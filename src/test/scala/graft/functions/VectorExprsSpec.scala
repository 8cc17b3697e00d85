package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The native vector expressions must be BIT-IDENTICAL to the
  * higher-order-function compositions they replaced (same element
  * widening, same sequential accumulation order) — these tests pin that
  * equality on the real embeddings fixture, not an approximation. */
class VectorExprsSpec extends SparkSpec {
  import spark.implicits._

  private def hofDot(x: Column, y: Column): Column =
    aggregate(zip_with(x, y, (p, q) => p * q), lit(0.0), (acc, v) => acc + v)

  private def asDouble(c: Column): Column = transform(c, _.cast("double"))

  test("SrpBits equals the per-plane aggregate(zip_with) composition exactly") {
    val planes = 16
    val seed = 42L
    val emb = sf("embeddings").select($"vec_id", $"embedding")
    val dim = 64 // embeddings fixture dim
    val pv = VectorExprs.srpPlanes(planes, dim, seed)
    val vecD = asDouble($"embedding")
    val hof = (0 until planes).map { i =>
      val dot = hofDot(vecD, typedLit(pv(i).toSeq))
      when(dot >= 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)
    val cmp = emb.select(
      VectorExprs.srp_bits($"embedding", planes, seed).as("fast"), hof.as("slow"))
    assert(cmp.filter($"fast" =!= $"slow").count() == 0)
    // different seeds and plane counts genuinely change the bucket
    val alt = emb.select(
      VectorExprs.srp_bits($"embedding", planes, seed).as("a"),
      VectorExprs.srp_bits($"embedding", planes, seed + 1).as("b"),
      VectorExprs.srp_bits($"embedding", 8, seed).as("c"))
    assert(alt.filter($"a" === $"b").count() < alt.count())
    assert(alt.filter($"c" >= (1L << 8)).count() == 0, "8 planes → 8 bits")
  }

  test("CosineSim equals the aggregate(zip_with) cosine exactly") {
    val emb = sf("embeddings").limit(40).select($"vec_id", $"embedding")
    val pairs = emb.as("a").crossJoin(emb.as("b"))
      .filter($"a.vec_id" < $"b.vec_id")
    def hofCos(x: Column, y: Column): Column =
      hofDot(x, y) / (sqrt(hofDot(x, x)) * sqrt(hofDot(y, y)))
    val cmp = pairs.select(
      VectorExprs.cosine_sim($"a.embedding", $"b.embedding").as("fast"),
      hofCos(asDouble($"a.embedding"), asDouble($"b.embedding")).as("slow"))
    assert(cmp.filter($"fast" =!= $"slow").count() == 0)
    // mixed float/double inputs (embedding column vs double query literal)
    val q = Seq.tabulate(64)(i => math.sin(i + 1.0))
    val mixed = emb.select(
      VectorExprs.cosine_sim($"embedding", typedLit(q)).as("fast"),
      hofCos(asDouble($"embedding"), typedLit(q)).as("slow"))
    assert(mixed.filter($"fast" =!= $"slow").count() == 0)
    // identical vectors → 1 up to sqrt(x)*sqrt(x) rounding (same as HOF)
    val self = emb.select(
      VectorExprs.cosine_sim($"embedding", $"embedding").as("c"))
    assert(self.filter(abs($"c" - 1.0) > 1e-12).count() == 0)
  }

  test("NearestCentroid equals the least(struct(dist, i)) composition, ties low") {
    val cents: Seq[Seq[Double]] =
      Seq(Seq(0.0, 0.0), Seq(1.0, 1.0), Seq(2.0, 0.0))
    val vecs = Seq(
      Seq(0.1, -0.1),  // → 0
      Seq(0.9, 1.2),   // → 1
      Seq(2.5, 0.0),   // → 2
      Seq(1.0, 0.0)    // equidistant to 0/2? d0=1, d1=1, d2=1 → tie → 0
    ).toDF("v")
    def l2(vec: Column, c: Seq[Double]): Column =
      aggregate(zip_with(vec, typedLit(c), (a, b) => (a - b) * (a - b)),
        lit(0.0), (acc, x) => acc + x)
    val hof = least(cents.zipWithIndex.map { case (c, i) =>
      struct(l2($"v", c).as("d"), lit(i).as("i"))
    }: _*).getField("i")
    val cmp = vecs.select(
      VectorExprs.nearest_centroid($"v", cents).as("fast"), hof.as("slow"))
    assert(cmp.filter($"fast" =!= $"slow").count() == 0)
    assert(vecs.select(VectorExprs.nearest_centroid($"v", cents))
      .as[Int].collect().toSeq == Seq(0, 1, 2, 0))
  }

  test("null vector input propagates null (all three expressions)") {
    val df = Seq(Some(Seq(1.0, 2.0)), None).toDF("v")
    val out = df.select(
      VectorExprs.srp_bits($"v", 4, 1L).as("b"),
      VectorExprs.cosine_sim($"v", $"v").as("c"),
      VectorExprs.nearest_centroid($"v", Seq(Seq(0.0, 0.0))).as("n"))
      .collect()
    assert(!out(0).isNullAt(0) && !out(0).isNullAt(1) && !out(0).isNullAt(2))
    assert(out(1).isNullAt(0) && out(1).isNullAt(1) && out(1).isNullAt(2))
  }

  test("SQL registration: srp_bits/cosine_sim with literal params, loud errors") {
    VectorExprs.register(spark)
    sf("embeddings").limit(10).createOrReplaceTempView("emb_sql")
    val r = spark.sql(
      """SELECT srp_bits(embedding) AS b16,
        |  srp_bits(embedding, 8) AS b8,
        |  srp_bits(embedding, 8, 7) AS b8s,
        |  cosine_sim(embedding, embedding) AS self_cos
        |FROM emb_sql""".stripMargin).collect()
    assert(r.length == 10)
    r.foreach { row =>
      assert(row.getLong(1) < (1L << 8))
      assert(math.abs(row.getDouble(3) - 1.0) < 1e-12)
    }
    // SQL output equals the Column API with the same parameters
    val viaSql = spark.sql("SELECT srp_bits(embedding, 8, 7) AS b FROM emb_sql")
    val viaCol = sf("embeddings").limit(10)
      .select(VectorExprs.srp_bits($"embedding", 8, 7L).as("b"))
    assert(viaSql.exceptAll(viaCol).isEmpty && viaCol.exceptAll(viaSql).isEmpty)
    // non-foldable / wrong-arity parameters fail loudly
    intercept[graft.core.GraftError.Configuration](
      spark.sql("SELECT srp_bits(embedding, vec_id) FROM emb_sql").collect())
    intercept[graft.core.GraftError.Configuration](
      spark.sql("SELECT cosine_sim(embedding) FROM emb_sql").collect())
    // a long seed beyond Int range is accepted un-truncated (regression:
    // litLong used to round-trip through Int)
    val bigSeed = spark.sql(
      "SELECT srp_bits(embedding, 8, 4294967296) AS b FROM emb_sql")
    val colSeed = sf("embeddings").limit(10)
      .select(VectorExprs.srp_bits($"embedding", 8, 4294967296L).as("b"))
    assert(bigSeed.exceptAll(colSeed).isEmpty && colSeed.exceptAll(bigSeed).isEmpty)
    // ...while an Int-typed parameter that overflows Int errors loudly
    intercept[graft.core.GraftError.Configuration](
      spark.sql("SELECT srp_bits(embedding, 4294967296) FROM emb_sql").collect())
  }

  test("L2Norm and QuantizeInt8 equal their HOF compositions; edges hold") {
    val emb = sf("embeddings").select($"vec_id", $"embedding")
    // norm: identical to sqrt(aggregate(squares))
    val slowNorm = sqrt(aggregate(
      transform(asDouble($"embedding"), x => x * x), lit(0.0), (a, v) => a + v))
    val cmp = emb.select(VectorExprs.l2_norm($"embedding").as("fast"),
      slowNorm.as("slow"))
    assert(cmp.filter($"fast" =!= $"slow").count() == 0)
    // quantize: codes match trunc(v/scale*127) with scale = max |v|
    val scale = array_max(transform(asDouble($"embedding"), x => abs(x)))
    val slowCodes = transform(asDouble($"embedding"),
      x => (x / scale * 127.0).cast("int"))
    val qcmp = emb.select(VectorExprs.quantize_int8($"embedding").as("fast"),
      slowCodes.as("slow"))
    assert(qcmp.filter(!($"fast" <=> $"slow")).count() == 0)
    // codes stay in the int8 range; the max-|v| element hits ±127
    val rng = emb.select(explode(VectorExprs.quantize_int8($"embedding")).as("c"))
    assert(rng.filter($"c" > 127 || $"c" < -127).count() == 0)
    assert(rng.filter(abs($"c") === 127).count() > 0)
    // zero vector → zero codes, norm 0, no division blowup
    val z = Seq(Seq(0.0, 0.0, 0.0)).toDF("v")
      .select(VectorExprs.l2_norm($"v").as("n"),
        VectorExprs.quantize_int8($"v").as("q")).collect()(0)
    assert(z.getDouble(0) == 0.0 && z.getSeq[Int](1) == Seq(0, 0, 0))
    // null propagates
    val nl = Seq(Option.empty[Seq[Double]]).toDF("v")
      .select(VectorExprs.l2_norm($"v"), VectorExprs.quantize_int8($"v")).collect()(0)
    assert(nl.isNullAt(0) && nl.isNullAt(1))
    // SQL registration round-trip
    VectorExprs.register(spark)
    emb.limit(5).createOrReplaceTempView("emb_q")
    val viaSql = spark.sql("SELECT l2_norm(embedding) AS n, quantize_int8(embedding) AS q FROM emb_q")
    val viaCol = emb.limit(5).select(VectorExprs.l2_norm($"embedding").as("n"),
      VectorExprs.quantize_int8($"embedding").as("q"))
    assert(viaSql.exceptAll(viaCol).isEmpty && viaCol.exceptAll(viaSql).isEmpty)
  }

  test("dimension mismatches fail loudly instead of truncating") {
    val e1 = intercept[Exception](
      Seq((Seq(1.0, 2.0), Seq(1.0, 2.0, 3.0))).toDF("a", "b")
        .select(VectorExprs.cosine_sim($"a", $"b")).collect())
    assert(e1.getMessage.contains("dimensions differ") ||
      Option(e1.getCause).exists(_.getMessage.contains("dimensions differ")))
    val e2 = intercept[Exception](
      Seq(Seq(1.0, 2.0, 3.0)).toDF("v")
        .select(VectorExprs.nearest_centroid($"v", Seq(Seq(0.0, 0.0))))
        .collect())
    assert(e2.getMessage.contains("centroid dim") ||
      Option(e2.getCause).exists(_.getMessage.contains("centroid dim")))
  }
}
