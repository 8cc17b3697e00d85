package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.sql.GraftBridge

/** Native Catalyst expressions for the embedding-similarity hot path.
  *
  * The higher-order-function compositions these replace
  * (`aggregate(zip_with(vec, plane, _*_), 0.0, _+_)` per plane / per
  * norm) evaluate their lambdas interpreted per element OUTSIDE
  * whole-stage codegen — an SRP bucket projection with 16 planes costs
  * 16 separate interpreted passes over every vector, and a cosine verify
  * 3 more per candidate pair. At 100 TB of vectors that projection
  * dominates embedding-dedup cost, so each of these is ONE JIT-compiled
  * pass per row that stays inside the surrounding codegen span (same
  * rationale and structure as [[SketchExprs.ShingleHash]]).
  *
  * Element widening matches the HOF form exactly: floats are widened to
  * double per element and accumulated sequentially in array order, so
  * results are bit-identical to the previous `cast("double")` +
  * aggregate composition (pinned by VectorExprsSpec equality tests).
  */
object VectorExprs {

  /** Deterministic Gaussian SRP plane matrix — row-major fill from
    * java.util.Random(seed). Shared by the executor-side [[SrpBits]]
    * expression and driver-side query bucketing
    * (Similarity.SrpIndex.bucketOf) so both always agree. */
  def srpPlanes(planes: Int, dim: Int, seed: Long): Array[Array[Double]] = {
    val rng = new java.util.Random(seed)
    Array.fill(planes)(Array.fill(dim)(rng.nextGaussian()))
  }

  /** One pass over an unsafe array into a local double[] — the plane /
    * centroid loops then run over cache-friendly primitives. Null
    * elements read as 0.0 (embedding vectors are dense; documented). */
  private[functions] def toDoubles(a: ArrayData, elem: DataType): Array[Double] = {
    val n = a.numElements()
    val out = new Array[Double](n)
    var i = 0
    elem match {
      case DoubleType => while (i < n) { out(i) = a.getDouble(i); i += 1 }
      case FloatType  => while (i < n) { out(i) = a.getFloat(i).toDouble; i += 1 }
      case LongType   => while (i < n) { out(i) = a.getLong(i).toDouble; i += 1 }
      case IntegerType => while (i < n) { out(i) = a.getInt(i).toDouble; i += 1 }
      case other => throw new IllegalStateException(
        s"unsupported vector element type $other")
    }
    out
  }

  private def requireNumericArray(fn: String, e: Expression): Unit = e.dataType match {
    case ArrayType(DoubleType | FloatType | LongType | IntegerType, _) => ()
    case other => throw graft.core.GraftError.Configuration(
      s"$fn expects array<float|double|int|bigint>, got ${other.simpleString}")
  }

  /** Signed-random-projection bucket id: bit i of the result is set iff
    * the vector's dot product with Gaussian plane i is >= 0. All `planes`
    * plane dots are computed in ONE pass over the vector. Plane vectors
    * derive deterministically from (seed, dim), with dim read from the
    * first row — no driver-side dim-probe job is ever needed. */
  case class SrpBits(child: Expression, planes: Int = 16, seed: Long = 42L)
    extends UnaryExpression {

    require(planes >= 1 && planes <= 64,
      s"planes must be in [1, 64] (bucket is a 64-bit key), got $planes")

    override def dataType: DataType = LongType
    override def nullable: Boolean = child.nullable
    override def checkInputDataTypes()
        : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
      requireNumericArray("srp_bits", child)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    }

    @transient private lazy val elemType =
      child.dataType.asInstanceOf[ArrayType].elementType
    // volatile (dim, planes) pair: the expression object is shared across
    // codegen tasks, and a torn cache write must never publish half-built
    // planes
    @transient @volatile private var cache: (Int, Array[Array[Double]]) = null

    private def planesFor(dim: Int): Array[Array[Double]] = {
      val c = cache
      if (c != null && c._1 == dim) c._2
      else {
        val p = srpPlanes(planes, dim, seed)
        cache = (dim, p)
        p
      }
    }

    override protected def doGenCode(
        ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
        ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
        : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
      val ref = ctx.addReferenceObj("srpBits", this, classOf[SrpBits].getName)
      nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.bits($c);")
    }

    protected override def nullSafeEval(input: Any): Any =
      bits(input.asInstanceOf[ArrayData])

    def bits(input: ArrayData): Long = {
      val v = toDoubles(input, elemType)
      val dim = v.length
      val pl = planesFor(dim)
      var bucket = 0L
      var i = 0
      while (i < planes) {
        val p = pl(i)
        var d = 0.0
        var j = 0
        while (j < dim) { d += v(j) * p(j); j += 1 }
        if (d >= 0.0) bucket |= (1L << i)
        i += 1
      }
      bucket
    }

    override protected def withNewChildInternal(c: Expression): SrpBits =
      copy(child = c)
  }

  /** Cosine similarity dot(a,b) / (|a| * |b|) in one pass per pair.
    * Mixed element types are fine (a float embedding column against an
    * array<double> query literal). */
  case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression {

    override def dataType: DataType = DoubleType
    override def nullable: Boolean = left.nullable || right.nullable
    override def checkInputDataTypes()
        : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
      requireNumericArray("cosine_sim", left)
      requireNumericArray("cosine_sim", right)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    }

    @transient private lazy val leftElem =
      left.dataType.asInstanceOf[ArrayType].elementType
    @transient private lazy val rightElem =
      right.dataType.asInstanceOf[ArrayType].elementType

    override protected def doGenCode(
        ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
        ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
        : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
      val ref = ctx.addReferenceObj("cosineSim", this, classOf[CosineSim].getName)
      nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = $ref.sim($a, $b);")
    }

    protected override def nullSafeEval(l: Any, r: Any): Any =
      sim(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

    def sim(a: ArrayData, b: ArrayData): Double = {
      val va = toDoubles(a, leftElem)
      val vb = toDoubles(b, rightElem)
      // a dimension mismatch is a data bug — fail loudly rather than
      // return a plausible-looking truncated dot product (the HOF form
      // this replaced surfaced the mistake as NULL)
      if (va.length != vb.length) throw new IllegalArgumentException(
        s"cosine_sim: vector dimensions differ (${va.length} vs ${vb.length})")
      val n = va.length
      var dot = 0.0
      var na = 0.0
      var nb = 0.0
      var i = 0
      while (i < n) {
        dot += va(i) * vb(i)
        na += va(i) * va(i)
        nb += vb(i) * vb(i)
        i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }

    override protected def withNewChildrenInternal(
        l: Expression, r: Expression): CosineSim = copy(left = l, right = r)
  }

  /** Index of the nearest centroid by squared L2, all centroids scanned
    * in one pass per row; ties keep the lowest index (same semantics as
    * the `least(struct(dist, i))` composition it replaces). */
  case class NearestCentroid(child: Expression, centroids: Seq[Seq[Double]])
    extends UnaryExpression {

    require(centroids.nonEmpty, "need at least one centroid")

    override def dataType: DataType = IntegerType
    override def nullable: Boolean = child.nullable
    override def checkInputDataTypes()
        : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
      requireNumericArray("nearest_centroid", child)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    }

    @transient private lazy val elemType =
      child.dataType.asInstanceOf[ArrayType].elementType
    @transient private lazy val cents: Array[Array[Double]] =
      centroids.map(_.toArray).toArray

    override protected def doGenCode(
        ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
        ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
        : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
      val ref = ctx.addReferenceObj("nearestCentroid", this,
        classOf[NearestCentroid].getName)
      nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.cell($c);")
    }

    protected override def nullSafeEval(input: Any): Any =
      cell(input.asInstanceOf[ArrayData])

    def cell(input: ArrayData): Int = {
      val v = toDoubles(input, elemType)
      var best = 0
      var bestD = Double.PositiveInfinity
      var i = 0
      while (i < cents.length) {
        val c = cents(i)
        // centroid/vector dimension mismatch is a data bug — loud, not
        // a truncated distance that silently misassigns cells
        if (c.length != v.length) throw new IllegalArgumentException(
          s"nearest_centroid: vector dim ${v.length} != centroid dim ${c.length}")
        var d = 0.0
        var j = 0
        while (j < v.length) { val t = v(j) - c(j); d += t * t; j += 1 }
        if (d < bestD) { bestD = d; best = i }
        i += 1
      }
      best
    }

    override protected def withNewChildInternal(c: Expression): NearestCentroid =
      copy(child = c)
  }

  /** Euclidean norm in one pass — the normalization denominator every
    * embedding pipeline computes before cosine-metric storage. */
  case class L2Norm(child: Expression) extends UnaryExpression {

    override def dataType: DataType = DoubleType
    override def nullable: Boolean = child.nullable
    override def checkInputDataTypes()
        : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
      requireNumericArray("l2_norm", child)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    }

    @transient private lazy val elemType =
      child.dataType.asInstanceOf[ArrayType].elementType

    override protected def doGenCode(
        ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
        ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
        : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
      val ref = ctx.addReferenceObj("l2norm", this, classOf[L2Norm].getName)
      nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.norm($c);")
    }

    protected override def nullSafeEval(input: Any): Any =
      norm(input.asInstanceOf[ArrayData])

    def norm(input: ArrayData): Double = {
      val v = toDoubles(input, elemType)
      var s = 0.0
      var i = 0
      while (i < v.length) { s += v(i) * v(i); i += 1 }
      math.sqrt(s)
    }

    override protected def withNewChildInternal(c: Expression): L2Norm =
      copy(child = c)
  }

  /** Symmetric int8 quantization: codes_i = trunc(v_i / scale * 127)
    * with scale = max |v_i| — the 4x storage/bandwidth shrink applied
    * before shipping an embedding corpus to an ANN index. Truncation
    * toward zero (not rounding) is used deliberately: it is exactly
    * replayable in any SQL engine, so the codes are oracle-checkable;
    * an all-zero vector quantizes to all-zero codes. One pass computes
    * the scale, one the codes, both over a primitive local array. */
  case class QuantizeInt8(child: Expression) extends UnaryExpression {

    override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
    override def nullable: Boolean = child.nullable
    override def checkInputDataTypes()
        : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
      requireNumericArray("quantize_int8", child)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    }

    @transient private lazy val elemType =
      child.dataType.asInstanceOf[ArrayType].elementType

    override protected def doGenCode(
        ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
        ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
        : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
      val ref = ctx.addReferenceObj("quantize", this, classOf[QuantizeInt8].getName)
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $ref.codes($c);")
    }

    protected override def nullSafeEval(input: Any): Any =
      codes(input.asInstanceOf[ArrayData])

    def codes(input: ArrayData): ArrayData = {
      val v = toDoubles(input, elemType)
      var scale = 0.0
      var i = 0
      while (i < v.length) {
        val a = math.abs(v(i)); if (a > scale) scale = a; i += 1
      }
      val out = new Array[Int](v.length)
      if (scale > 0.0) {
        i = 0
        while (i < v.length) { out(i) = (v(i) / scale * 127.0).toInt; i += 1 }
      }
      new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
    }

    override protected def withNewChildInternal(c: Expression): QuantizeInt8 =
      copy(child = c)
  }

  /** Exact integer dot product of two SORTED weighted posting arrays
    * (`array<struct<h: long, w: long>>`, ascending by `h`) via one
    * linear merge — O(|a| + |b|), no per-pair hash sets, no exploded
    * (pair, term) rows. This is the verify inner loop of the tf-idf
    * cosine join: the previous shape exploded every candidate pair
    * into per-term rows and re-aggregated them by pair, whose hash-map
    * pressure was the measured 28% GC loss at 3.1 GiB/core in the
    * round-12 100× ramp — the merge form streams two bounded arrays
    * per row instead.
    *
    * Accumulation is EXACT integer math with loud overflow
    * (`Math.multiplyExact`/`addExact` → DataValidation): quantized
    * tf·idf weights are < ~2^25, so a real corpus is orders of
    * magnitude below the 2^63 sum bound — an overflow means broken
    * inputs, not a rounding decision. Duplicate keys cannot occur on
    * either side (one weight per term per doc) short of an 8-byte
    * term-hash collision, the sketch family's standard 2^-64
    * contract. */
  case class DotSortedWeighted(left: Expression, right: Expression)
    extends BinaryExpression {

    override def dataType: DataType = LongType
    override def nullable: Boolean = left.nullable || right.nullable

    override protected def doGenCode(
        ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
        ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
        : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
      val ref = ctx.addReferenceObj("dotSorted", this,
        classOf[DotSortedWeighted].getName)
      nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = $ref.merge($a, $b);")
    }

    protected override def nullSafeEval(l: Any, r: Any): Any =
      merge(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

    def merge(a: ArrayData, b: ArrayData): Long = {
      val na = a.numElements(); val nb = b.numElements()
      var i = 0; var j = 0; var sum = 0L
      try {
        while (i < na && j < nb) {
          val ra = a.getStruct(i, 2); val rb = b.getStruct(j, 2)
          val ha = ra.getLong(0); val hb = rb.getLong(0)
          if (ha < hb) i += 1
          else if (ha > hb) j += 1
          else {
            sum = Math.addExact(sum,
              Math.multiplyExact(ra.getLong(1), rb.getLong(1)))
            i += 1; j += 1
          }
        }
      } catch {
        case _: ArithmeticException =>
          throw graft.core.GraftError.DataValidation(
            "dot_sorted_weighted: exact integer dot product exceeded " +
              "Long range — weights this large mean broken quantization " +
              "or corrupt inputs, not a rounding decision")
      }
      sum
    }

    override protected def withNewChildrenInternal(
        l: Expression, r: Expression): DotSortedWeighted =
      copy(left = l, right = r)
  }

  // ------------------------- Column-level API ---------------------------

  def dot_sorted_weighted(a: Column, b: Column): Column =
    GraftBridge.column(DotSortedWeighted(
      GraftBridge.expression(a), GraftBridge.expression(b)))

  def srp_bits(vec: Column, planes: Int = 16, seed: Long = 42L): Column =
    GraftBridge.column(SrpBits(GraftBridge.expression(vec), planes, seed))

  def cosine_sim(a: Column, b: Column): Column =
    GraftBridge.column(
      CosineSim(GraftBridge.expression(a), GraftBridge.expression(b)))

  def nearest_centroid(vec: Column, centroids: Seq[Seq[Double]]): Column =
    GraftBridge.column(
      NearestCentroid(GraftBridge.expression(vec), centroids))

  def l2_norm(vec: Column): Column =
    GraftBridge.column(L2Norm(GraftBridge.expression(vec)))

  def quantize_int8(vec: Column): Column =
    GraftBridge.column(QuantizeInt8(GraftBridge.expression(vec)))

  /** SQL names for `spark.sql` users, parameters parsed from foldable
    * literals with loud failures (same contract as SketchExprs.register).
    * nearest_centroid is Column-API-only — its centroid matrix is not a
    * SQL-literal-friendly parameter. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    import SketchExprs.{litInt, litLong}
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "srp_bits", {
        case Seq(v)       => SrpBits(v)
        case Seq(v, p)    => SrpBits(v, litInt("srp_bits", "planes")(p))
        case Seq(v, p, s) => SrpBits(v, litInt("srp_bits", "planes")(p),
          litLong("srp_bits", "seed")(s))
        case exprs => throw graft.core.GraftError.Configuration(
          s"srp_bits expects (vec[, planes[, seed]]), got ${exprs.length} arguments")
      }, "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cosine_sim", {
        case Seq(a, b) => CosineSim(a, b)
        case exprs => throw graft.core.GraftError.Configuration(
          s"cosine_sim expects (a, b), got ${exprs.length} arguments")
      }, "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "l2_norm", {
        case Seq(v) => L2Norm(v)
        case exprs => throw graft.core.GraftError.Configuration(
          s"l2_norm expects (vec), got ${exprs.length} arguments")
      }, "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "quantize_int8", {
        case Seq(v) => QuantizeInt8(v)
        case exprs => throw graft.core.GraftError.Configuration(
          s"quantize_int8 expects (vec), got ${exprs.length} arguments")
      }, "scala_udf")
  }
}
