package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class KeyCollisionSpec extends SparkSpec {
  import spark.implicits._

  test("case, punctuation, token order, and repeats collapse to one cluster") {
    val df = Seq(
      (1L, "Acme Corp."), (2L, "acme corp"), (3L, "CORP: Acme"),
      (4L, "Acme  Acme Corp"), // repeated token dedupes
      (5L, "Globex"), (6L, "Initech LLC"))
      .toDF("id", "name")
    val got = KeyCollision.clusters(df, "id", "name")
      .select("id", "fingerprint", "cluster_size", "canonical")
      .as[(Long, String, Long, String)].collect()
    assert(got.map(_._1).sorted.toSeq == Seq(1L, 2L, 3L, 4L))
    assert(got.forall(_._2 == "acme corp"))
    assert(got.forall(_._3 == 4L)) // four distinct spellings
    // every spelling occurs once → canonical = lexicographically least
    assert(got.forall(_._4 == "Acme  Acme Corp"))
  }

  test("canonical is the most frequent spelling, ties to the smallest") {
    val df = (Seq.fill(3)("ACME Corp") ++ Seq.fill(3)("Acme Corp") ++
        Seq("acme-corp")).zipWithIndex
      .map { case (n, i) => (i.toLong, n) }.toDF("id", "name")
    val got = KeyCollision.clusters(df, "id", "name")
      .select("canonical").as[String].collect().distinct.toSeq
    assert(got == Seq("ACME Corp")) // 3-way tie count, "ACME" < "Acme"
  }

  test("minClusterSize filters singletons; 1 reports everything") {
    val df = Seq((1L, "Solo Inc"), (2L, "Twin Co"), (3L, "twin co."))
      .toDF("id", "name")
    assert(KeyCollision.clusters(df, "id", "name").count() == 2)
    val all = KeyCollision.clusters(df, "id", "name", minClusterSize = 1)
    assert(all.count() == 3)
  }

  test("null and punctuation-only values drop; empty frame works") {
    val df = Seq((1L, Some("!!!")), (2L, None), (3L, Some("ok")))
      .toDF("id", "name")
    val got = KeyCollision.clusters(df, "id", "name", minClusterSize = 1)
      .select("id").as[Long].collect().toSeq
    assert(got == Seq(3L))
  }

  test("identical rows keep multiplicity; cluster_size counts spellings") {
    val df = Seq((1L, "A B"), (2L, "A B"), (3L, "b a"))
      .toDF("id", "name")
    val got = KeyCollision.clusters(df, "id", "name")
    assert(got.count() == 3)
    assert(got.select("cluster_size").as[Long].collect().forall(_ == 2L))
  }

  test("misuse is loud: reserved output names, bad minClusterSize") {
    val df = Seq((1L, "x")).toDF("id", "name")
    intercept[IllegalArgumentException](KeyCollision.clusters(
      df.withColumn("fingerprint", lit("f")), "id", "name"))
    intercept[IllegalArgumentException](
      KeyCollision.clusters(df, "id", "name", minClusterSize = 0))
  }
}
