package graft.operators

import graft.SparkSpec

class TrianglesSpec extends SparkSpec {
  import spark.implicits._

  private def naive(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val e = edges.filter(p => p._1 != p._2)
      .map(p => (math.min(p._1, p._2), math.max(p._1, p._2))).toSet
    val nodes = e.flatMap(p => Seq(p._1, p._2)).toSeq.sorted
    val tris = for {
      a <- nodes; b <- nodes if a < b && e((a, b))
      c <- nodes if b < c && e((b, c)) && e((a, c))
    } yield Seq(a, b, c)
    tris.flatten.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
  }

  test("K4: four triangles, every node in three") {
    val edges = for {
      a <- 0L to 3L; b <- 0L to 3L if a < b
    } yield (a, b)
    val got = Triangles.perNodeCounts(edges.toDF("x", "y"), "x", "y")
      .as[(Long, Long)].collect().toMap
    assert(got == Map(0L -> 3L, 1L -> 3L, 2L -> 3L, 3L -> 3L))
  }

  test("random graph matches the naive triple enumeration") {
    val rnd = new scala.util.Random(7)
    val edges = (1 to 400).map(_ =>
      (rnd.nextInt(30).toLong, rnd.nextInt(30).toLong))
    val got = Triangles.perNodeCounts(edges.toDF("x", "y"), "x", "y")
      .as[(Long, Long)].collect().toMap
    assert(got == naive(edges))
  }

  test("duplicates, reversed edges, and self-loops do not change counts") {
    val base = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L))
    val noisy = base ++ base.map(_.swap) ++ base ++ Seq((2L, 2L), (4L, 4L))
    val clean = Triangles.perNodeCounts(base.toDF("x", "y"), "x", "y")
      .as[(Long, Long)].collect().toMap
    val got = Triangles.perNodeCounts(noisy.toDF("x", "y"), "x", "y")
      .as[(Long, Long)].collect().toMap
    assert(clean == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
    assert(got == clean)
  }

  test("hub skew: a star core closes only the rim triangles") {
    // hub 0 connects to all of 1..20; rim edges 1-2 and 3-4 close
    // exactly two triangles; the hub participates in both
    val edges = (1L to 20L).map(i => (0L, i)) ++ Seq((1L, 2L), (3L, 4L))
    val got = Triangles.perNodeCounts(edges.toDF("x", "y"), "x", "y")
      .as[(Long, Long)].collect().toMap
    assert(got == Map(0L -> 2L, 1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L))
  }

  test("guards reject missing columns") {
    val df = Seq((1L, 2L)).toDF("x", "y")
    intercept[IllegalArgumentException](Triangles.perNodeCounts(df, "nope", "y"))
    intercept[IllegalArgumentException](Triangles.perNodeCounts(df, "x", "nope"))
  }
}
