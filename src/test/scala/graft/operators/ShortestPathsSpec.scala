package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ShortestPathsSpec extends SparkSpec {
  import spark.implicits._

  private def run(edges: Seq[(Long, Long)], seeds: Seq[Long], hops: Int,
                  directed: Boolean = false): Map[Long, Int] =
    ShortestPaths.bfs(edges.toDF("src", "dst"), "src", "dst",
        seeds.toDF("id"), "id", maxHops = hops, directed = directed)
      .as[(Long, Int)].collect().toMap

  /** Naive reference BFS over an adjacency map. */
  private def naive(edges: Seq[(Long, Long)], seeds: Seq[Long], hops: Int,
                    directed: Boolean): Map[Long, Int] = {
    val es = edges.filter(e => e._1 != e._2) ++
      (if (directed) Nil else edges.filter(e => e._1 != e._2).map(_.swap))
    val adj = es.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    var dist = seeds.map(_ -> 0).toMap
    var frontier = seeds.toSet
    for (h <- 1 to hops if frontier.nonEmpty) {
      val next = frontier.flatMap(v => adj.getOrElse(v, Set.empty))
        .diff(dist.keySet)
      dist ++= next.map(_ -> h)
      frontier = next
    }
    dist
  }

  test("path graph: hop distances, bound respected") {
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
    assert(run(path, Seq(1L), 2) == Map(1L -> 0, 2L -> 1, 3L -> 2))
    assert(run(path, Seq(1L), 10) ==
      Map(1L -> 0, 2L -> 1, 3L -> 2, 4L -> 3, 5L -> 4))
  }

  test("direction honored when directed; both ways otherwise") {
    val es = Seq((2L, 1L), (2L, 3L))
    assert(run(es, Seq(1L), 5, directed = true) == Map(1L -> 0))
    assert(run(es, Seq(1L), 5) == Map(1L -> 0, 2L -> 1, 3L -> 2))
  }

  test("multiple seeds take the minimum; ghost seeds emit at 0") {
    val es = Seq((1L, 2L), (2L, 3L), (3L, 4L))
    val got = run(es, Seq(1L, 4L, 99L), 5)
    assert(got == Map(1L -> 0, 4L -> 0, 99L -> 0, 2L -> 1, 3L -> 1))
  }

  test("cycles terminate; self-loops and duplicate edges are ignored") {
    val es = Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 1L),
      (1L, 2L), (1L, 2L))
    assert(run(es, Seq(1L), 10) == Map(1L -> 0, 2L -> 1, 3L -> 1))
  }

  test("maxHops 0 returns exactly the deduplicated seed set") {
    assert(run(Seq((1L, 2L)), Seq(1L, 1L), 0) == Map(1L -> 0))
  }

  test("random graphs match the naive reference, directed and not") {
    val rnd = new scala.util.Random(23)
    val es = Seq.fill(300)((rnd.nextInt(60).toLong, rnd.nextInt(60).toLong))
    val seeds = Seq(1L, 2L, 3L)
    for (directed <- Seq(true, false); hops <- Seq(1, 2, 4)) {
      assert(run(es, seeds, hops, directed) ==
        naive(es, seeds, hops, directed),
        s"directed=$directed hops=$hops diverged")
    }
  }

  test("misuse is loud: missing columns, absurd hop counts") {
    val es = Seq((1L, 2L)).toDF("src", "dst")
    intercept[IllegalArgumentException](
      ShortestPaths.bfs(es, "nope", "dst", Seq(1L).toDF("id")))
    intercept[IllegalArgumentException](
      ShortestPaths.bfs(es, "src", "dst", Seq(1L).toDF("id"),
        maxHops = 1000))
  }
}
