package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ConnectedComponentsSpec extends SparkSpec {
  import spark.implicits._

  private def comps(rows: Array[org.apache.spark.sql.Row]) =
    rows.map(r => (r.getLong(0), r.getLong(1))).toSeq

  test("chain graph: labels travel the whole diameter (pointer jumping)") {
    // 1-2-3-...-12 given as directed, unordered edges — one component
    val edges = (1L until 12L).map(i => (i + 1, i)).toDF("s", "d")
    val out = ConnectedComponents.run(edges, "s", "d")
      .orderBy("id").collect()
    assert(comps(out) == (1L to 12L).map(i => (i, 1L)))
  }

  test("two components, isolated vertex via explicit universe") {
    val edges = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("s", "d")
    val verts = Seq(1L, 2L, 3L, 10L, 11L, 99L).toDF("id")
    val out = ConnectedComponents.run(edges, "s", "d", Some(verts))
      .orderBy("id").collect()
    assert(comps(out) == Seq((1L, 1L), (2L, 1L), (3L, 1L),
      (10L, 10L), (11L, 10L), (99L, 99L)))
    // without the universe, 99 (edge-less) is absent
    assert(ConnectedComponents.run(edges, "s", "d").count() == 5)
  }

  test("multigraph noise: repeats, self-loops, nulls, reversed direction") {
    val edges = Seq(
      (java.lang.Long.valueOf(1L), java.lang.Long.valueOf(2L)),
      (java.lang.Long.valueOf(2L), java.lang.Long.valueOf(1L)), // reverse
      (java.lang.Long.valueOf(1L), java.lang.Long.valueOf(2L)), // repeat
      (java.lang.Long.valueOf(3L), java.lang.Long.valueOf(3L)), // self-loop
      (java.lang.Long.valueOf(4L), null),                       // null endpoint
      (null, java.lang.Long.valueOf(5L))
    ).toDF("s", "d")
    val verts = Seq(1L, 2L, 3L, 4L, 5L).toDF("id")
    val out = ConnectedComponents.run(edges, "s", "d", Some(verts))
      .orderBy("id").collect()
    // only the 1-2 edge survives; 3 (self-loop) and the null-edge
    // endpoints are singletons
    assert(comps(out) == Seq((1L, 1L), (2L, 1L), (3L, 3L),
      (4L, 4L), (5L, 5L)))
  }

  test("string vertex ids: min-label is lexicographic") {
    val edges = Seq(("b", "c"), ("a", "b"), ("x", "y")).toDF("s", "d")
    val out = ConnectedComponents.run(edges, "s", "d")
      .orderBy("id").collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq
    assert(out == Seq(("a", "a"), ("b", "a"), ("c", "a"),
      ("x", "x"), ("y", "x")))
  }

  test("withSizes attaches component populations") {
    val edges = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("s", "d")
    val out = ConnectedComponents.withSizes(
      ConnectedComponents.run(edges, "s", "d"))
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(out == Seq((1L, 1L, 3L), (2L, 1L, 3L), (3L, 1L, 3L),
      (10L, 10L, 2L), (11L, 10L, 2L)))
  }

  test("guards: missing columns are loud") {
    val edges = Seq((1L, 2L)).toDF("s", "d")
    intercept[IllegalArgumentException](
      ConnectedComponents.run(edges, "nope", "d"))
    intercept[IllegalArgumentException](
      ConnectedComponents.run(edges, "s", "d", Some(Seq(1L).toDF("v"))))
    intercept[IllegalArgumentException](
      ConnectedComponents.withSizes(edges))
  }
}
