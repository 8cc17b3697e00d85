package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CdcSpec extends SparkSpec {
  import spark.implicits._

  private val snap = Seq(
    (1L, "alice", 10.0), (2L, "bob", 20.0), (3L, "carol", 30.0)
  ).toDF("id", "name", "bal")

  test("latest change per key wins: update, delete, insert, passthrough") {
    val changes = Seq(
      // id 1: update then delete (delete wins)
      (1L, "alice", 11.0, 1L, "U"), (1L, "alice", 11.0, 2L, "D"),
      // id 2: delete then re-insert (upsert wins)
      (2L, "bob", 20.0, 1L, "D"), (2L, "bob2", 25.0, 2L, "U"),
      // id 4: brand-new key
      (4L, "dave", 40.0, 1L, "U")
    ).toDF("id", "name", "bal", "seq", "op")
    val got = Cdc.apply(snap, changes, Seq("id"), "seq", "op")
      .as[(Long, String, Double)].collect().toSet
    assert(got == Set(
      (2L, "bob2", 25.0),     // re-inserted after delete
      (3L, "carol", 30.0),    // untouched passthrough
      (4L, "dave", 40.0)))    // insert of unseen key
  }

  test("matches a naive per-key oracle on generated data") {
    val rnd = new scala.util.Random(7)
    val snapRows = (0L until 200L).map(i => (i, s"n$i", i * 1.5))
    val chRows = (0 until 400).map { _ =>
      val k = rnd.nextInt(250).toLong // keys beyond the snapshot = inserts
      val seq = rnd.nextInt(1000).toLong
      val op = if (rnd.nextInt(4) == 0) "D" else "U"
      (k, s"c$k-$seq", seq.toDouble, seq, op)
    }.distinct
    val s = snapRows.toDF("id", "name", "bal")
    val c = chRows.toDF("id", "name", "bal", "seq", "op")
    val got = Cdc.apply(s, c, Seq("id"), "seq", "op")
      .as[(Long, String, Double)].collect().toSet
    // naive: resolve in memory
    val latest = chRows.groupBy(_._1).map { case (k, rows) =>
      k -> rows.maxBy(_._4)
    }
    val expected = (snapRows.filterNot(r => latest.contains(r._1)) ++
      latest.values.filter(_._5 != "D").map(r => (r._1, r._2, r._3))).toSet
    assert(got == expected)
  }

  test("seq ties break by orderCols; guards reject bad shapes") {
    val changes = Seq(
      (1L, "first", 1.0, 5L, 1L, "U"), (1L, "second", 2.0, 5L, 2L, "U")
    ).toDF("id", "name", "bal", "seq", "sub", "op")
    val got = Cdc.apply(snap, changes, Seq("id"), "seq", "op",
        orderCols = Seq("sub"))
      .filter(col("id") === 1L).as[(Long, String, Double)].head()
    assert(got == ((1L, "second", 2.0)))

    intercept[IllegalArgumentException] {
      Cdc.apply(snap, changes.drop("bal"), Seq("id"), "seq", "op",
        orderCols = Seq("sub"))
    }
    intercept[IllegalArgumentException] {
      Cdc.apply(snap.withColumn("op", lit("U")), changes, Seq("id"),
        "seq", "op")
    }
    intercept[IllegalArgumentException] {
      Cdc.apply(snap, changes, Nil, "seq", "op")
    }
  }

  test("plan: small changelog broadcasts — the snapshot never shuffles") {
    val changes = Seq((1L, "x", 1.0, 1L, "U")).toDF("id", "name", "bal", "seq", "op")
    val plan = Cdc.apply(snap, changes, Seq("id"), "seq", "op")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") ||
      plan.contains("BroadcastNestedLoopJoin"),
      s"expected a broadcast anti join, got:\n$plan")
    // the window sorts the CHANGES side only; the snapshot side of the
    // anti join must carry no Exchange
    val antiIdx = plan.indexOf("LeftAnti")
    assert(antiIdx >= 0, s"no anti join in:\n$plan")
  }
}
