package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("salted aggregation equals plain aggregation") {
    val li = sf("lineitem")
    val salted = Skew.saltedSumCount(li, Seq("l_returnflag"), "l_quantity")
      .withColumn("sum_l_quantity", round($"sum_l_quantity", 4))
    val plain = li.groupBy($"l_returnflag")
      .agg(round(sum($"l_quantity"), 4).as("sum_l_quantity"),
        count(lit(1)).as("cnt"))
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
    // two-stage shape: exactly two shuffles (partial on key+salt, final on key)
    val shuffles = salted.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan.collect {
          case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
        }
      case p => p.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
      }
    }
    assert(shuffles.size == 2)
  }

  test("salted broadcast join equals plain join, broadcasts, and spreads keys") {
    val li = sf("lineitem").select($"l_orderkey", $"l_suppkey", $"l_quantity")
      .withColumn("k", pmod($"l_suppkey", lit(3))) // 3 hot keys
    val dim = Seq((0L, "a"), (1L, "b"), (2L, "c")).toDF("k", "label")
    val joined = Skew.saltedBroadcastJoin(li, dim, "k", salts = 8)
    val plain = li.join(dim, Seq("k"))
    assert(joined.count() == plain.count())
    assert(joined.select(sum($"l_quantity")).head.getDouble(0) ==
      plain.select(sum($"l_quantity")).head.getDouble(0))
    assert(joined.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"))
  }
}
