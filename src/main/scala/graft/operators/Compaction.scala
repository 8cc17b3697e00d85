package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Small-file compaction — the table-maintenance operator every
  * long-running ingest needs: streaming sinks, incremental batches,
  * and over-parallel writes leave thousands of KB-sized files, and at
  * 100 TB the NameNode/listing pressure plus per-file open cost
  * dominates scan time ("the small-files problem"). Compaction
  * rewrites a directory into ~targetBytes files.
  *
  * Three modes, by cost:
  *  - COALESCE (default): `coalesce(n)` merges input splits with NO
  *    shuffle — each output task just concatenates several input
  *    files. The cheapest rewrite; file sizes track input skew.
  *  - REBALANCE: `repartition(n)` round-robins rows through one
  *    shuffle — pays data motion for evenly-sized output files.
  *  - CLUSTER: `repartitionByRange(n, keys) + sortWithinPartitions` —
  *    the Z-order-lite layout pass: one range shuffle + local sort
  *    buys min/max-statistics data skipping on the cluster keys for
  *    every future scan (see [[ZOrder]] for the multi-column
  *    interleave variant).
  *
  * Output file count derives from the INPUT's actual byte size (a
  * driver-side file listing — no data scan), not a row count guess,
  * so parquet→parquet compaction lands near targetBytes per file. */
object Compaction {

  final case class DirStats(files: Long, bytes: Long, smallFiles: Long)

  /** Driver-side recursive listing: file count, total bytes, and how
    * many files are below `smallBytes` (the compaction motive). */
  def dirStats(spark: SparkSession, path: String,
               smallBytes: Long = 32L << 20): DirStats = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val it = fs.listFiles(p, true)
    var files = 0L; var bytes = 0L; var small = 0L
    while (it.hasNext) {
      val f = it.next()
      val name = f.getPath.getName
      // ignore commit-protocol droppings, not data
      if (!name.startsWith("_") && !name.startsWith(".")) {
        files += 1; bytes += f.getLen
        if (f.getLen < smallBytes) small += 1
      }
    }
    DirStats(files, bytes, small)
  }

  /** Partition count for `inputBytes` of data at `targetBytes` per
    * output file. */
  def targetPartitions(inputBytes: Long, targetBytes: Long): Int = {
    require(targetBytes > 0, s"targetBytes must be > 0, got $targetBytes")
    math.max(1L, (inputBytes + targetBytes - 1) / targetBytes)
      .min(Int.MaxValue.toLong).toInt
  }

  /** The compaction plan over an already-read frame. `clusterBy`
    * non-empty selects CLUSTER mode; otherwise `rebalance` picks
    * between REBALANCE and COALESCE. */
  def compact(df: DataFrame, nPartitions: Int,
              clusterBy: Seq[String] = Seq.empty,
              rebalance: Boolean = false): DataFrame = {
    require(nPartitions >= 1, s"nPartitions must be >= 1, got $nPartitions")
    clusterBy.foreach(c => require(df.columns.contains(c),
      s"no such cluster column '$c'"))
    if (clusterBy.nonEmpty) {
      val keys = clusterBy.map(col)
      df.repartitionByRange(nPartitions, keys: _*)
        .sortWithinPartitions(keys: _*)
    } else if (rebalance) df.repartition(nPartitions)
    else df.coalesce(nPartitions)
  }
}
