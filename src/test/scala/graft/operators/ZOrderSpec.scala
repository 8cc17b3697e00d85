package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  /** Reference Morton interleave on pre-quantized ranks. */
  private def morton2(qx: Long, qy: Long): Long =
    (0 until 16).map(i =>
      (((qx >> i) & 1L) << (2 * i)) | (((qy >> i) & 1L) << (2 * i + 1))).sum

  test("zvalue matches a reference Morton interleave on exact ranks") {
    // bounds [0, 65535] make quantization the identity on in-range longs
    val rows = Seq((0L, 0L), (1L, 0L), (0L, 1L), (65535L, 65535L),
      (12345L, 54321L), (40000L, 7L))
    val got = rows.toDF("x", "y")
      .select(col("x"), col("y"), ZOrder.zvalue(Seq(
        (col("x"), lit(0L), lit(65535L)),
        (col("y"), lit(0L), lit(65535L)))).as("z"))
      .as[(Long, Long, Long)].collect().toMap2
    rows.foreach { case (x, y) =>
      assert(got((x, y)) == morton2(x, y), s"($x,$y)") }
  }

  test("out-of-range and null values clamp to the curve edge, not error") {
    val df = Seq((Some(-5L), Some(100000L)), (None, Some(3L)))
      .toDF("x", "y")
      .select(ZOrder.zvalue(Seq(
        (col("x"), lit(0L), lit(65535L)),
        (col("y"), lit(0L), lit(65535L)))).as("z"))
    val zs = df.as[Long].collect()
    assert(zs(0) == morton2(0L, 65535L))
    assert(zs(1) == morton2(0L, 3L))
  }

  test("clustered files cover tiny bounding boxes vs a random layout") {
    val rnd = new scala.util.Random(13)
    val df = Seq.fill(20000)((rnd.nextInt(1000).toLong,
      rnd.nextInt(1000).toLong)).toDF("x", "y")
    val dir = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("target"), "zorder").toString
    ZOrder.cluster(df, Seq("x", "y"), numFiles = 16)
      .write.mode("overwrite").parquet(s"$dir/clustered")
    df.repartition(16).write.mode("overwrite").parquet(s"$dir/random")

    def bboxAreaSum(path: String): Long =
      spark.read.parquet(path)
        .groupBy(input_file_name())
        .agg(((max("x") - min("x") + 1) *
          (max("y") - min("y") + 1)).as("area"))
        .agg(sum("area")).head.getLong(0)

    val clustered = bboxAreaSum(s"$dir/clustered")
    val random = bboxAreaSum(s"$dir/random")
    // 16 random files each span ~the whole 1000x1000 square; 16
    // z-ordered files tile it — demand at least a 4x total reduction
    assert(clustered * 4 < random, s"clustered=$clustered random=$random")
  }

  test("guards: column count, reserved name, missing column") {
    val df = Seq((1L, 2L)).toDF("x", "y")
    intercept[IllegalArgumentException] {
      ZOrder.zvalue(Seq((col("x"), lit(0L), lit(1L))))
    }
    intercept[IllegalArgumentException] {
      ZOrder.cluster(df.withColumn("zval", lit(1L)), Seq("x", "y"), 4)
    }
    intercept[IllegalArgumentException] {
      ZOrder.cluster(df, Seq("x", "nope"), 4)
    }
  }

  private implicit class ToMap2(rows: Array[(Long, Long, Long)]) {
    def toMap2: Map[(Long, Long), Long] =
      rows.map { case (x, y, z) => (x, y) -> z }.toMap
  }
}
