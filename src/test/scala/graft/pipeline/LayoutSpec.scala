package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LayoutSpec extends SparkSpec {

  test("zValue: known interleaves, zero, and high-bit masking") {
    import spark.implicits._
    val df = Seq((5L, 3L), (0L, 0L), (65536L + 5L, 3L), (1L, 0L), (0L, 1L))
      .toDF("x", "y")
      .select(Layout.zValue(col("x"), col("y")).as("z"))
    // x=5 (101b) → z bits 0,4; y=3 (11b) → z bits 1,3 → 1+2+8+16 = 27
    assert(df.as[Long].collect().toSeq == Seq(27L, 0L, 27L, 1L, 2L))
  }

  test("zValue: equals the positional definition on random 16-bit pairs") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val pairs = Seq.fill(200)((rnd.nextInt(65536).toLong, rnd.nextInt(65536).toLong))
    def ref(x: Long, y: Long): Long =
      (0 until 16).map(i => (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))).sum
    val got = pairs.toDF("x", "y")
      .select(Layout.zValue(col("x"), col("y")).as("z")).as[Long].collect()
    assert(got.toSeq == pairs.map { case (x, y) => ref(x, y) })
  }

  test("zorderBy: written files are compact rectangles in BOTH dimensions") {
    import spark.implicits._
    // a full 64×64 grid; a linear sort on x would leave each file
    // spanning ALL of y — the z-curve must keep both spans small
    val grid = (0 until 4096).map(i => (i.toLong, (i % 64).toLong, (i / 64).toLong))
      .toDF("id", "x", "y")
    val out = java.nio.file.Files.createTempDirectory("zorder").toString
    Layout.zorderBy(grid.repartition(8), col("x"), col("y"), numFiles = 8, bits = 6)
      .write.mode("overwrite").parquet(out)
    val spans = spark.read.parquet(out)
      .groupBy(input_file_name().as("f"))
      .agg((max("x") - min("x")).as("xs"), (max("y") - min("y")).as("ys"),
        count(lit(1)).as("n"))
      .collect()
    assert(spans.length == 8)
    val avgX = spans.map(_.getAs[Long]("xs")).sum.toDouble / spans.length
    val avgY = spans.map(_.getAs[Long]("ys")).sum.toDouble / spans.length
    // global span is 63 on each axis; 8 contiguous z-ranges of ~512
    // cells tile as ≤ 32×16 rectangles (plus range-sampling slop)
    assert(avgX < 0.65 * 63, s"avg x-span $avgX not compact")
    assert(avgY < 0.65 * 63, s"avg y-span $avgY not compact")
    // nothing lost in the rewrite
    assert(spans.map(_.getAs[Long]("n")).sum == 4096L)
  }
}
