package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Z-order layout: curve arithmetic against a bit-twiddling reference,
  * and the skipping claim itself — a y-only rectangle query must touch
  * far fewer files under z-clustering than under an x-sorted layout
  * (where every file spans the full y range and none can be skipped). */
class ZOrderSpec extends SparkTestBase {
  import spark.implicits._

  private def refInterleave(x: Long, y: Long, bits: Int): Long =
    (0 until bits).foldLeft(0L) { (acc, i) =>
      acc | (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
    }

  test("zValue matches the reference interleave, incl. aliasing high bits") {
    val pts = for (x <- 0L to 70L by 7L; y <- 0L to 70L by 11L) yield (x, y)
    val got = pts.toDF("x", "y")
      .select(col("x"), col("y"), ZOrder.zValue(col("x"), col("y"), 6).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    pts.foreach { case (x, y) =>
      assert(got((x, y)) == refInterleave(x, y, 6), s"($x,$y)")
    }
  }

  test("zValue stays on the curve: square blocks share high bits") {
    // any 2x2-aligned block maps to 4 consecutive z values
    val z = (x: Long, y: Long) => refInterleave(x, y, 8)
    for (bx <- 0L until 8L; by <- 0L until 8L) {
      val vals = Seq(z(2 * bx, 2 * by), z(2 * bx + 1, 2 * by),
        z(2 * bx, 2 * by + 1), z(2 * bx + 1, 2 * by + 1)).sorted
      assert(vals == (vals.head to vals.head + 3))
    }
  }

  test("y-only query skips most files under z-layout, none under x-sort") {
    // 64x64 grid, one row per cell, 16 files per layout
    val grid = (for (x <- 0 until 64; y <- 0 until 64) yield (x.toLong, y.toLong))
      .toDF("x", "y")
    val zPath = tmpDir() + "/z"
    val xPath = tmpDir() + "/x"
    ZOrder.writeZOrdered(grid, col("x"), col("y"), bits = 6,
      numFiles = 16, path = zPath)
    grid.repartitionByRange(16, col("x")).sortWithinPartitions("x")
      .write.mode("overwrite").parquet(xPath)

    def touched(path: String): Long = {
      val boxes = ZOrder.fileBoxes(spark.read.parquet(path), col("x"), col("y"))
      // y in [0, 15], any x: a quarter-stripe of the y domain
      ZOrder.filesTouched(boxes, 0L, 63L, 0L, 15L)
    }
    val zTouched = touched(zPath)
    val xTouched = touched(xPath)
    assert(xTouched == 16L, s"x-sorted layout cannot skip for a y filter: $xTouched")
    // a quarter of the y-range under a space-filling curve ≈ a quarter of
    // the files (curve locality); allow slack for boundary files
    assert(zTouched <= 8L, s"z-layout should skip most files, touched $zTouched")

    // and the layouts hold the same rows
    val a = spark.read.parquet(zPath).orderBy("x", "y").collect().toSeq
    val b = spark.read.parquet(xPath).orderBy("x", "y").collect().toSeq
    assert(a == b)
  }

  test("zValueSql expands to the same curve (string parity with zValue)") {
    // evaluate the generated SQL text through Spark itself: same grammar
    // subset DuckDB parses (shifts, and, or)
    val df = Seq((13L, 22L), (0L, 63L), (63L, 0L), (41L, 41L)).toDF("x", "y")
    val viaSql = df.selectExpr("x", "y", s"${ZOrder.zValueSql("x", "y", 6)} AS z")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    viaSql.foreach { case ((x, y), z) =>
      assert(z == refInterleave(x, y, 6))
    }
  }
}
