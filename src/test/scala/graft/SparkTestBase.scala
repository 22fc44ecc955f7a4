package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** One shared local session per suite (lazy), UTC, small shuffle. */
trait SparkTestBase extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  def tmpDir(): String =
    java.nio.file.Files.createTempDirectory("graft_test").toString

  /** Write `df` as the single-file `<dir>/events.parquet` layout the
    * registry queries (and the file-stream twins, which glob-filter on
    * exactly that leaf name) read; returns the table dir. */
  def writeEventsParquet(df: org.apache.spark.sql.DataFrame): String = {
    val dir = tmpDir()
    df.coalesce(1).write.parquet(s"$dir/_stage")
    val part = new java.io.File(s"$dir/_stage").listFiles()
      .find(_.getName.endsWith(".parquet")).get
    java.nio.file.Files.move(part.toPath,
      java.nio.file.Paths.get(dir, "events.parquet"))
    dir
  }
}
