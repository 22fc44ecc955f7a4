package graft.examples

import org.apache.spark.sql.SparkSession
import graft.ops.Bucketing

/** Co-located join demo: both sides bucketed on the join key ⇒
  * SortMergeJoin with zero Exchange (no network shuffle). */
object BucketingDemo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("bucket_wh").toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val o = (1L to 5000L).map(i => (i, s"o$i")).toDF("o_id", "p")
    val d = (1L to 20000L).map(i => (i, i % 5000 + 1)).toDF("d_id", "d_order_id")
    Bucketing.writeBucketed(o, "demo_orders", "o_id", 8)
    Bucketing.writeBucketed(d, "demo_details", "d_order_id", 8)
    val j = Bucketing.bucketedJoin(spark, "demo_orders", "demo_details",
      "o_id", "d_order_id")
    println(s"[bucketing] rows=${j.count()}")
    val exchanges = j.queryExecution.executedPlan.toString
      .split("Exchange").length - 1
    println(s"[bucketing] exchanges=$exchanges (expect 0)")
    spark.stop()
  }
}
