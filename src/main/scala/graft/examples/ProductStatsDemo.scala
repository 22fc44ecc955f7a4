package graft.examples

import org.apache.spark.sql.SparkSession
import graft.streaming.dws.{ProductStatsShaping, WindowStats}
import graft.streaming.Runner
import graft.ads.Serving
import org.apache.spark.sql.functions._

/** ProductStats path end-to-end: 7-way one-hot shaping (P8/P9) → 10s
  * window agg (A2) → checkpointed parquet sink (Runner) → serving query
  * (A7) over the sink, with the ReplacingMergeTree-style dedup view. */
object ProductStatsDemo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    implicit val ctx = spark.sqlContext

    val out = java.nio.file.Files.createTempDirectory("ps_demo").toString

    // order_wide / payment_wide / comment streams (memory-backed)
    val orders = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Long, Double, Long)]
    val comments = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String, Long)]
    val unioned = ProductStatsShaping.unionAll(Seq(
      ProductStatsShaping.fromOrders(orders.toDF()
        .toDF("sku_id", "order_id", "split_total_amount", "ts")),
      ProductStatsShaping.fromComments(comments.toDF()
        .toDF("sku_id", "appraise", "ts"))))
    val stats = WindowStats.productStats(unioned)
      .withColumn("spu_id", col("sku_id"))     // dim enrichment elided here
      .withColumn("spu_name", concat(lit("spu"), col("sku_id")))
      .withColumn("ts", unix_millis(current_timestamp()))

    val q = Runner.toParquet(stats, s"$out/product_stats", s"$out/ckpt",
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0))
    orders.addData((7L, 101L, 50.5, 1000L), (7L, 102L, 10.0, 2000L),
      (8L, 103L, 99.0, 3000L))
    comments.addData((7L, "1201", 1500L), (7L, "1202", 2500L))
    q.processAllAvailable()
    orders.addData((9L, 104L, 1.0, 600000L)) // advance watermark → close windows
    q.processAllAvailable()
    q.stop()

    val ps = Serving.dedupView(
      spark.read.parquet(s"$out/product_stats"), Seq("stt", "sku_id"))
    println("=== product_stats (windows closed for sku 7/8) ===")
    ps.select("stt", "sku_id", "order_amount", "order_ct", "comment_ct",
      "good_comment_ct").orderBy("stt", "sku_id").show(false)
    println("=== serving: top spu by revenue on 1970-01-01 ===")
    Serving.bySpu(ps.withColumn("stt", to_timestamp(col("stt"))),
      "19700101", 3).show(false)
    spark.stop()
  }
}
