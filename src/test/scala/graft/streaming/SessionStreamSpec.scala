package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The merging-session-state path of streaming `session_window`: a later
  * micro-batch's event that lands between two open sessions must MERGE
  * them into one (this is the behavior a batch re-run can't distinguish
  * from window arithmetic — only a cross-batch drive exercises the
  * merging state store).
  */
class SessionStreamSpec extends SparkTestBase {
  import spark.implicits._

  private def sessions(table: String): Set[(Long, String, String, Long)] =
    spark.table(table)
      .select(col("user_id"), date_format(col("w.start"), "HH:mm:ss"),
        date_format(col("w.end"), "HH:mm:ss"), col("ct"))
      .as[(Long, String, String, Long)].collect().toSet

  test("bridging event merges two open sessions across micro-batches") {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val agg = input.toDF().toDF("user_id", "t")
      .withColumn("ts", to_timestamp(col("t"), "yyyy-MM-dd HH:mm:ss"))
      .withWatermark("ts", "1 hour")
      .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("ct"))
    val q = agg.writeStream.format("memory").queryName("sess_out")
      .outputMode("complete").start()
    try {
      input.addData(
        (1L, "2024-01-01 10:00:00"),
        (1L, "2024-01-01 10:40:00")) // 40-min gap: two sessions
      q.processAllAvailable()
      assert(sessions("sess_out") == Set(
        (1L, "10:00:00", "10:30:00", 1L),
        (1L, "10:40:00", "11:10:00", 1L)))
      // batch 2: 10:20 is within 30 min of BOTH open sessions → one merged
      // session spanning first event to last event + gap
      input.addData((1L, "2024-01-01 10:20:00"))
      q.processAllAvailable()
      assert(sessions("sess_out") == Set(
        (1L, "10:00:00", "11:10:00", 3L)))
    } finally q.stop()
  }
}
