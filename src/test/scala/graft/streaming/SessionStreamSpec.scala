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

  test("append mode emits each closed session exactly once across batches") {
    // The production path claimed in StreamingOps.stSessionWindow's
    // scaladoc: append output + watermark ⇒ a session row is emitted ONCE,
    // in the first batch whose watermark has passed the session's end, and
    // never again (state evicted). Driven across 4 micro-batches; the
    // sink rows are compared as a LIST so a duplicate emission fails even
    // when it collapses in a Set.
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val agg = input.toDF().toDF("user_id", "t")
      .withColumn("ts", to_timestamp(col("t"), "yyyy-MM-dd HH:mm:ss"))
      .withWatermark("ts", "10 minutes")
      .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("ct"))
    val q = agg.writeStream.format("memory").queryName("sess_append_out")
      .outputMode("append").start()
    def emitted(): Seq[(Long, String, String, Long)] =
      spark.table("sess_append_out")
        .select(col("user_id"), date_format(col("w.start"), "HH:mm:ss"),
          date_format(col("w.end"), "HH:mm:ss"), col("ct"))
        .as[(Long, String, String, Long)].collect().toSeq.sorted
    try {
      // b1: one open session [10:00, 10:35); watermark still at epoch
      input.addData((1L, "2024-01-01 10:00:00"), (1L, "2024-01-01 10:05:00"))
      q.processAllAvailable()
      assert(emitted() == Seq.empty, "open session must not emit in append")
      // b2: a far-future event advances the watermark to 11:50
      // (12:00 − 10 min); processAllAvailable also runs the follow-up
      // no-data batch under the new watermark, so the first session
      // closes and emits exactly once inside this drain. The 12:00
      // session stays open.
      input.addData((1L, "2024-01-01 12:00:00"))
      q.processAllAvailable()
      assert(emitted() == Seq((1L, "10:00:00", "10:35:00", 2L)))
      // b3: watermark 12:50 closes [12:00, 12:30); the already-emitted
      // session must NOT re-emit (list compare catches a duplicate)
      input.addData((1L, "2024-01-01 13:00:00"))
      q.processAllAvailable()
      assert(emitted() == Seq(
        (1L, "10:00:00", "10:35:00", 2L),
        (1L, "12:00:00", "12:30:00", 1L)))
      // b4: one more batch with no closable state — nothing new, nothing
      // re-emitted
      input.addData((1L, "2024-01-01 14:00:00"))
      q.processAllAvailable()
      assert(emitted() == Seq(
        (1L, "10:00:00", "10:35:00", 2L),
        (1L, "12:00:00", "12:30:00", 1L),
        (1L, "13:00:00", "13:30:00", 1L)))
    } finally q.stop()
  }
}
