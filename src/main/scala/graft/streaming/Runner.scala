package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Production query runner — the §2.8 delivery-semantics story.
  *
  * The reference enables EXACTLY_ONCE only on the routed Kafka sink and
  * has checkpointing commented out everywhere
  * (RT/app/dwm/UserJumpDetailApp.java:36-44). Here every layer query runs
  * with a checkpointLocation: offsets + state snapshots give effective
  * exactly-once into idempotent/transactional sinks (file sinks are
  * idempotent by manifest; Kafka gets at-least-once + downstream
  * ReplacingMergeTree-style dedup, same recovery model the reference's
  * ClickHouse tables assume).
  */
object Runner {

  /** Start a layer query into a partitioned parquet sink. `partitionBy`
    * day columns keeps serving-side partition pruning effective. */
  def toParquet(df: DataFrame, path: String, checkpoint: String,
      partitionBy: Seq[String] = Nil,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    val w = df.writeStream
      .format("parquet")
      .option("path", path)
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .trigger(trigger)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).start()
  }

  /** Start a layer query into a Kafka topic (K1), or — with `topic = None`
    * and a per-row `topic` column — into dynamic per-record topics (K2).
    * Delegates to graft.io.KafkaEdges so the options/encode logic stays
    * broker-testable; needs the spark-sql-kafka connector at runtime. */
  def toKafka(df: DataFrame, bootstrap: String, topic: Option[String],
      checkpoint: String, keyCol: Option[String] = None,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    topic match {
      case Some(t) =>
        graft.io.KafkaEdges.writeTopic(df, bootstrap, t, checkpoint, keyCol, trigger)
      case None =>
        graft.io.KafkaEdges.writer(df, bootstrap, None, checkpoint, trigger).start()
    }

  /** Start a layer query through foreachBatch (for MERGE-style sinks:
    * dim upsert, JDBC, dynamic routing). The batchId makes re-delivered
    * batches detectable for idempotent writes. */
  def toBatchSink(df: DataFrame, checkpoint: String,
      trigger: Trigger = Trigger.AvailableNow())(
      sink: (DataFrame, Long) => Unit): StreamingQuery =
    df.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode("update")
      .trigger(trigger)
      .foreachBatch(sink)
      .start()
}
