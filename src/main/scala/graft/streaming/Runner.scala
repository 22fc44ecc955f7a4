package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
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

  /** Opt-in large-state configuration: back every stateful operator of
    * this session (UV-dedup/bounce keyed state, window aggs, stream-stream
    * join buffers) with the RocksDB state store provider, so state lives
    * on executor local disk with a block-cache instead of on the JVM heap.
    * The default HDFSBackedStateStoreProvider keeps every key in heap
    * memory — fine at test scale, fatal at the reference's production
    * shape (24h-TTL per-device state, RT/app/dwm/UniqueVisitApp.java:51-54,
    * at fleet cardinality). Changelog checkpointing uploads per-batch
    * deltas instead of full RocksDB snapshots, keeping commit latency flat
    * as state grows. Session-scoped: call once before starting queries. */
  def useRocksDBStateStore(spark: SparkSession): Unit = {
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    spark.conf.set(
      "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled",
      "true")
  }

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
    * — into dynamic per-record topics (K2). The two branches take
    * different input shapes: with `Some(t)` any frame is accepted and
    * JSON-encoded; with `None` the frame must ALREADY be wire-shaped with
    * `topic` and `value` columns (use KafkaEdges.encodeDynamic, or call
    * KafkaEdges.writeDynamic directly to shape and start in one step).
    * The shape is validated here, at definition time, so a mis-call fails
    * with this message instead of a Kafka-sink AnalysisException at query
    * start. Delegates to graft.io.KafkaEdges so the options/encode logic
    * stays broker-testable; needs the spark-sql-kafka connector at
    * runtime. */
  def toKafka(df: DataFrame, bootstrap: String, topic: Option[String],
      checkpoint: String, keyCol: Option[String] = None,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    topic match {
      case Some(t) =>
        graft.io.KafkaEdges.writeTopic(df, bootstrap, t, checkpoint, keyCol, trigger)
      case None =>
        val cols = df.columns.toSet
        require(cols.contains("topic") && cols.contains("value"),
          "toKafka(topic = None) routes on per-row topics and needs a " +
            s"wire-shaped frame with `topic` and `value` columns (got " +
            s"${df.columns.mkString(", ")}) — shape it with " +
            "KafkaEdges.encodeDynamic(df, topicCol, payload) first")
        // the dynamic branch writes the frame as-is; a keyCol request
        // would be silently dropped — fail loudly instead (put a `key`
        // column in the wire frame to key dynamic-topic records)
        require(keyCol.isEmpty,
          "toKafka(topic = None) does not apply keyCol — add a `key` " +
            "column to the wire-shaped frame instead")
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
