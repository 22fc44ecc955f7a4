package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming ingest-side exact dedup: admit each content hash ONCE,
  * forever — the dedup a corpus pipeline runs at the door before any
  * pairwise machinery sees the stream.
  *
  * Semantics: within one micro-batch the admitted keeper is the MIN id of
  * the hash's arrivals (deterministic — an arbitrary-first would make
  * output depend on partition order); across batches first-batch-wins (a
  * later arrival never evicts an admitted doc — the true streaming
  * contract, where "first" is arrival time). Emits one row per NEWLY
  * admitted hash: (content_hash, keep_id, dup_count), dup_count counting
  * the admitting batch's arrivals; later duplicates are dropped silently.
  *
  * Scale: state is one boolean per distinct hash, partitioned by hash —
  * at fleet cardinality back it with RocksDB
  * ([[Runner.useRocksDBStateStore]]) so admission state lives on executor
  * disk. Verified by DedupStreamSpec (multi-batch first-wins, restart
  * exactly-once) and the st_dedup_exact_stream oracle gate.
  */
object IngestDedup {

  case class Arrival(h: String, id: Long)

  /** `df` must be a streaming frame; returns (content_hash, keep_id,
    * dup_count) rows for newly admitted hashes. `hashExpr` is hashed with
    * md5 when `hashRaw` is false (pass true if the column is already a
    * digest). */
  def firstWins(df: DataFrame, contentCol: String, idCol: String,
      hashRaw: Boolean = false): DataFrame = {
    import df.sparkSession.implicits._
    val h = if (hashRaw) col(contentCol) else md5(col(contentCol))
    val arrivals: Dataset[Arrival] =
      df.select(h.as("h"), col(idCol).cast("long").as("id")).as[Arrival]
    def admit(hash: String, rows: Iterator[Arrival],
        state: GroupState[Boolean]): Iterator[(String, Long, Long)] = {
      if (state.exists) Iterator.empty
      else {
        val ids = rows.map(_.id).toSeq
        state.update(true)
        Iterator((hash, ids.min, ids.size.toLong))
      }
    }
    arrivals.groupByKey(_.h)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(admit)
      .toDF("content_hash", "keep_id", "dup_count")
  }
}
