package graft.streaming.dwm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** DWM bounce detection — UserJumpDetailApp
  * (RT/app/dwm/UserJumpDetailApp.java:77-134): per-mid CEP pattern
  *
  *   start(entry page: last_page_id empty) NEXT next(entry page) WITHIN 10s
  *
  * A match emits the FIRST event (user saw one page then re-entered ⇒
  * bounce). A timeout (no second event within 10s) ALSO emits the pending
  * entry via the timeout side output; both branches are unioned. A
  * non-entry follow-up within 10s kills the match (strict `next`
  * contiguity).
  *
  * Spark has no CEP library; flatMapGroupsWithState with an event-time
  * timeout expresses both branches in one operator:
  *   state = pending entry event; on next event within 10s → emit iff it
  *   is also an entry; on watermark passing pending.ts+10s → emit.
  * Expected behavior walkthrough used as the spec:
  * RT/app/dwm/UserJumpDetailAppBak.java:27-43 and the 4-row fixture at
  * UserJumpDetailApp.java:52-60 (mid 101 times out ⇒ bounce; mid 102's two
  * entries match ⇒ bounce; follow-up pages break contiguity).
  */
object Bounce {

  val WindowMs: Long = 10000L

  case class PageEvent(
      mid: String, ts: Long, lastPageId: String, json: String,
      ts_ts: java.sql.Timestamp) // watermark column must reach the operator
  case class Pending(ts: Long, json: String)

  /** Input: parsed page-log frame with an event-time `ts_ts` watermark
    * already applied by the caller (see detect()). Output: bounce records
    * as JSON strings. */
  def detect(pageLog: DataFrame, watermarkDelay: String = "2 seconds"): DataFrame = {
    import pageLog.sparkSession.implicits._
    val keyed = pageLog
      .withColumn("_json", to_json(struct(pageLog.columns.map(col): _*)))
      .withColumn("ts_ts", timestamp_millis(col("ts")))
      .withWatermark("ts_ts", watermarkDelay)
      .select(col("common.mid").as("mid"), col("ts"),
        coalesce(col("page.last_page_id"), lit("")).as("lastPageId"),
        col("_json").as("json"), col("ts_ts"))
      .as[PageEvent]

    def step(mid: String, rows: Iterator[PageEvent],
             state: GroupState[Pending]): Iterator[String] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      if (state.hasTimedOut) {
        // watermark passed pending.ts + 10s with no follow-up: timeout
        // branch of the CEP pattern (PatternTimeoutFunction analog)
        state.getOption.foreach(p => out += p.json)
        state.remove()
      } else {
        val sorted = rows.toSeq.sortBy(_.ts)
        sorted.foreach { e =>
          val entry = e.lastPageId.isEmpty
          state.getOption match {
            case Some(p) if e.ts - p.ts <= WindowMs =>
              if (entry) { out += p.json; state.update(Pending(e.ts, e.json)) }
              else state.remove() // strict-next broken by a follow-up page
            case Some(p) => // gap beyond window: pending already bounced
              out += p.json
              if (entry) state.update(Pending(e.ts, e.json)) else state.remove()
            case None =>
              if (entry) state.update(Pending(e.ts, e.json))
          }
        }
        // arm the event-time timeout for whatever is pending
        state.getOption.foreach { p =>
          state.setTimeoutTimestamp(p.ts + WindowMs)
        }
      }
      out.iterator
    }

    keyed.groupByKey(_.mid)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(step)
      .toDF("value")
  }
}
