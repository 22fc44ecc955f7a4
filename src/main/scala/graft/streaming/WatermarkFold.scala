package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.streaming._

/** Watermark-ordered keyed fold — the PRODUCTION reorder buffer for the
  * monitoring state machines (debounce / rate limit / EWMA / CUSUM /
  * monitor-e2e).
  *
  * The problem (VERDICT r13/r14): flatMapGroupsWithState guarantees
  * grouping but NOT secondary order, so a sorted fold must buffer a key's
  * batch rows to restore (event-time, id) order — and an in-task heap
  * buffer cannot spill. The r14 answer was a LOUD 2M-row budget breaker;
  * this module is the production fix: out-of-order rows are buffered in
  * the STATE STORE (RocksDB-backed — spills off-heap, survives restart)
  * keyed by their exact event-time, and the fold advances on EVENT-TIME
  * TIMERS once the watermark guarantees no earlier row can still arrive —
  * the same timer machinery [[dwm.Bounce]] uses, applied to ordering
  * instead of timeouts. Flink expresses this exact shape as a RocksDB
  * MapState keyed by timestamp + an event-time timer; Spark's
  * transformWithState (StatefulProcessor + MapState + timers, RocksDB
  * provider required) is the equivalent.
  *
  * Heap profile per key per batch: O(rows at one event-time) while
  * buffering (each input row is one MapState append), plus O(distinct
  * pending event-times) longs at fold time (the key array being sorted —
  * 8 bytes per distinct timestamp, NOT a boxed row buffer). The 8M-row
  * hot-key batch that trips the r14 breaker streams through this operator
  * in a 512 MiB JVM (SkewFoldProbe --stream).
  *
  * Emission contract: a row is folded+emitted once the watermark REACHES
  * its event-time millisecond. This is safe because Spark's late filter
  * is INCLUSIVE — measured empirically (WmFold boundary probes, r15): a
  * row arriving with eventTime == the current watermark is dropped, at
  * watermark 0 (stream start — so epoch-0 event times never enter ANY
  * watermarked stateful operator) and at steady state alike. A folded
  * timestamp can therefore never receive another row. With a 0-second
  * watermark delay the final no-data batch folds the whole tail; a
  * far-future sentinel row (the stCepNegation / Warehouse.genSentinel
  * discipline) is still the right production-shaped flush for nonzero
  * delays and for replay harnesses. Rows the fold emits
  * per firing are produced LAZILY (pass 2 re-reads the buffered rows and
  * re-derives the deterministic fold from the pre-firing accumulator), so
  * a firing that releases millions of rows never materializes them; all
  * state writes (accumulator, fold cut) happen EAGERLY in pass 1, and the
  * folded timestamps are physically purged at the NEXT invocation.
  */
object WatermarkFold {

  /** Wire event, generic over the monitoring folds: `sub` is the
    * secondary key leg ("" when the key is just the user), `c` the
    * measure, `ts` the watermark column (timestamp_micros(us)). */
  case class FoldEv(event_id: Long, user_id: Long, sub: String, us: Long,
      c: Long, ts: java.sql.Timestamp)

  /** Emitted row: up to three machine values (EWMA's smoothed reading;
    * CUSUM's gp/gn/alarm; debounce leaves them 0). */
  case class FoldOut(event_id: Long, user_id: Long, sub: String, us: Long,
      v1: Long, v2: Long, v3: Long)

  /** Pure per-event step: (state or None, event) → (state', emit?).
    * MUST be deterministic — the lazy emission pass re-derives it. */
  type Step = (Option[Array[Long]], FoldEv) => (Array[Long], Option[(Long, Long, Long)])

  /** Milliseconds of an epoch-micros value — the granularity Spark
    * tracks watermarks and drops late rows at. */
  private def msOf(us: Long): Long = Math.floorDiv(us, 1000L)

  final class Processor(step: Step)
      extends StatefulProcessor[(Long, String), FoldEv, FoldOut] {

    // buffered rows are stored SLIM: the grouping key (user_id, sub) is
    // implicit and the event-time is the map key, so each element is just
    // (event_id, c) — half the RocksDB value bytes and encoder work of
    // storing the full event (the 8M-row probe is write-amplification
    // bound, so the constant matters)
    @transient private var pend: MapState[Long, Array[(Long, Long)]] = _
    @transient private var vacc: ValueState[Array[Long]] = _
    @transient private var vcut: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      pend = getHandle.getMapState[Long, Array[(Long, Long)]]("pend",
        Encoders.scalaLong, ExpressionEncoder[Array[(Long, Long)]](),
        TTLConfig.NONE)
      vacc = getHandle.getValueState[Array[Long]]("acc",
        ExpressionEncoder[Array[Long]](), TTLConfig.NONE)
      vcut = getHandle.getValueState[Long]("cut",
        Encoders.scalaLong, TTLConfig.NONE)
    }

    /** Physically remove timestamps folded by the PREVIOUS firing (their
      * rows were already emitted from the lazy pass — kept until now so
      * that pass could re-read them). Inclusive bound, matching the fold
      * (and Spark's inclusive late filter: no ms ≤ cut row can arrive). */
    private def purgeFolded(): Unit = {
      if (vcut.exists()) {
        val cut = vcut.get()
        val dead = scala.collection.mutable.ArrayBuffer.empty[Long]
        val it = pend.keys()
        while (it.hasNext) { val k = it.next(); if (msOf(k) <= cut) dead += k }
        dead.foreach(pend.removeKey)
        vcut.clear()
      }
    }

    /** One timer per key at watermark+1: fires on the next watermark
      * advance. Re-registering an already-armed expiry is a no-op in the
      * timer store, so arming is unconditional and idempotent. */
    private def arm(timerValues: TimerValues): Unit =
      getHandle.registerTimer(timerValues.getCurrentWatermarkInMs() + 1L)

    override def handleInputRows(key: (Long, String),
        rows: Iterator[FoldEv],
        timerValues: TimerValues): Iterator[FoldOut] = {
      purgeFolded()
      rows.foreach { e =>
        // getValue returns null on a missing key — one store op per row
        // instead of containsKey + getValue
        val prior = pend.getValue(e.us)
        val next =
          if (prior == null) Array((e.event_id, e.c))
          else prior :+ ((e.event_id, e.c))
        pend.updateValue(e.us, next)
      }
      arm(timerValues)
      Iterator.empty
    }

    override def handleExpiredTimer(key: (Long, String),
        timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[FoldOut] = {
      purgeFolded()
      val wm = timerValues.getCurrentWatermarkInMs()
      // foldable timestamps: at or before the watermark millisecond —
      // Spark's late filter is inclusive, so none can receive more rows
      val ready = scala.collection.mutable.ArrayBuffer.empty[Long]
      var pendingLater = false
      val it = pend.keys()
      while (it.hasNext) {
        val k = it.next()
        if (msOf(k) <= wm) ready += k else pendingLater = true
      }
      if (pendingLater) arm(timerValues)
      if (ready.isEmpty) return Iterator.empty
      val ks = ready.toArray
      java.util.Arrays.sort(ks)
      val acc0 = if (vacc.exists()) Some(vacc.get()) else None
      def foldRow(st: Option[Array[Long]], us: Long, ev: (Long, Long)) =
        step(st, FoldEv(ev._1, key._1, key._2, us, ev._2, null))
      // pass 1 (eager, O(1) heap beyond one timestamp's rows): advance the
      // accumulator over every ready row in (us, event_id) order and
      // commit the post-fold state + the fold cut BEFORE any emission
      var st = acc0
      ks.foreach { k =>
        pend.getValue(k).sortBy(_._1).foreach { e =>
          st = Some(foldRow(st, k, e)._1)
        }
      }
      st.foreach(vacc.update)
      vcut.update(wm)
      // pass 2 (lazy): re-derive the identical fold from the pre-firing
      // accumulator, yielding output rows as downstream consumes them —
      // the buffered rows stay in the store until the next purge
      var st2 = acc0
      ks.iterator.flatMap { k =>
        pend.getValue(k).sortBy(_._1).iterator.flatMap { e =>
          val (s2, emit) = foldRow(st2, k, e)
          st2 = Some(s2)
          emit.map { case (v1, v2, v3) =>
            FoldOut(e._1, key._1, key._2, k, v1, v2, v3)
          }
        }
      }
    }
  }

  /** Run `step` as a watermark-ordered fold over a stream of [[FoldEv]]
    * (watermark already applied on `ts`), keyed by (user_id, sub).
    * Requires the RocksDB state store provider
    * ([[Runner.useRocksDBStateStore]]) — transformWithState's contract. */
  def apply(typed: Dataset[FoldEv], step: Step): DataFrame = {
    val s = typed.sparkSession
    import s.implicits._
    typed
      .groupByKey(e => (e.user_id, e.sub))
      .transformWithState(new Processor(step),
        TimeMode.EventTime(), OutputMode.Append(),
        Encoders.product[FoldOut])
      .toDF()
  }
}
