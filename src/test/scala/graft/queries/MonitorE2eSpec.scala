package graft.queries

import graft.SparkTestBase

/** Discriminating gate for a30_monitor_e2e / st_monitor_e2e_stream: the
  * composition is verified against an INDEPENDENT plain-Scala
  * restatement of the contract (per-type lower median/MAD scrub →
  * integer EWMA spike flags → previous-KEPT alert rate limit), computed
  * here by direct sorting and a sequential fold — not by calling the
  * shipped step functions. The corpus mixes two event types at
  * different value scales (the scrub must be per-type), plants corrupt
  * readings far beyond 3·MAD (they must be scrubbed, not alerted, and
  * must not poison the EWMA baseline), and is volatile enough that
  * spikes outnumber alerts (the rate limit must actually suppress). */
class MonitorE2eSpec extends SparkTestBase {
  import spark.implicits._

  // deterministic LCG corpus: 2 types, 5 users, 400 events, day-ish
  // spacing; corrupt readings (value 100000.00) every 97th event
  private case class Ev(id: Long, typ: String, user: Long, us: Long, c: Long)
  private def corpus(): Seq[Ev] = {
    var x = 12345L
    def nxt(): Long = { x = (x * 6364136223846793005L + 1442695040888963407L); (x >>> 33) }
    (0 until 400).map { i =>
      val typ = if (i % 2 == 0) "hi" else "lo"
      val base = if (typ == "hi") nxt() % 30000L else nxt() % 3000L
      val c = if (i % 97 == 96) 10000000L else base
      // (i+2): a day past the epoch — see CusumSpec's late-filter note
      Ev(i.toLong, typ, 1L + i % 5, (i.toLong + 2L) * 43200L * 1000000L, c)
    }
  }

  private def writeCorpus(rows: Seq[Ev]): String =
    writeEventsParquet(rows.map(e => (e.id,
        new java.sql.Timestamp(e.us / 1000L), e.user, e.typ,
        e.c / 100.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props"))

  /** Independent restatement: sort-based lower median (rank (n+1)/2). */
  private def lowerMedian(vs: Seq[Long]): Long =
    vs.sorted.apply(((vs.size + 1) / 2) - 1)

  private def expectedAlerts(rows: Seq[Ev]): Seq[(Long, Long)] = {
    val med = rows.groupBy(_.typ).map { case (t, rs) =>
      t -> lowerMedian(rs.map(_.c)) }
    val mad = rows.groupBy(_.typ).map { case (t, rs) =>
      t -> lowerMedian(rs.map(e => math.abs(e.c - med(t)))) }
    val kept = rows.filter(e => math.abs(e.c - med(e.typ)) <= 3 * mad(e.typ))
    kept.groupBy(_.user).toSeq.flatMap { case (_, rs) =>
      var s = Long.MinValue
      var lastAlert = Long.MinValue
      rs.sortBy(e => (e.us, e.id)).flatMap { e =>
        val spike = s != Long.MinValue && math.abs(e.c - s) >= 5000L
        s = if (s == Long.MinValue) e.c else Math.floorDiv(e.c + s, 2L)
        if (spike && (lastAlert == Long.MinValue ||
            e.us - lastAlert >= 7L * 86400L * 1000000L)) {
          lastAlert = e.us
          Some((e.id, s))
        } else None
      }
    }.sortBy(_._1)
  }

  test("alerts match the independent scrub->smooth->flag->ratelimit restatement") {
    val rows = corpus()
    val dir = writeCorpus(rows)
    val expected = expectedAlerts(rows)
    assert(expected.nonEmpty, "corpus must produce alerts")
    // the rate limit must actually suppress (spikes > alerts) — recompute
    // the unlimited spike count to prove the corpus exercises it
    val med = rows.groupBy(_.typ).map { case (t, rs) => t -> lowerMedian(rs.map(_.c)) }
    val mad = rows.groupBy(_.typ).map { case (t, rs) =>
      t -> lowerMedian(rs.map(e => math.abs(e.c - med(t)))) }
    val kept = rows.filter(e => math.abs(e.c - med(e.typ)) <= 3 * mad(e.typ))
    val spikeCount = kept.groupBy(_.user).toSeq.map { case (_, rs) =>
      var s = Long.MinValue
      rs.sortBy(e => (e.us, e.id)).count { e =>
        val spike = s != Long.MinValue && math.abs(e.c - s) >= 5000L
        s = if (s == Long.MinValue) e.c else Math.floorDiv(e.c + s, 2L)
        spike
      }
    }.sum
    assert(spikeCount > expected.size,
      s"rate limit must suppress: $spikeCount spikes vs ${expected.size} alerts")
    val corrupt = rows.filter(_.c == 10000000L)
    assert(corrupt.nonEmpty &&
      corrupt.forall(e => math.abs(e.c - med(e.typ)) > 3 * mad(e.typ)),
      "corrupt readings must fall outside the scrub gate")
    val got = Registry.byName("a30_monitor_e2e").run(spark, dir)
      .select("event_id", "ewma_c").as[(Long, Long)].collect().sortBy(_._1)
    assert(got.toSeq == expected)
    assert(!got.exists(g => corrupt.exists(_.id == g._1)),
      "a corrupt reading must never surface as an alert")
  }

  test("streaming twin equals the batch query; suppression engages") {
    val rows = corpus()
    val dir = writeCorpus(rows)
    val batch = Registry.byName("a30_monitor_e2e").run(spark, dir)
      .collect().map(_.toSeq.map(String.valueOf)).sortBy(_.mkString("|"))
    val stream = Registry.byName("st_monitor_e2e_stream").run(spark, dir)
      .collect().map(_.toSeq.map(String.valueOf)).sortBy(_.mkString("|"))
    assert(batch.nonEmpty && batch.toSeq == stream.toSeq)
  }
}
