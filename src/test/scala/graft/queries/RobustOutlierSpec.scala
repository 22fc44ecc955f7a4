package graft.queries

import graft.SparkTestBase

/** Discriminating gate for a29_robust_outliers: hand-computed
  * median/MAD/flags per group, the EVEN-count lower-median semantics
  * pinned explicitly, and the MAD = 0 degenerate case (a majority-
  * constant group must flag ANY deviation, not divide by zero). */
class RobustOutlierSpec extends SparkTestBase {
  import spark.implicits._

  private def writeEvents(rows: Seq[(Long, String, Double)]): String =
    writeEventsParquet(rows.map { case (id, typ, v) =>
      (id, new java.sql.Timestamp(id * 1000L), 1L, typ, v, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props"))

  test("median, MAD and flags are the hand-computed values per group") {
    // group a (odd n=5): med=300, devs sorted [0,100,100,200,9700] →
    //   mad=100, only the 100.00 reading deviates > 3·mad
    // group b (EVEN n=4): lower median → med=200 (not 250), mad=100,
    //   no reading deviates > 300
    // group c (MAD=0): med=500, mad=0 → any nonzero deviation flags
    val dir = writeEvents(Seq(
      (0L, "a", 1.0), (1L, "a", 2.0), (2L, "a", 3.0), (3L, "a", 4.0),
      (4L, "a", 100.0),
      (10L, "b", 1.0), (11L, "b", 2.0), (12L, "b", 3.0), (13L, "b", 4.0),
      (20L, "c", 5.0), (21L, "c", 5.0), (22L, "c", 5.0), (23L, "c", 5.0),
      (24L, "c", 9.0)))
    val out = Registry.byName("a29_robust_outliers").run(spark, dir)
      .select("event_id", "event_type", "med_c", "mad_c", "is_outlier")
      .as[(Long, String, Long, Long, Long)].collect().sortBy(_._1)

    val a = out.filter(_._2 == "a")
    assert(a.forall(r => r._3 == 300L && r._4 == 100L))
    assert(a.filter(_._5 == 1L).map(_._1).toSeq == Seq(4L))

    val b = out.filter(_._2 == "b")
    assert(b.forall(r => r._3 == 200L && r._4 == 100L),
      s"even-count group must take the LOWER median, got ${b.toSeq}")
    assert(b.forall(_._5 == 0L))

    val c = out.filter(_._2 == "c")
    assert(c.forall(r => r._3 == 500L && r._4 == 0L))
    assert(c.filter(_._5 == 1L).map(_._1).toSeq == Seq(24L),
      "MAD=0 group must flag any deviating reading")
  }

  test("a clean symmetric group produces no flags; a contaminated one flags only the spikes") {
    val clean = (0L until 99L).map(i => (i, "t", 50.0 + (i % 11).toDouble))
    val spikes = Seq((200L, "t", 5000.0), (201L, "t", 4000.0))
    val dir = writeEvents(clean ++ spikes)
    val out = Registry.byName("a29_robust_outliers").run(spark, dir)
      .select("event_id", "is_outlier").as[(Long, Long)].collect()
    assert(out.filter(_._2 == 1L).map(_._1).sorted.toSeq == Seq(200L, 201L),
      "median/MAD must resist the contamination and flag exactly the spikes")
  }
}
