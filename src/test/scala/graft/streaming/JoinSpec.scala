package graft.streaming

import graft.SparkTestBase
import graft.streaming.dwm.{OrderWide, PaymentWide}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Stream-stream interval joins, replaying the reference's manual join
  * harness scenario (RTtest/app/FlinkDataStreamJoinTest.java:15-32: equal
  * keys join when |ts_l − ts_r| ≤ 5s; a record arriving past the watermark
  * produces no output) plus PaymentWide's asymmetric bounds. */
case class O(o_id: Long, o_create_ts: Long)
case class D(d_id: Long, d_order_id: Long, d_create_ts: Long)
case class P(p_id: Long, p_order_id: Long, p_create_ts: Long)
case class OW(ow_order_id: Long, ow_create_ts: Long)

class JoinSpec extends SparkTestBase {
  import spark.implicits._

  test("order⋈detail interval join: ±5s bounds + late-record drop (J1)") {
    implicit val ctx = spark.sqlContext
    val oIn = MemoryStream[O]
    val dIn = MemoryStream[D]
    val joined = OrderWide.intervalJoin(oIn.toDF(), dIn.toDF())
      .select($"o_id", $"d_id")
    val q = joined.writeStream.format("memory").queryName("ij_out")
      .outputMode("append").start()
    def got(): Set[(Long, Long)] =
      spark.table("ij_out").as[(Long, Long)].collect().toSet
    try {
      oIn.addData(O(1, 10000))
      dIn.addData(
        D(100, 1, 12000), // within +5s → joins
        D(101, 1, 16000), // 6s after → outside bound
        D(102, 2, 12000)) // no matching order key
      q.processAllAvailable()
      assert(got() == Set((1L, 100L)))
      // drive both watermarks far ahead, then send a too-late detail
      oIn.addData(O(9, 500000)); dIn.addData(D(900, 9, 500000))
      q.processAllAvailable()
      dIn.addData(D(103, 1, 9000)) // way below watermark → dropped
      q.processAllAvailable()
      assert(!got().contains((1L, 103L)))
    } finally q.stop()
  }

  test("payment⋈order_wide asymmetric bounds −15min/+5s (J2)") {
    implicit val ctx = spark.sqlContext
    val pIn = MemoryStream[P]
    val owIn = MemoryStream[OW]
    val joined = PaymentWide.intervalJoin(pIn.toDF(), owIn.toDF())
      .select($"p_id", $"ow_order_id")
    val q = joined.writeStream.format("memory").queryName("pw_out")
      .outputMode("append").start()
    try {
      val t = 3600000L // payment at t
      pIn.addData(P(1, 42, t))
      owIn.addData(
        OW(42, t - 14 * 60000), // 14 min before payment → joins
        OW(42, t + 4000))       // 4s after → joins
      pIn.addData(P(2, 43, t))
      owIn.addData(
        OW(43, t - 16 * 60000), // 16 min before → outside
        OW(43, t + 6000))       // 6s after → outside
      q.processAllAvailable()
      val got = spark.table("pw_out").as[(Long, Long)].collect().toSeq
      assert(got.count(_ == (1L, 42L)) == 2 && !got.exists(_._1 == 2L))
    } finally q.stop()
  }

  test("interval join ≡ brute-force model on random cases (SURVEY §5 property)") {
    // seeded random datasets; expected pairs computed by a plain Scala
    // double loop over the bound predicate |d_ts − o_ts| ≤ 5s
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 5) {
      val os = (1 to 30).map(i => O(i.toLong, rnd.nextInt(60) * 1000L))
      val ds = (1 to 60).map(i =>
        D(100L + i, rnd.nextInt(30) + 1L, rnd.nextInt(60) * 1000L))
      val expected = (for {
        o <- os; d <- ds
        if d.d_order_id == o.o_id && math.abs(d.d_create_ts - o.o_create_ts) <= 5000
      } yield (o.o_id, d.d_id)).toSet
      val got = graft.streaming.dwm.OrderWide
        .intervalJoin(os.toDF(), ds.toDF())
        .select($"o_id", $"d_id").as[(Long, Long)].collect().toSet
      assert(got == expected, s"trial $trial")
    }
  }

  test("dim enrichment: broadcast left join + user_age derivation (J3/F8)") {
    val fact = Seq((1L, 10L, "2021-12-01"), (2L, 99L, "2021-12-01"))
      .toDF("order_id", "user_id", "o_create_date")
    val dimUser = Seq((10L, "F", "1990-12-02")).toDF("id", "gender", "birthday")
    val enriched = OrderWide.withUserAge(
      OrderWide.enrich(fact, Seq(("u_", dimUser, "user_id", "id"))),
      "u_birthday", "o_create_date")
    val rows = enriched.select("order_id", "u_gender", "user_age")
      .as[(Long, Option[String], Option[Int])].collect().toSet
    // age = floor(11322 days / 365) = 31 — the reference's formula
    // (OrderWideApp.java:103-108) divides by flat 365, ignoring leap days,
    // so someone a day shy of their 31st birthday still counts as 31
    assert(rows == Set((1L, Some("F"), Some(31)), (2L, None, None)))
  }
}
