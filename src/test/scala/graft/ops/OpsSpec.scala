package graft.ops

import graft.SparkTestBase
import graft.streaming.dws.{ProductStatsShaping, WindowStats}
import graft.streaming.Runner
import org.apache.spark.sql.functions._

/** Salted join equivalence, ProductStats 7-way shaping, checkpointed
  * runner round-trip. */
class OpsSpec extends SparkTestBase {
  import spark.implicits._

  test("salted join ≡ plain join on skewed data (inner and left)") {
    // one hot key (90% of rows) + a long tail
    val large = ((1 to 900).map(_ => 1L) ++ (1 to 100).map(_.toLong + 1))
      .zipWithIndex.toDF("k", "payload")
    val dim = Seq((1L, "hot"), (2L, "warm"), (999L, "unmatched"))
      .toDF("dk", "name")
    for (jt <- Seq("inner", "left")) {
      val salted = SkewJoin.saltedJoin(large, dim, "k", "dk", buckets = 8, jt)
        .select("k", "payload", "name")
      val plain = large.join(dim, col("k") === col("dk"), jt)
        .select("k", "payload", "name")
      assert(salted.count() == plain.count(), jt)
      assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty, jt)
    }
  }

  test("salted join resolves identically-named key columns on both sides") {
    // the regression: col(key) === col(key) is ambiguous when both sides
    // share the column name — keys must be side-qualified inside saltedJoin
    val large = ((1 to 50).map(_ => 1L) ++ Seq(2L, 3L)).toDF("k")
    val dim = Seq((1L, "hot"), (2L, "warm")).toDF("k", "name")
    val salted = SkewJoin.saltedJoin(large, dim, "k", "k", buckets = 4)
    assert(salted.count() == 51)
    assert(salted.filter(col("name") === "hot").count() == 50)
  }

  test("binned range join ≡ naive range join; bounds inclusive; pairs meet once") {
    val points = Seq((1L, 0L), (2L, 999L), (3L, 1000L), (4L, 1500L),
      (5L, 2500L), (6L, 10000L)).toDF("pid", "v")
    val intervals = Seq(
      (10L, 0L, 1000L),     // aligned to bin edges, inclusive both ends
      (11L, 900L, 2600L),   // spans 18 bins — multi-bin pair must meet once
      (12L, 5L, 4L),        // hi < lo: matches nothing
      (13L, 9999L, 10001L)).toDF("iid", "lo", "hi")
    val got = RangeJoin.pointInInterval(points, "v", intervals, "lo", "hi",
        binWidth = 100L)
      .select("iid", "pid").as[(Long, Long)].collect().toSeq.sorted
    val naive = intervals.crossJoin(points)
      .filter(col("v") >= col("lo") && col("v") <= col("hi"))
      .select("iid", "pid").as[(Long, Long)].collect().toSeq.sorted
    assert(got == naive)
    assert(got.size == got.distinct.size, "a pair met in more than one bin")
    assert(got.contains((10L, 1L)) && got.contains((10L, 3L)))
    assert(!got.exists(_._1 == 12L))
    assert(got.contains((13L, 6L)))
  }

  test("ProductStats shaping: 7-way one-hot union aggregates correctly (P8/P9/A2)") {
    def page(item: String, pageId: String, ts: Long, displays: String = "[]") =
      s"""{"common":{"mid":"m"},"page":{"page_id":"$pageId","item":"$item","item_type":"sku_id"},"displays":$displays,"ts":$ts}"""
    val pageLog = graft.streaming.dwd.BaseLog.clean(graft.streaming.dwd.BaseLog.parse(Seq(
      page("7", "good_detail", 1000),
      page("7", "home", 2000, // not a click; carries displays for sku 7+8
        """[{"item":"7","item_type":"sku_id","pos_id":1,"order":1},
           {"item":"8","item_type":"sku_id","pos_id":2,"order":2}]"""
          .replaceAll("\n\\s*", "")),
      page("9", "good_detail", 3000)).toDF("value")))
    val favor = Seq((7L, 1500L)).toDF("sku_id", "ts")
    val cart = Seq((8L, 1600L)).toDF("sku_id", "ts")
    val orders = Seq((7L, 101L, java.math.BigDecimal.valueOf(50.5), 1700L),
      (7L, 102L, java.math.BigDecimal.valueOf(10.0), 1800L))
      .toDF("sku_id", "order_id", "split_total_amount", "ts")
    val payments = Seq((7L, 101L, java.math.BigDecimal.valueOf(50.5), 1900L))
      .toDF("sku_id", "order_id", "split_total_amount", "ts")
    val refunds = Seq((7L, 101L, java.math.BigDecimal.valueOf(50.5), 2100L))
      .toDF("sku_id", "order_id", "refund_amount", "ts")
    val comments = Seq((7L, "1201", 2200L), (7L, "1202", 2300L))
      .toDF("sku_id", "appraise", "ts")

    val unioned = ProductStatsShaping.unionAll(Seq(
      ProductStatsShaping.fromPageClicks(pageLog),
      ProductStatsShaping.fromDisplays(pageLog),
      ProductStatsShaping.fromFavor(favor),
      ProductStatsShaping.fromCart(cart),
      ProductStatsShaping.fromOrders(orders),
      ProductStatsShaping.fromPayments(payments),
      ProductStatsShaping.fromRefunds(refunds),
      ProductStatsShaping.fromComments(comments)))
    val stats = WindowStats.productStats(unioned) // batch mode: windows close
    val sku7 = stats.filter($"sku_id" === 7).select(
      "click_ct", "display_ct", "favor_ct", "order_amount", "order_ct",
      "paid_order_ct", "refund_order_ct", "comment_ct", "good_comment_ct")
      .as[(Long, Long, Long, java.math.BigDecimal, Int, Int, Int, Long, Long)]
      .head()
    assert(sku7._1 == 1 && sku7._2 == 1 && sku7._3 == 1) // click/display/favor
    assert(sku7._4.doubleValue() == 60.5)                // 50.5 + 10.0
    assert(sku7._5 == 2)                                 // distinct orders 101,102
    assert(sku7._6 == 1 && sku7._7 == 1)                 // paid + refund distinct
    assert(sku7._8 == 2 && sku7._9 == 1)                 // comments, good=1201 only
    assert(stats.filter($"sku_id" === 8)
      .select("display_ct", "cart_ct").as[(Long, Long)].head() == ((1L, 1L)))
  }

  test("Runner: checkpointed AvailableNow query writes partitioned parquet once") {
    val dir = tmpDir()
    implicit val ctx = spark.sqlContext
    val in = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    in.addData((1L, "a"), (2L, "b"))
    val q = Runner.toParquet(in.toDF().toDF("id", "dt"),
      s"$dir/out", s"$dir/ckpt", partitionBy = Seq("dt"))
    q.awaitTermination(30000)
    val got = spark.read.parquet(s"$dir/out")
    assert(got.count() == 2)
    assert(new java.io.File(s"$dir/out/dt=a").exists()) // partition pruning layout
    assert(new java.io.File(s"$dir/ckpt/offsets").exists()) // recovery state
  }
}
