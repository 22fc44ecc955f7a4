package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** PairBuckets: the hot-bucket triangle split must be invisible in the
  * result — exactly the plain self-join's pair set, for any skew. */
class PairBucketsSpec extends SparkTestBase {
  import spark.implicits._

  private def plainPairSet(rows: Seq[(Long, String)]): Set[(Long, Long)] =
    (for {
      (a, ba) <- rows; (b, bb) <- rows
      if ba == bb && a < b
    } yield (a, b)).toSet

  private def guardedPairSet(rows: Seq[(Long, String)], cap: Int): Set[(Long, Long)] =
    PairBuckets.selfPairs(rows.toDF("id", "bk"), "id", col("bk"),
        maxBucketRows = cap)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet

  test("hot bucket above the cap is salted yet produces the exact pair set") {
    // one pathological bucket (40 rows ≫ cap 8) + tail buckets + singleton
    val rows = (1L to 40L).map(i => (i, "HOT")) ++
      (41L to 50L).map(i => (i, s"b${i % 3}")) ++ Seq((99L, "lone"))
    val expected = plainPairSet(rows)
    assert(expected.size == 40 * 39 / 2 + plainPairSet(rows.drop(40)).size)
    assert(guardedPairSet(rows, cap = 8) == expected)
  }

  test("cold-only input takes the plain path and matches") {
    val rows = (1L to 30L).map(i => (i, s"b${i % 10}"))
    assert(guardedPairSet(rows, cap = 8) == plainPairSet(rows))
  }

  test("randomized skew: guarded == plain for seeded corpora (property)") {
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 5) {
      // zipf-ish: bucket 0 grabs ~half the rows
      val n = 20 + rnd.nextInt(60)
      val rows = (1L to n.toLong).map { i =>
        val b = if (rnd.nextBoolean()) 0 else rnd.nextInt(8)
        (i, s"b$b")
      }
      assert(guardedPairSet(rows, cap = 5) == plainPairSet(rows), s"trial $trial")
    }
  }

  test("pairs within one hot bucket spread across salt sub-keys, not one task") {
    val rows = (1L to 64L).map(i => (i, "HOT")).toDF("id", "bk")
    // with cap 8 → salts = ceil(64/8) = 8 distinct _g values on the left
    val salts = rows.withColumn("_g", pmod(hash(col("id")), lit(8)))
      .select("_g").distinct().count()
    assert(salts > 1) // the scatter genuinely splits the bucket
    assert(PairBuckets.selfPairs(rows, "id", col("bk"), maxBucketRows = 8)
      .count() == 64L * 63 / 2)
  }
}
