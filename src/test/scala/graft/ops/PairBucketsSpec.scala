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

  // ---- candidate-budget breaker (SCALING.md §6g's production control) ----

  /** The §6g failure shape: a Zipf-headed title corpus whose head-word
    * block crossed 24.7M candidates at the 10× rehearsal. The breaker
    * prices the blocks from their SIZES alone, so the spec reproduces the
    * candidate count (10,000 rows in one head block → 49,995,000 pairs,
    * twice the rehearsal's) without ever materializing a pair. */
  test("budget breaker fires on the §6g-scale head block, with the histogram") {
    val head = (1L to 10000L).map(i => (i, "the"))
    val tail = (10001L to 10050L).map(i => (i, s"w$i"))
    val df = (head ++ tail).toDF("id", "bk")
    val e = intercept[IllegalStateException] {
      PairBuckets.selfPairs(df, "id", col("bk"),
        maxCandidatePairs = 24700000L)
    }
    assert(e.getMessage.contains("candidate budget exceeded"))
    assert(e.getMessage.contains("49995000")) // Σ c·(c−1)/2, priced not built
    assert(e.getMessage.contains("the=10000")) // the histogram names the block
  }

  test("a composite key that divides the head block passes the same budget") {
    // same corpus, second key with 5 values: each sub-block 2000 rows →
    // Σ = 5 · 2000·1999/2 = 9,995,000 < 24.7M — the §6g-named control
    val head = (1L to 10000L).map(i => (i, s"the|k${i % 5}"))
    val df = head.toDF("id", "bk")
    val pairs = PairBuckets.selfPairs(df, "id", col("bk"),
      maxCandidatePairs = 24700000L)
    assert(pairs.limit(1).count() == 1L) // plan is live, breaker silent
  }

  test("the default budget path adds no breaker action and never fires") {
    val rows = (1L to 100L).map(i => (i, "b")).toDF("id", "bk")
    assert(PairBuckets.selfPairs(rows, "id", col("bk")).count() ==
      100L * 99 / 2)
  }
}
