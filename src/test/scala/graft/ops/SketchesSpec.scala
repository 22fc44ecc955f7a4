package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Count-Min sketch invariants: the ≥-true overestimate guarantee (so
  * sketch-proposed candidate sets have perfect recall), the ε·N bound on
  * the over-count, mergeability by summing counters, and the end-to-end
  * heavy-hitter contract on a skewed stream. */
class SketchesSpec extends SparkTestBase {
  import spark.implicits._

  private val d = 5
  private val w = 256 // small width on purpose: forces real collisions

  /** Zipf-ish stream: key i appears ~1000/i times, i = 1..50. */
  private def zipf = (1 to 50).flatMap(i => Seq.fill(1000 / i)(s"k$i"))
  private def exactCounts = zipf.groupBy(identity).map { case (k, v) => (k, v.size.toLong) }

  test("estimates never under-count, and honor the eps*N bound here") {
    val df = zipf.toDF("k")
    val sketch = Sketches.cmsSketch(df, col("k"), d, w)
    val est = Sketches.cmsEstimates(sketch, df, col("k"), d, w)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val n = zipf.size
    val epsN = math.ceil(math.E * n / w).toLong
    exactCounts.foreach { case (k, exact) =>
      assert(est(k) >= exact, s"$k under-counted: ${est(k)} < $exact")
      assert(est(k) <= exact + epsN,
        s"$k over bound: ${est(k)} > $exact + $epsN")
    }
  }

  test("unseen keys estimate small (only collision mass)") {
    val df = zipf.toDF("k")
    val sketch = Sketches.cmsSketch(df, col("k"), d, w)
    val ghosts = (1 to 20).map(i => s"ghost$i").toDF("k")
    val est = Sketches.cmsEstimates(sketch, ghosts, col("k"), d, w)
      .collect().map(_.getLong(1))
    val epsN = math.ceil(math.E * zipf.size / w).toLong
    assert(est.forall(_ <= epsN))
  }

  test("sketches merge by summing counters per (r, bucket)") {
    val (half1, half2) = zipf.splitAt(zipf.size / 2)
    val s1 = Sketches.cmsSketch(half1.toDF("k"), col("k"), d, w)
    val s2 = Sketches.cmsSketch(half2.toDF("k"), col("k"), d, w)
    val merged = s1.unionByName(s2)
      .groupBy("r", "bucket").agg(sum("cnt").as("cnt"))
    val whole = Sketches.cmsSketch(zipf.toDF("k"), col("k"), d, w)
    val a = merged.collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val b = whole.collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(a == b)
  }

  test("persisted per-cell partials re-merge bit-identically to one-shot") {
    val dir = tmpDir()
    val cells = zipf.zipWithIndex.map { case (k, i) => (k, (i % 3).toLong) }
    Sketches.cmsSketchPartials(cells.toDF("k", "day"), col("day"), col("k"), d, w)
      .write.mode("overwrite").parquet(s"$dir/partials")
    val merged = Sketches.cmsMerge(spark.read.parquet(s"$dir/partials"))
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val whole = Sketches.cmsSketch(zipf.toDF("k"), col("k"), d, w)
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(merged == whole,
      "store round-trip + counter-sum must reproduce the one-shot sketch")
  }

  test("heavy hitters = exact set, with bounds green") {
    val got = Sketches.cmsHeavyHitters(zipf.toDF("k"), col("k"),
        threshold = 100L, depth = d, width = w)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getBoolean(2)))
    val want = exactCounts.filter(_._2 >= 100L).toSet
    assert(got.map(t => (t._1, t._2)).toSet == want)
    assert(got.forall(_._3), "a key violated the CMS bound")
    // the skew is real: k1..k10 are heavy, the tail is not
    assert(got.map(_._1).toSet == (1 to 10).map(i => s"k$i").toSet)
  }
}
