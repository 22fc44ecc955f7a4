package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Binned point-in-interval range join — the scalable plan for a pure
  * range predicate with NO equi key.
  *
  * Catalyst plans `points JOIN intervals ON v BETWEEN lo AND hi` as a
  * BroadcastNestedLoopJoin (or a cartesian): every partition compares
  * every point against every interval — O(n·m) work that no cluster size
  * rescues at corpus scale. The standard rewrite bins the value domain on
  * a fixed width: a point lands in exactly one bin, an interval explodes
  * to every bin it covers, the bin becomes the equi key of an ordinary
  * shuffled join, and the residual BETWEEN filters inside the bucket.
  * Each qualifying (point, interval) pair meets in exactly ONE bin — the
  * point's — so the output needs no dedup.
  *
  * `binWidth` is the fan-out ↔ bucket-size knob: work is
  * Σ_bin |points(bin)| · |intervals covering bin|, and interval
  * replication is (hi−lo)/binWidth + 1 rows. Pick binWidth ≈ the typical
  * interval length so replication stays O(1) while buckets stay narrow.
  *
  * Contract: `pointCol`, `loCol`, `hiCol` are non-negative LONGs on one
  * shared axis (epoch micros, fixed-point money, …) — binning uses exact
  * integer division, never doubles (an epoch-micros value is not exactly
  * representable past 2^53 in a double). Column names must not collide
  * between the two frames.
  */
object RangeJoin {

  /** All (interval ⋈ point) rows with point ∈ [lo, hi]; output carries
    * every column of both frames. Intervals with hi < lo match nothing
    * (sequence() would count down — guarded explicitly). */
  def pointInInterval(points: DataFrame, pointCol: String,
      intervals: DataFrame, loCol: String, hiCol: String,
      binWidth: Long): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    // integer `div`, never double division: exact at any magnitude
    val p = points.withColumn("_bin", expr(s"`$pointCol` div $binWidth"))
    val i = intervals
      .filter(col(hiCol) >= col(loCol))
      .withColumn("_bin", explode(sequence(
        expr(s"`$loCol` div $binWidth"), expr(s"`$hiCol` div $binWidth"))))
    i.join(p, Seq("_bin"))
      .filter(col(pointCol).between(col(loCol), col(hiCol)))
      .drop("_bin")
  }
}
