package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus profiling: exact discrete percentiles of per-document metrics
  * (lengths, token counts) — the numbers that size sequence-length
  * budgets, truncation points, and packing efficiency for a training run.
  *
  * Exactness without a global sort, in two phases: ONE scan aggregates all
  * metrics to (metric, value, count) — at most Σ|distinct values| rows —
  * then the cumulative counts come from a distributed prefix sum: the
  * count frame is range-partitioned on (metric, value), every partition
  * computes its local running sums in parallel, and the per-partition
  * totals (≤ shuffle-partitions × metrics rows) are merged into global
  * offsets with one tiny ordered window. No operator ever funnels the
  * whole frame through a single task, so an unbounded value domain (byte
  * offsets, not just lengths) degrades gracefully instead of silently
  * serializing. Discrete (selection, not interpolation): the result is a
  * real corpus value and bit-identical in every engine; interpolated
  * quantiles differ across engines' formulas. */
object Profiling {

  /** (metric, q, value) rows: disc percentile per requested q for each
    * named numeric column. ONE corpus scan for all metrics (exploded into
    * a (metric, value) union), then every quantile is answered from the
    * same cumulative frame (explode the q list, filter, min) — not one
    * re-aggregation per (metric, q). */
  def discPercentiles(docs: DataFrame, metrics: Seq[String],
      qs: Seq[Double] = Seq(0.5, 0.9, 0.99)): DataFrame = {
    require(metrics.nonEmpty)
    val mv = docs
      .select(explode(array(metrics.map(m =>
        struct(lit(m).as("metric"), col(m).cast("long").as("v"))): _*)).as("mv"))
      .select(col("mv.metric").as("metric"), col("mv.v").as("v"))
    val counts = mv.groupBy("metric", "v").agg(count(lit(1)).as("cnt"))
    // Phase 1: range-partition so partition p holds keys strictly below
    // partition p+1's, tag rows with their physical partition, and
    // materialize ONCE — the pid column must be identical for every
    // consumer below, and two separate executions of a range exchange may
    // sample different boundaries (RangePartitioner seeds by RDD id).
    val parted = counts
      .repartitionByRange(col("metric"), col("v"))
      .withColumn("pid", spark_partition_id())
      .localCheckpoint()
    // partition-local running sums — parallel, bounded by partition size
    val wPart = Window.partitionBy("pid", "metric").orderBy("v")
      .rowsBetween(Window.unboundedPreceding, 0)
    val inPart = parted.withColumn("part_cum", sum("cnt").over(wPart))
    // Phase 2: offsets = totals of all EARLIER partitions of the same
    // metric. The partials frame has ≤ (shuffle partitions × |metrics|)
    // rows — a bounded-by-config frame, so its ordered window is trivially
    // cheap and always partitioned (no global-window WARN).
    val partials = parted.groupBy("pid", "metric").agg(sum("cnt").as("pc"))
    val wOff = Window.partitionBy("metric").orderBy("pid")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offs = partials
      .withColumn("off", coalesce(sum("pc").over(wOff), lit(0L)))
      .withColumn("n", sum("pc").over(Window.partitionBy("metric")))
      .select("pid", "metric", "off", "n")
    inPart.join(broadcast(offs), Seq("pid", "metric"))
      .select(col("metric"), col("v"),
        (col("part_cum") + col("off")).as("cum"), col("n"),
        explode(array(qs.map(lit): _*)).as("q"))
      .filter(col("cum") >= ceil(col("q") * col("n")))
      .groupBy("metric", "q").agg(min("v").as("value"))
  }
}
