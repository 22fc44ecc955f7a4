package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.core.Materialize._

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
    // cumulative counts via the shared two-phase prefix sum (range
    // partition + partition-local windows + tiny offset merge — see
    // PrefixSum for why no partition-less window ever appears)
    // the cumulative frame has two consumers (totals + the quantile
    // filter) — materialize it (it is distinct-value-sized, tiny) so the
    // window/offset subtree runs once, not once per consumer
    val cum = PrefixSum.runningTotal(counts, Seq("metric"), Seq("v"),
      "cnt", "cum").staged
    // per-metric totals = the last running total (no corpus re-aggregation)
    val totals = cum.groupBy("metric").agg(max("cum").as("n"))
    cum.join(broadcast(totals), Seq("metric"))
      .select(col("metric"), col("v"), col("cum"), col("n"),
        explode(array(qs.map(lit): _*)).as("q"))
      .filter(col("cum") >= ceil(col("q") * col("n")))
      .groupBy("metric", "q").agg(min("v").as("value"))
  }

  /** Snapshot diff between two corpus versions keyed by id: `added`
    * (id only in the new snapshot), `removed` (only in the old),
    * `changed` (present in both with different content), `unchanged` —
    * the audit primitive of an incremental pipeline ("what did this
    * refresh actually do?"), feeding incremental dedup/re-scoring of
    * exactly the added ∪ changed slice.
    *
    * Scale shape: both sides reduce to (id, md5) BEFORE the join, so the
    * single full-outer hash-shuffle moves 2 fixed-width columns per row,
    * never document bytes; comparing hashes instead of text keeps the
    * join key-bounded and the output column-pruned. */
  def corpusDiff(oldSnap: DataFrame, newSnap: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val o = oldSnap.select(col(idCol).as("id"), md5(col(textCol)).as("_ho"))
    val n = newSnap.select(col(idCol).as("id"), md5(col(textCol)).as("_hn"))
    o.join(n, Seq("id"), "full_outer")
      .select(col("id"),
        when(col("_ho").isNull, "added")
          .when(col("_hn").isNull, "removed")
          .when(col("_ho") === col("_hn"), "unchanged")
          .otherwise("changed").as("status"))
  }

  /** Per-column data-quality profile (the Deequ-/Great-Expectations-style
    * ingest gate): row count, null count, exact distinct count, min and
    * max — one row per profiled column.
    *
    * Callers pass (name, renderer) pairs where the renderer is a Column
    * producing a STRING — type-specific rendering (decimal for doubles,
    * formatted timestamps) stays at the call site so the profile itself
    * is engine-portable: a raw double→string cast formats differently
    * across engines, a decimal cast doesn't.
    *
    * Scale shape: ONE corpus scan, exploded map-side into (col_name,
    * value) pairs, then a single aggregation keyed by column name. The
    * explode multiplies rows by |cols| but never materializes — it feeds
    * straight into partial aggregation, so what shuffles is one partial
    * state per (task, column). Distinct is exact (count-distinct's
    * expand adds one shuffle keyed by (col_name, v)); at 100 TB swap in
    * approx_count_distinct — same plan minus the expand — as
    * `x_approx_distinct_bounds` demonstrates. */
  /** Join-key skew diagnostic: the top-k heavy-hitter keys with their row
    * counts and ratio over the mean key load — the number that decides
    * whether a join needs salting ([[graft.ops.SkewJoin]]) or AQE's skew
    * split suffices. ratio ≈ 1 everywhere → uniform; a top key with
    * ratio ≫ 10 is the single-hot-task shape.
    *
    * Scale shape: ONE corpus scan into a key-count aggregation (map-side
    * partials; the frame is distinct-key-sized and staged once to feed
    * both the global stats AND the top-k). Top-k is TakeOrdered — a
    * bounded heap per partition merged on the driver, never a global
    * sort — and rank comes from zipWithIndex over the already-k-row
    * result, keeping the plan window-free. */
  def keySkew(df: DataFrame, keyCol: String, kTop: Int = 20): DataFrame = {
    val counts = stage(df.groupBy(col(keyCol).as("key"))
      .agg(count(lit(1)).as("ct")))
    val stats = counts.agg(count(lit(1)).as("n_keys"),
      sum(col("ct")).as("total"))
    val top = counts.orderBy(col("ct").desc, col("key")).limit(kTop)
    val ranked = df.sparkSession.createDataFrame(
      top.rdd.zipWithIndex().map { case (r, i) =>
        org.apache.spark.sql.Row.fromSeq(r.toSeq :+ (i + 1L)) },
      org.apache.spark.sql.types.StructType(top.schema.fields :+
        org.apache.spark.sql.types.StructField("rank",
          org.apache.spark.sql.types.LongType)))
    ranked.crossJoin(broadcast(stats))
      .withColumn("ratio", TextAnalysis.trunc4(col("ct") /
        (col("total").cast("double") / col("n_keys").cast("double"))))
      .select(col("rank"), col("key"), col("ct"), col("ratio"))
  }

  def columnProfile(df: DataFrame,
      cols: Seq[(String, org.apache.spark.sql.Column)]): DataFrame = {
    require(cols.nonEmpty)
    df.select(explode(array(cols.map { case (n, c) =>
        struct(lit(n).as("col_name"), c.cast("string").as("v"))
      }: _*)).as("p"))
      .select(col("p.col_name").as("col_name"), col("p.v").as("v"))
      .groupBy("col_name")
      .agg(
        count(lit(1)).as("n_rows"),
        (count(lit(1)) - count(col("v"))).as("null_ct"),
        countDistinct(col("v")).as("distinct_ct"),
        min(col("v")).as("min_s"),
        max(col("v")).as("max_s"))
  }

  /** Robust per-group outlier statistics: median ± k·MAD (median absolute
    * deviation) — the robust-z-score data-QA classic: unlike mean/stddev,
    * one corrupted batch of extreme values cannot drag the fence and mask
    * itself. Both medians are DISCRETE selections (min v with cum ≥
    * ⌈n/2⌉) computed by the shared two-phase prefix sum — real data
    * values, no interpolation, bit-identical across engines; the
    * deviation |x − med| and fence k·MAD are single IEEE operations on
    * identical operands, so the outlier flags are engine-exact too.
    *
    * Scale shape: two prefix-sum passes over DISTINCT-VALUE-sized count
    * frames (never the raw corpus through a window), med/MAD frames are
    * group-cardinality-sized → broadcast back over one corpus scan for
    * the flag count. */
  def madOutliers(df: DataFrame, keyCol: String, valCol: String,
      k: Double = 3.0): DataFrame = {
    def discMedian(in: DataFrame, outAlias: String): DataFrame = {
      val counts = in.groupBy(col(keyCol), col("_v"))
        .agg(count(lit(1)).as("cnt"))
      val cum = PrefixSum.runningTotal(counts, Seq(keyCol), Seq("_v"),
        "cnt", "cum").staged
      val totals = cum.groupBy(keyCol).agg(max("cum").as("_n"))
      cum.join(broadcast(totals), Seq(keyCol))
        .filter(col("cum") >= ceil(col("_n") * 0.5))
        .groupBy(col(keyCol)).agg(min("_v").as(outAlias))
    }
    val vals = df.select(col(keyCol), col(valCol).cast("double").as("_v"))
    val med = discMedian(vals, "med")
    val dev = vals.join(broadcast(med), Seq(keyCol))
      .select(col(keyCol), abs(col("_v") - col("med")).as("_v"))
    val mad = discMedian(dev, "mad")
    vals
      .join(broadcast(med), Seq(keyCol))
      .join(broadcast(mad), Seq(keyCol))
      .groupBy(col(keyCol))
      .agg(
        first(col("med")).as("med"),
        first(col("mad")).as("mad"),
        count(lit(1)).as("n"),
        sum(when(abs(col("_v") - col("med")) > col("mad") * k, 1L)
          .otherwise(0L)).as("n_outliers"))
  }
}
