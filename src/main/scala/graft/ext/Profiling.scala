package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus profiling: exact discrete percentiles of per-document metrics
  * (lengths, token counts) — the numbers that size sequence-length
  * budgets, truncation points, and packing efficiency for a training run.
  *
  * Exactness without a global sort: percentiles of a LENGTH-like metric
  * exploit its bounded value domain. One shuffle aggregates rows to
  * (value, count) — at most |distinct lengths| rows, thousands not
  * billions — then a cumulative sum over that tiny frame picks the value
  * at rank ceil(q·n). Discrete (selection, not interpolation): the result
  * is a real corpus value and bit-identical in every engine; interpolated
  * quantiles differ across engines' formulas. The only window function
  * runs over the distinct-value frame, not the corpus. */
object Profiling {

  /** (metric, q, value) rows: disc percentile per requested q for each
    * named numeric column. ONE pass per metric: the corpus aggregates to
    * (value, count) once, then every quantile is answered from the same
    * tiny cumulative frame (explode the q list, filter, min) — not one
    * re-aggregation per (metric, q). */
  def discPercentiles(docs: DataFrame, metrics: Seq[String],
      qs: Seq[Double] = Seq(0.5, 0.9, 0.99)): DataFrame = {
    val perMetric = metrics.map { m =>
      val counts = docs.groupBy(col(m).cast("long").as("v"))
        .agg(count(lit(1)).as("cnt"))
      val wCum = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
      val wAll = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      counts
        .withColumn("cum", sum("cnt").over(wCum))
        .withColumn("n", sum("cnt").over(wAll))
        .select(col("v"), col("cum"), col("n"),
          explode(array(qs.map(lit): _*)).as("q"))
        .filter(col("cum") >= ceil(col("q") * col("n")))
        .groupBy("q").agg(min("v").as("value"))
        .select(lit(m).as("metric"), col("q"), col("value"))
    }
    perMetric.reduce(_ unionByName _)
  }
}
