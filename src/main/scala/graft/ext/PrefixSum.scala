package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Materialize._

/** Distributed running totals without a single-task window.
  *
  * `sum(...).over(Window.orderBy(...))` with no partition funnels the
  * whole frame through one task — the canonical scale trap for prefix
  * sums. This helper computes the same value in two phases: range-partition
  * on (group, order) so partition p holds keys strictly below partition
  * p+1's, run partition-LOCAL window sums in parallel, then merge the
  * per-partition totals — a frame bounded by shuffle-partitions × |groups|,
  * config-sized, never data-sized — into global offsets with one tiny
  * partitioned window. Used by corpus profiling (per-metric cumulative
  * counts) and sequence packing (global token offsets). */
object PrefixSum {

  /** Adds `outCol` = inclusive running total of `valueCol`, ordered by
    * `orderCols` within each `partCols` group (global when `partCols` is
    * empty). All other columns pass through. The range-partitioned frame
    * is materialized once (localCheckpoint) because the partition-id
    * column must be identical for every consumer — two executions of a
    * range exchange may sample different boundaries. */
  def runningTotal(df: DataFrame, partCols: Seq[String],
      orderCols: Seq[String], valueCol: String, outCol: String): DataFrame = {
    require(orderCols.nonEmpty, "runningTotal needs at least one order column")
    val rangeCols = (partCols ++ orderCols).map(col)
    val parted = df
      .repartitionByRange(rangeCols: _*)
      .withColumn("_pid", spark_partition_id())
      .staged
    val wPart = Window
      .partitionBy(("_pid" +: partCols).map(col): _*)
      .orderBy(orderCols.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, 0)
    val inPart = parted.withColumn("_pcum", sum(col(valueCol)).over(wPart))
    val partials = parted
      .groupBy(("_pid" +: partCols).map(col): _*)
      .agg(sum(col(valueCol)).as("_pc"))
    // offsets = Σ of EARLIER partitions' totals within the group, via a
    // broadcast theta self-join over the partials frame — O(P²) on a
    // config-bounded frame, and crucially NO window at all: a global
    // (partCols-empty) running total would otherwise need a
    // partition-less window (a constant partition key gets
    // optimizer-pruned back to one), the exact degradation this helper
    // exists to avoid
    val a = partials.alias("a")
    val b = partials.alias("b")
    val cond = partCols.foldLeft(col("b._pid") < col("a._pid")) {
      (acc, c) => acc && (col(s"a.$c") === col(s"b.$c"))
    }
    val offs = a.join(broadcast(b), cond, "left")
      .groupBy((col("a._pid") +: partCols.map(c => col(s"a.$c"))): _*)
      .agg(coalesce(sum(col("b._pc")), lit(0L)).as("_off"))
      // fresh names (and expr ids) so the merge join below is not a
      // self-join on the checkpointed frame's attributes
      .toDF(("_o_pid" +: partCols.map("_o_" + _) :+ "_off"): _*)
    // null-SAFE equality on the group keys: groupBy keeps a NULL group,
    // and plain equality would silently drop its rows here
    val joinCond = ("_pid" +: partCols).zip("_o_pid" +: partCols.map("_o_" + _))
      .map { case (l, r) => col(l) <=> col(r) }.reduce(_ && _)
    inPart.join(broadcast(offs), joinCond)
      .withColumn(outCol, col("_pcum") + col("_off"))
      .drop(("_pid" +: "_pcum" +: "_off" +: "_o_pid" +:
        partCols.map("_o_" + _)): _*)
  }
}
