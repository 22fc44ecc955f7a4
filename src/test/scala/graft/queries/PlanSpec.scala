package graft.queries

import graft.SparkTestBase
import org.apache.spark.sql.execution.ExplainMode

/** Physical-plan shape assertions: the plans we'd want at 100 TB, not just
  * plans that happen to pass. Filters/projections must reach the parquet
  * scan; small dims must broadcast; no query may fall back to a cartesian
  * product.
  */
class PlanSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  private def planOf(name: String): String =
    Registry.byName(name).run(spark, sf)
      .queryExecution.explainString(ExplainMode.fromString("formatted"))

  test("filter is pushed down to the parquet scan (P3)") {
    val p = planOf("p3_filter_deletes")
    assert(p.contains("PushedFilters"), p)
    assert(p.contains("Not(EqualTo(event_type,error))"), p)
  }

  test("projection prunes the scan to selected columns only (P4)") {
    val p = planOf("p4_column_projection")
    val readSchema = p.linesIterator.filter(_.contains("ReadSchema")).mkString
    assert(readSchema.contains("l_orderkey") && readSchema.contains("l_quantity"), p)
    assert(!readSchema.contains("l_extendedprice") && !readSchema.contains("l_comment"),
      s"scan reads pruned columns: $readSchema")
  }

  test("dim enrichment runs as broadcast hash joins, never shuffled (J3)") {
    val p = planOf("j3_dim_enrichment")
    assert(p.split("BroadcastHashJoin").length - 1 >= 4, p)
    assert(!p.contains("SortMergeJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("interval join stays a single equi-key join with range filter (J1)") {
    val p = planOf("j1_interval_join")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("serving top-N keeps the limit local (A7) and broadcasts the dim") {
    val p = planOf("a7_serving_topn")
    assert(p.contains("TakeOrderedAndProject") || p.contains("Limit"), p)
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("ANN brute force broadcasts queries; corpus is scanned, not shuffled") {
    val p = planOf("x_ann_bruteforce")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("ANN top-k is a bounded heap aggregate, not a window sort") {
    // the 100×-scale guarantee: no row_number().over(Window.partitionBy(qid))
    // single-reducer sort of the full candidate set — the TopKAgg runs as a
    // TypedImperativeAggregate with map-side partial merge
    for (q <- Seq("x_ann_bruteforce", "x_ann_native_expr", "x_ann_ivf")) {
      val p = planOf(q)
      assert(!p.contains("Window"), s"$q still window-sorts:\n$p")
      assert(p.contains("ObjectHashAggregate"), s"$q lost the heap aggregate:\n$p")
      // partial + final pairs ⇒ per-partition locals merge without a
      // global sort of candidates
      assert(p.linesIterator.count(_.matches("""\(\d+\) ObjectHashAggregate.*""")) >= 2, p)
    }
  }

  test("text analysis is a pure map pipeline: no shuffle except final sort") {
    for (q <- Seq("x_text_stats", "x_langid_ngram", "x_winnow_fingerprints")) {
      val p = planOf(q)
      // Project chain straight over the scan; the only Exchange is the
      // deterministic ORDER BY required for oracle comparison. Formatted
      // explain lists each node twice (tree + "(n) Node" details) — count
      // the detail headers.
      val exchanges = p.linesIterator.count(_.matches("""\(\d+\) Exchange.*"""))
      assert(exchanges <= 1, s"$q shuffles:\n$p")
      assert(!p.contains("HashAggregate"), s"$q aggregates:\n$p")
      assert(!p.contains("Window"), s"$q window-shuffles:\n$p")
    }
  }
}
