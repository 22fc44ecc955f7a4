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

  test("filtered vector search pushes the metadata predicate into the scan") {
    val p = planOf("x_ann_filtered")
    // the label predicate must prune candidates AT THE SCAN — a
    // post-scoring filter would read and score every vector first
    assert(p.contains("PushedFilters"), p)
    assert(p.contains("LessThanOrEqual(label,3)"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("ANN top-k is a bounded heap aggregate, not a window sort") {
    // the 100×-scale guarantee: no row_number().over(Window.partitionBy(qid))
    // single-reducer sort of the full candidate set — the TopKAgg runs as a
    // TypedImperativeAggregate with map-side partial merge
    for (q <- Seq("x_ann_bruteforce", "x_ann_native_expr", "x_ann_ivf",
        "x_ann_filtered", "x_ann_pq")) {
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

  test("bloom decontamination probes map-only, directly over the corpus scan") {
    val p = planOf("x_decontaminate_bloom")
    assert(p.contains("might_contain"), p)
    val lines = p.linesIterator.toVector
    // locate the detail block of the Filter whose condition is the bloom
    // probe, take its node id, and assert that node's TREE child is the
    // scan itself — probe-then-join, never shuffle-then-probe
    val detail = lines.indexWhere(l => l.matches("""\(\d+\) Filter.*""") &&
      lines.indexOf(l) >= 0 && {
        val i = lines.indexOf(l)
        lines.slice(i, i + 4).exists(_.contains("might_contain"))
      })
    assert(detail >= 0, p)
    val id = lines(detail).drop(1).takeWhile(_ != ')')
    val treeLine = lines.indexWhere(_.matches(s""".*[^)] Filter \\($id\\)\\s*"""))
    assert(treeLine >= 0, p)
    assert(lines(treeLine + 1).contains("Scan"),
      s"bloom probe is not directly over the corpus scan:\n$p")
    // the small (benchmark) side broadcasts; the corpus side never
    // shuffles before the verifying join
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("budget selection broadcasts the bucket-cutoff frame over the corpus") {
    val p = planOf("x_budget_select")
    // the corpus never sort-merge-joins the tiny (domain, score) cutoff
    // frame, and nothing degenerates to a cartesian product
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("shard assignment shuffles once by shard (plus the oracle sort)") {
    val p = planOf("x_shard_assign")
    val exchanges = p.linesIterator.count(_.matches("""\(\d+\) Exchange.*"""))
    assert(exchanges <= 2, s"shard assignment over-shuffles:\n$p")
    assert(p.contains("hashpartitioning(shard"), p)
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"), p)
  }

  test("incremental dedup and corpus diff never degenerate to cartesian plans") {
    for (q <- Seq("x_dedup_incremental", "x_corpus_diff")) {
      val p = planOf(q)
      assert(!p.contains("CartesianProduct"), s"$q goes cartesian:\n$p")
    }
  }

  test("corpus diff scan is pruned to id + text only") {
    val p = planOf("x_corpus_diff")
    val readSchema = p.linesIterator.filter(_.contains("ReadSchema")).mkString
    assert(readSchema.contains("doc_id") && readSchema.contains("text"), p)
    assert(!readSchema.contains("n_chars") && !readSchema.contains("lang"),
      s"diff reads pruned columns: $readSchema")
  }

  test("vocab profile and tf-idf aggregate with map-side partial combine") {
    for (q <- Seq("x_vocab_profile", "x_tfidf_topk")) {
      val p = planOf(q)
      // partial + final HashAggregate pairs on the (domain, word) key —
      // the explode never shuffles raw token rows without combining first
      assert(p.linesIterator.count(_.matches("""\(\d+\) HashAggregate.*""")) >= 2,
        s"$q lost map-side combine:\n$p")
      assert(!p.contains("CartesianProduct"), p)
    }
  }

  test("span dedup/cut never window over token-sized partitions") {
    // the ExactSubstr pair's 100-TB contract: coverage comes from the
    // doc-local sorted-starts fold, NOT a per-position PARTITION BY doc
    // window over the exploded gram frame
    for (q <- Seq("x_substring_dedup", "x_substring_cut")) {
      val p = planOf(q)
      assert(!p.contains("Window"), s"$q window-shuffles token rows:\n$p")
      assert(!p.contains("CartesianProduct") && !p.contains("SortMergeJoin"),
        s"$q degenerate join:\n$p")
    }
  }

  test("DSIR weights broadcast the bucket-lambda table over the feature frame") {
    val p = planOf("x_dsir_weights")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("Window"), s"weights need no window at all:\n$p")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("DSIR select and CCNet buckets keep every window partitioned") {
    // exact percentiles route through the two-phase prefix sum: any
    // window that appears must be keyed by the prefix-sum partition id
    // (_pid...) — a partition-less (global) window would serialize the
    // frame through one task at scale
    for (q <- Seq("x_dsir_select", "x_ccnet_buckets", "x_curriculum_order")) {
      val p = planOf(q)
      val windowDefs = p.linesIterator.filter(_.contains("windowspecdefinition")).toSeq
      assert(windowDefs.forall(_.contains("_pid")),
        s"$q has a window not keyed by the prefix-sum partition:\n${windowDefs.mkString("\n")}")
      assert(!p.contains("CartesianProduct"), p)
    }
  }

  test("NB classify: class list broadcasts; argmax window sees docs-by-classes only") {
    val p = planOf("x_nb_classify")
    // the tokens × classes expansion is a broadcast nested-loop over the
    // |classes|-row side (never a shuffled cartesian), and the argmax
    // window is keyed by doc id
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("windowspecdefinition(id"), p)
  }

  // formatted plans list each node twice (tree + detail section); count
  // scans by their numbered detail lines only
  private def scanCount(p: String): Int =
    p.linesIterator.count(_.matches("""\(\d+\) Scan parquet\s*.*"""))

  test("ROLLUP is one pass: a single Expand, never a scan per grouping level (A14)") {
    val p = planOf("a14_grouping_sets")
    assert(p.linesIterator.count(_.matches("""\(\d+\) Expand\s*""")) == 1, p)
    // one scan each of orders / customer / nation — 3 total, no re-scan
    assert(scanCount(p) == 3, p)
    assert(p.contains("BroadcastHashJoin"), p) // nation dim
  }

  test("explicit-values pivot skips the distinct-values scan (A15)") {
    val p = planOf("a15_pivot")
    // pivot(col, values) plans as conditional aggregation over ONE pass;
    // the values-less overload would add a distinct collect scan first
    assert(scanCount(p) == 3, p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("SRP signatures are map-only: no hash exchange before the final sort") {
    val p = planOf("x_srp_signature")
    // 16 hyperplane dots + band packing are pure projections over the
    // scan; the only exchange a signature pass may need is the oracle
    // ORDER BY's range partitioning
    assert(!p.contains("Exchange hashpartitioning"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("containment and SRP near-dup never degenerate to cartesian plans") {
    for (q <- Seq("x_containment_neardup", "x_srp_neardup")) {
      val p = planOf(q)
      assert(!p.contains("CartesianProduct"), s"$q goes cartesian:\n$p")
      assert(!p.contains("BroadcastNestedLoopJoin"), s"$q nested-loops:\n$p")
    }
  }

  test("pure range join plans as a binned equi-join, never a nested loop (J9)") {
    val p = planOf("j9_range_join")
    // without the bin rewrite, a keyless BETWEEN predicate can only plan
    // as BroadcastNestedLoopJoin / cartesian — O(n·m) per partition
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("salted skew join replicates the dim via explode, no cartesian (J7)") {
    val p = planOf("j7_skew_join")
    // the dim side replicates through Generate(explode(...)) — the
    // sequence(0, b-1) literal is constant-folded to an array literal
    assert(p.linesIterator.count(_.matches("""\(\d+\) Generate\s*""")) == 1, p)
    assert(p.contains("explode("), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("BM25 reuses one staged tokenize scan; top-k window is term-keyed") {
    val p = planOf("x_bm25_topk")
    // the tokenized frame is staged (localCheckpoint) and reused for dl
    // AND tf — the final plan must not re-scan documents.parquet at all
    assert(scanCount(p) == 0, p)
    val windowDefs = p.linesIterator.filter(_.contains("windowspecdefinition")).toSeq
    assert(windowDefs.nonEmpty && windowDefs.forall(_.contains("word")), p)
  }

  test("column profile is one scan with map-side partial aggregation") {
    val p = planOf("x_dq_profile")
    assert(scanCount(p) == 1, p)
    assert(p.linesIterator.count(_.matches("""\(\d+\) Generate\s*""")) == 1, p)
    // partial + final pairs (SortAggregate here: min/max over strings)
    assert(p.split("(Sort|Hash)Aggregate").length - 1 >= 2, p)
  }

  test("rolling window runs over the daily aggregate, keyed by type (A16)") {
    val p = planOf("a16_rolling_window")
    // the range window must be keyed (never partition-less) and sit
    // above the daily aggregation, not the raw event scan
    val windowDefs = p.linesIterator.filter(_.contains("windowspecdefinition")).toSeq
    assert(windowDefs.nonEmpty && windowDefs.forall(_.contains("event_type")), p)
    assert(scanCount(p) == 1, p)
    assert(p.split("HashAggregate").length - 1 >= 2, p) // daily agg partial+final
  }

  test("attribution stays join-free: as-of is union + keyed carry-forward (A17)") {
    val p = planOf("a17_attribution")
    assert(!p.contains("Join"), p) // no join operator of any kind
    val windowDefs = p.linesIterator.filter(_.contains("windowspecdefinition")).toSeq
    assert(windowDefs.nonEmpty && windowDefs.forall(_.contains("user_id")), p)
  }

  test("CEP times pushes the view filter into the scan; one keyed shuffle (C3)") {
    val p = planOf("c3_cep_times")
    // the pattern only reads views: the predicate must prune AT THE SCAN
    assert(p.contains("PushedFilters"), p)
    assert(p.contains("EqualTo(event_type,view)"), p)
    // exactly the groupByKey(user) exchange + the deterministic output
    // sort — a third exchange would mean the per-user fold re-shuffles
    assert(p.linesIterator.count(_.matches("""\(\d+\) Exchange.*""")) <= 2, p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("memorizing ANN twins keep the vec_id cap at the scan, no cartesian") {
    for (q <- Seq("x_ann_kmeans_exact", "x_ann_pq_exact", "x_ann_ivfpq_exact")) {
      val p = planOf(q)
      // the corpus restriction is the whole point of the fixture — it
      // must prune at the parquet scan, not post-filter scored rows
      assert(p.contains("PushedFilters"), s"$q:\n$p")
      assert(p.contains("LessThan(vec_id,"), s"$q:\n$p")
      assert(!p.contains("CartesianProduct"), s"$q goes cartesian:\n$p")
    }
  }

  test("containment counts rare intersections in the candidate aggregate") {
    // the rare/common split: the wide verify join must NOT rejoin the
    // full shingle frame — both co-occurrence joins are shuffle-hash
    // (bounded build sides), and no sort-merge sneaks back in
    val p = planOf("x_containment_neardup")
    assert(p.contains("ShuffledHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("bucketed join is co-located: no exchange on either join key (J10)") {
    val p = planOf("j10_bucketed_join")
    assert(p.contains("SortMergeJoin"), p)
    // the only hash exchange allowed is the groupBy's (status, returnflag);
    // a shuffle on a join key means bucketing was not recognized
    assert(!p.contains("Exchange hashpartitioning(o_orderkey"), p)
    assert(!p.contains("Exchange hashpartitioning(l_orderkey"), p)
    // bucketed scans: selected bucket count appears in the scan detail
    assert(p.contains("SelectedBucketsCount"), p)
  }

  test("partitioned store prunes to the filtered day at planning time (S8)") {
    val p = planOf("s8_partition_prune")
    val pf = p.linesIterator.filter(_.contains("PartitionFilters")).mkString
    assert(pf.contains("event_date"), p)
    // equality against the literal day must sit in PartitionFilters (file
    // skipping), not ride along as a post-scan data filter
    assert(pf.contains("= 2024-01-10") || pf.contains("= 19732"), p)
  }

  test("weighted sample is map + bounded top-k, no global sort of the corpus") {
    val p = planOf("x_sample_weighted")
    // TakeOrderedAndProject: each partition reduces to its local k before
    // anything moves — the A-Res selection never range-shuffles the corpus
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("Exchange rangepartitioning"), p)
  }

  test("prefix-filter join: no cartesian, no partition-less window") {
    val p = planOf("x_prefix_join")
    assert(!p.contains("CartesianProduct"), p)
    // the canonical rarity order is realized per-doc (sort_array over the
    // doc's own tokens), never as a corpus-wide rank window — the plan
    // must contain NO window at all
    assert(!p.contains("windowspecdefinition"), p)
  }

  test("ER fuzzy match: blocked join, no cartesian, no corpus-wide window") {
    val p = planOf("x_er_fuzzy_match")
    assert(!p.contains("CartesianProduct"), p)
    // the JW verify fetches strings by id through hash joins — a
    // sort-merge here would mean the candidate frame lost its bound
    assert(!p.contains("windowspecdefinition"), p)
    assert(p.contains("jaro_winkler"), p)
  }

  test("winnow rolling bounds: two map-only fingerprint scans, no pair join") {
    val p = planOf("x_winnow_rolling_bounds")
    // both variants aggregate per doc straight off their generator
    // expressions: any join other than the final doc_id count-merge —
    // or any cartesian — means a fingerprint-level shuffle snuck in
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("winnow_fps"), p)
    assert(p.contains("winnow_fps_rolling"), p)
  }

  test("edit-distance near-dup verifies only blocked candidates") {
    val p = planOf("x_editdist_neardup")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("MAD outliers: every window keyed by the prefix-sum partition, broadcast fences") {
    val p = planOf("x_mad_outliers")
    // both discrete medians ride the two-phase prefix sum — no window may
    // ever see a partition key narrower than (_pid, group)
    val windowDefs =
      p.linesIterator.filter(_.contains("windowspecdefinition")).toSeq
    assert(windowDefs.forall(_.contains("_pid")),
      s"x_mad_outliers has a window not keyed by the prefix-sum partition:\n" +
        windowDefs.mkString("\n"))
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("JL rerank: coarse heap (no Window), exact pass candidate-pruned via broadcast") {
    val p = planOf("x_ann_jl_rerank")
    // stage-1 top-C and stage-2 top-k both run as bounded-heap aggregates
    assert(!p.contains("Window"), p)
    // the exact re-rank joins the corpus against the tiny candidate frame
    // by broadcast — the raw-vector scan is never shuffled
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("IVF-PQ rerank: exact stage candidate-pruned, no cartesian, heaps not windows") {
    val p = planOf("x_ann_ivfpq_rerank")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("Window"), p)
    // the only sort-merge allowed is the recall gate's |queries|·k-row
    // LeftSemi bookkeeping join (static stats mispredict the two tiny
    // aggregate-derived frames; AQE converts it at runtime) — the DATA
    // PATH joins (candidate × corpus, query panel) must all broadcast
    // count TREE lines only ("+- SortMergeJoin LeftSemi (n)") — the
    // formatted detail section repeats each node name without join type
    val smjAll = p.linesIterator.count(_.contains("- SortMergeJoin"))
    val smjSemi = p.linesIterator.count(_.contains("- SortMergeJoin LeftSemi"))
    assert(smjAll == smjSemi, p)
    assert(p.contains("BroadcastExchange"), p)
  }

  test("ER serving match: the reference list broadcasts; corpus side never shuffles") {
    val p = planOf("x_er_match")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.linesIterator.exists(_.contains("- SortMergeJoin")), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("Window"), p)
  }

  test("rolling decontamination: fp-keyed joins only, 1-row gate broadcast") {
    val p = planOf("x_decontaminate_rolling")
    // both kernels' gates are fingerprint equi-joins; the agreement gate
    // rides 1-row broadcast frames — no cartesian, no corpus-wide window
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("Window"), p)
  }

  test("CMS heavy hitters: sketch side broadcasts, exact pass is semi-pruned") {
    val p = planOf("x_cms_heavy_hitters")
    // the ≤ d·w sketch and candidate frames ride broadcast joins; the
    // events scan must never shuffle against them
    assert(p.contains("BroadcastHashJoin"), p)
    assert(p.contains("LeftSemi"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("sketch rollup re-merges partials: two aggregate levels, one scan each") {
    val p = planOf("x_sketch_rollup")
    // hll partials per (day,type) then union_agg per type — both hash
    // aggregates with map-side partials, no window, no extra sort
    assert(p.contains("ObjectHashAggregate") || p.contains("HashAggregate"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("Window"), p)
  }

  test("KLL rollup broadcasts the 5-row quantile answer; no window, no cartesian") {
    val p = planOf("x_kll_rollup")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
    assert(!p.contains("Window"), p)
  }

  test("z-order curve values are a map-only projection, zero exchanges") {
    val p = planOf("x_zorder_curve")
    // orderBy is the verify-ordering; everything before it is one scan +
    // codegen'd bit arithmetic, no shuffle, no join
    assert(!p.contains("Exchange hashpartitioning"), p)
    assert(!p.contains("Join"), p)
    val readSchema = p.linesIterator.filter(_.contains("ReadSchema")).mkString
    assert(!readSchema.contains("props"), s"scan reads pruned columns: $readSchema")
  }

  test("simhash64 gate: band/pair equi-joins only, 1-row recall gate broadcast") {
    val p = planOf("x_simhash64_neardup")
    // truth side = rare-shingle-blocked candidates + token-keyed verify;
    // sketch side = 4×16-bit band equi-joins; the recall gate rides
    // 1-row broadcast frames — no cartesian, no global window anywhere
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("Window"), p)
    assert(p.contains("BroadcastNestedLoopJoin"), p) // the 1-row gate frames
  }

  test("fast-dedup gate: pair-keyed joins only, 1-row agreement gate broadcast") {
    val p = planOf("x_dedup_pipeline_fast")
    // both kernels' pipelines are band/pair equi-joins; the agreement
    // gate rides 1-row broadcast frames (the x_decontaminate_rolling
    // shape) — no cartesian over anything corpus-sized, no global window
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("Window"), p)
  }

  test("trend top-k plans as TakeOrdered, never a global sort") {
    val p = planOf("a21_trend_topk")
    assert(p.contains("TakeOrderedAndProject"), p)
    // a global Sort before the limit would pay a full range exchange for
    // a 10-row answer
    assert(!p.linesIterator.exists(_.matches("""\(\d+\) Sort\s*""")), p)
  }

  test("ratelimit: secondary-sort fold — one keyed exchange, local sort, " +
      "no window, no cartesian") {
    val p = planOf("a22_ratelimit")
    // previous-KEPT is a data-dependent fold, not a lag window — and
    // since r14 it is the SPILL-SAFE shape: one keyed hash exchange, a
    // LOCAL sort (spills through the external sorter), and a
    // MapPartitions streaming fold (O(1) live state per key) instead of
    // the flatMapGroups + toSeq buffer that OOMed on a hot key
    // (SCALING §10a). No Window operator, no cartesian.
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("Window"), p)
    assert(p.contains("MapPartitions"), p)
    assert(p.linesIterator.count(_.contains("hashpartitioning")) == 1, p)
    // the secondary sort is LOCAL (formatted explain: the Sort node's
    // Arguments line ends "false, 0" = global=false): no range exchange
    // before the fold
    assert(p.linesIterator.exists(l =>
      l.contains("us#") && l.contains("ASC NULLS FIRST") &&
        l.contains("false, 0")), p)
  }

  test("resample forward-fill: LOCF window rides the grid join's user key") {
    val p = planOf("a23_resample_ffill")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    // same span-bounded grid discipline as a19…
    assert(p.linesIterator.count(_.matches("""\(\d+\) Generate\s*""")) == 1, p)
    assert(p.contains("sequence("), p)
    // …and the carry-forward window is keyed by user_id (the partition
    // the grid join already established — no ungrouped window anywhere)
    val windowDefs =
      p.linesIterator.filter(_.contains("windowspecdefinition")).toSeq
    assert(windowDefs.nonEmpty, p)
    assert(windowDefs.forall(_.contains("user_id")), windowDefs.mkString("\n"))
  }

  test("resample zero-fill: span-bounded sequence explode, no cartesian grid") {
    val p = planOf("a19_resample_zerofill")
    // the grid must be generated per-user from the span aggregate (one
    // Generate over sequence()), never a calendar × users cross product
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.linesIterator.count(_.matches("""\(\d+\) Generate\s*""")) == 1, p)
    assert(p.contains("sequence("), p)
  }

  test("debounce: lag window keyed by (user, type), never a global sort") {
    val p = planOf("a20_debounce")
    val windowDefs =
      p.linesIterator.filter(_.contains("windowspecdefinition")).toSeq
    assert(windowDefs.nonEmpty, p)
    assert(windowDefs.forall(w =>
      w.contains("user_id") && w.contains("event_type")),
      s"a20_debounce has a window not keyed by (user_id, event_type):\n" +
        windowDefs.mkString("\n"))
    assert(!p.contains("CartesianProduct"), p)
  }

  test("trend decay: horizon is a 1-row broadcast, weights fold map-side, one exchange") {
    val p = planOf("a18_trend_decay")
    // the horizon max(ts) joins back as a 1-row broadcast; the weighted
    // sum must partially aggregate BELOW the item exchange (map-side
    // partial sums are what bound the shuffle to one row per
    // (partition, item) at 100 TB)
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("SortMergeJoin"), p)
    val ex = p.linesIterator.count(_.contains("hashpartitioning(item"))
    assert(ex == 1, s"expected exactly one hash exchange (item groupBy):\n$p")
    assert(p.contains("partial_sum"), p)
  }

  test("cusum: 1-row target broadcast, secondary-sort fold — local sort, no window") {
    val p = planOf("a28_cusum")
    // the frozen target rides a 1-row broadcast frame (the a18 horizon
    // shape); the per-user recurrence is the spill-safe secondary-sort
    // fold (SCALING §10a): one keyed hash exchange, a LOCAL sort, a
    // MapPartitions streaming fold — no Window operator, no cartesian
    // over anything corpus-sized
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("Window"), p)
    assert(p.contains("MapPartitions"), p)
    assert(p.contains("BroadcastNestedLoopJoin"), p) // the 1-row target frame
    assert(p.linesIterator.count(_.contains("hashpartitioning(user_id")) == 1, p)
    // the secondary sort is LOCAL (global=false): no range exchange
    // before the fold
    assert(p.linesIterator.exists(l =>
      l.contains("us#") && l.contains("ASC NULLS FIRST") &&
        l.contains("false, 0")), p)
  }

  test("monitor e2e: broadcast scrub, ONE fold for smooth+flag+alert — " +
      "single keyed exchange, no row-level window") {
    val p = planOf("a30_monitor_e2e")
    // the composition must not pay per-stage: the med/mad scrub rides
    // broadcast joins (a29's shape), then smooth+flag+alert share ONE
    // secondary-sort fold — exactly one hashpartitioning(user_id)
    // exchange for the whole stateful tail, windows only over the value
    // histogram, never over raw rows
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("SortMergeJoin"), p)
    assert(p.contains("MapPartitions"), p)
    assert(p.split("BroadcastHashJoin").length - 1 >= 4, p)
    assert(p.linesIterator.count(_.contains("hashpartitioning(user_id")) == 1, p)
    val windowDefs =
      p.linesIterator.filter(_.contains("windowspecdefinition")).toSeq
    assert(windowDefs.nonEmpty && windowDefs.forall(_.contains("event_type")),
      windowDefs.mkString("\n"))
  }

  test("scd2 history: windows keyed by the dim key, never a global sort, " +
      "scan pruned to the change feed") {
    val p = planOf("a31_scd2_history")
    // version numbering and interval closing both ride ONE per-key
    // window (the shuffle the dim layout needs anyway); the change-feed
    // predicate must reach the scan so non-change events are never read
    assert(!p.contains("CartesianProduct"), p)
    val windowDefs =
      p.linesIterator.filter(_.contains("windowspecdefinition")).toSeq
    assert(windowDefs.nonEmpty && windowDefs.forall(_.contains("user_id")),
      windowDefs.mkString("\n"))
    assert(p.contains("EqualTo(event_type,signup)"),
      s"change-feed filter not pushed to the scan:\n$p")
  }

  test("scd2 lookup: history broadcasts onto the fact stream, interval " +
      "bounds ride the equi key — no cartesian, no nested loop") {
    val p = planOf("a32_scd2_lookup")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("kcenter assignment is join-free: centers fold as literals in one " +
      "row-local expression") {
    val p = planOf("x_kcenter_assign")
    // the coverage partition must never join vectors against a center
    // table — k ≤ 8 centers arrive as literal arrays inside a single
    // projection, so the only exchange is the final orderBy's range
    // partition
    assert(!p.contains("Join"), p)
    assert(!p.contains("hashpartitioning"), p)
  }

  test("perceptron: weight joins broadcast; serving scorer is map-only, " +
      "zero exchanges") {
    val p = planOf("x_perceptron_train")
    // every weights-side join is vs a ≤ dims-row frame and must
    // broadcast — shuffle volume stays bounded by corpus features,
    // never weights × corpus
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("BroadcastHashJoin"), p)
    // the DEPLOYED form: one row-local expression over the doc frame —
    // a pure projection, no exchange anywhere
    val docs = graft.core.Tables.load(spark, sf, "documents")
    val wmap = org.apache.spark.sql.functions.map(
      org.apache.spark.sql.functions.lit(1L),
      org.apache.spark.sql.functions.lit(5L))
    val serve = docs.select(org.apache.spark.sql.functions.col("doc_id"),
        graft.ext.Classify.mapOnlyScore(
          org.apache.spark.sql.functions.col("text"), wmap, dims = 32)
          .as("score"))
      .queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(!serve.contains("Exchange"),
      s"map-only scorer plans an exchange:\n$serve")
  }

  test("robust outliers: histogram-CDF medians — windows over distinct values, " +
      "med/mad broadcast back") {
    val p = planOf("a29_robust_outliers")
    // the exact-median selection must NEVER sort raw rows: every window
    // runs over the (type, value) HISTOGRAM (post-groupBy distinct
    // values) keyed by event_type, and the ≤|types|-row med/mad answers
    // broadcast back onto the corpus — no shuffled join anywhere
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("SortMergeJoin"), p)
    assert(p.split("BroadcastHashJoin").length - 1 >= 4, p)
    val windowDefs =
      p.linesIterator.filter(_.contains("windowspecdefinition")).toSeq
    assert(windowDefs.nonEmpty && windowDefs.forall(_.contains("event_type")),
      windowDefs.mkString("\n"))
  }
}
