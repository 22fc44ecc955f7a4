package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.core.Materialize._

/** Deterministic, content-addressed sampling for training-data curation.
  *
  * Why not `df.sample(fraction, seed)`? RNG sampling is tied to partition
  * layout: repartition the corpus (or retry a failed stage on a cluster)
  * and a different subset survives, which breaks audits and incremental
  * reruns. Here the keep/drop decision is a pure function of the row's own
  * id: keep iff the md5 hex prefix of the id sorts below the stratum's
  * cutoff. Same subset in every engine, at any parallelism, on every
  * rerun — and the DuckDB oracle can verify the exact membership.
  *
  * Cutoffs are 2-hex-char thresholds: md5 is uniform, so cutoff "40"
  * keeps 0x40/0x100 = 25%, "80" keeps 50%. Per-stratum cutoffs give
  * stratified downsampling (e.g. keep half the English corpus, a quarter
  * of everything else) — the standard mixture-balancing move.
  */
object Sampling {

  /** Content-addressed keep predicate for a plain fraction: true iff the
    * row's md5(id) 2-hex prefix sorts below the fraction's cutoff. The
    * cutoff is clamped to at least "01" — rounding a small fraction to
    * cutoff "00" would silently select NOTHING — and a fraction rounding
    * to cutoff 256 keeps EVERYTHING (a 2-hex prefix can never reach
    * "100", so clamping down to "ff" would silently shed ~1/256 of the
    * rows despite the (0, 1] domain). Shared by ad-hoc samplers (e.g.
    * the k-means sample-fit path) so the cutoff arithmetic and its
    * guards live once. */
  def keepFraction(idCol: Column, fraction: Double): Column = {
    require(fraction > 0.0 && fraction <= 1.0,
      s"fraction must be in (0, 1], got $fraction")
    val c = math.round(fraction * 256)
    if (c >= 256) lit(true)
    else {
      val cutoff = f"${math.max(1L, c)}%02x"
      substring(md5(idCol.cast("string")), 1, 2) < lit(cutoff)
    }
  }

  /** Keep rows whose md5(id) 2-hex prefix sorts strictly below the cutoff
    * of their stratum. `cutoffs` maps stratum value → cutoff; strata not
    * listed use `defaultCutoff`. Adds `stratum` and keeps all columns. */
  def stratifiedSample(df: DataFrame, idCol: String, stratumCol: Column,
      cutoffs: Map[String, String], defaultCutoff: String): DataFrame = {
    val cutoff = cutoffs.foldLeft(lit(defaultCutoff)) {
      case (acc, (stratum, c)) =>
        when(col("stratum") === stratum, lit(c)).otherwise(acc)
    }
    df.withColumn("stratum", stratumCol)
      .withColumn("_hx", substring(md5(col(idCol).cast("string")), 1, 2))
      .filter(col("_hx") < cutoff)
      .drop("_hx")
  }

  /** Mixture rebalancing (the DoReMi/Pile-style domain-weights move, here
    * as deterministic downsampling): keep per-domain fractions so the
    * surviving corpus approaches the target mixture `weights`, discarding
    * as little data as possible. The binding domain — the one whose
    * observed share falls shortest of its target — is kept whole and
    * every other domain is downsampled proportionally:
    * scale = min_d(count_d / w_d), keep_d = scale·w_d / count_d.
    * Domains with weight 0 (or absent from `weights`, via
    * `defaultWeight`) are dropped entirely.
    *
    * Membership is content-addressed like everything in this file, so the
    * realized subset is partition-layout-independent and auditable; keep
    * fractions quantize to 1/256ths (cutoff 256 = keep all — the binding
    * domain loses nothing). Scale shape: one per-domain count shuffle
    * (map-side combined, key cardinality = |domains|), a few-row
    * cutoff frame broadcast back over the corpus — no second scan, no
    * global sort. Returns kept rows as (idCol, domain, cutoff). */
  def domainMix(df: DataFrame, idCol: String, domainCol: Column,
      weights: Map[String, Double], defaultWeight: Double = 0.0): DataFrame = {
    require(weights.values.forall(_ >= 0) && defaultWeight >= 0,
      "mixture weights must be non-negative")
    require(weights.values.exists(_ > 0), "at least one positive weight")
    val weighted = df.withColumn("domain", domainCol)
    val wCol = weights.foldLeft(lit(defaultWeight)) {
      case (acc, (d, w)) => when(col("domain") === d, lit(w)).otherwise(acc)
    }
    val counts = weighted.groupBy("domain").agg(count(lit(1)).as("_cnt"))
      .withColumn("_w", wCol)
      .filter(col("_w") > 0)
    mixFromCounts(weighted, idCol, counts)
  }

  /** Temperature-flattened mixture (the multilingual-LM α-sampling move:
    * sample domains ∝ count^α, α ∈ (0, 1]): small domains are boosted
    * relative to their natural share, big ones downsampled. Identical
    * machinery to [[domainMix]] with the target weight DERIVED from the
    * observed count — w_d = cnt_d^α, so scale = min_d(cnt_d^(1−α)) and
    * the SMALLEST domain binds (kept whole); α = 1 is the identity (every
    * domain binds), α → 0 approaches a uniform mixture.
    *
    * α = 0.5 computes through `sqrt`, which IEEE-754 requires to be
    * correctly rounded — bit-identical in every engine, so that instance
    * is oracle-gated. Other α go through libm `pow` (1-ulp
    * cross-engine wobble possible at cutoff boundaries): spec-gate those,
    * don't oracle-hash them. */
  def temperatureMix(df: DataFrame, idCol: String, domainCol: Column,
      alpha: Double): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, s"alpha must be in (0, 1], got $alpha")
    val weighted = df.withColumn("domain", domainCol)
    val wExpr =
      if (alpha == 0.5) sqrt(col("_cnt").cast("double"))
      else if (alpha == 1.0) col("_cnt").cast("double")
      else pow(col("_cnt").cast("double"), lit(alpha))
    val counts = weighted.groupBy("domain").agg(count(lit(1)).as("_cnt"))
      .withColumn("_w", wExpr)
    mixFromCounts(weighted, idCol, counts)
  }

  /** Shared mixture tail: counts(domain, _cnt, _w>0) → per-domain cutoffs
    * → content-addressed membership. One bounded-key count shuffle, a
    * few-row cutoff frame broadcast back over the corpus. */
  private def mixFromCounts(weighted: DataFrame, idCol: String,
      counts: DataFrame): DataFrame = {
    val scale = counts.agg(min(col("_cnt") / col("_w")).as("_scale"))
    // The binding domain (argmin of cnt/w) is identified EXPLICITLY and
    // forced to cutoff 256: recomputing its keep fraction as
    // (min(cnt/w))·w/cnt can land a hair under 1.0 in doubles, flooring
    // to cutoff 255 and shedding ~0.4% of the domain the contract says
    // is kept whole. The equality test is exact — min() returns one of
    // the cnt/w values, and this row recomputes the identical double op.
    val cutoffs = counts.crossJoin(broadcast(scale))
      .withColumn("_keep_frac", col("_scale") * col("_w") / col("_cnt"))
      .withColumn("cutoff",
        when(col("_cnt") / col("_w") === col("_scale"), lit(256))
          .otherwise(
            greatest(lit(1), least(lit(256), floor(col("_keep_frac") * 256))))
          .cast("int"))
      .select("domain", "cutoff")
    weighted.join(broadcast(cutoffs), Seq("domain"))
      .filter(col("cutoff") === 256 ||
        substring(md5(col(idCol).cast("string")), 1, 2) <
          format_string("%02x", col("cutoff")))
      .select(col(idCol), col("domain"), col("cutoff"))
  }

  /** Deterministic train/val/test split assignment: every row gets
    * exactly one split label, a pure function of md5(id) — the same
    * content-addressed contract as the samplers (rerun-, engine- and
    * layout-independent, so a document NEVER migrates between train and
    * eval across pipeline reruns, the property that makes eval splits
    * trustworthy). `head` lists the leading splits with their fractions
    * (quantized to 1/65536 via 4-hex-char cutoffs — fine enough for
    * 0.01% eval slices); everything above the last cutoff falls into
    * `rest`. Cutoffs are cumulative, so splits are disjoint and
    * exhaustive by construction. */
  def assignSplits(df: DataFrame, idCol: String,
      head: Seq[(String, Double)], rest: String): DataFrame = {
    require(head.nonEmpty, "need at least one leading split")
    require(head.forall(_._2 > 0.0), "split fractions must be positive")
    require(head.map(_._2).sum < 1.0, "leading fractions must sum below 1")
    val cuts = head.scanLeft(0L) { case (acc, (_, f)) =>
      acc + math.max(1L, math.round(f * 65536)) }.tail
    require(cuts.last <= 65536, "cumulative cutoffs overflow the hash range")
    val hx = substring(md5(col(idCol).cast("string")), 1, 4)
    val split = head.map(_._1).zip(cuts).reverse
      .foldLeft(lit(rest)) { case (acc, (name, cut)) =>
        when(hx < lit(f"$cut%04x"), lit(name)).otherwise(acc)
      }
    df.withColumn("split", split)
  }

  /** Uniform k-per-group sampling (the "keep exactly k docs per stratum"
    * move — per-domain eval slices, debugging samples, labeling batches):
    * the k members with the SMALLEST content hash win, so membership is
    * deterministic, content-addressed, and rerun/engine-independent like
    * everything in this file.
    *
    * Scale shape: this is top-k by hash per group, so it runs on the
    * bounded-heap TopKAgg (map-side partial aggregation, O(k) state per
    * group, shuffle volume O(partitions × k)) — NOT a
    * `row_number().over(partitionBy(group))` window, which would shuffle
    * and fully sort every row of a group into one task. The score is the
    * NEGATED first 48 md5 bits (exact in a double), ties → smaller id;
    * the oracle mirrors exactly that ordering. Returns (id, group, rk)
    * with rk = 1..k in hash order. */
  def uniformKPerGroup(df: DataFrame, idCol: String, groupCol: Column,
      kPer: Int): DataFrame = {
    require(kPer > 0, s"kPer must be positive, got $kPer")
    val topk = graft.functions.TopK.topK(kPer)
    val score =
      -conv(substring(md5(col(idCol).cast("string")), 1, 12), 16, 10)
        .cast("double")
    df.select(groupCol.as("grp"), score.as("_s"),
        col(idCol).cast("long").as("_id"))
      .groupBy("grp").agg(topk(col("_s"), col("_id")).as("_top"))
      .select(col("grp"), posexplode(col("_top.items")))
      .select(col("col.id").as(idCol), col("grp"),
        (col("pos") + 1).cast("long").as("rk"))
  }

  /** Token-budget corpus selection: per domain, rank documents by
    * (score desc, id asc) and keep them while the running token total
    * stays ≤ `budget` — "take the best N tokens per domain", the selection
    * move that turns a scored corpus into a fixed-size training mix.
    * Returns every input row with a `selected` 0/1 flag (the kept corpus
    * is `filter(selected = 1)`); semantics are exactly the flat
    * per-domain window `sum(tok) OVER (ORDER BY score DESC, id) ≤ budget`.
    *
    * Scale shape: the flat window is how the ORACLE states the semantics,
    * not how this runs — a per-domain global sort serializes each domain
    * through one reducer. Instead: (1) aggregate token mass per
    * (domain, score) bucket — scores are 4-dp-quantized, so this frame is
    * tiny; (2) one window over the BUCKET frame finds each domain's
    * fully-kept prefix and its single boundary bucket; (3) only boundary-
    * bucket documents (one score value per domain) are ranked by id to
    * split the remaining budget. The corpus-sized frames are touched by
    * one groupBy and one broadcast-joined filter — no per-domain sort of
    * the full data. */
  def tokenBudgetSelect(docs: DataFrame, idCol: String, domainCol: Column,
      tokCol: Column, scoreCol: Column, budget: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(budget >= 0, s"budget must be non-negative, got $budget")
    val base = docs.select(col(idCol).as("doc_id"), domainCol.as("domain"),
      tokCol.cast("long").as("n_tok"), scoreCol.cast("double").as("score"))
    val buckets = base.groupBy("domain", "score")
      .agg(sum("n_tok").as("_btok"))
    val wb = Window.partitionBy("domain").orderBy(col("score").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // _prev ≤ budget < _cum isolates exactly one boundary bucket per
    // domain (the running total is monotone); _prev uses ≤ so a bucket
    // starting exactly at the budget is still examined doc-by-doc
    val marked = buckets
      .withColumn("_cum", sum("_btok").over(wb))
      .withColumn("_prev", col("_cum") - col("_btok"))
      .select(col("domain"), col("score"),
        (col("_cum") <= budget).as("_whole"),
        (col("_cum") > budget && col("_prev") <= budget).as("_boundary"),
        col("_prev"))
    val joined = base.join(broadcast(marked), Seq("domain", "score"))
    val nonBoundary = joined.filter(!col("_boundary"))
      .withColumn("selected", col("_whole").cast("long"))
    val wd = Window.partitionBy("domain", "score").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val boundary = joined.filter(col("_boundary"))
      .withColumn("selected",
        (col("_prev") + sum("n_tok").over(wd) <= budget).cast("long"))
    nonBoundary.unionByName(boundary)
      .select("doc_id", "domain", "n_tok", "score", "selected")
  }

  /** DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
    * public method): score every raw document by how much more likely its
    * hashed n-gram features are under the TARGET distribution (the
    * high-quality subset you want more of) than under the raw pool, then
    * resample the corpus proportionally to exp(log_weight). This is the
    * "make the crawl look like Wikipedia" selection move. Features are
    * unigrams + word bigrams, bucketed by the first `hexChars` hex chars
    * of their md5 (16^hexChars buckets) — the feature hashing of the
    * paper, here content-addressed so every engine agrees on the bucket.
    *
    * Per-bucket log ratio λ_b = ln( ((tc_b+1)/(tt+B)) / ((rc_b+1)/(rt+B)) )
    * (add-1 smoothing over the B-bucket space on both distributions),
    * floor-truncated to 4 dp at MODEL BUILD time — once per bucket — and
    * summed per doc as exact DECIMAL, the LmScore parity discipline.
    * Returns (id, n_feat, log_weight) for docs with ≥1 token.
    *
    * Scale shapes: one corpus tokenize staged (feeds both distributions
    * AND scoring); bucket counts are B-bounded aggregations with map-side
    * combine; the λ table is B rows — broadcast back onto the staged
    * feature frame; final per-doc sum shuffles on doc id. No corpus-sized
    * key ever shuffles twice. */
  def dsirLogWeights(docs: DataFrame, textCol: String, idCol: String,
      target: Column, hexChars: Int = 2): DataFrame = {
    require(hexChars >= 1 && hexChars <= 8, "hexChars must be in [1, 8]")
    val buckets = 1L << (4 * hexChars)
    val feats = docs
      .select(col(idCol).as("id"), target.as("_target"),
        filter(split(col(textCol), " "), w => length(w) > 0).as("_w"))
      .filter(size(col("_w")) > 0)
      .select(col("id"), col("_target"),
        explode(concat(col("_w"), expr(
          """CASE WHEN size(_w) < 2 THEN array()
             ELSE transform(sequence(1, size(_w) - 1),
                  i -> concat_ws(' ', element_at(_w, i),
                                 element_at(_w, i + 1))) END"""))).as("f"))
      .select(col("id"), col("_target"),
        substring(md5(col("f")), 1, hexChars).as("b"))
      .staged
    val raw = feats.groupBy("b").agg(count(lit(1)).as("rc"))
    val tgt = feats.filter(col("_target"))
      .groupBy("b").agg(count(lit(1)).as("tc"))
    val totals = raw.agg(sum("rc").as("rt"))
      .crossJoin(tgt.agg(coalesce(sum("tc"), lit(0L)).as("tt")))
    val lambda = raw.join(tgt, Seq("b"), "left")
      .crossJoin(broadcast(totals))
      .select(col("b"),
        (floor(log(((coalesce(col("tc"), lit(0L)) + 1.0) / (col("tt") + buckets))
          / ((col("rc") + 1.0) / (col("rt") + buckets))) * 10000.0) / 10000.0)
          .cast("decimal(18,4)").as("lam"))
    feats.join(broadcast(lambda), Seq("b"))
      .groupBy("id")
      .agg(count(lit(1)).as("n_feat"),
        sum("lam").cast("double").as("log_weight"))
  }

  /** DSIR selection: flag the documents whose importance weight reaches
    * the exact q-quantile of the corpus weight distribution (keep-top-
    * (1−q) selection — the deterministic thresholding variant of the
    * paper's resampling step; same selected set on every rerun and in
    * every engine, which is what a reproducible data recipe needs).
    *
    * The threshold is the DISCRETE percentile of [[dsirLogWeights]]'s
    * output — a real corpus value, computed with the shared two-phase
    * prefix sum over the (distinct weight, count) frame, so no global
    * sort and no partition-less window ever touch a docs-sized frame.
    * Returns every scored doc with `selected` ∈ {0, 1}. */
  def dsirSelect(docs: DataFrame, textCol: String, idCol: String,
      target: Column, q: Double = 0.5, hexChars: Int = 2): DataFrame = {
    require(q > 0.0 && q < 1.0, s"quantile must be in (0, 1), got $q")
    val weights = dsirLogWeights(docs, textCol, idCol, target, hexChars).staged
    val counts = weights.groupBy("log_weight").agg(count(lit(1)).as("cnt"))
    val cum = PrefixSum.runningTotal(counts, Seq.empty,
      Seq("log_weight"), "cnt", "cum").staged
    val total = cum.agg(max("cum").as("n"))
    val thr = cum.crossJoin(broadcast(total))
      .filter(col("cum") >= ceil(lit(q) * col("n")))
      .agg(min("log_weight").as("_thr"))
    weights.crossJoin(broadcast(thr))
      .withColumn("selected", (col("log_weight") >= col("_thr")).cast("long"))
      .select("id", "n_feat", "log_weight", "selected")
  }

  /** Weighted reservoir sampling without replacement (Efraimidis–Spirakis
    * A-Res), exact and engine-portable. A-Res draws u ~ U(0,1) per row and
    * keeps the k largest priorities u^(1/w). Computing u^(1/w) in floating
    * point would tie the sample to each engine's `pow`/`ln` rounding — a
    * one-ulp difference at the k-th boundary changes the selected SET, so
    * the oracle could never verify membership bit-for-bit. Instead we use
    * the distributional identity  max(u_1..u_w) ~ U^(1/w)  for integer w:
    * each row gets w deterministic md5 "tickets" (hex strings — uniform
    * under lexicographic order) and its priority is the LARGEST ticket.
    * Selection = global top-k by (priority desc, id asc) — pure string
    * comparison, identical in every engine, no transcendental math.
    *
    * Scale shape: tickets are built per-row inside one projection
    * (sequence → transform → array_max — no explode, no shuffle), and the
    * top-k is orderBy+limit, which Spark plans as TakeOrderedAndProject:
    * each partition reduces to its local k rows and only k·partitions
    * rows reach the driver — no global sort. `weightCol` must be an
    * integer column; callers clamp it to a small range (the ticket count
    * per row is the weight, so w ≤ ~100 keeps the projection linear).
    *
    * Output: (id-named, weight, priority), the k selected rows. */
  def weightedSample(df: DataFrame, idCol: String, weightCol: Column,
      k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val withW = df.select(col(idCol), weightCol.cast("long").as("weight"))
    val priority = array_max(transform(
      sequence(lit(1L), col("weight")),
      i => md5(concat(i.cast("string"), lit("|"), col(idCol).cast("string")))))
    withW
      .withColumn("priority", priority)
      .orderBy(col("priority").desc, col(idCol))
      .limit(k)
  }
}
