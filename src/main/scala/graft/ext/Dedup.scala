package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.core.Materialize._

/** Deduplication operators for large-scale training-data pipelines.
  *
  * Scale design: every operator here is shuffle-by-key over bounded-size
  * keys (hash / signature / band), never a cartesian product. Candidate
  * generation (LSH banding, bucket keys) bounds the pairwise verification
  * to within-bucket pairs, which is what makes near-dup detection feasible
  * at 100 TB: the full O(n²) comparison never materializes.
  *
  * Portability: hashes are md5 hex strings (identical across engines) so
  * the DuckDB oracle can verify every stage bit-for-bit. On a production
  * cluster xxhash64 halves the hash cost; the algorithms are unchanged.
  */
object Dedup {

  /** Exact dedup via content hash: one shuffle on md5(text). Keeps the
    * smallest id as the canonical representative. */
  def exactDedup(docs: DataFrame, textCol: String, idCol: String): DataFrame =
    docs.groupBy(md5(col(textCol)).as("content_hash"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("dup_count"))

  /** MinHash signatures from an existing (id, word) token frame — one
    * groupBy over rows already shingled elsewhere, so a pipeline that also
    * needs the tokens for verification pays the shingle explode ONCE.
    * min over the distinct token set equals min over the raw shingle
    * stream, so a deduplicated frame yields identical signatures. */
  def minhashFromTokens(tok: DataFrame, k: Int = 8): DataFrame = {
    val hashes = (0 until k).map(i =>
      min(md5(concat(lit(s"$i|"), col("word")))).as(s"h$i"))
    tok.groupBy(col("id")).agg(hashes.head, hashes.tail: _*)
  }

  /** [[minhashFromTokens]] on the production hash: the i-th function is
    * xxhash64(i, word) — same seeded-family design as the md5 kernel,
    * one-for-one, but each digest is a single 64-bit XXH64 pass instead
    * of a full md5 block schedule, and signatures are 8-byte LONGs
    * instead of 32-char hex strings (4× narrower signature frame, and
    * min() compares longs, not strings). The minhash order is Long's
    * signed total order — any fixed total order over a uniform hash
    * family yields Broder's estimator, so E[agreement] is unchanged.
    *
    * The md5 kernel stays the default because DuckDB can restate it
    * bit-for-bit (the oracle portability note on this object); this
    * kernel is the 100-TB path, gated by flagged-set agreement against
    * the md5 pipeline (x_dedup_pipeline_fast) exactly like the rolling
    * winnowing kernel — hash choice only moves LSH *candidate* recall
    * at the margin; every emitted pair is still exact-Jaccard-verified. */
  def minhashFromTokensFast(tok: DataFrame, k: Int = 8): DataFrame = {
    val hashes = (0 until k).map(i =>
      min(xxhash64(lit(i), col("word"))).as(s"h$i"))
    tok.groupBy(col("id")).agg(hashes.head, hashes.tail: _*)
  }

  /** MinHash signatures over word 3-shingles. k independent hash functions
    * are simulated by seeding md5 with the function index; the minhash is
    * the lexicographic min of the hex digests (a valid uniform min-hash —
    * hex order = byte order). Returns one row per doc with h0..h{k-1}.
    *
    * Deliberately NOT routed through [[shingleTokens]]: signatures don't
    * need set semantics, and explode → groupBy(id) collapses to one row
    * per doc in the map-side partial aggregate — a distinct-first shape
    * would shuffle every (id, shingle) row instead. Pipelines that need
    * the token frame anyway compose [[minhashFromTokens]] over it. */
  def minhashSignatures(docs: DataFrame, textCol: String, idCol: String,
      k: Int = 8): DataFrame = {
    val shingled = docs
      .select(col(idCol), split(col(textCol), " ").as("w"))
      .select(col(idCol), expr(
        "explode(transform(sequence(1, greatest(size(w) - 2, 1)), " +
          "i -> concat_ws(' ', slice(w, i, 3)))) AS s"))
    val hashes = (0 until k).map(i =>
      min(md5(concat(lit(s"$i|"), col("s")))).as(s"h$i"))
    shingled.groupBy(col(idCol)).agg(hashes.head, hashes.tail: _*)
  }

  /** Band keys for a k-wide h0..h{k-1} signature frame: one (id, band)
    * row per band, band = md5(bandIndex | its signature slice). Shared by
    * the within-corpus self-join and the incremental cross-corpus join so
    * the banding scheme is defined exactly once. */
  def bandKeys(signatures: DataFrame, idCol: String, k: Int,
      bands: Int): DataFrame = {
    val rowsPerBand = k / bands
    val bandCols = (0 until bands).map { b =>
      val hs = (b * rowsPerBand until (b + 1) * rowsPerBand).map(i => col(s"h$i"))
      md5(concat_ws("|", (lit(b.toString) +: hs): _*))
    }
    signatures.select(col(idCol), explode(array(bandCols: _*)).as("band"))
  }

  /** LSH banding: split the k-wide signature into `bands` bands of
    * k/bands rows each; docs sharing any band key are candidate pairs.
    * One self-join on the band key — the join key space is the band hash,
    * so skew is bounded by true duplicate-cluster size. */
  def lshCandidatePairs(signatures: DataFrame, idCol: String, k: Int = 8,
      bands: Int = 2): DataFrame = {
    val banded = bandKeys(signatures, idCol, k, bands)
    val a = banded.select(col(idCol).as("doc_a"), col("band"))
    val b = banded.select(col(idCol).as("doc_b"), col("band"))
    a.join(b, Seq("band")).filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b").distinct()
  }

  /** MinHash similarity ESTIMATION over an explicit candidate pair list:
    * est_jaccard = fraction of the k signature positions where the two
    * documents agree — E[est] is the true shingle Jaccard (Broder), so
    * this is the standard cheap scorer between LSH banding and exact
    * verification: two hash-joins against the (already materialized)
    * signature frame, no token explode, no per-pair set intersection.
    * At 100 TB the exact verify pass touches Σ(pair token sets); this
    * touches k integers per pair — run it first and reserve exact
    * Jaccard for pairs whose estimate clears a looser bar.
    * est is an exact multiple of 1/k (k a power of two → exactly
    * representable as double → engine-stable without truncation). */
  def minhashEstimate(signatures: DataFrame, pairs: DataFrame,
      idCol: String, k: Int = 8): DataFrame = {
    val sigA = signatures.select(
      col(idCol).as("doc_a") +: (0 until k).map(i => col(s"h$i").as(s"_a$i")): _*)
    val sigB = signatures.select(
      col(idCol).as("doc_b") +: (0 until k).map(i => col(s"h$i").as(s"_b$i")): _*)
    val matches = (0 until k)
      .map(i => when(col(s"_a$i") === col(s"_b$i"), 1L).otherwise(0L))
      .reduce(_ + _)
    pairs.select("doc_a", "doc_b").distinct()
      .join(sigA, Seq("doc_a"))
      .join(sigB, Seq("doc_b"))
      .withColumn("n_match", matches)
      .withColumn("est_jaccard", col("n_match").cast("double") / k)
      .select("doc_a", "doc_b", "n_match", "est_jaccard")
  }

  /** Exact word-set Jaccard over candidate pairs (n-gram Jaccard with
    * n=1 over word tokens; bucketing keeps the pair count linear).
    * `bucketKey` is any blocking expression (prefix, LSH band, …).
    * Candidate generation goes through PairBuckets.selfPairs, so one
    * pathological bucket (a boilerplate prefix shared corpus-wide) is
    * triangle-salted across tasks instead of serializing O(c²) pairs
    * into one. */
  def jaccardPairs(docs: DataFrame, textCol: String, idCol: String,
      bucketKey: org.apache.spark.sql.Column, threshold: Double): DataFrame =
    jaccardOnPairs(docs, textCol, idCol,
      graft.ops.PairBuckets.selfPairs(docs, idCol, bucketKey)
        .select("doc_a", "doc_b"),
      threshold)

  /** Distinct word n-gram shingles per doc: (id, token) rows where each
    * token is n consecutive words (n=1 → the word set itself). The same
    * shingling the MinHash signatures hash, exposed for exact n-gram
    * Jaccard. */
  def shingleTokens(docs: DataFrame, textCol: String, idCol: String,
      n: Int): DataFrame =
    if (n == 1)
      docs.select(col(idCol).as("id"),
        explode(split(col(textCol), " ")).as("word"))
        .filter(length(col("word")) > 0).distinct()
    else
      docs.select(col(idCol).as("id"), split(col(textCol), " ").as("w"))
        .select(col("id"), expr(
          s"explode(transform(sequence(1, greatest(size(w) - ${n - 1}, 1)), " +
            s"i -> concat_ws(' ', slice(w, i, $n)))) AS word"))
        .distinct()

  /** Exact n-gram Jaccard scored over an EXPLICIT candidate pair list
    * (doc_a, doc_b) — the verification stage of the dedup pipeline, fed by
    * LSH candidates or any blocking scheme. `ngram` = 1 compares word
    * sets; higher n compares word-shingle sets (order-sensitive, the
    * similarity MinHash approximates). Work is linear in
    * Σ(pair token-set sizes): tokens join the pair list by id, never
    * all-pairs. */
  def jaccardOnPairs(docs: DataFrame, textCol: String, idCol: String,
      cand: DataFrame, threshold: Double, ngram: Int = 1): DataFrame =
    // materialize the token frame once: it feeds three plan branches below
    // (sizes + both sides of the intersection join), and without a
    // checkpoint each branch re-runs the dominant shingle explode
    jaccardOnTokens(
      shingleTokens(docs, textCol, idCol, ngram).staged,
      cand, threshold)

  /** Jaccard verification from an existing (id, word) token frame — the
    * core of [[jaccardOnPairs]], exposed so a composed pipeline can feed
    * signatures AND verification from one materialized shingle scan.
    * Pass a checkpointed/persisted frame: `tok` is referenced three times.
    * Duplicate (doc_a, doc_b) candidate rows would multiply the
    * intersection count while sizes stay fixed, inflating jaccard — so
    * candidates are deduplicated here (a no-op Aggregate that the
    * optimizer removes when the caller already ended in distinct()).
    *
    * Shape note (measured, round 10): a packed-array alternative — join
    * candidates to two per-doc sorted token ARRAYS and count
    * array_intersect map-side — moves |A|+|B| strings per candidate where
    * this token-level form moves only |A| narrow rows (the B side
    * hash-joins once, never per pair), and measured 1.6× SLOWER on the
    * prefix-join workload (193k candidates, ~100-shingle docs at sf0.1:
    * 5.8 s vs 3.7 s). Candidate-bound verification wants the smaller
    * per-candidate footprint, so the row form stays. */
  def jaccardOnTokens(tok: DataFrame, cand: DataFrame,
      threshold: Double): DataFrame = {
    val pairs = cand.select("doc_a", "doc_b").distinct()
    val sizes = tok.groupBy("id").agg(count(lit(1)).as("n"))
    val inter = pairs
      .join(tok.select(col("id").as("doc_a"), col("word")), Seq("doc_a"))
      .join(tok.select(col("id").as("doc_b"), col("word")), Seq("doc_b", "word"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.select(col("id").as("doc_a"), col("n").as("na")), Seq("doc_a"))
      .join(sizes.select(col("id").as("doc_b"), col("n").as("nb")), Seq("doc_b"))
      // floor-truncation, not round(): identical on every engine (see
      // TextAnalysis.trunc4)
      .withColumn("jaccard",
        floor(col("inter").cast("double") /
          (col("na") + col("nb") - col("inter")) * 10000.0) / 10000.0)
      .filter(col("jaccard") >= threshold)
      .select("doc_a", "doc_b", "jaccard")
  }

  /** Containment near-dup pairs (Broder 1997's containment coefficient):
    * |A∩B| / min(|A|,|B|) over shingle sets. Detects SUBSET duplicates —
    * a document embedded verbatim inside a longer one — which symmetric
    * Jaccard dilutes below any practical threshold (|A∩B|/|A∪B| shrinks
    * as the host grows). Blocking is the df-capped inverted index (the
    * same recipe as clone detection): a candidate pair must share at
    * least one shingle with document frequency ≤ maxDf, so candidate
    * volume is Σ df² over rare shingles — never all-pairs, and ubiquitous
    * boilerplate shingles are dropped by the cap. One staged shingle scan
    * feeds the index, the sizes, and both sides of the intersection join.
    * Output: (doc_a, doc_b, containment), floor-truncated to 4 dp. */
  /** Exact similarity self-join via prefix filtering (Chaudhuri et al.,
    * "A Primitive Operator for Similarity Joins", ICDE'06; Bayardo et
    * al.'s All-Pairs, WWW'07) — the guaranteed-recall alternative to LSH
    * banding for Jaccard ≥ t. Order every document's shingle set by one
    * canonical corpus-wide rarity order (document frequency asc, shingle
    * asc). If J(A,B) ≥ t then |A∩B| ≥ ⌈t·|A|⌉, so A must share a token
    * with B inside its first |A| − ⌈t·|A|⌉ + 1 rarest tokens — the
    * prefix. Indexing ONLY prefixes makes candidate volume
    * Σ (prefix-df)² over the rarest tokens — self-tuning (a ubiquitous
    * token never enters any prefix once sets are big enough) — with ZERO
    * recall loss, unlike a df-capped index or LSH, where a cap/band
    * choice can drop true pairs. Verification is the shared exact
    * [[jaccardOnTokens]] stage.
    *
    * No global rank is materialized: sorting each doc's own tokens by the
    * (df, shingle) PAIR realizes the same canonical order, so prefixes
    * fall out of a per-row sort_array + slice after one df join — the
    * vocabulary is never sorted through a single task (the
    * "partition-less window" this repo bans).
    *
    * One more All-Pairs refinement cuts candidates before they cost
    * anything: the LENGTH FILTER at candidate generation. J(A,B) ≥ t
    * forces min(|A|,|B|) ≥ t·max(|A|,|B|) (the intersection fits in the
    * smaller set but must cover t of the union), so size-mismatched
    * prefix collisions never reach verification. The comparison carries
    * a −1e−9 slack so a binary-float t·n landing a hair ABOVE the true
    * rational can only ADMIT a doomed candidate, never drop a true pair
    * (same one-sided treatment as the prefix length). */
  def prefixFilterPairs(docs: DataFrame, textCol: String, idCol: String,
      ngram: Int = 3, threshold: Double = 0.6): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0,
      s"threshold must be in (0, 1], got $threshold")
    val tok = shingleTokens(docs, textCol, idCol, ngram).staged
    val dfreq = tok.groupBy("word").agg(count(lit(1)).as("df"))
    val perDoc = tok.join(dfreq, "word")
      .groupBy("id")
      .agg(sort_array(collect_list(struct(col("df"), col("word")))).as("ord"),
        count(lit(1)).as("n"))
    // ceil(n·t) in binary floats can land one ulp ABOVE the true rational
    // (e.g. 0.6·5), which would SHORTEN the prefix and silently lose
    // recall on an unlucky corpus; the one-sided −1e−9 makes any FP error
    // lengthen it instead (a few extra candidates, zero recall risk)
    // NOT staged, although the frame feeds both sides of the self-join
    // below: the duplicated subtree in the un-executed plan text is
    // collapsed at runtime by ReuseExchange (identical exchange subtrees
    // execute once), and both sides keep broadcast-joining off the same
    // built relation. Measured (r16, sf0.1, 3-iter medians): staging this
    // frame REGRESSED the query 6.07 → 8.08 s — the eager
    // materialization pays a corpus-sized block write and replaces the
    // reused broadcast with scans of statistics-less checkpointed blocks.
    val prefixes = perDoc
      .withColumn("p",
        (col("n") - ceil(col("n") * threshold - lit(1e-9)) + lit(1)).cast("int"))
      .select(col("id"), col("n"),
        explode(slice(col("ord"), lit(1), col("p"))).as("pt"))
      .select(col("id"), col("n"), col("pt.word").as("word"))
    val cand = prefixes.as("pa").join(prefixes.as("pb"),
        col("pa.word") === col("pb.word") && col("pa.id") < col("pb.id") &&
          least(col("pa.n"), col("pb.n")).cast("double") >=
            greatest(col("pa.n"), col("pb.n")) * threshold - lit(1e-9))
      .select(col("pa.id").as("doc_a"), col("pb.id").as("doc_b"))
      .distinct()
    jaccardOnTokens(tok, cand, threshold)
  }

  /** Edit-distance near-dup verification over blocked candidate pairs.
    * Blocking is delegated to PairBuckets (prefix key, simhash band, a
    * length bucket — whatever the caller's recall/cost point is); the
    * verify is Spark's BOUNDED levenshtein(l, r, maxDist), which
    * early-exits in O(len·maxDist) instead of O(len²) — the difference
    * between feasible and not when documents are kilobytes. The bounded
    * form returns -1 past the threshold; those pairs are dropped.
    * Output: (doc_a, doc_b, dist) with dist ≤ maxDist, exact. */
  def editDistancePairs(docs: DataFrame, textCol: String, idCol: String,
      bucketKey: org.apache.spark.sql.Column, maxDist: Int): DataFrame = {
    require(maxDist >= 0, s"maxDist must be non-negative, got $maxDist")
    val base = docs.select(col(idCol).as("id"), col(textCol).as("t"))
    val cand = graft.ops.PairBuckets.selfPairs(docs, idCol, bucketKey)
      .select("doc_a", "doc_b").distinct()
    cand
      .join(base.select(col("id").as("doc_a"), col("t").as("ta")), Seq("doc_a"))
      .join(base.select(col("id").as("doc_b"), col("t").as("tb")), Seq("doc_b"))
      .withColumn("dist", levenshtein(col("ta"), col("tb"), maxDist))
      .filter(col("dist") >= 0)
      .select(col("doc_a"), col("doc_b"), col("dist").cast("long").as("dist"))
  }

  /** Entity-resolution fuzzy matching: Jaro-Winkler–verified pairs over
    * blocked candidates — the classic record-linkage shape (block on a
    * cheap deterministic key, verify with an edit-based similarity that
    * tolerates typos/transpositions where exact/Jaccard matching cannot).
    * Blocking is delegated to PairBuckets (triangle-salted hot buckets,
    * loud failure on non-selective keys); the verifier is the native
    * codegen'd [[graft.functions.JaroWinkler]] expression, floor-truncated
    * to 4 dp so the DuckDB oracle (`jaro_winkler_similarity`, the same
    * standard Winkler form) restates scores exactly.
    * Output: (doc_a, doc_b, jw) with jw ≥ threshold.
    *
    * ER is the family where a head-word blocking key is the RIGHT key at
    * small scale (§6g: 94% recall on short Zipf titles) and a quadratic
    * time bomb at corpus scale (the same head block grows ×107.7 at 10×) —
    * so unlike the other PairBuckets callers this one opts into the
    * candidate-budget breaker by default ([[DefaultJwCandidateBudget]]):
    * past the budget the call fails loudly with the block histogram
    * instead of silently running a 10⁹-pair verify. */
  def jaroWinklerPairs(docs: DataFrame, textCol: String, idCol: String,
      bucketKey: org.apache.spark.sql.Column, threshold: Double,
      maxCandidatePairs: Long = DefaultJwCandidateBudget): DataFrame =
    jwVerify(docs, textCol, idCol,
      graft.ops.PairBuckets.selfPairs(docs, idCol, bucketKey,
          maxCandidatePairs = maxCandidatePairs)
        .select("doc_a", "doc_b").distinct(),
      threshold)

  /** Default JW verify budget: ~2×10⁹ candidate pairs ≈ a few core-hours
    * of the native kernel — generous for any sane blocking scheme, loud
    * before a broken one burns a cluster-day. */
  val DefaultJwCandidateBudget: Long = 2000000000L

  /** [[jaroWinklerPairs]] with a COMPOSITE blocking key — §6g's named
    * production-scale control for the head-word block's quadratic growth:
    * two cheap fields must BOTH agree for a pair to become a candidate
    * (name+zip in the classic record-linkage setting), which divides each
    * head block by the second key's selectivity while costing recall only
    * on pairs that disagree on that second field — choose one the match
    * semantics already require (same language, same region, same year).
    * NULLs in either key get a sentinel so they block among themselves
    * rather than vanishing or cross-colliding. */
  def jaroWinklerPairsComposite(docs: DataFrame, textCol: String,
      idCol: String, key1: org.apache.spark.sql.Column,
      key2: org.apache.spark.sql.Column, threshold: Double,
      maxCandidatePairs: Long = DefaultJwCandidateBudget): DataFrame = {
    def part(k: org.apache.spark.sql.Column) =
      coalesce(k.cast("string"), lit("\u0000"))
    jaroWinklerPairs(docs, textCol, idCol,
      concat_ws("\u0001", part(key1), part(key2)), threshold,
      maxCandidatePairs)
  }

  /** [[jaroWinklerPairs]] with the df-capped RARE-TOKEN blocking key: a
    * candidate pair must share at least one word with document frequency
    * ≤ maxDf — the Σ df² bound the containment/clone indexes carry,
    * measured growing ~linearly where first-word blocks grow
    * quadratically (SCALING.md §6g).
    *
    * CHOOSE THE KEY BY STRING LENGTH — this was measured, not assumed
    * (§6g table): on LONG strings (documents), fuzzy matches share rare
    * words essentially always and this key is both linear and
    * high-recall, the same argument the containment family proves. On
    * SHORT Zipf-headed strings (6-word titles), the head words ARE the
    * signal and every rarity-capped or sorted key collapses recall
    * (rare-token 20 %, sorted-neighborhood 63 %, capped char-4-grams
    * 24 % of brute-force pairs vs first-word blocking's 94 %) — there
    * the quadratic-in-theory head key wins, with PairBuckets salting for
    * distribution and a composite schema key (name+zip, not name alone)
    * as the production-scale control. */
  def jaroWinklerPairsRareToken(docs: DataFrame, textCol: String,
      idCol: String, maxDf: Long, threshold: Double): DataFrame = {
    val tok = shingleTokens(docs, textCol, idCol, 1).staged
    val dfreq = tok.groupBy("word").agg(count(lit(1)).as("df"))
    val rare = tok.join(dfreq.filter(col("df") <= maxDf).select("word"),
      Seq("word"))
    jwVerify(docs, textCol, idCol,
      rare.select(col("id").as("doc_a"), col("word"))
        .join(rare.select(col("id").as("doc_b"), col("word")), Seq("word"))
        .filter(col("doc_a") < col("doc_b"))
        .select("doc_a", "doc_b").distinct(),
      threshold)
  }

  /** Shared JW verification: fetch both strings by id (two hash joins —
    * scales, unlike carrying strings through the pair join) and score
    * with the native expression, floor-truncated to 4 dp. */
  /** A-against-REFERENCE fuzzy matching — the SERVING half of entity
    * resolution: each document is matched against a FROZEN reference list
    * (arriving records vs a curated master/entity table), never against
    * the rest of its own batch. Candidates come from the equi-join on the
    * caller's blocking column; the reference side is broadcast BY
    * CONTRACT — a master list is orders of magnitude smaller than the
    * corpus (the same asymmetry the dim-enrichment family leans on,
    * reference analog `RT/app/dwm/OrderWideApp.java:90-199`) — so the
    * corpus side never shuffles and per-row cost is bounded by the
    * hottest reference block. Verification is the native codegen'd
    * [[graft.functions.JaroWinkler]], floor-truncated to 4 dp for exact
    * DuckDB-oracle parity. Because each row's matches depend only on the
    * row and the frozen reference, the streamed union over any batching
    * equals the batch run — st_er_match_stream shares x_er_match's
    * oracle on that argument. Output: (doc_id, ref_id, jw) with
    * jw ≥ threshold; self-matches excluded. */
  def jaroWinklerMatch(docs: DataFrame, reference: DataFrame,
      textCol: String, idCol: String, blockCol: String,
      threshold: Double): DataFrame = {
    require(threshold >= 0.0 && threshold <= 1.0,
      s"threshold must be in [0, 1], got $threshold")
    val spark = docs.sparkSession
    val l = docs.select(col(idCol).as("doc_id"), col(textCol).as("_lt"),
      col(blockCol).as("_blk"))
    val r = reference.select(col(idCol).as("ref_id"), col(textCol).as("_rt"),
      col(blockCol).as("_blk"))
    l.join(broadcast(r), Seq("_blk"))
      .filter(col("doc_id") =!= col("ref_id"))
      .withColumn("jw",
        floor(graft.functions.JaroWinkler
          .jaroWinkler(spark, col("_lt"), col("_rt")) * 10000.0) / 10000.0)
      .filter(col("jw") >= threshold)
      .select("doc_id", "ref_id", "jw")
  }

  private def jwVerify(docs: DataFrame, textCol: String, idCol: String,
      cand: DataFrame, threshold: Double): DataFrame = {
    require(threshold >= 0.0 && threshold <= 1.0,
      s"threshold must be in [0, 1], got $threshold")
    val spark = docs.sparkSession
    val base = docs.select(col(idCol).as("id"), col(textCol).as("t"))
    cand
      .join(base.select(col("id").as("doc_a"), col("t").as("ta")), Seq("doc_a"))
      .join(base.select(col("id").as("doc_b"), col("t").as("tb")), Seq("doc_b"))
      .withColumn("jw",
        floor(graft.functions.JaroWinkler
          .jaroWinkler(spark, col("ta"), col("tb")) * 10000.0) / 10000.0)
      .filter(col("jw") >= threshold)
      .select("doc_a", "doc_b", "jw")
  }

  def containmentPairs(docs: DataFrame, textCol: String, idCol: String,
      ngram: Int = 3, maxDf: Long = 10L,
      threshold: Double = 0.5): DataFrame = {
    val sh = shingleTokens(docs, textCol, idCol, ngram).staged
    // Partition the vocabulary by document frequency ONCE; both halves of
    // the intersection count flow from it. Shingles are distinct per doc
    // (shingleTokens), so |A ∩ B| = |shared rare| + |shared common|.
    val dfreq = sh.groupBy("word").agg(count(lit(1)).as("_df")).staged
    val rare = sh.join(dfreq.filter(col("_df") <= maxDf).select("word"),
      Seq("word"))
    // Common (df > cap) shingles ride the QUADRATIC fan-out frame below
    // (candidate pairs × common shingles per doc), so their join key must
    // be narrow: an injective LONG id from a dictionary, not the ~25-byte
    // shingle string — measured 2× off the suite's largest exchange
    // (SCALING.md §7g follow-up) with identical results (any injective
    // mapping preserves the intersection counts exactly; no hash-collision
    // caveat, unlike xxhash64 ids). The dictionary is the df>cap
    // vocabulary HEAD — Zipf-small relative to the corpus — and ids are
    // (hash-bucket, rank-within-bucket) from a PARTITIONED window, so no
    // partition-less window and no broadcast theta-join appears in a plan
    // PlanSpec pins cartesian-free. The sh⋈dict join replaces the
    // previous sh⋈(df-filter) join one-for-one: zero added shuffle.
    val DictBuckets = 1024L
    val dict = dfreq.filter(col("_df") > maxDf).select("word")
      .withColumn("_b", pmod(xxhash64(col("word")), lit(DictBuckets)))
      .withColumn("_r", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("_b").orderBy("word")).cast("long"))
      .select(col("word"), (col("_r") * DictBuckets + col("_b")).as("wid"))
    // NOT staged, although `common` feeds both sides of the wide
    // intersection join below: the duplicated sh⋈dict work is fed by
    // exchanges ReuseExchange already shares, and an eager
    // materialization of the (id, wid) rows measured a WASH (r16, sf0.1,
    // 9-iter medians: 4.57 s staged vs 4.55 s un-staged) while adding a
    // corpus-sized block write and an executor-loss failure mode.
    val common = sh.join(dict.hint("shuffle_hash"), Seq("word"))
      .select(col("id"), col("wid"))
    // Candidate generation IS the rare-intersection count: the same
    // Σ df² co-occurrence rows that used to feed a distinct() now feed a
    // groupBy count (one shuffle either way), so the expensive wide join
    // below only has to count the COMMON shared shingles — about half the
    // token rows at the default cap on the documents corpus, and exactly
    // the half the candidate join has NOT already enumerated.
    val rareCo = rare.select(col("id").as("doc_a"), col("word"))
      .join(rare.select(col("id").as("doc_b"), col("word"))
        .hint("shuffle_hash"), Seq("word"))
      .filter(col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("rare_inter"))
      .staged
    val sizes = sh.groupBy("id").agg(count(lit(1)).as("n"))
    // shuffle_hash: the probe stream is |cand| × common-shingles-per-doc
    // rows — hash-joining avoids sort-merge's O(n log n) sort of that
    // stream (5-6x on this stage at sf0.1) while staying
    // shuffle-partitioned (no broadcast of corpus-sized state, unlike a
    // broadcast hint)
    val commonInter = rareCo.select("doc_a", "doc_b")
      .join(common.select(col("id").as("doc_a"), col("wid"))
        .hint("shuffle_hash"), Seq("doc_a"))
      .join(common.select(col("id").as("doc_b"), col("wid"))
        .hint("shuffle_hash"), Seq("doc_b", "wid"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("common_inter"))
    rareCo
      // both count frames leave their groupBys partitioned by the pair
      // key; hash-joining them skips sort-merge's per-partition sorts
      .join(commonInter.hint("shuffle_hash"), Seq("doc_a", "doc_b"), "left")
      .withColumn("inter",
        col("rare_inter") + coalesce(col("common_inter"), lit(0L)))
      .join(sizes.select(col("id").as("doc_a"), col("n").as("na")),
        Seq("doc_a"))
      .join(sizes.select(col("id").as("doc_b"), col("n").as("nb")),
        Seq("doc_b"))
      .withColumn("containment",
        floor(col("inter").cast("double") / least(col("na"), col("nb"))
          * 10000.0) / 10000.0)
      .filter(col("containment") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("containment"))
  }

  /** LSH-blocked, Jaccard-verified near-duplicate pairs — MinHash →
    * banding → exact verification, from ONE shingle scan: the 3-shingle
    * token frame is locally checkpointed and feeds both the signatures
    * (via [[minhashFromTokens]]) and the verification joins (via
    * [[jaccardOnTokens]]). The explode over corpus text — the dominant
    * cost of the whole pipeline at scale — runs exactly once per distinct
    * shingle size instead of 3-4 times as uncached plan branches.
    * When `ngram != 3` the verification tokens differ from the signature
    * shingles, costing one extra (also single) scan. */
  def lshVerifiedPairs(docs: DataFrame, textCol: String, idCol: String,
      k: Int = 8, bands: Int = 2, threshold: Double = 0.5,
      ngram: Int = 3, fast: Boolean = false): DataFrame = {
    val tok3 = shingleTokens(docs, textCol, idCol, 3).staged
    val vTok = if (ngram == 3) tok3
      else shingleTokens(docs, textCol, idCol, ngram).staged
    val sig = if (fast) minhashFromTokensFast(tok3, k)
      else minhashFromTokens(tok3, k)
    val cand = lshCandidatePairs(
      sig.withColumnRenamed("id", idCol), idCol, k, bands)
    jaccardOnTokens(vTok, cand, threshold)
  }

  /** The full corpus-dedup pipeline, composed end to end: MinHash
    * signatures → LSH banding (candidate pairs) → exact Jaccard
    * verification (kills LSH false positives) → connected components over
    * verified pairs (transitive closure into duplicate clusters) →
    * canonical keep (cluster label = min doc id). Returns one row per
    * document: its cluster, the cluster size, and whether this document is
    * the cluster's keeper — `filter(is_kept)` IS the deduplicated corpus.
    *
    * Verification defaults to ngram = 3: the MinHash signatures hash
    * 3-word shingles, so LSH recall is a guarantee about SHINGLE Jaccard —
    * verifying with the same similarity keeps candidate generation and the
    * acceptance predicate measuring one thing. Every stage is the scale
    * shape proven individually: bounded-key shuffles, guarded pair
    * buckets, diameter-bounded label propagation. */
  def dedupCorpus(docs: DataFrame, textCol: String, idCol: String,
      k: Int = 8, bands: Int = 2, threshold: Double = 0.5,
      ngram: Int = 3, fast: Boolean = false): DataFrame = {
    val verified = lshVerifiedPairs(docs, textCol, idCol, k, bands,
      threshold, ngram, fast)
    val comps = connectedComponents(docs, idCol, verified)
    val clusterSizes = comps.groupBy("component")
      .agg(count(lit(1)).as("cluster_size"))
    comps.join(clusterSizes, Seq("component"))
      .select(col("id").as("doc_id"), col("component"), col("cluster_size"),
        (col("id") === col("component")).as("is_kept"))
  }

  /** Quality-aware canonical selection: like [[dedupCorpus]], but the
    * cluster keeper is the member with the HIGHEST score (ties → smallest
    * id) instead of the smallest id — production dedup keeps the best
    * copy of a near-dup cluster (longest / highest-quality / freshest),
    * not an arbitrary one. `scoreCol` is any numeric expression over the
    * input columns (e.g. TextAnalysis.qualityScore's `quality`).
    *
    * Scale shape: identical to [[dedupCorpus]] plus one window ranked
    * WITHIN each component — partition key = component, so the sort is
    * bounded by duplicate-cluster size (small by construction), never a
    * global order. */
  def dedupCorpusKeepBest(docs: DataFrame, textCol: String, idCol: String,
      scoreCol: org.apache.spark.sql.Column, k: Int = 8, bands: Int = 2,
      threshold: Double = 0.5, ngram: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val verified = lshVerifiedPairs(docs, textCol, idCol, k, bands,
      threshold, ngram)
    val comps = connectedComponents(docs, idCol, verified)
    val scored = docs.select(col(idCol).cast("long").as("id"),
      scoreCol.cast("double").as("score"))
    val w = Window.partitionBy("component")
      .orderBy(col("score").desc, col("id"))
    comps.join(scored, Seq("id"))
      .withColumn("_rk", row_number().over(w))
      .select(col("id").as("doc_id"), col("component"), col("score"),
        (col("_rk") === 1).cast("long").as("is_kept"))
  }

  /** Precomputed existing-corpus artifacts for incremental dedup: distinct
    * content hashes (`_h`), the 3-shingle token frame (id, word), and band
    * keys (`_old`, band). Built ONCE — each frame is staged — so a stream
    * of incoming shards/micro-batches pays the corpus-side scan a single
    * time, not once per batch. */
  final case class CorpusIndex(hashes: DataFrame, tokens: DataFrame,
      bands: DataFrame, k: Int, nBands: Int, fast: Boolean = false)

  /** Build the frozen corpus-side index for [[incrementalDedupAgainst]].
    * `fast` selects the xxhash64 minhash kernel (§8a) — recorded in the
    * index so every incoming batch bands with the SAME kernel (band keys
    * from different hash families never collide, which would silently
    * zero near-dup recall). */
  def buildCorpusIndex(existing: DataFrame, textCol: String, idCol: String,
      k: Int = 8, bands: Int = 2, fast: Boolean = false): CorpusIndex = {
    val hashes = existing.select(md5(col(textCol)).as("_h")).distinct().staged
    val tokEx = shingleTokens(existing, textCol, idCol, 3).staged
    val sig = if (fast) minhashFromTokensFast(tokEx, k)
      else minhashFromTokens(tokEx, k)
    val bEx = bandKeys(sig, "id", k, bands)
      .select(col("id").as("_old"), col("band")).staged
    CorpusIndex(hashes, tokEx, bEx, k, bands, fast)
  }

  /** Incremental (cross-corpus) dedup: filter an INCOMING batch against an
    * EXISTING corpus without re-deduplicating the corpus — the shape every
    * production pipeline runs when a new crawl shard lands. A new document
    * is dropped if (a) its content hash already exists (`dropped_exact`),
    * or (b) LSH banding pairs it with an existing document and exact
    * shingle Jaccard confirms ≥ `threshold` (`dropped_near`). Returns one
    * row per incoming doc: (id, dropped_exact, dropped_near, is_kept).
    * Ids must be unique ACROSS both frames (they key the shared token
    * join).
    *
    * Scale shape: the existing side is never self-joined — its hashes and
    * band keys join only against the (much smaller) incoming side, and the
    * Jaccard verification token frame is semi-join-pruned to candidate
    * docs first, so the big (id, word) shuffle carries candidate docs
    * only, not the whole corpus. In steady state the per-shard cost is
    * O(shard + matched-corpus-slice), independent of corpus size. */
  def incrementalDedup(existing: DataFrame, incoming: DataFrame,
      textCol: String, idCol: String, k: Int = 8, bands: Int = 2,
      threshold: Double = 0.5, fast: Boolean = false): DataFrame =
    incrementalDedupAgainst(
      buildCorpusIndex(existing, textCol, idCol, k, bands, fast),
      incoming, textCol, idCol, threshold)

  /** [[incrementalDedup]] against a pre-built [[CorpusIndex]] — the
    * streaming shape: the index is frozen before the stream starts and
    * every micro-batch pays only its own (incoming-side) work. Per-batch
    * results are row-independent (each flag depends only on the doc and
    * the frozen corpus), so a streamed union over batches equals the
    * one-shot batch run on the same rows — the property the streaming
    * twin's oracle hash-checks. Intra-stream duplicates (new doc vs new
    * doc) are NOT flagged here; that is the ingest-side exact dedup's job
    * (graft.streaming.IngestDedup). */
  def incrementalDedupAgainst(index: CorpusIndex, incoming: DataFrame,
      textCol: String, idCol: String,
      threshold: Double = 0.5): DataFrame = {
    // (a) exact: content hash seen in the corpus
    val exactDropped = incoming
      .select(col(idCol).as("_eid"), md5(col(textCol)).as("_h"))
      .join(index.hashes, Seq("_h"), "left_semi")
      .select(col("_eid"))
    // (b) near: band keys on both sides, incoming × existing (never
    // existing × existing), then exact 3-shingle Jaccard on candidates
    val tokIn = shingleTokens(incoming, textCol, idCol, 3).staged
    val sigIn = if (index.fast) minhashFromTokensFast(tokIn, index.k)
      else minhashFromTokens(tokIn, index.k)
    val bIn = bandKeys(sigIn, "id", index.k, index.nBands)
      .select(col("id").as("_new"), col("band"))
    val cand = bIn.join(index.bands, Seq("band"))
      .select(col("_new").as("doc_a"), col("_old").as("doc_b")).distinct()
    // verification tokens: union of both sides, pruned to candidate docs
    // (AQE broadcasts the candidate id list when it is small), then staged
    // — jaccardOnTokens reads its token frame three times, and an unstaged
    // frame would re-run the corpus-wide semi-join prune per branch
    val candIds = cand.select(col("doc_a").as("id"))
      .unionByName(cand.select(col("doc_b").as("id"))).distinct()
    val tok = tokIn.unionByName(index.tokens)
      .join(candIds, Seq("id"), "left_semi").staged
    val nearDropped = jaccardOnTokens(tok, cand, threshold)
      .select(col("doc_a").as("_nid")).distinct()
    incoming.select(col(idCol))
      .join(exactDropped.withColumn("_de", lit(1L)),
        col(idCol) === col("_eid"), "left")
      .join(nearDropped.withColumn("_dn", lit(1L)),
        col(idCol) === col("_nid"), "left")
      .select(col(idCol),
        coalesce(col("_de"), lit(0L)).as("dropped_exact"),
        coalesce(col("_dn"), lit(0L)).as("dropped_near"),
        (coalesce(col("_de"), lit(0L)) === 0 &&
          coalesce(col("_dn"), lit(0L)) === 0).cast("long").as("is_kept"))
  }

  /** Connected components over an undirected pair list — the CLUSTERING
    * step of a dedup pipeline. LSH/Jaccard emit PAIRS, but dedup must keep
    * one canonical doc per duplicate CLUSTER: pairs (a,b) and (b,c) must
    * collapse into {a,b,c} even though (a,c) was never emitted. The
    * component label is the minimum reachable id, so the label IS the
    * canonical keeper.
    *
    * Algorithm: min-label propagation (the hash-join Pregel analog used by
    * large-scale dedup pipelines): every iteration each node takes the min
    * of its own label and its neighbors' labels — one shuffle join + one
    * aggregate per round, converging after graph-diameter rounds (near-dup
    * clusters are shallow, so the diameter is small). The driver loop is
    * how iterative graph algorithms on Spark work (GraphX/Pregel do the
    * same under the hood): each round's labels are locally checkpointed so
    * lineage stays flat, and the convergence probe (`isEmpty` on changed
    * labels) is the only driver-side data.
    * Integer-only math — bit-exact in any engine. */
  def connectedComponents(nodes: DataFrame, idCol: String,
      pairs: DataFrame, maxRounds: Int = 64,
      driverEdgeLimit: Long = 1000000L): DataFrame = {
    import org.apache.spark.storage.StorageLevel
    require(maxRounds > 0)
    val edges = pairs
      .select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .unionByName(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)

    // Size-adaptive execution: the VERIFIED pair graph is tiny relative
    // to the corpus even at 100 TB (near-dup edges survive Jaccard, not
    // the whole candidate set), so below `driverEdgeLimit` edges a single
    // driver-side union-find replaces maxRounds× shuffle rounds — the
    // same small-graph shortcut graph libraries take. Long-id graphs
    // only; anything bigger or non-long falls through to distributed
    // min-label propagation below.
    val longIds = pairs.schema("doc_a").dataType ==
      org.apache.spark.sql.types.LongType
    if (longIds && edges.count() <= 2 * driverEdgeLimit) {
      val parent = scala.collection.mutable.HashMap.empty[Long, Long]
      def find(x: Long): Long = {
        var r = x
        while (parent.getOrElse(r, r) != r) r = parent(r)
        var c = x
        while (parent.getOrElse(c, c) != c) { val n = parent(c); parent(c) = r; c = n }
        r
      }
      edges.select("src", "dst").collect().foreach { row =>
        val (a, b) = (find(row.getLong(0)), find(row.getLong(1)))
        if (a != b) { if (a < b) parent(b) = a else parent(a) = b } // min-root union
      }
      edges.unpersist()
      val labels = parent.keys.map(k => (k, find(k))).toSeq
      val spark = nodes.sparkSession
      import spark.implicits._
      val labelDf = labels.toDF("id", "component")
      // singletons (no edge) keep their own id
      return nodes.select(col(idCol).cast("long").as("id"))
        .join(broadcast(labelDf.select(col("id"), col("component"))), Seq("id"), "left")
        .select(col("id"), coalesce(col("component"), col("id")).as("component"))
    }
    // propagation runs ONLY over the pair-connected subgraph: a node with
    // no edge is its own component forever, so the iterated frame is the
    // near-dup subgraph (≪ corpus at scale — most documents pair with
    // nothing), not the full node set. Singletons rejoin at the end.
    //
    // staging (not persist) per round is load-bearing: with `labels`
    // referenced twice per round an un-truncated plan DOUBLES every
    // iteration — see graft.core.Materialize for the full persist-vs-
    // checkpoint rationale and the cluster-scale caveat.
    val paired = edges.select(col("src").as("id")).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    var labels = paired.withColumn("component", col("id"))
      .staged
    var converged = false
    var rounds = 0
    while (!converged) {
      // rounds needed = graph diameter; near-dup clusters are shallow, so
      // a graph that hasn't converged after maxRounds signals a data bug
      // (e.g. a chain of spurious pairs) — fail loudly, don't spin
      rounds += 1
      if (rounds > maxRounds) throw new IllegalStateException(
        s"connectedComponents did not converge within $maxRounds rounds — " +
          "pair-graph diameter is pathological; inspect the pair generator " +
          "or raise maxRounds")
      val nbrMin = edges
        .join(labels.select(col("id").as("src"), col("component")), Seq("src"))
        .groupBy(col("dst").as("id")).agg(min("component").as("nbr"))
      // the convergence flag is computed INSIDE the propagation join (the
      // previous label is right there) and read back from the checkpointed
      // blocks — no separate next⋈labels probe job per round
      val next = labels.join(nbrMin, Seq("id"), "left")
        .select(col("id"),
          least(col("component"), coalesce(col("nbr"), col("component")))
            .as("component"),
          coalesce(col("nbr") < col("component"), lit(false)).as("_changed"))
        .staged
      converged = next.filter(col("_changed")).isEmpty
      labels = next.drop("_changed")
    }
    // release loop-time caches: labels is checkpointed (self-contained),
    // and the lazy singletons branch recomputes paired from the input
    // pair list when materialized — correct, just uncached
    edges.unpersist()
    paired.unpersist()
    val singletons = nodes.select(col(idCol).as("id"))
      .join(paired, Seq("id"), "left_anti")
      .withColumn("component", col("id"))
    labels.unionByName(singletons)
  }

  /** SimHash bit expressions, shared with the DuckDB oracle: bit b of a
    * hex nibble is tested with a plain IN-list of the nibbles having that
    * bit set — portable SQL, no engine-specific bit ops. */
  def simhashBitSql(hashCol: String, bit: Int): String = {
    val nibblePos = bit / 4 + 1          // hex char position (1-based)
    val bitInNibble = bit % 4
    val hexWithBit = "0123456789abcdef".filter(c =>
      (Integer.parseInt(c.toString, 16) & (1 << bitInNibble)) != 0)
      .map(c => s"'$c'").mkString(", ")
    s"CASE WHEN substr($hashCol, $nibblePos, 1) IN ($hexWithBit) THEN 1 ELSE 0 END"
  }

  /** The majority-vote assembly: sum per-bit counts, set bit if ≥ half. */
  def simhashAssembleSql(bits: Int): String =
    (0 until bits).map(b =>
      s"CASE WHEN b$b * 2 >= n THEN ${1L << b} ELSE 0 END").mkString(" + ")

  /** Duplicated-SPAN detection (the ExactSubstr recipe of Lee et al. 2021,
    * "Deduplicating Training Data Makes Language Models Better" — public
    * method): instead of dropping whole near-duplicate documents, find the
    * token positions covered by an n-token run that occurs more than once
    * in the corpus. Returns one row per document:
    * (id, n_tok, n_dup_tok, retained_tok, dup_frac) — `retained_tok` is
    * what survives cutting every duplicated span, the number ExactSubstr
    * actually deletes against.
    *
    * Scale shapes, in pipeline order (the suffix array of the paper is a
    * single-machine construction; the Spark-native equivalent is n-gram
    * hashing, which finds the same ≥ n-token duplicated runs):
    *   1. tokenize once — the staged words frame feeds the gram explode
    *      AND the final per-doc join;
    *   2. per-doc n-gram hashes built doc-locally (one md5 per position,
    *      map-only), then exploded with their start position;
    *   3. duplicate detection: groupBy(gram hash) count — map-side
    *      combined, key cardinality = distinct n-grams, never pairwise;
    *   4. the gram frame joins the duplicated-hash set on the SAME key it
    *      was just aggregated on and collapses per doc to the sorted list
    *      of duplicated start positions — only duplicated rows shuffle
    *      (on real corpora a few % of tokens), never the full token
    *      stream; per-doc state is bounded by the doc's own length, held
    *      on executors;
    *   5. covered-token count = interval union of [s, s+n−1] over the
    *      sorted starts, computed with a doc-local array fold: the j-th
    *      start contributes min(n, next_start − start) and the last
    *      contributes n. No per-position window — the corpus-token-sized
    *      PARTITION BY doc shuffle a windowed-coverage shape would pay is
    *      exactly the scale-killer this shape avoids at 100 TB.
    */
  def duplicatedSpans(docs: DataFrame, textCol: String, idCol: String,
      n: Int = 8): DataFrame = {
    val (words, dupStarts) = spanStarts(docs, textCol, idCol, n)
    val counted = dupStarts.withColumn("n_dup_tok", expr(
      s"""aggregate(transform(sequence(1, size(_starts)),
            j -> CASE WHEN j < size(_starts)
                 THEN least(element_at(_starts, j + 1)
                            - element_at(_starts, j), $n)
                 ELSE $n END),
          0L, (a, x) -> a + CAST(x AS BIGINT))"""))
    words.select(col(idCol), col("n_tok"))
      .join(counted.select(col(idCol), col("n_dup_tok")), Seq(idCol), "left")
      .withColumn("n_dup_tok", coalesce(col("n_dup_tok"), lit(0L)))
      .withColumn("retained_tok", col("n_tok") - col("n_dup_tok"))
      .withColumn("dup_frac", TextAnalysis.trunc4(
        col("n_dup_tok").cast("double") / greatest(col("n_tok"), lit(1L))))
  }

  /** The REMOVAL half of ExactSubstr: rebuild each document with every
    * token covered by a corpus-duplicated n-gram cut out. Returns
    * (id, n_tok, retained_tok, retained) where `retained` is the
    * surviving tokens re-joined with single spaces (ExactSubstr deletes
    * the duplicated bytes; downstream filters typically then drop docs
    * whose retained fraction falls below a threshold).
    *
    * Scale shape: identical to [[duplicatedSpans]] up to the per-doc
    * sorted-starts frame; the cut itself is a doc-local position filter
    * (`exists` over the starts array per position — O(tokens × starts)
    * interpreted work bounded by the doc's own size, zero extra
    * shuffle). Documents with no duplicated span pass through verbatim
    * via the left join's empty-starts default. */
  def cutDuplicatedSpans(docs: DataFrame, textCol: String, idCol: String,
      n: Int = 8): DataFrame = {
    val (words, dupStarts) = spanStarts(docs, textCol, idCol, n)
    words
      .join(dupStarts.select(col(idCol), col("_starts")), Seq(idCol), "left")
      .withColumn("_starts",
        coalesce(col("_starts"), expr("CAST(array() AS ARRAY<INT>)")))
      // sequence(1, 0) counts DOWN ([1, 0]) — the empty-doc guard is
      // load-bearing, not defensive
      .withColumn("_kept", expr(
        s"""CASE WHEN size(_w) = 0 THEN CAST(array() AS ARRAY<INT>)
            ELSE filter(sequence(1, size(_w)),
                 j -> NOT exists(_starts,
                        s -> j >= s AND j <= s + ${n - 1})) END"""))
      .withColumn("retained",
        expr("concat_ws(' ', transform(_kept, j -> element_at(_w, j)))"))
      .withColumn("retained_tok", size(col("_kept")).cast("long"))
      .select(col(idCol), col("n_tok"), col("retained_tok"), col("retained"))
  }

  /** Shared front half of the ExactSubstr pair: the staged token frame
    * (id, _w, n_tok) and, per doc that has any, the SORTED duplicated
    * n-gram start positions (id, _starts). Gram hashing is doc-local;
    * the duplicate test is one vocab-of-ngrams-keyed count; only
    * duplicated starts shuffle back per doc. */
  private def spanStarts(docs: DataFrame, textCol: String, idCol: String,
      n: Int): (DataFrame, DataFrame) = {
    require(n >= 2, "span length must be at least 2 tokens")
    val words = docs.select(col(idCol),
        filter(split(col(textCol), " "), w => length(w) > 0).as("_w"))
      .withColumn("n_tok", size(col("_w")).cast("long"))
      .staged
    val grams = words
      .select(col(idCol), posexplode(expr(
        s"""CASE WHEN size(_w) < $n THEN array()
            ELSE transform(sequence(1, size(_w) - ${n - 1}),
                 i -> md5(concat_ws(' ', slice(_w, i, $n)))) END"""))
        .as(Seq("_p", "h")))
      .select(col(idCol), (col("_p") + 1).as("start"), col("h"))
      .staged
    val dupHashes = grams.groupBy("h").agg(count(lit(1)).as("_c"))
      .filter(col("_c") > 1).select("h")
    val dupStarts = grams.join(dupHashes, Seq("h"))
      .groupBy(col(idCol))
      .agg(sort_array(collect_list(col("start"))).as("_starts"))
    (words, dupStarts)
  }

  /** 16-bit SimHash over word tokens: per-token md5, majority vote per
    * bit. One explode + one groupBy — linear, no pairwise work; docs with
    * equal simhash (or small Hamming distance) are near-dup candidates. */
  def simhash(docs: DataFrame, textCol: String, idCol: String,
      bits: Int = 16): DataFrame = {
    val tok = docs.select(col(idCol),
      explode(split(col(textCol), " ")).as("word"))
      .filter(length(col("word")) > 0)
      .withColumn("hh", md5(col("word")))
    val bitAggs = (0 until bits).map(b =>
      sum(expr(simhashBitSql("hh", b))).as(s"b$b"))
    tok.groupBy(col(idCol))
      .agg(count(lit(1)).as("n"), bitAggs: _*)
      .select(col(idCol),
        expr(simhashAssembleSql(bits)).cast("long").as("simhash"))
  }

  /** [[simhash]] on the production hash: one xxhash64 per token and each
    * sketch bit extracted with `shiftright & 1` — integer bit arithmetic
    * instead of the md5 + 16 hex-substring CASE chains the oracle-parity
    * kernel pays (the third and last md5 hot loop after winnowing §7b and
    * minhash §8a). Same Charikar majority vote, same assembly.
    *
    * Gating (SCALING §8f): at the oracle-parity 16-bit width, pair-set
    * agreement across hash families is margin-dominated noise (a 16-bit
    * sketch at hamming ≤ 1 over 50+-token docs is mostly collisions whose
    * membership is a per-kernel coin flip), so the 16-bit kernel is
    * STRUCTURALLY gated (ExtSpec: assembly bit-exact vs an independent
    * majority-vote re-derivation; exact dups collide at hamming 0). The
    * PRODUCTION width is 64 bits, where the sketch is no longer
    * margin-dominated — x_simhash64_neardup gates that configuration on
    * RECALL against rare-blocked exact-Jaccard ground truth (the §8a
    * minhash recipe), Manku 4×16-bit bands at hamming ≤ 3.
    *
    * Supports bits up to 64: assembly is Column-level shiftleft/OR rather
    * than [[simhashAssembleSql]]'s summed `1L << b` literals (whose bit-63
    * term, Long.MinValue, does not survive a round-trip through the SQL
    * parser as a literal). */
  def simhashFast(docs: DataFrame, textCol: String, idCol: String,
      bits: Int = 16): DataFrame = {
    require(bits >= 1 && bits <= 64, s"simhashFast bits=$bits not in [1,64]")
    val tok = docs.select(col(idCol),
      explode(split(col(textCol), " ")).as("word"))
      .filter(length(col("word")) > 0)
      .withColumn("hh", xxhash64(col("word")))
    val bitAggs = (0 until bits).map(b =>
      sum(expr(s"shiftright(hh, $b) & 1").cast("long")).as(s"b$b"))
    val assembled = (0 until bits).map(b =>
        shiftleft(when(col(s"b$b") * 2 >= col("n"), lit(1L))
          .otherwise(lit(0L)), b))
      .reduce(_ bitwiseOR _)
    tok.groupBy(col(idCol))
      .agg(count(lit(1)).as("n"), bitAggs: _*)
      .select(col(idCol), assembled.as("simhash"))
  }

  /** The production-width sketch on the NATIVE kernel
    * ([[graft.functions.Simhash64]]): one fused per-row loop over the
    * token array — map-only, no explode, no 64-column aggregate, no
    * keyed exchange. Bit-exact vs [[simhashFast]] at bits = 64
    * (ExtSpec pins it), so the banded join and x_simhash64_neardup's
    * recall gate are unchanged; only the plan shape improves. Docs with
    * no non-empty tokens drop (the expression yields NULL there, the
    * aggregate path's groupBy drops them). */
  def simhash64Native(docs: DataFrame, textCol: String, idCol: String): DataFrame = {
    graft.functions.Simhash64.register(docs.sparkSession)
    docs.select(col(idCol),
      expr(s"simhash64(split($textCol, ' '))").as("simhash"))
      .filter(col("simhash").isNotNull)
  }

  /** SimHash near-duplicate pairs — the banded hamming join of Manku,
    * Jain & Sarma (WWW'07, "Detecting Near-Duplicates for Web
    * Crawling"; public method), in its GENERAL block-combination form.
    * Split the `bits`-bit sketch into `nBlocks` near-equal blocks;
    * pigeonhole: ≤ `maxHam` differing bits corrupt ≤ maxHam blocks, so
    * two hashes within the radius agree EXACTLY on all blocks of at
    * least one (nBlocks − maxHam)-sized block combination. Candidates
    * come from C(nBlocks, maxHam) equi-joins on (combo, packed-key) —
    * never an all-pairs scan — and each is verified with one XOR +
    * popcount. Blocking is EXACT at every parameterization (no recall
    * change; the emitted pair set is identical), but candidate mass is
    * not: the key carries (nBlocks − maxHam)/nBlocks of the sketch's
    * bits, so
    *
    *   - nBlocks = maxHam + 1 (the default, and the only shape ≤ r13):
    *     single-block keys. At 64 bits / ham 3 that is a 16-bit
    *     keyspace — saturated once the corpus ≫ 2^16, where buckets
    *     grow linearly and candidate mass quadratically (SCALING §9c's
    *     honest negative: 519k → 48.9M candidates for 50k → 500k docs).
    *   - nBlocks = 6 at 64/ham-3 (WWW'07 §3's production table design,
    *     C(6,3) = 20 key families of ~32 bits): the keyspace outruns any
    *     realistic corpus, buckets stay O(true near-dups + 2^-32
    *     collisions), and candidate mass scales with the corpus, not its
    *     square. 20 families × 1 row each per doc is a 5× bigger explode
    *     than the 4-band shape — the deliberate trade, paid map-side.
    *
    * The same sketch-then-block-then-verify shape as MinHash→LSH→
    * Jaccard, at one 64-bit word per document of state: the cheapest
    * near-dup path when token sets aren't needed. One signature pass
    * (materialized) feeds both join sides and the verification. */
  def simhashNeardupPairs(docs: DataFrame, textCol: String, idCol: String,
      bits: Int = 16, maxHam: Int = 1, fast: Boolean = false,
      nBlocks: Int = 0): DataFrame = {
    val sh = (if (fast && bits == 64) simhash64Native(docs, textCol, idCol)
      else if (fast) simhashFast(docs, textCol, idCol, bits)
      else simhash(docs, textCol, idCol, bits)).staged
    // identical-sketch PRE-COLLAPSE (VERDICT r14 #5): a cluster of equal
    // sketches collides in EVERY key family — §10b measured it as the
    // irreducible candidate residual (687,730 pairs at 500k docs) that
    // salting only spreads and only upstream exact-dedup removed. Fold
    // the defense in: band ONE representative per distinct sketch value
    // (bucket mass collapses from Σ cluster² to Σ distinct-sketches per
    // bucket), emit intra-cluster pairs analytically (equal sketches are
    // hamming-0 by construction — one sketch-keyed equi-join, true
    // output pairs, no banding needed), and expand each verified
    // rep-pair back to the full member cross product (every member
    // shares its rep's sketch, so the hamming is the rep pair's). The
    // emitted pair set is IDENTICAL to banding all members (ExtSpec +
    // SimhashBandProbe pin it); only the candidate mass changes.
    //
    // SINGLETON FAST PATH (VERDICT r15 #5): on a clean corpus the
    // clusters are tiny and the collapse's three expansion joins cost
    // more than the mass they remove (r15 measured x_simhash64_neardup
    // 8.8 → 10.2 s at sf0.1 for a −3.4× win that only matters at 500k).
    // The decision signal is the intra-cluster PAIR MASS Σ c·(c−1)/2 —
    // the exact quantity the collapse deletes from every key family —
    // read from the one aggregation both paths already need: at or below
    // corpus size, direct banding of all members pays at most a
    // corpus-linear candidate surcharge (cheaper than three joins);
    // above it, the quadratic regime has begun and the collapse wins.
    // Both paths emit the IDENTICAL pair set (identical sketches share
    // every block key, so direct banding still surfaces hamming-0
    // pairs; ExtSpec + SimhashBandProbe pin the equality).
    val bySketch = sh.groupBy("simhash")
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("_c")).staged
    val massRow = bySketch
      .agg(sum(col("_c")).as("n"),
        sum(expr("_c * (_c - 1)")).as("m2")).collect()(0)
    val nDocs = if (massRow.isNullAt(0)) 0L else massRow.getLong(0)
    val intraMass = (if (massRow.isNullAt(1)) 0L else massRow.getLong(1)) / 2
    if (intraMass <= nDocs) {
      simhashCandidates(sh, idCol, bits, maxHam, nBlocks)
        .withColumn("hamming",
          bit_count(col("_sa").bitwiseXOR(col("_sb"))).cast("long"))
        .filter(col("hamming") <= maxHam)
        .select(col("doc_a"), col("doc_b"), col("hamming"))
    } else {
      val reps = bySketch.select(col(idCol), col("simhash"))
      val intra = sh.select(col(idCol).as("doc_a"), col("simhash"))
        .join(sh.select(col(idCol).as("doc_b"), col("simhash")),
          Seq("simhash"))
        .filter(col("doc_a") < col("doc_b"))
        .select(col("doc_a"), col("doc_b"), lit(0L).as("hamming"))
      val repPairs = simhashCandidates(reps, idCol, bits, maxHam, nBlocks)
        .withColumn("hamming",
          bit_count(col("_sa").bitwiseXOR(col("_sb"))).cast("long"))
        .filter(col("hamming") <= maxHam)
      val cross = repPairs
        .join(sh.select(col(idCol).as("_ma"), col("simhash").as("_sa")),
          Seq("_sa"))
        .join(sh.select(col(idCol).as("_mb"), col("simhash").as("_sb")),
          Seq("_sb"))
        .select(least(col("_ma"), col("_mb")).as("doc_a"),
          greatest(col("_ma"), col("_mb")).as("doc_b"), col("hamming"))
      intra.unionByName(cross)
    }
  }

  /** The candidate stage of [[simhashNeardupPairs]]: distinct (doc_a,
    * doc_b, _sa, _sb) pairs sharing at least one block-combination key.
    * Factored out so the scale rehearsal (examples.SimhashBandProbe) can
    * measure candidate MASS per parameterization — the quantity the §9c
    * third-decade negative was about — without the verify filter hiding
    * it. `sh` must carry (idCol, simhash). */
  private[graft] def simhashCandidates(sh: DataFrame, idCol: String,
      bits: Int, maxHam: Int, nBlocks: Int): DataFrame = {
    val banded = simhashBandKeys(sh, idCol, bits, maxHam, nBlocks)
    // pair generation through the hot-bucket guard (r14): a cluster of
    // IDENTICAL sketches collides in EVERY key family no matter how wide
    // the keys — SimhashBandProbe measured the rehearsal corpus's
    // identical-sketch clusters dominating candidate mass at 500k docs —
    // so one fat bucket must triangle-salt across tasks exactly like the
    // minhash-LSH path. distinct on bare id pairs BEFORE fetching the
    // sketches back by id (two hash joins) keeps the dedup exchange
    // narrow.
    // scalar bucket key (PairBuckets' hot-bucket guard literalizes the
    // observed hot keys — a struct key cannot literalize; a packed long
    // keeps the 10M+-row candidate exchange narrow)
    val pairs = graft.ops.PairBuckets
      .selfPairs(banded, idCol, col("bks"))
      .select("doc_a", "doc_b").distinct()
    pairs
      .join(sh.select(col(idCol).as("doc_a"), col("simhash").as("_sa")),
        Seq("doc_a"))
      .join(sh.select(col(idCol).as("doc_b"), col("simhash").as("_sb")),
        Seq("doc_b"))
      .select("doc_a", "doc_b", "_sa", "_sb")
  }

  /** The (id, simhash, b, key, bks) banding frame behind
    * [[simhashCandidates]] — one row per document per key family. `bks`
    * is the SCALAR bucket id ((family, key) packed into one long when the
    * widths allow — they do for every practical parameterization — else a
    * string): one narrow column for the pair join instead of a two-column
    * or string key, which halved the candidate exchange in the rehearsal.
    * Exposed package-internal so the rehearsal can histogram bucket sizes
    * (Σ size·(size−1)/2 is the exchange mass the equi-join pays before
    * distinct). */
  private[graft] def simhashBandKeys(sh: DataFrame, idCol: String,
      bits: Int, maxHam: Int, nBlocks: Int): DataFrame = {
    val d = if (nBlocks <= 0) maxHam + 1 else nBlocks
    require(d > maxHam && d <= bits,
      s"nBlocks=$d must exceed maxHam=$maxHam and fit in bits=$bits")
    // near-equal block widths (Manku: f/d bits each, remainder spread)
    val widths = (0 until d).map(i => bits / d + (if (i < bits % d) 1 else 0))
    val offsets = widths.scanLeft(0)(_ + _)
    def blockVal(bi: Int) = {
      val w = widths(bi)
      val v = shiftright(col("simhash"), offsets(bi))
      if (w >= 64) v else v.bitwiseAND(lit((1L << w) - 1))
    }
    // one key family per (d - maxHam)-combination of blocks; each key is
    // the chosen blocks' values packed little-endian into one long
    // (total key bits = bits·(d-maxHam)/d ≤ 64 by construction)
    val combos = (0 until d).combinations(d - maxHam).toSeq
    val maxKeyBits = combos.map(_.map(widths).sum).max
    val famBits = 64 - java.lang.Long.numberOfLeadingZeros(
      math.max(1L, combos.size.toLong - 1L)).toInt
    val packable = maxKeyBits + famBits <= 63
    val keyStructs = combos.zipWithIndex.map { case (blks, ci) =>
      var shift = 0
      val packed = blks.map { bi =>
        val p = shiftleft(blockVal(bi), shift)
        shift += widths(bi)
        p
      }.reduce(_ bitwiseOR _)
      val scalar =
        if (packable)
          (packed.bitwiseOR(lit(ci.toLong << maxKeyBits))).cast("long")
        else concat_ws(":", lit(ci), packed).cast("string")
      struct(lit(ci).as("b"), packed.as("key"), scalar.as("bks"))
    }
    sh.select(col(idCol), col("simhash"),
      explode(array(keyStructs: _*)).as("bk"))
      .select(col(idCol), col("simhash"), col("bk.b"), col("bk.key"),
        col("bk.bks"))
  }

  /** C4-style LINE-level global dedup ("we removed all but one of any
    * [span] occurring more than once in the dataset", Raffel et al. 2020
    * §2.2): every line keeps only its globally FIRST occurrence — ordered
    * by (doc id, position) — and all later occurrences are cut; documents
    * are rebuilt from their surviving lines in order. Catches the
    * boilerplate exact dedup misses (same footer/nav line pasted into
    * thousands of otherwise-distinct pages) without the full span
    * machinery of [[duplicatedSpans]].
    *
    * Scale shape: split is map-side; ONE line-keyed shuffle computes each
    * line's canonical first occurrence (min struct — map-side combinable);
    * the keep-filter is the same join; reassembly is one doc-keyed shuffle
    * with per-doc state bounded by document size. A hot line (site-wide
    * boilerplate on millions of pages) is one heavy aggregation key —
    * map-side partial min reduces it per partition before anything moves,
    * and the join back is AQE-skew-splittable. Never an all-pairs step.
    *
    * Returns (id, text_kept, n_kept, n_dropped); a fully-duplicated doc
    * survives with text_kept = "" so corpus accounting stays total. */
  def lineDedup(docs: DataFrame, textCol: String, idCol: String,
      delim: String = "\n"): DataFrame = {
    val lines = docLines(docs, textCol, idCol, delim)
    val canon = lines
      .groupBy("line")
      .agg(min(struct(col(idCol), col("pos"))).as("first"))
    rebuildKept(
      lines.join(canon, Seq("line"))
        .withColumn("is_first",
          struct(col(idCol), col("pos")) === col("first")),
      idCol, delim)
  }

  private def docLines(docs: DataFrame, textCol: String, idCol: String,
      delim: String): DataFrame =
    docs.select(col(idCol), posexplode(split(col(textCol),
      java.util.regex.Pattern.quote(delim))).as(Seq("pos", "line")))

  /** Rebuild documents from their flagged lines: survivors in order,
    * kept/dropped accounting. Per-doc state bounded by document size. */
  private def rebuildKept(flagged: DataFrame, idCol: String,
      delim: String): DataFrame =
    flagged.groupBy(col(idCol))
      .agg(
        array_join(transform(
          array_sort(collect_list(when(col("is_first"),
            struct(col("pos"), col("line"))))),
          s => s.getField("line")), delim).as("text_kept"),
        sum(when(col("is_first"), 1L).otherwise(0L)).as("n_kept"),
        sum(when(col("is_first"), 0L).otherwise(1L)).as("n_dropped"))

  /** Frozen line index for incremental line dedup: the corpus's distinct
    * lines, staged ONCE before a stream starts (the same frozen-index
    * cadence as [[buildCorpusIndex]] — refresh on the batch side's
    * schedule, not per micro-batch). */
  def buildLineIndex(corpus: DataFrame, textCol: String, idCol: String,
      delim: String = "\n"): DataFrame =
    docLines(corpus, textCol, idCol, delim).select("line").distinct().staged

  /** Fold one processed batch's lines into a line index: after this, every
    * line the batch contained (kept OR cut — it has now "occurred") is
    * known to subsequent [[lineDedupAgainst]] calls. One distinct over the
    * batch's lines plus a staged union with the old index — the same
    * between-batch refresh cost class as rebuilding
    * [[buildCorpusIndex]] on the batch side's schedule, paid per batch
    * here because line identity (unlike MinHash signatures) makes the
    * increment exact. */
  def extendLineIndex(index: DataFrame, batch: DataFrame, textCol: String,
      idCol: String, delim: String = "\n"): DataFrame =
    index
      .union(docLines(batch, textCol, idCol, delim).select("line").distinct())
      .distinct().staged

  /** Incremental line dedup for one incoming shard/micro-batch: a line is
    * cut if it exists in the corpus index OR occurred earlier within this
    * batch (first-wins by (doc id, pos), [[lineDedup]]'s rule). Per-batch
    * cost is the batch's own lines plus one keyed join against the index
    * — independent of corpus document count.
    *
    * Cross-BATCH first-wins is the CALLER's contract, not this
    * function's: a topology that may deliver more than one batch must
    * fold each processed batch's lines back into the index via
    * [[extendLineIndex]] before the next call (the refresh cadence
    * st_line_dedup_stream wires up), otherwise a line kept in batch 1 is
    * kept again in batch 2. With that fold, multi-batch semantics are
    * processing-order first-wins — which coincides with the global
    * (doc id, pos) rule whenever batches arrive in id order, and exactly
    * equals it in the single-batch case. */
  def lineDedupAgainst(index: DataFrame, batch: DataFrame, textCol: String,
      idCol: String, delim: String = "\n"): DataFrame = {
    val lines = docLines(batch, textCol, idCol, delim)
    val canon = lines
      .groupBy("line")
      .agg(min(struct(col(idCol), col("pos"))).as("first"))
    val flagged = lines.join(canon, Seq("line"))
      .join(index.withColumn("_in_corpus", lit(true)), Seq("line"), "left")
      .withColumn("is_first",
        struct(col(idCol), col("pos")) === col("first") &&
          col("_in_corpus").isNull)
    rebuildKept(flagged, idCol, delim)
  }
}
