package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.core.Materialize._

/** Language-model quality scoring for corpus curation (the CCNet recipe,
  * Wenzek et al. 2020 — public method): score every document by its mean
  * per-token surprisal under a language model trained on a trusted corpus,
  * then filter / bucket by the score (high perplexity ⇒ boilerplate,
  * gibberish, wrong-language text; unusually LOW perplexity ⇒ templated
  * spam). Here the model is a per-language unigram LM with add-1 (Laplace)
  * smoothing — the smallest member of the family; the frame shapes are the
  * same ones a KenLM-style n-gram model needs (n-gram counts keyed by
  * context, joined back to the token stream).
  *
  * Scale shapes, in pipeline order:
  *   1. token explode — linear map, no shuffle; done ONCE even when the
  *      same corpus feeds both the model build and the scoring join
  *      ([[scoreAgainstSubset]] materializes the token frame via
  *      localCheckpoint, the same single-scan move as Dedup's verified
  *      pairs);
  *   2. model build: groupBy (lang, word) count — ONE shuffle whose key
  *      cardinality is the vocabulary, not the corpus (map-side partial
  *      aggregation collapses each task's token stream to its local vocab
  *      first), then a tiny per-lang totals aggregate;
  *   3. scoring join on (lang, word): left unhinted — at test scale AQE
  *      converts it to broadcast at runtime; at 100 TB a real vocabulary
  *      (~10⁷ rows) exceeds the broadcast threshold and the right answer
  *      IS the shuffle hash join on a vocab-bounded key;
  *   4. per-document sum — one shuffle on doc id, map-side combined.
  *
  * Oracle parity: per-token surprisal −ln(p) is floor-truncated to 4 dp
  * IMMEDIATELY (ln is computed once per distinct (lang, word), so engine
  * ulp differences can only matter if a model value lands within an ulp of
  * a 1e-4 boundary — measured zero across the corpus), then summed as
  * DECIMAL, which is exact and order-independent — a raw double sum would
  * depend on reduction order and break the hash gate.
  */
object LmScore {

  /** One row per token: (id?, lang, word), split on single spaces with
    * empties dropped — the same tokenizer every oracle in the text family
    * uses (`string_split(text, ' ')` + length filter in DuckDB). */
  def tokens(df: DataFrame, textCol: String, langCol: String,
      idCol: String): DataFrame = {
    val base = if (idCol == null) df.select(col(langCol).as("lang"), col(textCol))
      else df.select(col(idCol).as("id"), col(langCol).as("lang"), col(textCol))
    base.withColumn("word",
        explode(filter(split(col(textCol), " "), w => length(w) > 0)))
      .drop(textCol)
  }

  /** Unigram model from a token frame: one row per (lang, word) with its
    * add-1-smoothed surprisal −ln((cnt+1)/(tot+|V|)) as DECIMAL(18,4),
    * plus per-lang `oov_surprisal` = −ln(1/(tot+|V|)) for words never seen
    * in training (the add-1 mass every unseen word gets). */
  def modelFromTokens(tok: DataFrame): DataFrame = {
    val counts = tok.groupBy("lang", "word").agg(count("*").as("cnt"))
    val totals = counts.groupBy("lang")
      .agg(sum("cnt").as("tot"), count("*").as("vocab"))
    counts.join(totals, Seq("lang"))
      .withColumn("surprisal",
        surprisalOf((col("cnt") + 1).cast("double") / (col("tot") + col("vocab"))))
      .withColumn("oov_surprisal",
        surprisalOf(lit(1.0) / (col("tot") + col("vocab"))))
      .select("lang", "word", "surprisal", "oov_surprisal")
  }

  /** Unigram model over a training corpus (convenience scan wrapper). */
  def unigramModel(train: DataFrame, textCol: String,
      langCol: String): DataFrame =
    modelFromTokens(tokens(train, textCol, langCol, idCol = null))

  /** Score a token frame (id, lang, word) against `model`: returns
    * (id, lang, n_tok, cross_entropy) — mean per-token surprisal in nats,
    * floor-truncated to 4 dp. Out-of-vocabulary tokens take the model's
    * per-lang OOV surprisal; documents whose language has no model rows at
    * all are dropped (no model ⇒ no score — filter upstream). Documents
    * with zero tokens produce no row (nothing to score). */
  def scoreTokens(tok: DataFrame, model: DataFrame): DataFrame = {
    // per-lang OOV default: genuinely tiny (one row per language) —
    // broadcast is ALWAYS right for this side
    val oov = model.groupBy("lang").agg(max("oov_surprisal").as("_oov"))
    tok
      .join(model.select("lang", "word", "surprisal"), Seq("lang", "word"), "left")
      .join(broadcast(oov), Seq("lang"))
      .withColumn("_s", coalesce(col("surprisal"), col("_oov")))
      .groupBy(col("id"), col("lang"))
      .agg(count("*").as("n_tok"), sum("_s").as("_sum"))
      // exact decimal sum → double once, then a single correctly-rounded
      // division + truncation: bit-identical in every IEEE engine
      .withColumn("cross_entropy",
        floor(col("_sum").cast("double") / col("n_tok") * 10000.0) / 10000.0)
      .select(col("id"), col("lang"), col("n_tok"), col("cross_entropy"))
  }

  /** Score each document of `docs` against a model built elsewhere (the
    * CCNet arrangement trains on a trusted reference corpus and scores
    * the crawl — `model` from [[unigramModel]] over a DIFFERENT frame). */
  def scoreDocs(docs: DataFrame, model: DataFrame, textCol: String,
      idCol: String, langCol: String): DataFrame =
    scoreTokens(tokens(docs, textCol, langCol, idCol), model)

  /** One-corpus arrangement: train the model on the `trusted` subset of
    * `docs` and score ALL of `docs` against it (untrusted documents pay
    * OOV surprisal for words the trusted slice never saw — exactly the
    * signal the filter thresholds on). The corpus is tokenized ONCE:
    * the token frame is localCheckpoint'd so the model branch and the
    * scoring branch share one materialized scan instead of re-exploding
    * the corpus per branch. */
  def scoreAgainstSubset(docs: DataFrame, textCol: String, idCol: String,
      langCol: String, trusted: Column): DataFrame = {
    val tok = docs
      .select(col(idCol).as("id"), col(langCol).as("lang"),
        trusted.as("_trusted"), col(textCol))
      .withColumn("word",
        explode(filter(split(col(textCol), " "), w => length(w) > 0)))
      .drop(textCol)
      .staged
    scoreTokens(tok.drop("_trusted"),
      modelFromTokens(tok.filter(col("_trusted")).drop("id", "_trusted")))
  }

  /** Train-on-self scoring: model and scored corpus are the same frame. */
  def selfScore(docs: DataFrame, textCol: String, idCol: String,
      langCol: String): DataFrame =
    scoreAgainstSubset(docs, textCol, idCol, langCol, trusted = lit(true))

  /** Bigram LM with STUPID BACKOFF (Brants et al. 2007, "Large Language
    * Models in Machine Translation" — the public web-scale recipe:
    * unnormalized score S(w|prev) = count(prev,w)/count(prev) when the
    * bigram was seen in training, else alpha * S_unigram(w); document
    * start and unseen-prev tokens score by the add-1 unigram). One step up
    * the n-gram family from [[scoreAgainstSubset]] — same frame shapes a
    * KenLM-style model needs, one order deeper.
    *
    * Scale shapes: the corpus is exploded ONCE into a staged
    * token-with-context frame (id, lang, word, prev) that feeds unigram
    * counts, bigram counts, AND scoring; prev comes from a zip with the
    * 1-shifted token array on the staged row (map-only — no window, no
    * per-position array re-evaluation). Both model shuffles collapse
    * map-side to vocabulary-bounded keys ((lang,word) and
    * (lang,prev,word)); scoring is two vocab-keyed left joins plus one
    * per-lang broadcast, then one doc-keyed sum. Oracle parity discipline
    * matches the unigram model: every surprisal is floor-truncated to
    * 4 dp at MODEL BUILD time (once per distinct model row), summed as
    * DECIMAL. Returns (id, lang, n_tok, cross_entropy). */
  def scoreBigramAgainstSubset(docs: DataFrame, textCol: String,
      idCol: String, langCol: String, trusted: Column,
      alpha: Double = 0.4): DataFrame = {
    // staged words array: the split runs once; the shift/zip below reads
    // materialized arrays (and the staging barrier keeps the HOF pyramid
    // out of CollapseProject's reach — see core.Materialize)
    val words = docs
      .select(col(idCol).as("id"), col(langCol).as("lang"),
        trusted.as("_trusted"),
        filter(split(col(textCol), " "), w => length(w) > 0).as("w"))
      .filter(size(col("w")) > 0)
      .staged
    // (word, prev) pairs via zip with the 1-shifted array; prev is NULL
    // at document start
    val tok = words
      .withColumn("p", concat(array(lit(null).cast("string")),
        slice(col("w"), lit(1), greatest(size(col("w")) - 1, lit(0)))))
      .select(col("id"), col("lang"), col("_trusted"),
        explode(arrays_zip(col("w"), col("p"))).as("t"))
      .select(col("id"), col("lang"), col("_trusted"),
        col("t.w").as("word"), col("t.p").as("prev"))
      .staged
    val train = tok.filter(col("_trusted"))
    val uni = train.groupBy("lang", "word").agg(count("*").as("cnt"))
    val totals = uni.groupBy("lang")
      .agg(sum("cnt").as("tot"), count("*").as("vocab"))
    val uniModel = uni.join(totals, Seq("lang"))
      .select(col("lang"), col("word"),
        surprisalOf((col("cnt") + 1).cast("double") / (col("tot") + col("vocab")))
          .as("s_uni"),
        surprisalOf(lit(alpha) * (col("cnt") + 1) / (col("tot") + col("vocab")))
          .as("s_bo"))
    val langDefaults = totals.select(col("lang"),
      surprisalOf(lit(1.0) / (col("tot") + col("vocab"))).as("oov"),
      surprisalOf(lit(alpha) / (col("tot") + col("vocab"))).as("bo_oov"))
    val bigModel = train.filter(col("prev").isNotNull)
      .groupBy("lang", "prev", "word").agg(count("*").as("bcnt"))
      // denominator = the prev word's TRAINING unigram count (≥ bcnt by
      // construction: every counted bigram's prev is a training token)
      .join(uni.select(col("lang"), col("word").as("prev"),
        col("cnt").as("pcnt")), Seq("lang", "prev"))
      .select(col("lang"), col("prev"), col("word"),
        surprisalOf(col("bcnt").cast("double") / col("pcnt")).as("s_big"))
    tok
      .join(bigModel, Seq("lang", "prev", "word"), "left")
      .join(uniModel, Seq("lang", "word"), "left")
      .join(broadcast(langDefaults), Seq("lang"))
      .withColumn("_s",
        when(col("prev").isNull, coalesce(col("s_uni"), col("oov")))
          .when(col("s_big").isNotNull, col("s_big"))
          .otherwise(coalesce(col("s_bo"), col("bo_oov"))))
      .groupBy(col("id"), col("lang"))
      .agg(count("*").as("n_tok"), sum("_s").as("_sum"))
      .withColumn("cross_entropy",
        floor(col("_sum").cast("double") / col("n_tok") * 10000.0) / 10000.0)
      .select(col("id"), col("lang"), col("n_tok"), col("cross_entropy"))
  }

  /** CCNet's selection step on top of [[scoreAgainstSubset]]: split each
    * language's documents into perplexity TERCILES — `head` (lowest
    * cross-entropy third, the "looks like the trusted corpus" slice
    * CCNet keeps for LM training), `middle`, `tail`. Thresholds are
    * exact discrete per-language percentiles at integer-arithmetic cut
    * ranks (k₁ = ⌈n/3⌉ = (n+2) div 3, k₂ = ⌈2n/3⌉ = (2n+2) div 3 — no
    * float rounding to disagree across engines), computed with the
    * shared two-phase prefix sum over the (lang, score, count) frame:
    * distinct-score-sized, never docs-sized, no partition-less window.
    * Returns (id, lang, cross_entropy, bucket) for every scored doc. */
  def ccnetBuckets(docs: DataFrame, textCol: String, idCol: String,
      langCol: String, trusted: Column): DataFrame = {
    val scores = scoreAgainstSubset(docs, textCol, idCol, langCol, trusted)
      .staged
    val counts = scores.groupBy("lang", "cross_entropy")
      .agg(count(lit(1)).as("cnt"))
    val cum = PrefixSum.runningTotal(counts, Seq("lang"),
      Seq("cross_entropy"), "cnt", "cum").staged
    val totals = cum.groupBy("lang").agg(max("cum").as("n"))
    val thr = cum.join(broadcast(totals), Seq("lang"))
      .groupBy("lang")
      .agg(
        min(when(col("cum") >= expr("(n + 2) div 3"),
          col("cross_entropy"))).as("_t1"),
        min(when(col("cum") >= expr("(2 * n + 2) div 3"),
          col("cross_entropy"))).as("_t2"))
    scores.join(broadcast(thr), Seq("lang"))
      .withColumn("bucket",
        when(col("cross_entropy") <= col("_t1"), "head")
          .when(col("cross_entropy") <= col("_t2"), "middle")
          .otherwise("tail"))
      .select("id", "lang", "cross_entropy", "bucket")
  }

  /** Multinomial Naive Bayes text classifier — the learned quality/domain
    * filter of the GPT-3 / CCNet lineage (there a logistic regression or
    * fastText model; NB is the closed-form member of the same family, so
    * the whole train+predict cycle stays inside declarative Spark with no
    * iterative solver). Trains P(class) and P(word|class) on the `trusted`
    * subset's `labelCol`, then scores EVERY document against every class
    * and returns the argmax:
    * (id, label, pred, n_tok, log_post) — `label` is the document's own
    * class (so accuracy is one aggregation away), `pred` the argmax class,
    * `log_post` the winning unnormalized log-posterior (4-dp DECIMAL sum
    * cast to double).
    *
    * Add-1 smoothing over the GLOBAL training vocabulary + 1 OOV bucket:
    * p(w|c) = (cnt_{c,w}+1)/(tot_c+|V|+1), OOV → 1/(tot_c+|V|+1); priors
    * p(c) = docs_c/docs. Every log is floor-truncated to 4 dp at model
    * build (once per model row), per-doc sums are exact DECIMAL — the
    * file's standard oracle-parity discipline.
    *
    * Scale shapes: tokenize once (staged frame feeds training counts AND
    * scoring); model shuffles are vocabulary-bounded with map-side
    * combine; scoring expands tokens × |classes| via a broadcast of the
    * class list (|classes| is small by construction — languages, quality
    * tiers), joins the model on the vocab-bounded (cls, word) key, and
    * collapses to one row per (doc, class) before the argmax window runs
    * over a docs×|classes| frame — the window never sees token-sized
    * partitions. */
  def classifyNaiveBayes(docs: DataFrame, textCol: String, idCol: String,
      labelCol: String, trusted: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = docs
      .select(col(idCol).as("id"), col(labelCol).as("label"),
        trusted.as("_trusted"),
        filter(split(col(textCol), " "), w => length(w) > 0).as("_w"))
      .filter(size(col("_w")) > 0)
      .staged
    val tok = base.select(col("id"), col("label"), col("_trusted"),
      explode(col("_w")).as("word")).staged
    val train = tok.filter(col("_trusted"))
    val counts = train.groupBy(col("label").as("cls"), col("word"))
      .agg(count("*").as("cnt"))
    val vocab = counts.agg(countDistinct("word").as("_v"))
    val classTotals = counts.groupBy("cls").agg(sum("cnt").as("tot"))
      .crossJoin(broadcast(vocab))
    val model = counts.join(classTotals, Seq("cls"))
      .select(col("cls"), col("word"),
        negSurprisalOf((col("cnt") + 1).cast("double")
          / (col("tot") + col("_v") + 1)).as("lp"))
    val priors = base.filter(col("_trusted"))
      .groupBy(col("label").as("cls")).agg(count("*").as("nd"))
    val classDefaults = classTotals
      .join(priors, Seq("cls"))
      .crossJoin(broadcast(priors.agg(sum("nd").as("_ndt"))))
      .select(col("cls"),
        negSurprisalOf(lit(1.0) / (col("tot") + col("_v") + 1)).as("oov_lp"),
        negSurprisalOf(col("nd").cast("double") / col("_ndt")).as("prior_lp"))
    val scored = tok.select(col("id"), col("label"), col("word"))
      .crossJoin(broadcast(classDefaults.select("cls")))
      .join(model, Seq("cls", "word"), "left")
      .join(broadcast(classDefaults), Seq("cls"))
      .withColumn("_lp", coalesce(col("lp"), col("oov_lp")))
      .groupBy(col("id"), col("label"), col("cls"))
      .agg(count("*").as("_n"), (sum("_lp") + first("prior_lp")).as("_post"))
    val w = Window.partitionBy("id")
      .orderBy(col("_post").desc, col("cls").asc)
    scored
      .withColumn("_rk", row_number().over(w))
      .filter(col("_rk") === 1)
      .select(col("id"), col("label"), col("cls").as("pred"),
        // token count is class-independent; the winning row carries it
        col("_n").cast("long").as("n_tok"),
        col("_post").cast("double").as("log_post"))
  }

  private def surprisalOf(p: Column): Column =
    (floor(-log(p) * 10000.0) / 10000.0).cast("decimal(18,4)")

  /** Log-probability (≤ 0) at the same 4-dp truncation: floor on the
    * NEGATED surprisal keeps the truncation a pure function of the IEEE
    * double exactly like [[surprisalOf]]. */
  private def negSurprisalOf(p: Column): Column =
    (floor(log(p) * 10000.0) / 10000.0).cast("decimal(18,4)")
}
