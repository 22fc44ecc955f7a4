package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.core.Materialize.StageSyntax

/** In-engine TRAINED classifier: an integer-weight batch perceptron over
  * hashed bag-of-words features (the fastText-style linear filter family —
  * the quality/language gate a training-data pipeline trains on a labeled
  * slice and then applies to the whole corpus). Complements the untrained
  * scorers (x_langid_ngram heuristic, x_nb_classify's closed-form counts):
  * this one has a real iterative training loop, expressed as DataFrame
  * algebra end-to-end.
  *
  * Engine-exactness: features are binary presence of md5-hashed token
  * buckets (hex-char arithmetic portable to any SQL engine — the
  * [[Sharding]] instr() discipline); weights are BIGINT; the update is the
  * classic perceptron full-batch rule w += Σ_misclassified y·x with no
  * learning-rate float anywhere. A fixed epoch count unrolls to a CTE
  * chain, so the whole trained model — not just its predictions — is
  * hash-verifiable against a SQL oracle.
  *
  * Deterministic by construction: the full-batch gradient is an
  * order-independent integer SUM (unlike the classic per-row SGD
  * perceptron, whose result depends on visit order — meaningless on a
  * shuffled cluster). Every epoch is the same answer on any partitioning,
  * any parallelism, any engine.
  *
  * Scale shape: one epoch = one broadcast join of the (≤ dims)-row weight
  * table against the feature frame + two keyed aggregations (per-doc
  * margin, per-bucket gradient) — shuffle volume bounded by corpus
  * features, never weights × corpus. The feature frame is staged once and
  * reused by every epoch; weight frames are staged per epoch to keep the
  * loop's plan depth constant ([[graft.core.Materialize]]). Driver holds
  * nothing — weights live as a DataFrame and broadcast to executors.
  */
object Classify {

  /** Feature bucket of a token: first md5 BYTE mod `dims`. Spark states
    * it as conv(hex, 16, 10) on a Column (composable inside higher-order
    * lambdas — the serving path's map-only scorer needs that); the oracle
    * restates the identical integer with instr() hex-char arithmetic
    * (DuckDB has no conv) — both are "value of the first hex byte", so
    * the bucket is engine-exact. `dims` ≤ 256 (one byte); widen the
    * substring to two bytes before raising it. */
  def bucketOf(token: Column, dims: Int): Column = {
    require(dims > 0 && dims <= 256, s"dims must be in [1, 256], got $dims")
    conv(substring(md5(token), 1, 2), 16, 10).cast("long") % dims
  }

  /** Binary hashed bag-of-words: one (doc_id, y, bucket) row per DISTINCT
    * feature per document. Collisions are the hashing-trick's contract,
    * identical on both engines. */
  def hashedFeatures(docs: DataFrame, idCol: String, textCol: String,
      label: Column, dims: Int): DataFrame =
    docs
      .select(col(idCol).cast("long").as("doc_id"), label.cast("long").as("y"),
        explode(split(col(textCol), " ")).as("word"))
      .filter(length(col("word")) > 0)
      .select(col("doc_id"), col("y"), bucketOf(col("word"), dims).as("bucket"))
      .distinct()

  /** The map-only serving scorer: the whole per-document margin as ONE
    * row-local expression — tokenize, bucket, dedup, fold the frozen
    * weight MAP — no explode, no shuffle, no state. This is the form the
    * trained filter deploys in (batch corpus sweep or streaming
    * micro-batches): weights arrive as literals, so the plan is a pure
    * projection that scales with input bytes only. */
  def mapOnlyScore(textCol: Column, weightMap: Column, dims: Int): Column = {
    val toks = filter(split(textCol, " "), t => length(t) > lit(0))
    val bkts = array_distinct(transform(toks, t => bucketOf(t, dims)))
    aggregate(bkts, lit(0L),
      (acc, b) => acc + coalesce(element_at(weightMap, b), lit(0L)))
  }

  /** Misclassified docs under the current weights: margin per doc (a
    * missing bucket weighs 0), kept where y·s ≤ 0 — note a zero margin
    * counts as wrong, which is what makes the all-zero initial model
    * update on every doc in epoch 1. */
  private def misclassified(f: DataFrame, w: DataFrame): DataFrame =
    f.join(broadcast(w), Seq("bucket"), "left")
      .groupBy("doc_id", "y").agg(sum(coalesce(col("w"), lit(0L))).as("s"))
      .filter(col("y") * col("s") <= 0L)
      .select("doc_id")

  /** Gradient + update for one full-batch epoch: per-bucket Σy over the
    * misclassified docs' features, weights += gradient. */
  private def updateStep(f: DataFrame, w: DataFrame,
      mis: DataFrame): DataFrame = {
    val g = f.join(mis, Seq("doc_id"))
      .groupBy("bucket").agg(sum(col("y")).as("g"))
    w.join(g, Seq("bucket"), "full")
      .select(col("bucket"),
        (coalesce(col("w"), lit(0L)) + coalesce(col("g"), lit(0L))).as("w"))
  }

  private def epochStep(f: DataFrame, w: DataFrame): DataFrame =
    updateStep(f, w, misclassified(f, w))

  private def zeroModel(f: DataFrame): DataFrame = {
    val s = f.sparkSession
    import s.implicits._
    Seq.empty[(Long, Long)].toDF("bucket", "w")
  }

  /** Train `epochs` full-batch rounds from the zero model. Returns the
    * weight table (bucket, w) — ≤ dims rows. */
  def perceptronTrain(features: DataFrame, epochs: Int): DataFrame = {
    require(epochs >= 1, s"epochs must be positive, got $epochs")
    val f = features.staged
    var w = zeroModel(f)
    for (_ <- 1 to epochs) w = epochStep(f, w).staged
    w
  }

  /** Train with EARLY STOP: before each update, check whether the current
    * model already classifies every doc correctly — a zero-misclassified
    * epoch means every further epoch is the identity (empty gradient), so
    * the model is FROZEN and training ends. Returns (weights, epochs
    * actually run). Equivalent to perceptronTrain(f, maxEpochs) in the
    * MODEL (frozen means converged), cheaper when the corpus separates
    * early; the per-epoch convergence probe is one isEmpty on the staged
    * misclassified frame (bounded driver cost). epochs-run ≤ maxEpochs is
    * the quality signal a training pipeline logs. */
  def perceptronTrainConverged(features: DataFrame,
      maxEpochs: Int): (DataFrame, Int) = {
    require(maxEpochs >= 1, s"maxEpochs must be positive, got $maxEpochs")
    val f = features.staged
    var w = zeroModel(f)
    var e = 0
    var frozen = false
    while (e < maxEpochs && !frozen) {
      val mis = misclassified(f, w).staged
      if (mis.isEmpty) frozen = true
      else { w = updateStep(f, w, mis).staged; e += 1 }
    }
    (w, e)
  }

  /** Score a feature frame under a (frozen) weight table: per-doc integer
    * margin, sign prediction (zero margin → −1, the epochStep convention),
    * and a correctness flag against the carried label. */
  def score(features: DataFrame, weights: DataFrame): DataFrame =
    features.join(broadcast(weights), Seq("bucket"), "left")
      .groupBy("doc_id", "y")
      .agg(sum(coalesce(col("w"), lit(0L))).as("score"))
      .withColumn("pred", when(col("score") > 0L, 1L).otherwise(-1L))
      .withColumn("correct", (col("pred") === col("y")).cast("long"))
}
