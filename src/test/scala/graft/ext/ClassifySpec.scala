package graft.ext

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Batch perceptron: epoch-1 closed form, real learning on a separable
  * corpus (the power check the shared-vocabulary fixture can't provide),
  * full-batch order-independence, and map-only-scorer ≡ join-scorer. */
class ClassifySpec extends SparkTestBase {
  import spark.implicits._

  private val pos = Seq("alpha beta", "alpha gamma", "beta gamma alpha")
  private val neg = Seq("delta epsilon", "delta zeta", "epsilon zeta delta")
  private def corpus = (pos.map((_, 1L)) ++ neg.map((_, -1L))).zipWithIndex
    .map { case ((t, y), i) => (i.toLong, t, y) }
    .toDF("doc_id", "text", "y")

  private def feats = Classify.hashedFeatures(corpus, "doc_id", "text",
    col("y"), dims = 32)

  test("epoch 1 from the zero model is the per-bucket label sum") {
    val w1 = Classify.perceptronTrain(feats, epochs = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expect = feats.groupBy("bucket").agg(sum("y").as("e"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(w1 == expect)
  }

  test("a separable corpus is learned to accuracy 1.0 within 3 epochs") {
    val w = Classify.perceptronTrain(feats, epochs = 3)
    val acc = Classify.score(feats, w)
      .agg(avg(col("correct"))).collect()(0).getDouble(0)
    assert(acc == 1.0, s"separable corpus not learned: accuracy $acc")
  }

  test("early stop freezes on the first zero-misclassified epoch and the " +
      "frozen model equals the fixed-epoch model") {
    val (w, e) = Classify.perceptronTrainConverged(feats, maxEpochs = 10)
    assert(e < 10, s"separable corpus should converge before the cap, ran $e")
    val acc = Classify.score(feats, w)
      .agg(avg(col("correct"))).collect()(0).getDouble(0)
    assert(acc == 1.0, s"converged model must classify perfectly, got $acc")
    // convergence means further epochs are the identity: the frozen model
    // equals the fixed-count trainer run past the convergence point
    val wFixed = Classify.perceptronTrain(feats, epochs = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val wConv = w.collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(wConv == wFixed, "frozen model diverged from the fixed-epoch run")
  }

  test("a non-separating cap reports epochs_run == cap") {
    // cap the separable corpus BELOW its convergence point: the trainer
    // must run exactly cap epochs and report it
    val (_, e1) = Classify.perceptronTrainConverged(feats, maxEpochs = 1)
    assert(e1 == 1)
  }

  test("full-batch updates are partitioning-independent") {
    val w1 = Classify.perceptronTrain(feats.repartition(1), epochs = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val w7 = Classify.perceptronTrain(feats.repartition(7), epochs = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(w1 == w7)
  }

  test("map-only serving scorer equals the join scorer") {
    val w = Classify.perceptronTrain(feats, epochs = 3)
    val wmap = map(w.collect().flatMap(r =>
      Seq(lit(r.getLong(0)), lit(r.getLong(1)))).toIndexedSeq: _*)
    val served = corpus.select(col("doc_id"),
        Classify.mapOnlyScore(col("text"), wmap, dims = 32).as("score"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val joined = Classify.score(feats, w)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(served == joined)
  }

  test("repeated tokens count once: bucket presence is binary") {
    val d = Seq((1L, "alpha alpha alpha", 1L)).toDF("doc_id", "text", "y")
    val f = Classify.hashedFeatures(d, "doc_id", "text", col("y"), dims = 32)
    assert(f.count() == 1L)
    val w = Seq.empty[(Long, Long)].toDF("bucket", "w")
    // score under w1 = labels sum: the tripled token contributes once
    val w1 = Classify.perceptronTrain(f, epochs = 1)
    val sc = Classify.score(f, w1).collect()(0).getLong(2)
    assert(sc == 1L)
    assert(w.count() == 0L)
  }
}
