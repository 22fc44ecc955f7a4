package graft.ext

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Unigram-LM quality scoring (CCNet recipe): smoothing math, OOV
  * fallback, unmodeled-language drop, and the single-scan contract of the
  * one-corpus arrangement. */
class LmScoreSpec extends SparkTestBase {
  import spark.implicits._

  // train corpus: lang "en", tokens a a b → cnt(a)=2, cnt(b)=1,
  // tot=3, vocab=2 → p(a)=3/5, p(b)=2/5, p(oov)=1/5
  private lazy val train = Seq((1L, "en", "a a b")).toDF("doc_id", "lang", "text")
  private lazy val model = LmScore.unigramModel(train, "text", "lang")

  test("unigramModel: add-1 smoothed surprisals, floor-truncated to 4 dp") {
    val m = model.select("word", "surprisal", "oov_surprisal")
      .as[(String, BigDecimal, BigDecimal)].collect()
      .map(r => r._1 -> (r._2.toDouble, r._3.toDouble)).toMap
    assert(m("a")._1 == 0.5108) // -ln(3/5) = 0.51082...
    assert(m("b")._1 == 0.9162) // -ln(2/5) = 0.91629...
    assert(m("a")._2 == 1.6094) // -ln(1/5) = 1.60943...
  }

  test("scoreDocs: in-vocab words use model rows, OOV words the add-1 mass") {
    val docs = Seq((10L, "en", "a b c"), (11L, "en", "a a a a"))
      .toDF("doc_id", "lang", "text")
    val s = LmScore.scoreDocs(docs, model, "text", "doc_id", "lang")
      .select("id", "n_tok", "cross_entropy")
      .as[(Long, Long, Double)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    // (0.5108 + 0.9162 + 1.6094) / 3 = 1.01213... → 1.0121
    assert(s(10L) == (3L, 1.0121))
    assert(s(11L) == (4L, 0.5108)) // all in-vocab, uniform
  }

  test("scoreDocs drops unmodeled languages and zero-token documents") {
    val docs = Seq((20L, "fr", "a b"), (21L, "en", "   "), (22L, "en", "b"))
      .toDF("doc_id", "lang", "text")
    val s = LmScore.scoreDocs(docs, model, "text", "doc_id", "lang")
      .select("id").as[Long].collect().toSet
    assert(s == Set(22L)) // no fr model; no tokens in 21
  }

  test("scoreAgainstSubset: untrusted-only vocabulary pays OOV surprisal") {
    val docs = Seq(
      (1L, "en", "a a b"),   // trusted (model = the toy model above)
      (2L, "en", "c c c"))   // untrusted: c is OOV everywhere
      .toDF("doc_id", "lang", "text")
    val s = LmScore.scoreAgainstSubset(docs, "text", "doc_id", "lang",
        trusted = col("doc_id") === 1)
      .select("id", "cross_entropy").as[(Long, Double)].collect().toMap
    assert(s(2L) == 1.6094) // every token at the oov surprisal
    // trusted doc scores exactly as under the separately-built model
    val ref = LmScore.scoreDocs(docs.filter("doc_id = 1"), model,
      "text", "doc_id", "lang")
      .select("id", "cross_entropy").as[(Long, Double)].collect().toMap
    assert(s(1L) == ref(1L))
  }

  test("scoreAgainstSubset tokenizes the corpus exactly once (shared scan)") {
    val docs = Seq((1L, "en", "a a b"), (2L, "en", "a b c"))
      .toDF("doc_id", "lang", "text")
    val plan = LmScore.scoreAgainstSubset(docs, "text", "doc_id", "lang",
      trusted = col("doc_id") % 2 === 1).queryExecution.optimizedPlan
    // no Generate (token explode) survives in the lazy plan — it ran once
    // into the checkpointed token frame
    val gens = plan.collect {
      case g: org.apache.spark.sql.catalyst.plans.logical.Generate => g }
    assert(gens.isEmpty, gens.mkString("\n"))
    // every leaf (scoring side, model counts, oov defaults) reads the SAME
    // materialized token RDD
    val leaves = plan.collectLeaves()
    val rddIds = leaves.collect {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd.id }
    assert(rddIds.nonEmpty && rddIds.toSet.size == 1, s"leaf RDD ids: $rddIds")
    assert(rddIds.size == leaves.size,
      "non-checkpoint leaves: " + leaves.filterNot(
        _.isInstanceOf[org.apache.spark.sql.execution.LogicalRDD]))
  }

  test("scoreBigramAgainstSubset: every backoff branch, hand-computed") {
    // trusted doc "a b a b": uni a=2 b=2 (tot=4, vocab=2);
    // bigrams (a,b)=2 (b,a)=1 → S(b|a)=2/2, S(a|b)=1/2.
    // untrusted doc "a b b c" exercises all four scoring branches:
    //   a  doc-start          → s_uni(a)   = -ln(3/6)     = 0.6931
    //   b  bigram (a,b) hit   → -ln(2/2)                  = 0.0000
    //   b  (b,b) unseen       → s_bo(b)    = -ln(0.4*3/6) = 1.6094
    //   c  (b,c) unseen + OOV → bo_oov     = -ln(0.4/6)   = 2.7080
    // mean = 5.0105 / 4 = 1.2526 (floor 4 dp)
    val docs = Seq((1L, "en", "a b a b"), (2L, "en", "a b b c"),
      (3L, "fr", "x y")) // fr has no trusted rows → dropped
      .toDF("doc_id", "lang", "text")
    val s = LmScore.scoreBigramAgainstSubset(docs, "text", "doc_id", "lang",
        trusted = col("doc_id") === 1)
      .select("id", "n_tok", "cross_entropy")
      .as[(Long, Long, Double)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(s(2L) == (4L, 1.2526))
    // trusted doc: 0.6931 + 0 + -ln(1/2)=0.6931 + 0 → 1.3862/4 = 0.3465
    assert(s(1L) == (4L, 0.3465))
    assert(!s.contains(3L))
  }

  test("bigram scoring beats unigram on in-domain word order") {
    // same unigram profile, different order: the bigram model separates
    // them while the unigram model cannot
    val docs = Seq((1L, "en", "a b a b a b"), (2L, "en", "a b a b a b"),
      (3L, "en", "b b b a a a"))
      .toDF("doc_id", "lang", "text")
    val tr = col("doc_id") === 1
    val uniCe = LmScore.scoreAgainstSubset(docs, "text", "doc_id", "lang", tr)
      .select("id", "cross_entropy").as[(Long, Double)].collect().toMap
    val biCe = LmScore.scoreBigramAgainstSubset(docs, "text", "doc_id", "lang", tr)
      .select("id", "cross_entropy").as[(Long, Double)].collect().toMap
    assert(uniCe(2L) == uniCe(3L)) // unigram is order-blind
    assert(biCe(2L) < biCe(3L))    // bigram is not
  }

  test("selfScore equals scoring against the self-trained model") {
    val docs = Seq((1L, "en", "a a b"), (2L, "en", "a b c"),
      (3L, "de", "x y"), (4L, "de", "x x z z"))
      .toDF("doc_id", "lang", "text")
    val self = LmScore.selfScore(docs, "text", "doc_id", "lang")
    val composed = LmScore.scoreDocs(docs,
      LmScore.unigramModel(docs, "text", "lang"), "text", "doc_id", "lang")
    assert(self.collect().toSet == composed.collect().toSet)
    assert(self.count() == 4)
  }

  test("ccnet buckets: per-lang terciles at integer cut ranks") {
    // 6 en docs with distinct scores → 2/2/2; ranks k1=(6+2)div3=2, k2=4
    val docs = Seq(
      (1L, "en", "a a a a"),      // all in-vocab → lowest ce
      (2L, "en", "a a a b"),
      (3L, "en", "a a b b"),
      (4L, "en", "a b b c"),
      (5L, "en", "a b c c"),
      (6L, "en", "c c c c"))      // all OOV-ish → highest ce
      .toDF("doc_id", "lang", "text")
    val b = LmScore.ccnetBuckets(docs, "text", "doc_id", "lang",
        trusted = col("doc_id") <= 2)
      .select("id", "bucket").as[(Long, String)].collect().toMap
    assert(b.size == 6)
    assert(Seq(1L, 2L).forall(b(_) == "head"))
    assert(Seq(3L, 4L).forall(b(_) == "middle"))
    assert(Seq(5L, 6L).forall(b(_) == "tail"))
  }

  test("naive bayes: held-out docs classify to their training class") {
    val docs = Seq(
      (1L, "en", "the cat sat on the mat"),
      (2L, "en", "the dog ran to the park"),
      (3L, "de", "der hund lief durch den wald"),
      (4L, "de", "der vogel sang in den baum"),
      (5L, "en", "the cat ran to the mat"),     // held out, en vocab
      (6L, "de", "der hund sang in den wald"))  // held out, de vocab
      .toDF("doc_id", "lang", "text")
    val r = LmScore.classifyNaiveBayes(docs, "text", "doc_id", "lang",
        trusted = col("doc_id") <= 4)
      .select("id", "label", "pred", "n_tok", "log_post")
      .as[(Long, String, String, Long, Double)].collect()
      .map(t => t._1 -> t).toMap
    assert(r.size == 6)
    // training docs and held-out docs all land on their own class
    assert(r.values.forall(t => t._3 == t._2))
    assert(r(5L)._4 == 6L)
    // posteriors are log-probabilities: strictly negative
    assert(r.values.forall(_._5 < 0))
  }

  test("naive bayes: all-OOV doc falls back to priors + OOV mass, deterministically") {
    val docs = Seq(
      (1L, "en", "a a b"), (2L, "en", "a b"),
      (3L, "de", "x y"),
      (9L, "en", "qq ww ee"))  // no training word at all
      .toDF("doc_id", "lang", "text")
    val nb = LmScore.classifyNaiveBayes(docs, "text", "doc_id", "lang",
      trusted = col("doc_id") < 9)
    val row = nb.filter(col("id") === 9L)
      .select("pred", "n_tok").as[(String, Long)].head()
    // global V=4 (a,b,x,y); en: tot=5 → oov 1/10, prior ln(2/3);
    // de: tot=2 → oov 1/7, prior ln(1/3);
    // 3·ln(1/7)+ln(1/3) = −6.94 beats 3·ln(1/10)+ln(2/3) = −7.31
    assert(row == (("de", 3L)))
    assert(nb.count() == 4)
  }
}
