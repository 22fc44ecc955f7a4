package graft.examples

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ext.{Curation, Dedup, LmScore, Packing, Sampling, TextAnalysis}
import graft.core.Materialize._

/** Stage-by-stage wall-clock profile of the curation pipeline — a
  * measurement harness (like TopKBench), not product code. Each stage is
  * forced with a noop write and timed separately so a regression names
  * its stage instead of hiding in the composed total. */
object CurationProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id) s")
      .write.format("noop").mode("overwrite").save()

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    def force(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val docs = graft.core.Tables.load(spark, sfDir, "documents")

    val qSig = time("quality checkpoint")(
      TextAnalysis.qualityScore(docs, "text", "n_chars")
        .select(col("doc_id"), col("quality")).staged)
    val rSig = time("repetition checkpoint")(
      TextAnalysis.repetitionSignals(
        docs.select(col("doc_id"), col("text")), "text")
        .select(col("doc_id"), col("dup_2gram_frac")).staged)

    val lm = LmScore.scoreAgainstSubset(docs, "text", "doc_id", "lang",
        trusted = col("doc_id") % 3 =!= 0)
      .select(col("id").as("doc_id"), col("cross_entropy"))
    time("lm")(force(lm))

    val kept = docs.select(col("doc_id"), col("lang").as("domain"), col("text"))
      .join(qSig, Seq("doc_id")).join(rSig, Seq("doc_id"))
      .join(lm, Seq("doc_id"))
      .filter(col("quality") >= 0.45 &&
        col("dup_2gram_frac") <= 0.1 && col("cross_entropy") <= 3.45)
    time("filter")(force(kept))

    val survivors = time("survivors checkpoint")(
      TextAnalysis.scrubPii(kept, "text")
        .select(col("doc_id"), col("domain"),
          col("quality"), col("cross_entropy"), col("scrubbed"))
        .staged)

    val keepers = time("dedup build+cc")(
      Dedup.dedupCorpus(survivors, "scrubbed", "doc_id",
        k = 8, bands = 2, threshold = 0.5)
        .filter(col("is_kept")).select("doc_id"))
    time("dedup force")(force(keepers))

    val contaminated = time("contamination build")(
      TextAnalysis.contaminationWithinStats(survivors, "scrubbed", "doc_id",
        isBench = col("doc_id") % 7 === 0)
        .filter(col("n_shared_fps") * 100 >= col("n_fps") * 20)
        .select("doc_id"))
    time("contamination force")(force(contaminated))

    val clean = survivors
      .join(keepers, Seq("doc_id"), "left_semi")
      .filter(col("doc_id") % 7 =!= 0)
      .join(contaminated, Seq("doc_id"), "left_anti")
    time("clean force")(force(clean))

    val mixed = clean.join(
      Sampling.domainMix(clean, "doc_id", col("domain"),
        Map("en" -> 0.4, "zh" -> 0.15, "es" -> 0.15, "de" -> 0.15,
          "fr" -> 0.15)).select("doc_id"),
      Seq("doc_id"), "left_semi")
    time("mix force")(force(mixed))

    val withTok = time("withTok stage")(
      stage(mixed.withColumn("n_tokens",
        size(filter(split(col("scrubbed"), " "), w => length(w) > 0))
          .cast("long"))))
    val packed = time("pack build")(
      Packing.concatChunkPacks(withTok, "doc_id", "n_tokens", 512)
        .join(withTok.select("doc_id", "domain", "quality", "cross_entropy"),
          Seq("doc_id")))
    time("pack force")(force(packed))

    // default (md5, oracle-parity) vs production kernels (xxhash64
    // minhash + Karp-Rabin winnowing) — twice each, alternating, so both
    // see the same warmth; the gap is the §8d pipeline-level kernel win
    for (i <- 1 to 2) {
      time(s"FULL curate() md5 #$i")(force(
        Curation.curate(docs, "text", "doc_id", "lang", "n_chars",
          qualityMin = 0.45, dupFracMax = 0.1, ceMax = 3.45,
          benchMod = 7, weights = Map("en" -> 0.4, "zh" -> 0.15,
            "es" -> 0.15, "de" -> 0.15, "fr" -> 0.15),
          packBudget = 512, minSharedPct = 20).orderBy("doc_id")))
      time(s"FULL curate() fast #$i")(force(
        Curation.curate(docs, "text", "doc_id", "lang", "n_chars",
          qualityMin = 0.45, dupFracMax = 0.1, ceMax = 3.45,
          benchMod = 7, weights = Map("en" -> 0.4, "zh" -> 0.15,
            "es" -> 0.15, "de" -> 0.15, "fr" -> 0.15),
          packBudget = 512, minSharedPct = 20,
          fastKernels = true).orderBy("doc_id")))
    }
    spark.stop()
  }
}
