package graft.examples
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.ext.{Curation, Dedup, LmScore, Sampling, TextAnalysis}

/** Stage-level wall breakdown of the x_curation_e2e pipeline at sf0.1 —
  * the measurement behind round-10's pipeline cost accounting (each
  * stage forced through a count/noop action on a staged copy, so the
  * numbers are additive rather than lineage-shared). */
object CurateProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.load(spark, sfDir, "documents")
    def time[T](n: String)(f: => T): T = {
      val t = System.nanoTime(); val r = f
      println(f"[curprof] $n%-16s ${(System.nanoTime() - t) / 1e9}%.2f s"); r
    }
    import graft.core.Materialize.stage
    for (i <- 1 to 2) {
      println(s"[curprof] --- pass $i ---")
      val qSig = time("quality") { stage(TextAnalysis.qualityScore(docs, "text", "n_chars")
        .select(col("doc_id"), col("quality"))) }
      val rSig = time("repetition") { stage(TextAnalysis.repetitionSignals(
        docs.select(col("doc_id"), col("text")), "text")
        .select(col("doc_id"), col("dup_2gram_frac"))) }
      val lm = time("lm-score") { stage(LmScore.scoreAgainstSubset(docs, "text",
        "doc_id", "lang", trusted = col("doc_id") % 3 =!= 0)
        .select(col("id").as("doc_id"), col("cross_entropy"))) }
      val survivors = time("filter+scrub") { stage(TextAnalysis.scrubPii(
        docs.select(col("doc_id"), col("lang").as("domain"), col("text"))
          .join(qSig, Seq("doc_id")).join(rSig, Seq("doc_id")).join(lm, Seq("doc_id"))
          .filter(col("quality") >= 0.45 && col("dup_2gram_frac") <= 0.1 &&
            col("cross_entropy") <= 3.45), "text")
        .select(col("doc_id"), col("domain"), col("quality"),
          col("cross_entropy"), col("scrubbed"))) }
      val keepers = time("dedup") { stage(Dedup.dedupCorpus(survivors, "scrubbed",
        "doc_id", k = 8, bands = 2, threshold = 0.5)
        .filter(col("is_kept")).select("doc_id")) }
      val contaminated = time("decontaminate") { stage(
        TextAnalysis.contaminationWithinStatsBloom(survivors, "scrubbed",
          "doc_id", isBench = col("doc_id") % 7 === 0)
        .filter(col("n_shared_fps") * 100 >= col("n_fps") * 20)
        .select("doc_id")) }
      val clean = survivors.join(keepers, Seq("doc_id"), "left_semi")
        .filter(col("doc_id") % 7 =!= 0)
        .join(contaminated, Seq("doc_id"), "left_anti")
      val mixed = time("mix") { stage(clean.join(
        Sampling.domainMix(clean, "doc_id", col("domain"),
          Map("en" -> 0.7, "de" -> 0.3)).select("doc_id"),
        Seq("doc_id"), "left_semi")) }
      time("pack") {
        val withTok = stage(mixed.withColumn("n_tokens",
          size(filter(split(col("scrubbed"), " "), w => length(w) > 0)).cast("long")))
        graft.ext.Packing.concatChunkPacks(withTok, "doc_id", "n_tokens", 512L)
          .join(withTok.select("doc_id"), Seq("doc_id"))
          .write.format("noop").mode("overwrite").save() }
    }
    spark.stop()
  }
}
