package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.ext.Dedup
import graft.core.Materialize.StageSyntax

/** Measurement probe behind the r16 jaccardOnTokens size-prefilter
  * decision (guide §2.3 "shuffle fewer bytes" / All-Pairs length filter):
  * J(A,B) ≥ t forces min(|A|,|B|) ≥ t·max(|A|,|B|), so a candidate pair
  * whose token-set sizes are further apart than t can be dropped from the
  * verify BEFORE its tokens are expanded through the intersection join —
  * provably result-identical (the dropped pairs cannot pass the final
  * threshold filter), the question is only whether LSH-banded candidates
  * carry enough size-mismatched false positives for the drop to pay for
  * its two extra size joins.
  *
  * Measures, at each corpus: candidate count, size-filter survivors, and
  * a back-to-back A/B of the verify stage (tokens pre-staged outside the
  * clock, noop sink) with and without the prefilter.
  */
object VerifySizeFilterProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](n: String)(f: => T): T = {
      val t = System.nanoTime(); val r = f
      println(f"[szprobe] $n%-40s ${(System.nanoTime() - t) / 1e9}%.2f s"); r
    }
    val dirs = if (args.nonEmpty) args.toSeq else Seq("/root/testdata/sf0.1")
    for (dir <- dirs; threshold <- Seq(0.5)) {
      val docs = Tables.load(spark, dir, "documents")
      // Pipeline config: k=8, bands=2, ngram=3 (x_dedup_pipeline/keepbest)
      val tok = Dedup.shingleTokens(docs, "text", "doc_id", 3).staged
      val sig = Dedup.minhashFromTokens(tok, 8)
      val cand = Dedup.lshCandidatePairs(
        sig.withColumnRenamed("id", "doc_id"), "doc_id", 8, 2)
        .select("doc_a", "doc_b").distinct().staged
      val sizes = tok.groupBy("id").agg(count(lit(1)).as("n")).staged
      val nCand = cand.count()
      val withSz = cand
        .join(sizes.select(col("id").as("doc_a"), col("n").as("na")),
          Seq("doc_a"))
        .join(sizes.select(col("id").as("doc_b"), col("n").as("nb")),
          Seq("doc_b"))
      val nSurvive = withSz
        .filter(least(col("na"), col("nb")).cast("double") >=
          greatest(col("na"), col("nb")) * threshold - lit(1e-9))
        .count()
      println(s"[szprobe] $dir t=$threshold candidates=$nCand " +
        s"size-filter survivors=$nSurvive " +
        f"(${100.0 * nSurvive / math.max(1, nCand)}%.1f%%)")
      // A/B the verify stage itself, 3 iterations each, interleaved
      for (i <- 1 to 3) {
        time(s"verify unfiltered #$i") {
          Dedup.jaccardOnTokens(tok, cand, threshold)
            .write.format("noop").mode("overwrite").save() }
        time(s"verify size-prefiltered #$i") {
          val kept = withSz
            .filter(least(col("na"), col("nb")).cast("double") >=
              greatest(col("na"), col("nb")) * threshold - lit(1e-9))
            .select("doc_a", "doc_b")
          Dedup.jaccardOnTokens(tok, kept, threshold)
            .write.format("noop").mode("overwrite").save() }
      }
    }
    spark.stop()
  }
}
