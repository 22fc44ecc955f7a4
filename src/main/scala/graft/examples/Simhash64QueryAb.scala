package graft.examples

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.ext.Dedup
import graft.core.Materialize.StageSyntax

/** FULL-QUERY interleaved A/B for x_simhash64_neardup's ground-truth
  * restructure: A = the r15 composition (rare candidate distinct +
  * all-token jaccardOnTokens), B = the rare/common split (candidate join
  * doubling as the rare-side intersection count). Both sides run the
  * complete query (gt + simhash + recall gate + final orderBy) to a noop
  * sink, alternating in one JVM, because the stage-level A/B
  * (Simhash64GtAb) and the bench-level comparison disagreed. VERDICT:
  * the split was REJECTED — it wins the isolated stage (3.02 vs 4.36 s
  * against a warm pre-staged token frame) but loses the bench
  * (8.5–9.6 vs 5.6–6.5 s): per fresh run it pays two extra eager
  * barriers, one of which materializes the vocabulary-sized df census,
  * and repeated in-JVM iterations compound the staged-block load. See
  * SCALING §12i.
  */
object Simhash64QueryAb {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(f: => Unit): Double = {
      val t = System.nanoTime(); f; (System.nanoTime() - t) / 1e9
    }
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"

    def finish(docs: DataFrame, gt: DataFrame): Unit = {
      val sim = Dedup.simhashNeardupPairs(docs, "text", "doc_id",
        bits = 64, maxHam = 3, fast = true, nBlocks = 6)
        .select("doc_a", "doc_b")
      val hi = gt.filter(col("jaccard") >= 0.8)
      val hit = hi.join(sim, Seq("doc_a", "doc_b"), "left_semi")
        .agg(count(lit(1)).as("_nh"))
      val gate = hi.agg(count(lit(1)).as("_ng"))
        .crossJoin(broadcast(hit))
        .select((col("_nh") * 100L >= col("_ng") * 60L)
          .as("sim64_recall_ok"))
      gt.crossJoin(broadcast(gate)).orderBy("doc_a", "doc_b")
        .write.format("noop").mode("overwrite").save()
    }
    def shapeA(): Unit = {
      val docs = Tables.load(spark, dir, "documents")
      val tok = Dedup.shingleTokens(docs, "text", "doc_id", 3).staged
      val dfreq = tok.groupBy("word").agg(count(lit(1)).as("_d"))
      val rare = tok.join(dfreq.filter(col("_d") <= 10).select("word"),
        Seq("word"))
      val cand = rare.select(col("id").as("doc_a"), col("word"))
        .join(rare.select(col("id").as("doc_b"), col("word")), Seq("word"))
        .filter(col("doc_a") < col("doc_b"))
        .select("doc_a", "doc_b").distinct()
      val gt = Dedup.jaccardOnTokens(tok, cand, 0.5)
        .withColumn("jaccard", col("jaccard").cast("double")).staged
      finish(docs, gt)
    }
    // B with staging variants: stageDfreq / stageRareCo toggles — the
    // barrier count is the suspect for B losing at composition level
    // while winning stage-level.
    def shapeBVar(stageDfreq: Boolean, stageRareCo: Boolean): Unit = {
      import org.apache.spark.sql.expressions.Window
      val docs = Tables.load(spark, dir, "documents")
      val tok = Dedup.shingleTokens(docs, "text", "doc_id", 3).staged
      val maxDf = 10L; val threshold = 0.5
      val dfreq0 = tok.groupBy("word").agg(count(lit(1)).as("_df"))
      val dfreq = if (stageDfreq) dfreq0.staged else dfreq0
      val rare = tok.join(dfreq.filter(col("_df") <= maxDf).select("word"),
        Seq("word"))
      val DictBuckets = 1024L
      val dict = dfreq.filter(col("_df") > maxDf).select("word")
        .withColumn("_b", pmod(xxhash64(col("word")), lit(DictBuckets)))
        .withColumn("_r", row_number().over(
          Window.partitionBy("_b").orderBy("word")).cast("long"))
        .select(col("word"), (col("_r") * DictBuckets + col("_b")).as("wid"))
      val common = tok.join(dict.hint("shuffle_hash"), Seq("word"))
        .select(col("id"), col("wid"))
      val rareCo0 = rare.select(col("id").as("doc_a"), col("word"))
        .join(rare.select(col("id").as("doc_b"), col("word"))
          .hint("shuffle_hash"), Seq("word"))
        .filter(col("doc_a") < col("doc_b"))
        .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("rare_inter"))
      val rareCo = if (stageRareCo) rareCo0.staged else rareCo0
      val sizes = tok.groupBy("id").agg(count(lit(1)).as("n"))
      val commonInter = rareCo.select("doc_a", "doc_b")
        .join(common.select(col("id").as("doc_a"), col("wid"))
          .hint("shuffle_hash"), Seq("doc_a"))
        .join(common.select(col("id").as("doc_b"), col("wid"))
          .hint("shuffle_hash"), Seq("doc_b", "wid"))
        .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("common_inter"))
      val gt = rareCo
        .join(commonInter.hint("shuffle_hash"), Seq("doc_a", "doc_b"), "left")
        .withColumn("inter",
          col("rare_inter") + coalesce(col("common_inter"), lit(0L)))
        .join(sizes.select(col("id").as("doc_a"), col("n").as("na")),
          Seq("doc_a"))
        .join(sizes.select(col("id").as("doc_b"), col("n").as("nb")),
          Seq("doc_b"))
        .withColumn("jaccard",
          floor(col("inter").cast("double") /
            (col("na") + col("nb") - col("inter")) * 10000.0) / 10000.0)
        .filter(col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
        .withColumn("jaccard", col("jaccard").cast("double")).staged
      finish(docs, gt)
    }
    val variants: Seq[(String, () => Unit)] = Seq(
      "A  (r15 shape)         " -> (() => shapeA()),
      "B  (staged df+rareCo)  " -> (() => shapeBVar(true, true)),
      "B2 (no extra stages)   " -> (() => shapeBVar(false, false)),
      "B3 (rareCo staged only)" -> (() => shapeBVar(false, true)))
    variants.foreach(_._2()) // warmup each
    val t = variants.map(v => v._1 ->
      collection.mutable.ArrayBuffer[Double]()).toMap
    for (i <- 1 to 5) {
      for ((n, f) <- variants) t(n) += time(f())
      println(f"[s64qab] iter $i " +
        variants.map { case (n, _) => f"${n.trim}=${t(n).last}%.2f" }
          .mkString("  "))
    }
    def med(x: Seq[Double]) = x.sorted.apply(x.size / 2)
    for ((n, _) <- variants)
      println(f"[s64qab] MEDIAN $n ${med(t(n).toSeq)}%.2f s")
    spark.stop()
  }
}
