package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.ext.Dedup
import graft.core.Materialize.StageSyntax

/** Stage-level wall-clock split of x_simhash64_neardup (r16 optimization
  * session): the query composes a ground-truth stage (staged 3-shingle
  * scan → df census → rare-blocked candidates → exact Jaccard verify)
  * with the simhash sketch/band/verify path and a recall gate. The bench
  * times the whole composition at ~8–9 s; this probe noop-times each
  * stage in sequence (later stages re-use earlier stages' staged frames,
  * exactly as the query does) so the wall has a named owner.
  */
object Simhash64Profile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    def time[T](n: String)(f: => T): T = {
      val t = System.nanoTime(); val r = f
      println(f"[s64prof] $n%-36s ${(System.nanoTime() - t) / 1e9}%.2f s"); r
    }
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    for (iter <- 1 to 2) {
      println(s"[s64prof] === iteration $iter ===")
      val docs = Tables.load(spark, dir, "documents")
      val tok = time("1 tok staged (shingle scan)") {
        Dedup.shingleTokens(docs, "text", "doc_id", 3).staged }
      val cand = time("2 rare-blocked candidates (staged)") {
        val dfreq = tok.groupBy("word").agg(count(lit(1)).as("_d"))
        val rare = tok.join(dfreq.filter(col("_d") <= 10).select("word"),
          Seq("word"))
        rare.select(col("id").as("doc_a"), col("word"))
          .join(rare.select(col("id").as("doc_b"), col("word")), Seq("word"))
          .filter(col("doc_a") < col("doc_b"))
          .select("doc_a", "doc_b").distinct().staged }
      println(s"[s64prof]   candidates = ${cand.count()}")
      // All-Pairs size filter admissibility on the rare-blocked candidates:
      // J >= t forces min(|A|,|B|) >= t*max, monotone under the exact
      // floor-trunc arithmetic of the final filter, so failures are
      // provably result-free drops.
      val sizes = tok.groupBy("id").agg(count(lit(1)).as("n")).staged
      val withSz = cand
        .join(sizes.select(col("id").as("doc_a"), col("n").as("na")),
          Seq("doc_a"))
        .join(sizes.select(col("id").as("doc_b"), col("n").as("nb")),
          Seq("doc_b"))
      val nSurv = withSz
        .filter(least(col("na"), col("nb")).cast("double") >=
          greatest(col("na"), col("nb")) * 0.5 - lit(1e-9)).count()
      println(s"[s64prof]   size-filter survivors = $nSurv")
      val gt = time("3 gt verify (jaccardOnTokens, staged)") {
        Dedup.jaccardOnTokens(tok, cand, 0.5)
          .withColumn("jaccard", col("jaccard").cast("double")).staged }
      println(s"[s64prof]   gt pairs = ${gt.count()}")
      time("3b gt verify size-prefiltered (noop)") {
        val kept = withSz
          .filter(least(col("na"), col("nb")).cast("double") >=
            greatest(col("na"), col("nb")) * 0.5 - lit(1e-9))
          .select("doc_a", "doc_b")
        Dedup.jaccardOnTokens(tok, kept, 0.5)
          .write.format("noop").mode("overwrite").save() }
      // 3c: rare/common split (the x_containment_neardup shape): the rare
      // co-occurrence join IS the candidate gen AND the rare-side
      // intersection count; the wide per-candidate expansion then only
      // carries common (df>cap) tokens, keyed by a narrow LONG wid.
      val gt2 = time("3c gt rare/common split (staged)") {
        import org.apache.spark.sql.expressions.Window
        val dfreq = tok.groupBy("word").agg(count(lit(1)).as("_df")).staged
        val rare = tok.join(dfreq.filter(col("_df") <= 10).select("word"),
          Seq("word"))
        val DictBuckets = 1024L
        val dict = dfreq.filter(col("_df") > 10).select("word")
          .withColumn("_b", pmod(xxhash64(col("word")), lit(DictBuckets)))
          .withColumn("_r", row_number().over(
            Window.partitionBy("_b").orderBy("word")).cast("long"))
          .select(col("word"), (col("_r") * DictBuckets + col("_b")).as("wid"))
        val common = tok.join(dict.hint("shuffle_hash"), Seq("word"))
          .select(col("id"), col("wid"))
        val rareCo = rare.select(col("id").as("doc_a"), col("word"))
          .join(rare.select(col("id").as("doc_b"), col("word"))
            .hint("shuffle_hash"), Seq("word"))
          .filter(col("doc_a") < col("doc_b"))
          .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("rare_inter"))
          .staged
        val commonInter = rareCo.select("doc_a", "doc_b")
          .join(common.select(col("id").as("doc_a"), col("wid"))
            .hint("shuffle_hash"), Seq("doc_a"))
          .join(common.select(col("id").as("doc_b"), col("wid"))
            .hint("shuffle_hash"), Seq("doc_b", "wid"))
          .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("common_inter"))
        rareCo
          .join(commonInter.hint("shuffle_hash"), Seq("doc_a", "doc_b"),
            "left")
          .withColumn("inter",
            col("rare_inter") + coalesce(col("common_inter"), lit(0L)))
          .join(sizes.select(col("id").as("doc_a"), col("n").as("na")),
            Seq("doc_a"))
          .join(sizes.select(col("id").as("doc_b"), col("n").as("nb")),
            Seq("doc_b"))
          .withColumn("jaccard",
            floor(col("inter").cast("double") /
              (col("na") + col("nb") - col("inter")) * 10000.0) / 10000.0)
          .filter(col("jaccard") >= 0.5)
          .select(col("doc_a"), col("doc_b"),
            col("jaccard").cast("double").as("jaccard")).staged }
      val diff = gt.unionByName(gt2).groupBy("doc_a", "doc_b", "jaccard")
        .agg(count(lit(1)).as("c")).filter(col("c") =!= 2).count()
      println(s"[s64prof]   gt2 pairs = ${gt2.count()}, sym-diff vs gt = $diff")
      val sim = time("4 simhash pairs (sketch+band+ham)") {
        val p = Dedup.simhashNeardupPairs(docs, "text", "doc_id",
          bits = 64, maxHam = 3, fast = true, nBlocks = 6)
          .select("doc_a", "doc_b")
        p.write.format("noop").mode("overwrite").save(); p }
      time("5 gate + final (given staged gt)") {
        val hi = gt.filter(col("jaccard") >= 0.8)
        val hit = hi.join(sim, Seq("doc_a", "doc_b"), "left_semi")
          .agg(count(lit(1)).as("_nh"))
        val gate = hi.agg(count(lit(1)).as("_ng"))
          .crossJoin(broadcast(hit))
          .select((col("_nh") * 100L >= col("_ng") * 60L)
            .as("sim64_recall_ok"))
        gt.crossJoin(broadcast(gate)).orderBy("doc_a", "doc_b")
          .write.format("noop").mode("overwrite").save() }
    }
    spark.stop()
  }
}
