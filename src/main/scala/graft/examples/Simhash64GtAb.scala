package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.ext.Dedup
import graft.core.Materialize.StageSyntax

/** Back-to-back interleaved A/B for the x_simhash64_neardup ground-truth
  * restructure (r16 optimization session): A = the shipped shape
  * (rare-blocked candidate distinct + jaccardOnTokens over ALL tokens),
  * B = the rare/common split (candidate join doubles as the rare-side
  * intersection count; the per-candidate expansion carries only df>cap
  * tokens on a narrow LONG wid — the x_containment_neardup shape).
  * Both run from the same warm staged token frame, as the query does.
  */
object Simhash64GtAb {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(f: => Unit): Double = {
      val t = System.nanoTime(); f; (System.nanoTime() - t) / 1e9
    }
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val docs = Tables.load(spark, dir, "documents")
    val tok = Dedup.shingleTokens(docs, "text", "doc_id", 3).staged
    tok.count()

    def shapeA(): Unit = {
      val dfreq = tok.groupBy("word").agg(count(lit(1)).as("_d"))
      val rare = tok.join(dfreq.filter(col("_d") <= 10).select("word"),
        Seq("word"))
      val cand = rare.select(col("id").as("doc_a"), col("word"))
        .join(rare.select(col("id").as("doc_b"), col("word")), Seq("word"))
        .filter(col("doc_a") < col("doc_b"))
        .select("doc_a", "doc_b").distinct()
      Dedup.jaccardOnTokens(tok, cand, 0.5)
        .withColumn("jaccard", col("jaccard").cast("double"))
        .write.format("noop").mode("overwrite").save()
    }
    def shapeB(): Unit = {
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
      val sizes = tok.groupBy("id").agg(count(lit(1)).as("n"))
      val commonInter = rareCo.select("doc_a", "doc_b")
        .join(common.select(col("id").as("doc_a"), col("wid"))
          .hint("shuffle_hash"), Seq("doc_a"))
        .join(common.select(col("id").as("doc_b"), col("wid"))
          .hint("shuffle_hash"), Seq("doc_b", "wid"))
        .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("common_inter"))
      rareCo
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
        .filter(col("jaccard") >= 0.5)
        .select(col("doc_a"), col("doc_b"),
          col("jaccard").cast("double").as("jaccard"))
        .write.format("noop").mode("overwrite").save()
    }
    // warmup once each, then 5 interleaved measured iterations
    shapeA(); shapeB()
    val as = collection.mutable.ArrayBuffer[Double]()
    val bs = collection.mutable.ArrayBuffer[Double]()
    for (i <- 1 to 5) {
      as += time(shapeA())
      bs += time(shapeB())
      println(f"[gtab] iter $i A=${as.last}%.2f s  B=${bs.last}%.2f s")
    }
    def med(x: Seq[Double]) = x.sorted.apply(x.size / 2)
    println(f"[gtab] MEDIAN A=${med(as.toSeq)}%.2f s  B=${med(bs.toSeq)}%.2f s")
    spark.stop()
  }
}
