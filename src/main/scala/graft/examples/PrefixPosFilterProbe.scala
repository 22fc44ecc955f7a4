package graft.examples
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.core.Materialize.stage
import graft.ext.Dedup

/** Measures PPJoin's POSITIONAL filter (Xiao et al., WWW'08) as a
  * candidate-pruning refinement for x_prefix_join — r16 optimization
  * session. For a candidate row matched on a shared prefix token at
  * 0-based canonical positions i (in A) and j (in B):
  *   overlap(A,B) <= min(i,j) + 1 + min(|A|-i-1, |B|-j-1)
  * (common tokens before the match fit in both before-segments; after
  * likewise), while J >= t requires overlap >= t/(1+t)*(|A|+|B|).
  * Rows whose bound falls short are dropped INSIDE the join predicate —
  * no extra shuffle, no barrier (the lesson of SCALING §12i); a pair
  * survives if ANY of its shared prefix tokens passes, so recall is
  * untouched (the bound is valid per row; slack is one-sided to only
  * ever ADMIT). Probe prints candidate counts with/without the filter
  * and interleaved full-verify A/B walls.
  */
object PrefixPosFilterProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val threshold = 0.6
    def time(f: => Unit): Double = {
      val t = System.nanoTime(); f; (System.nanoTime() - t) / 1e9
    }
    val docs = Tables.load(spark, sfDir, "documents")
    val tok = stage(Dedup.shingleTokens(docs, "text", "doc_id", 3))
    val dfreq = tok.groupBy("word").agg(count(lit(1)).as("df"))
    val perDoc = tok.join(dfreq, "word")
      .groupBy("id")
      .agg(sort_array(collect_list(struct(col("df"), col("word")))).as("ord"),
        count(lit(1)).as("n"))
    def prefixes = perDoc
      .withColumn("p",
        (col("n") - ceil(col("n") * threshold - lit(1e-9)) + lit(1)).cast("int"))
      .select(col("id"), col("n"),
        posexplode(slice(col("ord"), lit(1), col("p"))).as(Seq("pos", "pt")))
      .select(col("id"), col("n"), col("pos"), col("pt.word").as("word"))
    val lenPred =
      least(col("pa.n"), col("pb.n")).cast("double") >=
        greatest(col("pa.n"), col("pb.n")) * threshold - lit(1e-9)
    val posPred =
      (least(col("pa.pos"), col("pb.pos")) + lit(1) +
        least(col("pa.n") - col("pa.pos") - 1,
          col("pb.n") - col("pb.pos") - 1)).cast("double") >=
        (col("pa.n") + col("pb.n")) * (threshold / (1.0 + threshold)) -
          lit(1e-9)
    def cand(withPos: Boolean) = {
      val pred0 = col("pa.word") === col("pb.word") &&
        col("pa.id") < col("pb.id") && lenPred
      prefixes.as("pa").join(prefixes.as("pb"),
          if (withPos) pred0 && posPred else pred0)
        .select(col("pa.id").as("doc_a"), col("pb.id").as("doc_b"))
        .distinct()
    }
    println(s"[pposf] candidates without pos filter = ${cand(false).count()}")
    println(s"[pposf] candidates WITH   pos filter = ${cand(true).count()}")
    // sanity: verified pair sets must be identical
    val vA = Dedup.jaccardOnTokens(tok, cand(false), threshold)
    val vB = Dedup.jaccardOnTokens(tok, cand(true), threshold)
    val diff = vA.unionByName(vB).groupBy("doc_a", "doc_b", "jaccard")
      .agg(count(lit(1)).as("c")).filter(col("c") =!= 2).count()
    println(s"[pposf] verified pairs A=${vA.count()} B=${vB.count()} " +
      s"sym-diff=$diff")
    // interleaved candidate+verify A/B (the part of the query the filter
    // changes), 5 iterations
    val as = collection.mutable.ArrayBuffer[Double]()
    val bs = collection.mutable.ArrayBuffer[Double]()
    for (i <- 1 to 5) {
      as += time(Dedup.jaccardOnTokens(tok, cand(false), threshold)
        .write.format("noop").mode("overwrite").save())
      bs += time(Dedup.jaccardOnTokens(tok, cand(true), threshold)
        .write.format("noop").mode("overwrite").save())
      println(f"[pposf] iter $i A=${as.last}%.2f s  B=${bs.last}%.2f s")
    }
    def med(x: Seq[Double]) = x.sorted.apply(x.size / 2)
    println(f"[pposf] MEDIAN A=${med(as.toSeq)}%.2f s  B=${med(bs.toSeq)}%.2f s")
    spark.stop()
  }
}
