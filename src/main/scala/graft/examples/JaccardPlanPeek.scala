package graft.examples
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.ext.Dedup
import graft.core.Materialize.stage

/** Prints the physical plan of the x_simhash64_neardup ground-truth
  * verify (jaccardOnTokens over the rare-blocked candidates) WITHOUT the
  * final staging barrier, so the join strategies inside the barrier are
  * visible — the committed plans/r16 dump only shows the post-barrier
  * tail. */
object JaccardPlanPeek {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables.load(spark, sfDir, "documents")
    val tok = stage(Dedup.shingleTokens(docs, "text", "doc_id", 3))
    val dfreq = tok.groupBy("word").agg(count(lit(1)).as("_d"))
    val rare = tok.join(dfreq.filter(col("_d") <= 10).select("word"),
      Seq("word"))
    val cand = rare.select(col("id").as("doc_a"), col("word"))
      .join(rare.select(col("id").as("doc_b"), col("word")), Seq("word"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b").distinct()
    val v = Dedup.jaccardOnTokens(tok, cand, 0.5)
    println(v.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode))
    spark.stop()
  }
}
