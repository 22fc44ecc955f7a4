package graft.examples
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.core.Materialize.StageSyntax
import graft.ext.Dedup
/** One-off: where does containmentPairs' wall go — the rare co-occurrence
  * count (Σ df² frame) or the wide common-intersection join? */
object ContainStageProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.load(spark, "/root/testdata/sf0.1", "documents")
    def time[T](n: String)(f: => T): T = {
      val t = System.nanoTime(); val r = f
      println(f"[cstage] $n%-22s ${(System.nanoTime() - t) / 1e9}%.2f s"); r
    }
    for (i <- 1 to 2) {
      val sh = time(s"#$i shingles+stage") {
        Dedup.shingleTokens(docs, "text", "doc_id", 3).staged }
      val dfreq = time(s"#$i dfreq") {
        sh.groupBy("word").agg(count(lit(1)).as("_df")).staged }
      val rare = sh.join(dfreq.filter(col("_df") <= 10).select("word"), Seq("word"))
      val common = sh.join(dfreq.filter(col("_df") > 10).select("word"), Seq("word"))
      val rareCo = time(s"#$i rareCo(Σdf²)") {
        rare.select(col("id").as("doc_a"), col("word"))
          .join(rare.select(col("id").as("doc_b"), col("word"))
            .hint("shuffle_hash"), Seq("word"))
          .filter(col("doc_a") < col("doc_b"))
          .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("rare_inter"))
          .staged }
      println("[cstage] rareCo rows = " + rareCo.count())
      time(s"#$i commonInter join") {
        rareCo.select("doc_a", "doc_b")
          .join(common.select(col("id").as("doc_a"), col("word"))
            .hint("shuffle_hash"), Seq("doc_a"))
          .join(common.select(col("id").as("doc_b"), col("word"))
            .hint("shuffle_hash"), Seq("doc_b", "word"))
          .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("common_inter"))
          .write.format("noop").mode("overwrite").save() }
    }
    spark.stop()
  }
}
