package graft.examples
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.ext.{Curation, LmScore}
object GateProfile {
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
      println(f"[gateprof] $n%-18s ${(System.nanoTime() - t) / 1e9}%.2f s"); r
    }
    for (i <- 1 to 2) {
      val model = time(s"model fit #$i") {
        graft.core.Materialize.stage(LmScore.unigramModel(
          docs.filter(col("doc_id") % 3 =!= 0), "text", "lang")) }
      time(s"gate batch #$i") {
        Curation.gate(docs, "text", "doc_id", "lang", "n_chars",
            model, qualityMin = 0.45, dupFracMax = 0.1, ceMax = 3.45)
          .withColumn("scrubbed_md5", md5(col("scrubbed"))).drop("scrubbed")
          .write.format("noop").mode("overwrite").save() }
    }
    spark.stop()
  }
}
