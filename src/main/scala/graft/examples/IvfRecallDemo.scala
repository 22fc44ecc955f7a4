package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.ext.Similarity

/** Measures IVF recall@k against the brute-force ground truth, probing
  * (a) the synthetic random `label` column and (b) k-means cells built by
  * Similarity.kmeansAssign. Random cells put a query's true neighbors in
  * arbitrary cells, so probing 2 of 8 finds ~2/8 of them; k-means cells
  * co-locate similar vectors, so the same probe budget recovers most of
  * the true top-k. This is the measurement behind ARCHITECTURE.md's claim
  * that IVF needs a real quantizer at ingest, not a blocking column. */
object IvfRecallDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val e = Tables.load(spark, sfDir, "embeddings")
    val q = e.filter(col("vec_id") < 16)
    val k = 5

    val truth = Similarity.cosineTopK(e, "vec_id", "embedding", q, k)
      .select("qid", "cid")

    def recall(clustered: org.apache.spark.sql.DataFrame, label: String): Unit = {
      val got = Similarity.ivfTopK(clustered, "vec_id", "embedding", "cluster",
          q, k, nProbe = 2)
        .select("qid", "cid")
      val hit = truth.intersect(got).count().toDouble
      val total = truth.count().toDouble
      println(f"[ivfrecall] $label%-14s recall@$k = ${hit / total}%.3f")
    }

    recall(e.withColumn("cluster", col("label")), "random-label")
    val cells = Similarity.kmeansAssign(e, "vec_id", "embedding", k = 8, iters = 3)
    recall(e.join(cells.withColumnRenamed("id", "vec_id"), Seq("vec_id")),
      "kmeans-cells")
    spark.stop()
  }
}
