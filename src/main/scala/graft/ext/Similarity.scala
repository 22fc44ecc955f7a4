package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (Array[Float]).
  *
  * Scale design: the brute-force path broadcasts the (small) query set and
  * scans candidates once — O(|queries| × N) with no shuffle of the corpus.
  * The IVF path prunes that scan to the probed partitions: a coarse
  * quantizer (here: the precomputed cluster/label column; k-means at
  * ingest in production) buckets vectors, queries probe the nProbe nearest
  * centroids, and only those buckets are scanned — the standard
  * IVF-Flat trade of recall for a ~(nProbe/nLists) scan fraction.
  *
  * All dot products run in DOUBLE (a float fold drifts vs the oracle) and
  * cosines are floor-truncated to 6 dp before ranking — truncation is a
  * pure function of the IEEE double (engine-independent, unlike round()'s
  * half-way handling), so rank ties resolve identically everywhere (then
  * by candidate id).
  */
object Similarity {

  private val dotExpr =
    "aggregate(zip_with(qe, ce, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), " +
      "CAST(0 AS DOUBLE), (a, x) -> a + x)"

  private def norm(vecCol: String) =
    expr(s"aggregate($vecCol, CAST(0 AS DOUBLE), " +
      s"(a, x) -> a + CAST(x AS DOUBLE) * CAST(x AS DOUBLE))")

  /** Brute-force cosine top-k: every query × every candidate (minus self),
    * ranked per query. Queries are broadcast; candidates stream. */
  def cosineTopK(embeddings: DataFrame, idCol: String, vecCol: String,
      queries: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val q = queries.select(col(idCol).as("qid"), col(vecCol).as("qe"))
      .withColumn("qn", norm("qe"))
    val c = embeddings.select(col(idCol).as("cid"), col(vecCol).as("ce"))
      .withColumn("cn", norm("ce"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("cid") =!= col("qid"))
      .withColumn("cosine",
        floor(expr(dotExpr) / (sqrt(col("qn")) * sqrt(col("cn"))) * 1000000.0) / 1000000.0)
    val w = Window.partitionBy("qid").orderBy(col("cosine").desc, col("cid"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("qid", "cid", "cosine", "rank")
  }

  /** Brute-force top-k through the native codegen'd VectorCosine
    * expression (one fused loop, no intermediate zip array) — same
    * semantics as cosineTopK, faster hot path. */
  def cosineTopKNative(embeddings: DataFrame, idCol: String, vecCol: String,
      queries: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    graft.functions.VectorCosine.register(embeddings.sparkSession)
    val q = queries.select(col(idCol).as("qid"), col(vecCol).as("qe"))
    val c = embeddings.select(col(idCol).as("cid"), col(vecCol).as("ce"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("cid") =!= col("qid"))
      .withColumn("cosine",
        floor(expr("vec_cosine(qe, ce)") * 1000000.0) / 1000000.0)
    val w = Window.partitionBy("qid").orderBy(col("cosine").desc, col("cid"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("qid", "cid", "cosine", "rank")
  }

  /** Coarse-quantizer centroids: the mean vector per cluster id. */
  def centroids(embeddings: DataFrame, clusterCol: String,
      vecCol: String): DataFrame =
    embeddings
      .select(col(clusterCol).as("cluster"), posexplode(col(vecCol)).as(Seq("i", "v")))
      .groupBy("cluster", "i").agg(avg(col("v").cast("double")).as("cv"))
      .groupBy("cluster")
      .agg(expr("transform(array_sort(collect_list(struct(i, cv))), s -> s.cv)")
        .as("centroid"))

  /** IVF top-k: probe the nProbe closest centroids per query, then
    * brute-force only within the probed clusters. */
  def ivfTopK(embeddings: DataFrame, idCol: String, vecCol: String,
      clusterCol: String, queries: DataFrame, k: Int,
      nProbe: Int = 2): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cents = centroids(embeddings, clusterCol, vecCol)
    val q = queries.select(col(idCol).as("qid"), col(vecCol).as("qe"))
      .withColumn("qn", norm("qe"))
    // rank centroids per query (centroid set is tiny → broadcast)
    val cScored = q.crossJoin(broadcast(
        cents.select(col("cluster"), col("centroid").as("ce"))
          .withColumn("cn", norm("ce"))))
      .withColumn("cosine",
        floor(expr(dotExpr) / (sqrt(col("qn")) * sqrt(col("cn"))) * 1000000.0) / 1000000.0)
    val wC = Window.partitionBy("qid").orderBy(col("cosine").desc, col("cluster"))
    val probed = cScored.withColumn("r", row_number().over(wC))
      .filter(col("r") <= nProbe).select("qid", "cluster")
    // scan only the probed clusters
    val cand = embeddings.select(col(idCol).as("cid"), col(vecCol).as("ce"),
        col(clusterCol).as("cluster"))
      .withColumn("cn", norm("ce"))
    val scored = cand.join(broadcast(probed), Seq("cluster"))
      .filter(col("cid") =!= col("qid"))
      .join(q.select("qid", "qe", "qn"), Seq("qid"))
      .withColumn("cosine",
        floor(expr(dotExpr) / (sqrt(col("qn")) * sqrt(col("cn"))) * 1000000.0) / 1000000.0)
    val w = Window.partitionBy("qid").orderBy(col("cosine").desc, col("cid"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("qid", "cid", "cosine", "rank")
  }

  /** Embedding-cosine near-duplicate pairs: all pairs above a cosine
    * threshold, restricted to within-cluster pairs (the IVF blocking —
    * linear in cluster size, not corpus size). */
  def cosineNearDupPairs(embeddings: DataFrame, idCol: String, vecCol: String,
      clusterCol: String, threshold: Double): DataFrame = {
    val v = embeddings.select(col(clusterCol).as("cluster"),
      col(idCol).as("id"), col(vecCol).as("e"))
      .withColumn("n", norm("e"))
    val a = v.select(col("cluster"), col("id").as("qid"), col("e").as("qe"), col("n").as("qn"))
    val b = v.select(col("cluster"), col("id").as("cid"), col("e").as("ce"), col("n").as("cn"))
    a.join(b, Seq("cluster")).filter(col("qid") < col("cid"))
      .withColumn("cosine",
        floor(expr(dotExpr) / (sqrt(col("qn")) * sqrt(col("cn"))) * 1000000.0) / 1000000.0)
      .filter(col("cosine") >= threshold)
      .select(col("qid").as("doc_a"), col("cid").as("doc_b"), col("cosine"))
  }
}
