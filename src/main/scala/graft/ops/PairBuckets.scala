package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Blocked (within-bucket) self-pair generation with a hot-bucket guard.
  *
  * Blocking is what makes near-dup detection feasible at 100 TB: pairs are
  * only generated inside a bucket (LSH band, text prefix, IVF cluster), so
  * the corpus-wide O(n²) never materializes. But the plain self-join on
  * the bucket key has a failure mode: ONE pathological bucket (a
  * boilerplate prefix shared by a million docs; one fat cluster) serializes
  * its entire O(c²) pair space into a single shuffle task.
  *
  * Guard: bucket sizes are computed first; buckets above `maxBucketRows`
  * are triangle-salted — the left side scatters on hash(id) % salts, the
  * right side replicates to every salt, so the hot bucket's c² pairs split
  * across `salts` tasks (~c²/salts each) while every pair is still produced
  * exactly once. `salts` is sized from the observed max bucket
  * (ceil(maxSize / maxBucketRows), capped) and the split is logged. Cold
  * buckets take the plain join — no replication cost. Output is EXACTLY
  * the plain join's pair set (property-tested in PairBucketsSpec).
  */
object PairBuckets {

  private lazy val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** All unordered pairs (doc_a < doc_b) of ids sharing `bucketKey`.
    * Returns columns (bk, doc_a, doc_b). */
  def selfPairs(df: DataFrame, idCol: String, bucketKey: Column,
      maxBucketRows: Int = 4096, maxSalts: Int = 256): DataFrame = {
    require(maxBucketRows > 0)
    val rows = df.select(col(idCol).as("id"), bucketKey.as("bk"))
    val sizes = rows.groupBy("bk").agg(count(lit(1)).as("_bc"))
    val hotKeys = sizes.filter(col("_bc") > maxBucketRows).select("bk")

    // one tiny (2-value) action to size the salting and log the split —
    // the sizes aggregation is a single shuffle over (bk) and is the price
    // of adaptivity; the driver only ever sees two longs
    val Array(nHot, maxBc) = sizes
      .agg(coalesce(sum(when(col("_bc") > maxBucketRows, 1L).otherwise(0L)), lit(0L)),
        coalesce(max("_bc"), lit(0L)))
      .collect()(0).toSeq.map(_.asInstanceOf[Long]).toArray

    if (nHot == 0L) {
      plainPairs(rows, rows)
    } else {
      val salts = math.min(
        math.ceil(maxBc.toDouble / maxBucketRows).toLong, maxSalts.toLong).toInt
      log.warn(s"PairBuckets: $nHot bucket(s) over $maxBucketRows rows " +
        s"(max $maxBc) — triangle-salting across $salts sub-tasks")
      val tagged = rows.join(broadcast(hotKeys.withColumn("_hot", lit(true))),
          Seq("bk"), "left")
        .withColumn("_hot", coalesce(col("_hot"), lit(false)))
      val cold = tagged.filter(!col("_hot")).drop("_hot")
      val hot = tagged.filter(col("_hot")).drop("_hot")
      // triangle split: pair (a,b) is matched exactly once, in the task
      // owning salt hash(a) — the replicated side carries every salt
      val salted = hot.withColumn("_g", pmod(hash(col("id")), lit(salts)))
      val replicated = hot.withColumn("_g",
        explode(sequence(lit(0), lit(salts - 1))))
      val hotPairs = salted.as("x").join(replicated.as("y"),
          col("x.bk") === col("y.bk") && col("x._g") === col("y._g") &&
            col("x.id") < col("y.id"))
        .select(col("x.bk").as("bk"),
          col("x.id").as("doc_a"), col("y.id").as("doc_b"))
      plainPairs(cold, cold).unionByName(hotPairs)
    }
  }

  private def plainPairs(x: DataFrame, y: DataFrame): DataFrame =
    x.as("x").join(y.as("y"),
        col("x.bk") === col("y.bk") && col("x.id") < col("y.id"))
      .select(col("x.bk").as("bk"),
        col("x.id").as("doc_a"), col("y.id").as("doc_b"))
}
