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

  /** Hard cap on the driver-side hot-bucket list. Buckets above the row
    * cap are few by construction (they are the pathology being guarded);
    * more than this many means the bucketing scheme itself is broken. */
  val MaxHotBuckets = 100000

  /** All unordered pairs (doc_a < doc_b) of ids sharing `bucketKey`.
    * Returns columns (bk, doc_a, doc_b).
    *
    * `maxCandidatePairs` is the loud CANDIDATE-BUDGET breaker (the ER
    * family's production control, SCALING.md §6g): salting distributes a
    * hot bucket's c² pairs across tasks but does nothing about their
    * NUMBER — a boilerplate-headed block can silently expand to tens of
    * millions of verify candidates that are each individually cheap and
    * collectively a cluster-day. When a finite budget is passed, the total
    * Σ c·(c−1)/2 over all buckets is computed up front (one extra
    * aggregate over the bucket-size frame — only when opted in, so the
    * default Long.MaxValue path keeps the single guard action) and the
    * call FAILS with the top-of-the-block-size histogram when it exceeds
    * the budget — the fix is a more selective (composite) blocking key,
    * not a bigger cluster, and that decision belongs to a human. */
  def selfPairs(df: DataFrame, idCol: String, bucketKey: Column,
      maxBucketRows: Int = 4096, maxSalts: Int = 256,
      maxCandidatePairs: Long = Long.MaxValue): DataFrame = {
    require(maxBucketRows > 0)
    val rows = df.select(col(idCol).as("id"), bucketKey.as("bk"))
    if (maxCandidatePairs < Long.MaxValue) {
      val sizes = rows.groupBy("bk").agg(count(lit(1)).as("_bc"))
      // sum c·(c−1) in LONG (SQL `/` would go double) and halve exactly here
      val tot = sizes
        .agg(coalesce(sum(col("_bc") * (col("_bc") - 1L)), lit(0L)),
          count(lit(1)))
        .collect()(0)
      val (totPairs, nBuckets) = (tot.getLong(0) / 2L, tot.getLong(1))
      if (totPairs > maxCandidatePairs) {
        val top = sizes.orderBy(col("_bc").desc).limit(10).collect()
          .map(r => s"${r.get(0)}=${r.getLong(1)}").mkString(", ")
        throw new IllegalStateException(
          s"PairBuckets: candidate budget exceeded — Σ c·(c−1)/2 = $totPairs " +
            s"pairs across $nBuckets bucket(s) > budget $maxCandidatePairs. " +
            s"Largest blocks (key=rows): $top. The blocking key is not " +
            "selective enough at this corpus size; compose it with a second " +
            "cheap field (e.g. Dedup.jaroWinklerPairsComposite) or raise " +
            "the budget deliberately.")
      }
    }
    // ONE action computes the guard stats: the hot-bucket keys and their
    // sizes (bounded by MaxHotBuckets, loud failure beyond). The sizes
    // aggregation — a single shuffle on (bk) — is the price of
    // adaptivity and runs exactly once; hot tagging is then a driver-side
    // in-set predicate, not a second aggregation + broadcast join.
    val hot = rows.groupBy("bk").agg(count(lit(1)).as("_bc"))
      .filter(col("_bc") > maxBucketRows)
      .limit(MaxHotBuckets + 1).collect()
    if (hot.length > MaxHotBuckets) throw new IllegalStateException(
      s"PairBuckets: more than $MaxHotBuckets buckets exceed $maxBucketRows " +
        "rows — the bucket key is not selective enough to block pairs; fix " +
        "the bucketing scheme instead of salting everything")

    if (hot.isEmpty) {
      plainPairs(rows, rows)
    } else {
      val maxBc = hot.map(_.getLong(1)).max
      val salts = math.min(
        math.ceil(maxBc.toDouble / maxBucketRows).toLong, maxSalts.toLong).toInt
      log.warn(s"PairBuckets: ${hot.length} bucket(s) over $maxBucketRows rows " +
        s"(max $maxBc) — triangle-salting across $salts sub-tasks")
      val isHot = col("bk").isInCollection(hot.map(_.get(0)).toSeq)
      val cold = rows.filter(!isHot)
      val hotRows = rows.filter(isHot)
      // triangle split: pair (a,b) is matched exactly once, in the task
      // owning salt hash(a) — the replicated side carries every salt
      val salted = hotRows.withColumn("_g", pmod(hash(col("id")), lit(salts)))
      val replicated = hotRows.withColumn("_g",
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
