package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed (co-located) joins — the shuffle-elimination story for
  * repeated fact-fact joins at 100 TB.
  *
  * A shuffle join moves BOTH sides over the network every query. Writing
  * the fact tables bucketed by the join key (same bucket count both
  * sides) pre-partitions them on disk: Catalyst recognizes the matching
  * output partitioning and plans a SortMergeJoin with NO Exchange on
  * either side (asserted in BucketingSpec). At warehouse scale this turns
  * the order⋈detail interval join from the dominant network cost into a
  * local merge per bucket.
  */
object Bucketing {

  /** Write a DataFrame as a bucketed managed table (parquet). */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int): Unit =
    df.write
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .mode("overwrite")
      .saveAsTable(table)

  /** Join two tables bucketed on the same key with equal bucket counts —
    * plans shuffle-free. Extra join predicates (e.g. interval bounds)
    * ride along as post-join filters. */
  def bucketedJoin(spark: SparkSession, left: String, right: String,
      leftKey: String, rightKey: String,
      extraCond: Option[org.apache.spark.sql.Column] = None): DataFrame = {
    val l = spark.table(left)
    val r = spark.table(right)
    // side-qualified keys: unqualified col(key) is AMBIGUOUS_REFERENCE
    // whenever both tables share the column name (the canonical
    // same-key co-located case)
    val cond = extraCond.foldLeft(l(leftKey) === r(rightKey))(_ && _)
    l.join(r, cond)
  }
}
