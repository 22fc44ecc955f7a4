package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic corpus shuffle + shard assignment for training-data
  * serving: every document gets a content-addressed sort key (md5 of its
  * id), a shard (top byte of the key mod nShards), and a position within
  * its shard (rank by sort key). A training loader reading shard files in
  * (shard, pos) order sees a globally pseudo-random document order that
  * is IDENTICAL on every engine, at any parallelism, on every rerun —
  * unlike `orderBy(rand(seed))`, which is partition-layout-dependent and
  * unauditable.
  *
  * Scale shape: no global sort. The only shuffle is by shard id, and each
  * shard sorts independently (a window partitioned by `shard` — bounded by
  * corpus/nShards, the size a shard writer must hold anyway). Choose
  * nShards ≥ cluster parallelism so every executor sorts its own shards;
  * the output (shard, pos) IS the layout a sharded parquet/webdataset
  * writer needs (`.repartition(col("shard")).sortWithinPartitions("pos")`).
  */
object Sharding {

  /** Hex-char value via position in the hex alphabet — portable SQL (the
    * same instr() in Spark and DuckDB), no engine-specific conv()/strtol. */
  private def hexVal(sqlChar: String): String =
    s"(instr('0123456789abcdef', $sqlChar) - 1)"

  /** Assign (sort_key, shard, pos) to every row. nShards ≤ 256: the shard
    * is the first md5 BYTE mod nShards, so more than 256 shards would
    * alias — plenty for the shard-count a loader wants per epoch; raise to
    * two bytes if ever needed. */
  def shardAssign(df: DataFrame, idCol: String, nShards: Int): DataFrame = {
    require(nShards > 0 && nShards <= 256,
      s"nShards must be in [1, 256], got $nShards")
    val byte0 =
      s"(${hexVal(s"substring(sort_key, 1, 1)")} * 16 + " +
        s"${hexVal(s"substring(sort_key, 2, 1)")})"
    val w = Window.partitionBy("shard").orderBy(col("sort_key"), col(idCol))
    df.withColumn("sort_key", md5(col(idCol).cast("string")))
      .withColumn("shard", expr(s"CAST($byte0 % $nShards AS BIGINT)"))
      .withColumn("pos", row_number().over(w).cast("long"))
  }
}
