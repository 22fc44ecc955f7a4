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

  /** CURRICULUM layout: a global total order by `orderCol` (short→long,
    * easy→hard, low→high perplexity — whatever the curriculum metric is),
    * cut into `nShards` contiguous, equal-as-possible shards. A loader
    * reading shards 0..n-1 in (shard, global_rank) order replays the
    * exact curriculum; the order is a pure function of (orderCol, id) —
    * engine-, parallelism- and rerun-independent.
    *
    * The 100-TB shape: global rank WITHOUT a global window. A
    * `row_number().over(Window.orderBy(...))` funnels the corpus through
    * ONE task; here rank is a [[PrefixSum.runningTotal]] of ones — range-
    * partition on the sort key, partition-local ranks in parallel, then
    * merge config-bounded per-partition totals into offsets. Shard cut
    * points are integer arithmetic on the rank ((rank−1)·nShards div N —
    * exact in BIGINT, no float boundary), so the whole layout is
    * oracle-verifiable against a row_number reference. */
  def curriculumOrder(df: DataFrame, idCol: String,
      orderCol: String, nShards: Int): DataFrame = {
    require(nShards > 0, s"nShards must be positive, got $nShards")
    val ranked = graft.ext.PrefixSum.runningTotal(
      df.select(col(idCol), col(orderCol)).withColumn("_one", lit(1L)),
      partCols = Nil, orderCols = Seq(orderCol, idCol),
      valueCol = "_one", outCol = "global_rank")
    val total = df.agg(count(lit(1)).as("_n"))
    ranked.crossJoin(broadcast(total))
      .withColumn("shard",
        expr(s"CAST((global_rank - 1) * $nShards DIV _n AS BIGINT)"))
      .select(col(idCol), col(orderCol),
        col("global_rank").cast("long").as("global_rank"), col("shard"))
  }

  /** Shard integrity manifest: per shard, the row count plus an
    * ORDER-INDEPENDENT content checksum — md5 over the shard's per-row
    * content hashes concatenated in sorted order, so the manifest value
    * is a pure function of the shard's row SET (task count, read order
    * and file layout never change it). The 100 TB integrity primitive: a
    * loader (or tomorrow's recompute) re-derives the manifest and any
    * corrupted/duplicated/dropped row flips its shard's checksum;
    * comparing manifests localizes damage to a shard without comparing
    * any rows. Per-shard state is the shard's hash list — shard size is a
    * layout parameter (bounded by construction), and at the extreme the
    * same fold nests one level (hash-of-sorted-hashes per sub-bucket).
    * One shuffle, keyed by shard. */
  def shardManifest(df: DataFrame, shardCol: String,
      contentCols: Seq[String]): DataFrame =
    df.withColumn("_rh", md5(concat(contentCols.map(rowHashField): _*)))
      .groupBy(col(shardCol))
      .agg(
        count(lit(1)).as("n_rows"),
        md5(array_join(sort_array(collect_list(col("_rh"))), ""))
          .as("checksum"))

  /** Unambiguous per-field encoding feeding the manifest row hash:
    * NULL → the sentinel `N:`; a value → `V<charlen>:<value>`. The length
    * prefix makes every field self-delimiting (no separator can shift a
    * column boundary: ('a|b','c') ≠ ('a','b|c')), and the distinct N/V
    * prefixes make NULL ≠ any string — including 'N:' itself. A naive
    * concat_ws would silently SKIP nulls ((NULL,'a') ≡ ('a',NULL)) and
    * let a separator char inside a value shift boundaries: silent
    * detection blind spots for an op whose contract is "any corrupted
    * row flips its shard's checksum". Values hash via CAST AS STRING —
    * for oracle-compared columns the cast must be engine-parity
    * (integers/strings are; see the x_shard_manifest oracle, which
    * states the same encoding). */
  private def rowHashField(c: String): org.apache.spark.sql.Column = {
    val v = col(c).cast("string")
    when(v.isNull, lit("N:"))
      .otherwise(concat(lit("V"), length(v).cast("string"), lit(":"), v))
  }
}
