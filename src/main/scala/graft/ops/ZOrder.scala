package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BitwiseAnd, BitwiseOr, Cast, Expression, Literal, ShiftLeft, ShiftRight}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Z-order (Morton) curve layout — multi-dimensional clustering for
  * min/max data skipping. Sorting a table by the bit-interleaving of two
  * dimensions places rows that are close in BOTH dimensions into the same
  * files, so every file's per-column min/max footer covers a small
  * rectangle instead of a thin slab; a predicate on EITHER dimension then
  * skips most files, where a single-column sort only serves its own
  * column. This is the clustering discipline behind Delta/Iceberg
  * `OPTIMIZE ZORDER BY` — here built from public Spark primitives: a
  * codegen'd interleave expression + `repartitionByRange` on the z-value.
  *
  * Complements the other two storage disciplines in this repo
  * (`Storage.ensureBucketedTable` for shuffle-free joins,
  * `s8_partition_prune` for planning-time directory pruning): z-order is
  * the one that serves range predicates on multiple non-partition columns
  * at once. Reference analog: the date+province ClickHouse serving tables
  * (gmall-publisher's province/keyword endpoints) whose queries filter on
  * either dimension — at 100 TB a layout choice, not an index.
  */
object ZOrder {

  /** Interleave the low `bits` bits of `x` (even positions) and `y` (odd
    * positions) into one z-value. Pure bit arithmetic — codegen'd,
    * map-only, no shuffle. Values ≥ 2^bits alias into the low bits
    * (callers clamp or widen `bits` to the true domain); negative inputs
    * are invalid by contract (sign bits would interleave meaninglessly).
    */
  def zValue(x: Column, y: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      acc
        .bitwiseOR(shiftleft(shiftright(x.cast("long"), i).bitwiseAND(lit(1L)), 2 * i))
        .bitwiseOR(shiftleft(shiftright(y.cast("long"), i).bitwiseAND(lit(1L)), 2 * i + 1))
    }
  }

  /** Catalyst builder for the SQL surface (`z_value(x, y, bits)` via
    * GraftExtensions): expands the same fold as [[zValue]] at resolution
    * time, so the SQL and Column paths share one shape. `bits` must be a
    * literal — the expansion is a compile-time decision. */
  def builder(args: Seq[Expression]): Expression = {
    require(args.length == 3, "z_value(x, y, bits) takes exactly 3 arguments")
    val bits = args(2) match {
      case Literal(v: Int, IntegerType) => v
      case e if e.foldable && e.dataType == IntegerType =>
        e.eval().asInstanceOf[Int]
      case _ => throw new IllegalArgumentException(
        "z_value: bits must be an integer literal")
    }
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    val x = Cast(args(0), LongType)
    val y = Cast(args(1), LongType)
    def bit(src: Expression, i: Int, pos: Int): Expression =
      ShiftLeft(BitwiseAnd(ShiftRight(src, Literal(i)), Literal(1L)),
        Literal(pos))
    (0 until bits).foldLeft(Literal(0L): Expression) { (acc, i) =>
      BitwiseOr(BitwiseOr(acc, bit(x, i, 2 * i)), bit(y, i, 2 * i + 1))
    }
  }

  /** The DuckDB-parity SQL text for [[zValue]] over column names — the
    * same Σ ((x>>i)&1)<<2i | ((y>>i)&1)<<(2i+1) expansion, so oracle
    * queries can restate the curve exactly. */
  def zValueSql(x: String, y: String, bits: Int): String =
    (0 until bits).flatMap { i =>
      Seq(s"((($x >> $i) & 1) << ${2 * i})",
        s"((($y >> $i) & 1) << ${2 * i + 1})")
    }.mkString("(", " | ", ")")

  /** Write `df` z-clustered on (x, y): range-partition by z-value into
    * `numFiles` tasks, sort within each, one file per task. Range
    * partitioning keeps the curve contiguous per file (hash partitioning
    * would scatter it), which is what makes the per-file min/max tight. */
  def writeZOrdered(df: DataFrame, x: Column, y: Column, bits: Int,
      numFiles: Int, path: String): Unit = {
    val z = df.withColumn("_z", zValue(x, y, bits))
    z.repartitionByRange(numFiles, col("_z"))
      .sortWithinPartitions("_z")
      .drop("_z")
      .write.mode("overwrite").parquet(path)
  }

  /** Per-file bounding boxes of (x, y) for a parquet directory — the
    * skipping model: a file must be read iff its box intersects the query
    * rectangle. Used by specs/demos to measure layout quality; at scale
    * the engine reads the same min/max from footers without a scan. */
  def fileBoxes(df: DataFrame, x: Column, y: Column): DataFrame =
    df.groupBy(input_file_name().as("file"))
      .agg(min(x).as("x_min"), max(x).as("x_max"),
        min(y).as("y_min"), max(y).as("y_max"))

  /** How many files a rectangle query must touch under a given layout. */
  def filesTouched(boxes: DataFrame, xLo: Long, xHi: Long, yLo: Long,
      yHi: Long): Long =
    boxes.filter(col("x_max") >= xLo && col("x_min") <= xHi &&
      col("y_max") >= yLo && col("y_min") <= yHi).count()
}
