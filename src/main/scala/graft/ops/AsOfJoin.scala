package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (temporal point-in-time) join — each left row enriched with the
  * right row having the greatest timestamp ≤ the left timestamp within
  * the same key; the operator behind "join every event to the dimension
  * version that was current when the event happened" (kdb's `aj`,
  * DuckDB's ASOF JOIN; Spark has no built-in).
  *
  * Arrangement: UNION the two sides tagged left/right, then one window
  * partitioned by key and ordered by (ts, side) carries the most recent
  * right payload forward into each left row (`last(..., ignoreNulls)`
  * over an unbounded-preceding frame). Exactly ONE shuffle on the key
  * and a per-key sort — no per-row subquery, no range cross-join, no
  * driver loop; skew is bounded by per-key row counts, the same bound
  * any keyed operator carries at 100 TB. Right rows sort BEFORE left
  * rows at an equal timestamp, so a version effective exactly at the
  * event time matches (the ≤ in the contract, DuckDB `ON l.ts >= r.ts`
  * parity).
  *
  * Left-join semantics: a left row with no prior right version keeps
  * null payload columns.
  *
  * Preconditions: right payload column names must not collide with left
  * columns (rename before calling); (key, rightTs) should be unique —
  * among right rows sharing key AND timestamp the carried version is
  * otherwise order-undefined (mirrors every as-of engine's ambiguity).
  */
object AsOfJoin {

  def asOf(left: DataFrame, right: DataFrame, keyCols: Seq[String],
      leftTsCol: String, rightTsCol: String): DataFrame = {
    require(keyCols.nonEmpty, "as-of join needs at least one key column")
    val leftCols = left.columns.toSeq.filterNot(keyCols.contains)
    val payload = right.columns.toSeq
      .filterNot(c => keyCols.contains(c) || c == rightTsCol)
    require(payload.nonEmpty, "right side has no payload columns")
    val clash = payload.intersect(left.columns.toSeq)
    require(clash.isEmpty, s"right payload collides with left columns: $clash")

    val lNorm = left.select(
      keyCols.map(col) ++
        Seq(col(leftTsCol).as("_ats"), lit(1).as("_side")) ++
        leftCols.map(col) ++
        payload.map(c => lit(null).cast(right.schema(c).dataType).as(c)): _*)
    val rNorm = right.select(
      keyCols.map(col) ++
        Seq(col(rightTsCol).as("_ats"), lit(0).as("_side")) ++
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        payload.map(col): _*)
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("_ats"), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lNorm.unionByName(rNorm)
      .select(
        (keyCols ++ leftCols).map(col) ++ Seq(col("_side")) ++
          payload.map(c => last(col(c), ignoreNulls = true).over(w).as(c)): _*)
      .filter(col("_side") === 1)
      .drop("_side")
  }
}
