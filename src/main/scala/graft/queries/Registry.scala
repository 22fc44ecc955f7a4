package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable operator query: a Spark implementation over the testdata
  * parquet tables plus (where SQL-expressible) an equivalent DuckDB oracle.
  *
  * Determinism contract (driver hashes rows):
  *   - every query ends in an ORDER BY over columns that make row order
  *     deterministic (unique key, or all output columns);
  *   - money/measure sums go through DECIMAL(18,2) (exact, order-independent)
  *     and are cast to DOUBLE in the final projection on BOTH sides;
  *   - integer outputs are BIGINT on both sides; timestamps are emitted as
  *     'yyyy-MM-dd HH:mm:ss' strings.
  */
final case class OpQuery(
    name: String,
    doc: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Registry {
  lazy val all: Seq[OpQuery] =
    CoreOps.all ++ JoinOps.all ++ AggOps.all ++ StatefulOps.all ++
      MiscOps.all ++ StreamingOps.all ++ WarehouseOps.all ++ ExtOps.all ++
      ScaleOps.all

  lazy val byName: Map[String, OpQuery] = {
    val m = all.map(q => q.name -> q).toMap
    require(m.size == all.size, "duplicate query names in Registry")
    m
  }
}
