package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.Registry

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Queries/oracles are assembled from graft.queries.Registry, one entry per
  * implemented operator from SURVEY.md §2.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Runs the ProvinceStats slice (SURVEY §7.2 step 2): source → join →
    * tumbling window agg → distinct count → serving projection. */
  def entry(spark: SparkSession): DataFrame = {
    // fail fast with one drift-naming line if the driver regenerated the
    // testdata with a changed schema (the round-7 failure mode)
    graft.core.Tables.contractCheck(spark, "/root/testdata/sf0.001")
    Registry.byName("a3_province_stats").run(spark, "/root/testdata/sf0.001")
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Registry.all.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Registry.all.flatMap(q => q.oracle.map(o => q.name -> o)).toMap
}
