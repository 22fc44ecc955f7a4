package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Layout-aware storage: write-once materialization of partitioned parquet
  * stores and bucketed tables, so repeated queries (bench iterations, test
  * suites, a warehouse's daily load) pay the layout cost once and every
  * subsequent read gets partition pruning / shuffle-free joins for free.
  *
  * At 100 TB the write layout IS the query plan: a date-partitioned store
  * turns every time-bounded scan into a directory listing, and a bucketed
  * fact table removes the join shuffle from every downstream query. Both
  * are idempotent here — keyed by destination path / table name — because
  * the source tables are immutable snapshots (the testdata contract).
  */
object Storage {

  private val lock = new Object

  /** Root for materialized stores: JVM temp dir, tagged per source dir so
    * different scale factors never collide. */
  def root: String =
    new java.io.File(sys.props("java.io.tmpdir"), "graft_store").toString

  /** Tag for a source directory, safe both as a path fragment and inside
    * an unquoted SQL table identifier (no dots — `a.b` parses as
    * catalog.table). */
  def tagFor(dir: String): String = dir.replaceAll("[^A-Za-z0-9_]", "_")

  /** Run `write` for `path` unless a complete write (_SUCCESS marker) is
    * already there. Serialized JVM-wide: parallel test suites or bench
    * iterations must not race the same destination. Returns `path`. */
  def ensureWritten(path: String)(write: String => Unit): String =
    lock.synchronized {
      if (!new java.io.File(path, "_SUCCESS").exists()) write(path)
      path
    }

  /** Register (and if needed write) a bucketed external table. Three
    * cases, all idempotent:
    *  - session already has the table → no-op;
    *  - files complete on disk but the catalog (fresh JVM) doesn't know
    *    them → re-register with a CREATE TABLE that declares the SAME
    *    CLUSTERED BY layout, so Catalyst still plans shuffle-free joins
    *    without rewriting a byte;
    *  - otherwise → bucketed write + catalog entry in one saveAsTable. */
  def ensureBucketedTable(spark: SparkSession, table: String, path: String,
      key: String, buckets: Int)(df: => DataFrame): String =
    lock.synchronized {
      if (!spark.catalog.tableExists(table)) {
        if (new java.io.File(path, "_SUCCESS").exists()) {
          val schemaDdl = df.schema.toDDL
          spark.sql(
            s"""CREATE TABLE $table ($schemaDdl) USING PARQUET
               |CLUSTERED BY ($key) SORTED BY ($key) INTO $buckets BUCKETS
               |LOCATION '$path'""".stripMargin)
        } else {
          org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(path))
          df.write
            .bucketBy(buckets, key)
            .sortBy(key)
            .option("path", path)
            .format("parquet")
            .mode("overwrite")
            .saveAsTable(table)
        }
      }
      table
    }
}
