package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Storage materialization: write-once idempotence, and the fresh-JVM
  * re-registration path (files on disk, catalog empty) must rebuild a
  * table Catalyst still plans shuffle-free joins against. */
class StorageSpec extends SparkTestBase {
  import spark.implicits._

  test("ensureWritten writes once and is a no-op when _SUCCESS exists") {
    val path = tmpDir() + "/store"
    var writes = 0
    Storage.ensureWritten(path) { p =>
      writes += 1
      (1 to 10).toDF("x").write.parquet(p)
    }
    Storage.ensureWritten(path) { _ => writes += 1 }
    assert(writes == 1)
    assert(spark.read.parquet(path).count() == 10)
  }

  test("ensureBucketedTable: write, catalog-drop, re-register from files") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val dir = tmpDir()
    val left = (1L to 500L).map(i => (i, s"l$i")).toDF("k", "lv")
    val right = (1L to 1500L).map(i => (i % 500 + 1, s"r$i")).toDF("k2", "rv")
    try {
      Storage.ensureBucketedTable(spark, "st_left", s"$dir/left", "k", 4)(left)
      Storage.ensureBucketedTable(spark, "st_right", s"$dir/right", "k2", 4)(right)

      def joined = {
        val l = spark.table("st_left")
        val r = spark.table("st_right")
        l.join(r.hint("merge"), l("k") === r("k2"))
      }
      val plan1 = joined.queryExecution.executedPlan.toString
      assert(plan1.contains("SortMergeJoin"), plan1)
      assert(!plan1.contains("Exchange"), s"bucketed join shuffled:\n$plan1")
      assert(joined.count() == 1500)

      // same session calls are no-ops (no rewrite, table still there)
      Storage.ensureBucketedTable(spark, "st_left", s"$dir/left", "k", 4)(
        fail("ensureBucketedTable rewrote an existing table"))

      // fresh-JVM shape: catalog loses the table, files stay — the DDL
      // re-registration must declare the same CLUSTERED BY layout so the
      // join still plans with zero exchanges
      spark.sql("DROP TABLE st_left")
      val mtime = new java.io.File(s"$dir/left", "_SUCCESS").lastModified()
      Storage.ensureBucketedTable(spark, "st_left", s"$dir/left", "k", 4)(left)
      assert(new java.io.File(s"$dir/left", "_SUCCESS").lastModified() == mtime,
        "re-registration rewrote the bucketed files")
      val plan2 = joined.queryExecution.executedPlan.toString
      assert(plan2.contains("SortMergeJoin"), plan2)
      assert(!plan2.contains("Exchange"), s"re-registered join shuffled:\n$plan2")
      assert(joined.count() == 1500)
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS st_left")
      spark.sql("DROP TABLE IF EXISTS st_right")
    }
  }
}
