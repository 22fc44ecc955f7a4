package graft.io

import graft.SparkTestBase
import org.apache.hadoop.fs.Path

/** DimStore: incremental MERGE semantics, bucket-bounded writes, and
  * crash-safety of the manifest commit. */
class DimStoreSpec extends SparkTestBase {
  import spark.implicits._

  private def fs = org.apache.hadoop.fs.FileSystem.get(
    spark.sparkContext.hadoopConfiguration)

  test("upsert merges by pk: higher version wins, ties go to the batch") {
    val dir = tmpDir() + "/dim"
    DimStore.upsert(spark,
      Seq(("1", "Apple", 100L), ("2", "Sony", 100L)).toDF("id", "nm", "ver"),
      dir, "id", "ver")
    DimStore.upsert(spark,
      Seq(("1", "APPLE-v2", 200L), ("2", "SONY-stale", 50L),
        ("3", "LG", 200L)).toDF("id", "nm", "ver"),
      dir, "id", "ver")
    // same version for pk 3 in a later batch → batch (incoming) wins the tie
    DimStore.upsert(spark,
      Seq(("3", "LG-retry", 200L)).toDF("id", "nm", "ver"), dir, "id", "ver")
    val dim = DimStore.read(spark, dir).select("id", "nm")
      .as[(String, String)].collect().toSet
    assert(dim == Set(("1", "APPLE-v2"), ("2", "Sony"), ("3", "LG-retry")))
  }

  test("only buckets containing batch keys are rewritten") {
    val dir = tmpDir() + "/dim"
    val many = (1 to 200).map(i => (i.toString, s"n$i", 1L))
    DimStore.upsert(spark, many.toDF("id", "nm", "ver"), dir, "id", "ver",
      nBuckets = 16)
    val (v1, m1) = DimStore.currentManifest(spark, dir).get
    assert(v1 == 1L && m1.size == 16) // 200 keys cover all 16 buckets

    DimStore.upsert(spark, Seq(("7", "n7-v2", 2L)).toDF("id", "nm", "ver"),
      dir, "id", "ver", nBuckets = 16)
    val (v2, m2) = DimStore.currentManifest(spark, dir).get
    assert(v2 == 2L)
    val moved = m2.filter { case (b, rel) => m1(b) != rel }
    assert(moved.size == 1) // exactly the one bucket key "7" hashes into
    assert(moved.values.head.startsWith("data/v-000000002"))
    // untouched buckets still point at v1 dirs
    assert(m2.count(_._2.startsWith("data/v-000000001")) == 15)
    // and the merge preserved every row
    assert(DimStore.read(spark, dir).count() == 200)
    assert(DimStore.read(spark, dir).filter($"id" === "7")
      .select("nm").as[String].head() == "n7-v2")
  }

  test("crash before manifest commit leaves the previous snapshot intact") {
    val dir = tmpDir() + "/dim"
    DimStore.upsert(spark, Seq(("1", "a", 1L)).toDF("id", "nm", "ver"),
      dir, "id", "ver")
    // simulate a writer that died after writing data but before committing:
    // an orphan v-dir and a leftover tmp manifest must both be invisible
    Seq(("1", "CRASHED", 9L)).toDF("id", "nm", "ver")
      .write.parquet(dir + "/data/v-000000002/_bucket=0")
    val tmp = new Path(dir + "/_manifests/.m-000000002.tmp")
    val out = fs.create(tmp, true)
    out.write("0\tdata/v-000000002/_bucket=0".getBytes("UTF-8")); out.close()

    assert(DimStore.currentManifest(spark, dir).get._1 == 1L)
    assert(DimStore.read(spark, dir).select("nm").as[String].head() == "a")
    // and the next real upsert commits right over the debris
    DimStore.upsert(spark, Seq(("2", "b", 2L)).toDF("id", "nm", "ver"),
      dir, "id", "ver")
    assert(DimStore.read(spark, dir).count() == 2)
  }

  test("vacuum deletes only version dirs no current bucket references") {
    val dir = tmpDir() + "/dim"
    val many = (1 to 50).map(i => (i.toString, s"n$i", 1L))
    DimStore.upsert(spark, many.toDF("id", "nm", "ver"), dir, "id", "ver",
      nBuckets = 4)
    // touch every bucket so v1 becomes fully unreferenced
    DimStore.upsert(spark, many.map { case (i, n, _) => (i, n + "x", 2L) }
      .toDF("id", "nm", "ver"), dir, "id", "ver", nBuckets = 4)
    assert(fs.exists(new Path(dir + "/data/v-000000001")))
    DimStore.vacuum(spark, dir)
    assert(!fs.exists(new Path(dir + "/data/v-000000001")))
    assert(DimStore.read(spark, dir).count() == 50) // current still whole
  }

  test("nBuckets is persisted at first commit and a mismatch fails loudly") {
    val dir = tmpDir() + "/dim"
    DimStore.upsert(spark, Seq(("1", "a", 1L)).toDF("id", "nm", "ver"),
      dir, "id", "ver", nBuckets = 16)
    assert(DimStore.storedNBuckets(spark, dir).contains(16))
    val e = intercept[IllegalArgumentException] {
      DimStore.upsert(spark, Seq(("2", "b", 2L)).toDF("id", "nm", "ver"),
        dir, "id", "ver", nBuckets = 32)
    }
    assert(e.getMessage.contains("nBuckets=16"))
    // matching value still works and the layout stays consistent
    DimStore.upsert(spark, Seq(("2", "b", 2L)).toDF("id", "nm", "ver"),
      dir, "id", "ver", nBuckets = 16)
    assert(DimStore.read(spark, dir).count() == 2)
  }

  test("a parquet dir without a manifest is rejected, not treated as virgin") {
    val dir = tmpDir() + "/legacy"
    Seq(("1", "a")).toDF("id", "nm").write.parquet(dir)
    val e = intercept[IllegalStateException] {
      DimStore.upsert(spark, Seq(("2", "b", 1L)).toDF("id", "nm", "ver"),
        dir, "id", "ver")
    }
    assert(e.getMessage.contains("not a DimStore layout"))
    intercept[IllegalStateException] { DimStore.read(spark, dir) }
  }

  test("a crashed FIRST commit does not brick the virgin store") {
    val dir = tmpDir() + "/dim"
    // writer died after writing data but before ANY manifest existed:
    // data/ present, _manifests absent — must be treated as virgin, not
    // rejected as a legacy layout
    Seq(("1", "CRASHED", 9L)).toDF("id", "nm", "ver")
      .write.parquet(dir + "/data/v-000000001/_bucket=0")
    DimStore.upsert(spark, Seq(("1", "a", 1L)).toDF("id", "nm", "ver"),
      dir, "id", "ver")
    assert(DimStore.read(spark, dir).select("nm").as[String].head() == "a")
  }

  test("an existing v-dir at the next version is never deleted (live writer safety)") {
    val dir = tmpDir() + "/dim"
    DimStore.upsert(spark, Seq(("1", "a", 1L)).toDF("id", "nm", "ver"),
      dir, "id", "ver")
    // another writer's uncommitted v-2 data (or crash debris — upsert
    // cannot tell, so it must leave the dir alone either way)
    val otherWriterDir = dir + "/data/v-000000002/_bucket=0"
    Seq(("9", "THEIRS", 9L)).toDF("id", "nm", "ver").write.parquet(otherWriterDir)
    DimStore.upsert(spark, Seq(("2", "b", 2L)).toDF("id", "nm", "ver"),
      dir, "id", "ver")
    // the other writer's data survives; ours landed in an attempt-suffixed dir
    assert(spark.read.parquet(otherWriterDir).count() == 1)
    val (_, m) = DimStore.currentManifest(spark, dir).get
    assert(m.values.exists(_.startsWith("data/v-000000002-a1/")))
    assert(DimStore.read(spark, dir).count() == 2)
    // vacuum at current version 2 must keep BOTH v-2 dirs (>= current)
    DimStore.vacuum(spark, dir)
    assert(spark.read.parquet(otherWriterDir).count() == 1)
    assert(DimStore.read(spark, dir).count() == 2)
  }

  test("schema evolution: a new column appears, old rows read as null") {
    val dir = tmpDir() + "/dim"
    DimStore.upsert(spark, Seq(("1", "a", 1L)).toDF("id", "nm", "ver"),
      dir, "id", "ver")
    DimStore.upsert(spark,
      Seq(("2", "b", 2L, "extra")).toDF("id", "nm", "ver", "logo"),
      dir, "id", "ver")
    val dim = DimStore.read(spark, dir)
    assert(dim.columns.contains("logo"))
    assert(dim.count() == 2)
  }
}
