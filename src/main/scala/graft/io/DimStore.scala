package graft.io

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental dim upsert store — K3/F12, the Spark analog of the
  * reference's row-by-row Phoenix upsert (RT/app/function/
  * DimSinkFunction.java:39-71) at table scale.
  *
  * Layout (a minimal manifest-swap table format, the MERGE INTO shape the
  * interface is designed around):
  *
  *   <path>/data/v-<n>/_bucket=<b>/part-*.parquet   immutable bucket data
  *   <path>/_manifests/m-<n>                        text manifest: "b<TAB>dir"
  *
  * A reader resolves the highest manifest and unions the bucket dirs it
  * names. An upsert merges the batch ONLY into the buckets its keys hash
  * to, writes those buckets as a new immutable version dir, then commits
  * by creating the next manifest file (write-tmp + rename-to-fresh-name —
  * atomic; a crash anywhere before that leaves the previous manifest and
  * all its data intact, so there is no window of deleted data, unlike a
  * delete-then-rename snapshot swap). Untouched buckets keep their old
  * dirs — per-batch work is O(|batch| + |touched buckets|), not O(|dim|).
  *
  * Scale: nBuckets bounds the merge shuffle to touched partitions; a CDC
  * batch touching few keys rewrites few buckets. Last-write-wins by
  * `versionCol`, ties break toward the incoming batch (upsert semantics:
  * the newest write for a pk wins, DimSinkFunction.java:58-66).
  */
object DimStore {

  val DefaultBuckets = 64

  private def fileSystem(spark: SparkSession): FileSystem =
    FileSystem.get(spark.sparkContext.hadoopConfiguration)

  private def manifestDir(path: String) = new Path(path, "_manifests")

  private def bucketOf(pk: String, nBuckets: Int) =
    pmod(hash(col(pk)), lit(nBuckets))

  /** (version, bucket → data dir relative to `path`), from the highest
    * committed manifest; None for a virgin store. */
  def currentManifest(spark: SparkSession, path: String): Option[(Long, Map[Int, String])] = {
    val fs = fileSystem(spark)
    val dir = manifestDir(path)
    if (!fs.exists(dir)) return None
    val committed = fs.listStatus(dir).map(_.getPath.getName)
      .filter(_.startsWith("m-")).map(_.stripPrefix("m-").toLong)
    if (committed.isEmpty) return None
    val v = committed.max
    val in = fs.open(new Path(dir, f"m-$v%09d"))
    val text = try scala.io.Source.fromInputStream(in).mkString finally in.close()
    val buckets = text.linesIterator.filter(_.nonEmpty).map { line =>
      val Array(b, rel) = line.split('\t')
      b.toInt -> rel
    }.toMap
    Some((v, buckets))
  }

  /** Current dim snapshot (business columns only). Empty frame with the
    * given schema if the store is virgin and `schemaOf` is provided. */
  def read(spark: SparkSession, path: String): DataFrame = {
    val m = currentManifest(spark, path)
      .getOrElse(throw new IllegalStateException(s"no committed dim at $path"))
    val dirs = m._2.values.toSeq.distinct.map(rel => s"$path/$rel")
    spark.read.option("mergeSchema", "true").parquet(dirs: _*)
  }

  def exists(spark: SparkSession, path: String): Boolean =
    currentManifest(spark, path).isDefined

  /** MERGE the batch into the store: last-write-wins per `pk` by
    * `versionCol` (batch wins ties). Only buckets containing batch keys
    * are read, merged, and rewritten. */
  def upsert(spark: SparkSession, batch: DataFrame, path: String,
      pk: String, versionCol: String,
      nBuckets: Int = DefaultBuckets): Unit = {
    val fs = fileSystem(spark)
    val current = currentManifest(spark, path)
    val nextV = current.map(_._1 + 1).getOrElse(1L)
    val oldBuckets = current.map(_._2).getOrElse(Map.empty)

    val batchB = batch.withColumn("_bucket", bucketOf(pk, nBuckets))
    val touched = batchB.select("_bucket").distinct()
      .collect().map(_.getInt(0)).toSet // ≤ nBuckets entries — driver-safe

    // existing rows of ONLY the touched buckets (partition-pruned by dir)
    val touchedDirs = oldBuckets.filter { case (b, _) => touched(b) }
      .values.toSeq.distinct.map(rel => s"$path/$rel")
    val existing =
      if (touchedDirs.isEmpty) None
      else Some(spark.read.option("mergeSchema", "true").parquet(touchedDirs: _*)
        .withColumn("_bucket", bucketOf(pk, nBuckets))
        // dirs can be shared v-dirs listing more buckets than we touched
        .filter(col("_bucket").isInCollection(touched)))

    val unioned = existing match {
      case Some(ex) =>
        ex.withColumn("_src", lit(0))
          .unionByName(batchB.withColumn("_src", lit(1)), allowMissingColumns = true)
      case None => batchB.withColumn("_src", lit(1))
    }
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(pk))
      .orderBy(col(versionCol).desc, col("_src").desc)
    val merged = unioned.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1).drop("_rn", "_src")

    // immutable new version dir for the touched buckets. nextV is one past
    // the highest COMMITTED manifest, so an existing dir here can only be
    // debris from a writer that crashed before committing — reclaim it.
    val dataRel = f"data/v-$nextV%09d"
    val dataPath = new Path(s"$path/$dataRel")
    if (fs.exists(dataPath)) fs.delete(dataPath, true)
    merged.write.partitionBy("_bucket").parquet(s"$path/$dataRel")

    // commit: old entries + touched buckets re-pointed, as manifest nextV.
    // Written to a tmp name, renamed to its final fresh name (atomic).
    val entries = (oldBuckets ++ touched.map(b => b -> s"$dataRel/_bucket=$b"))
      .toSeq.sortBy(_._1).map { case (b, rel) => s"$b\t$rel" }.mkString("\n")
    val dir = manifestDir(path)
    fs.mkdirs(dir)
    val tmp = new Path(dir, f".m-$nextV%09d.tmp")
    val out = fs.create(tmp, true)
    try out.write(entries.getBytes("UTF-8")) finally out.close()
    if (!fs.rename(tmp, new Path(dir, f"m-$nextV%09d")))
      throw new IllegalStateException(
        s"manifest commit collision at $path v$nextV (concurrent writer?)")
  }

  /** Delete data dirs no manifest-current bucket points to (old versions).
    * Safe to run any time after upsert: readers resolve through the
    * latest manifest only. */
  def vacuum(spark: SparkSession, path: String): Unit = {
    val fs = fileSystem(spark)
    currentManifest(spark, path).foreach { case (_, buckets) =>
      val live = buckets.values.map(rel => rel.split('/')(1)).toSet // v-dirs
      val dataDir = new Path(path, "data")
      if (fs.exists(dataDir))
        fs.listStatus(dataDir).map(_.getPath)
          .filterNot(p => live(p.getName))
          .foreach(fs.delete(_, true))
    }
  }
}
