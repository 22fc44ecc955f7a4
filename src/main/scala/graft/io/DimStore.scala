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

  private def manifestText(spark: SparkSession, path: String): Option[(Long, String)] = {
    val fs = fileSystem(spark)
    val dir = manifestDir(path)
    if (!fs.exists(dir)) return None
    val committed = fs.listStatus(dir).map(_.getPath.getName)
      .filter(_.startsWith("m-")).map(_.stripPrefix("m-").toLong)
    if (committed.isEmpty) return None
    val v = committed.max
    val in = fs.open(new Path(dir, f"m-$v%09d"))
    val text = try scala.io.Source.fromInputStream(in).mkString finally in.close()
    Some((v, text))
  }

  /** (version, bucket → data dir relative to `path`), from the highest
    * committed manifest; None for a virgin store. Lines starting with `#`
    * are metadata (e.g. `#nBuckets=64`), not bucket entries. */
  def currentManifest(spark: SparkSession, path: String): Option[(Long, Map[Int, String])] =
    manifestText(spark, path).map { case (v, text) =>
      val buckets = text.linesIterator
        .filter(l => l.nonEmpty && !l.startsWith("#")).map { line =>
          val Array(b, rel) = line.split('\t')
          b.toInt -> rel
        }.toMap
      (v, buckets)
    }

  /** The bucket count the store was committed with (None: virgin store, or
    * a store predating the `#nBuckets` manifest header). */
  def storedNBuckets(spark: SparkSession, path: String): Option[Int] =
    manifestText(spark, path).flatMap { case (_, text) =>
      text.linesIterator.collectFirst {
        case l if l.startsWith("#nBuckets=") => l.stripPrefix("#nBuckets=").toInt
      }
    }

  /** Guard against silently treating a non-DimStore parquet directory as a
    * virgin store: loose parquet files in the ROOT (the legacy plain-
    * parquet layout) mean this reader does not understand the layout, and
    * upserting "over" it would drop every pre-existing row from the
    * snapshot. A `data/` dir WITHOUT a manifest is deliberately allowed:
    * that is the debris of a first commit that crashed before writing any
    * manifest, and the retry must succeed (the attempt-suffix probe picks
    * a fresh v-dir; the debris is vacuumed once versions move past it). */
  private def requireNotLegacy(spark: SparkSession, path: String): Unit = {
    val fs = fileSystem(spark)
    val p = new Path(path)
    if (fs.exists(p) && !fs.exists(manifestDir(path)) &&
      fs.listStatus(p).exists { s =>
        val n = s.getPath.getName
        n.endsWith(".parquet") || n == "_SUCCESS"
      })
      throw new IllegalStateException(
        s"$path contains data but no _manifests dir — not a DimStore layout. " +
          "Import the legacy snapshot explicitly (read it, upsert into a fresh " +
          "path) instead of writing over it.")
  }

  /** Current dim snapshot (business columns only). Throws on a virgin
    * store — check `exists` first. */
  def read(spark: SparkSession, path: String): DataFrame = {
    requireNotLegacy(spark, path)
    val m = currentManifest(spark, path)
      .getOrElse(throw new IllegalStateException(s"no committed dim at $path"))
    val dirs = m._2.values.toSeq.distinct.map(rel => s"$path/$rel")
    spark.read.option("mergeSchema", "true").parquet(dirs: _*)
  }

  def exists(spark: SparkSession, path: String): Boolean =
    currentManifest(spark, path).isDefined

  /** MERGE the batch into the store: last-write-wins per `pk` by
    * `versionCol` (batch wins ties). Only buckets containing batch keys
    * are read, merged, and rewritten.
    *
    * `nBuckets` is persisted in the manifest at first commit and validated
    * on every later upsert: a different value would hash keys into
    * different buckets than the committed layout, silently dropping
    * existing rows from the merge. Mismatch fails loudly. */
  def upsert(spark: SparkSession, batch: DataFrame, path: String,
      pk: String, versionCol: String,
      nBuckets: Int = DefaultBuckets): Unit = {
    val fs = fileSystem(spark)
    requireNotLegacy(spark, path)
    // one manifest read serves both the nBuckets check and the layout
    val text = manifestText(spark, path)
    text.flatMap(_._2.linesIterator.collectFirst {
      case l if l.startsWith("#nBuckets=") => l.stripPrefix("#nBuckets=").toInt
    }).foreach { stored =>
      require(stored == nBuckets,
        s"dim at $path was committed with nBuckets=$stored; upsert called " +
          s"with nBuckets=$nBuckets — refusing a silently-corrupting merge")
    }
    val current = text.map { case (v, t) =>
      (v, t.linesIterator.filter(l => l.nonEmpty && !l.startsWith("#")).map { line =>
        val Array(b, rel) = line.split('\t')
        b.toInt -> rel
      }.toMap)
    }
    val nextV = current.map(_._1 + 1).getOrElse(1L)
    val oldBuckets = current.map(_._2).getOrElse(Map.empty)

    val batchB = batch.withColumn("_bucket", bucketOf(pk, nBuckets))
    val touched = batchB.select("_bucket").distinct()
      .collect().map(_.getInt(0)).toSet // ≤ nBuckets entries — driver-safe
    // empty micro-batch (quiet streaming source): nothing to merge — do
    // not churn a new identical manifest version per trigger
    if (touched.isEmpty) return

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

    // immutable new version dir for the touched buckets. An existing dir
    // at this version is either crash debris OR a live concurrent writer's
    // uncommitted data — we can't tell which, so NEVER delete it: probe
    // for a fresh attempt-suffixed name instead. A loser/crasher leaves
    // only its own orphan dir, reclaimed by vacuum once the manifest
    // version moves past it.
    val base = f"data/v-$nextV%09d"
    val dataRel = Iterator.from(0)
      .map(a => if (a == 0) base else s"$base-a$a")
      .find(rel => !fs.exists(new Path(s"$path/$rel"))).get
    merged.write.partitionBy("_bucket").parquet(s"$path/$dataRel")

    // commit: old entries + touched buckets re-pointed, as manifest nextV,
    // headed by the persisted bucket count. Written to a tmp name, renamed
    // to its final fresh name. NOTE the atomicity + collision guarantees
    // are HDFS rename semantics: on S3A rename is a non-atomic copy+delete,
    // and on RawLocalFileSystem rename over an existing destination
    // succeeds — there the exists-check below narrows but cannot close the
    // concurrent-commit window. Single-writer-per-dim is the supported
    // model off HDFS (matches the reference's one Phoenix sink per table).
    val entries = (s"#nBuckets=$nBuckets" +:
      (oldBuckets ++ touched.map(b => b -> s"$dataRel/_bucket=$b"))
        .toSeq.sortBy(_._1).map { case (b, rel) => s"$b\t$rel" }).mkString("\n")
    val dir = manifestDir(path)
    fs.mkdirs(dir)
    val tmp = new Path(dir, f".m-$nextV%09d.tmp")
    val out = fs.create(tmp, true)
    try out.write(entries.getBytes("UTF-8")) finally out.close()
    val finalName = new Path(dir, f"m-$nextV%09d")
    if (fs.exists(finalName) || !fs.rename(tmp, finalName))
      throw new IllegalStateException(
        s"manifest commit collision at $path v$nextV (concurrent writer?)")
  }

  private def versionOf(vDirName: String): Long =
    vDirName.stripPrefix("v-").takeWhile(_.isDigit).toLong

  /** Delete data dirs no manifest-current bucket points to, but ONLY dirs
    * whose version is strictly below the current manifest version: a dir
    * at/above it may be a live concurrent writer's uncommitted data whose
    * commit would then point at deleted files. With that rule vacuum is
    * safe to run any time after upsert, even alongside an in-flight
    * writer; readers resolve through the latest manifest only. */
  def vacuum(spark: SparkSession, path: String): Unit = {
    val fs = fileSystem(spark)
    currentManifest(spark, path).foreach { case (v, buckets) =>
      val live = buckets.values.map(rel => rel.split('/')(1)).toSet // v-dirs
      val dataDir = new Path(path, "data")
      if (fs.exists(dataDir))
        fs.listStatus(dataDir).map(_.getPath)
          .filterNot(p => live(p.getName))
          // only version-shaped names are vacuum candidates: a stray dir
          // or staging artifact must be skipped, not crash the vacuum
          .filter(p => p.getName.matches("v-\\d+.*"))
          .filter(p => versionOf(p.getName) < v)
          .foreach(fs.delete(_, true))
    }
  }
}
