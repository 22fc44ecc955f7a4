package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.ext.TextAnalysis

/** Bound provenance for x_winnow_rolling_bounds (BoundsProbe pattern):
  * per-doc fingerprint-count ratio rolling/md5 across corpora, plus the
  * wall-clock gap between the two hash kernels — the measurement behind
  * SCALING.md §6h and the query's density band. */
object WinnowRollingProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](n: String)(f: => T): T = {
      val t = System.nanoTime(); val r = f
      println(f"[winprobe] $n%-28s ${(System.nanoTime() - t) / 1e9}%.2f s"); r
    }
    for (dir <- Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      val docs = Tables.load(spark, dir, "documents")
      for (i <- 1 to 2) {
        time(s"$dir md5 #$i") {
          TextAnalysis.winnowFingerprints(docs, "text", "doc_id")
            .write.format("noop").mode("overwrite").save() }
        time(s"$dir rolling #$i") {
          TextAnalysis.winnowFingerprintsRolling(docs, "text", "doc_id")
            .write.format("noop").mode("overwrite").save() }
      }
      val m = TextAnalysis.winnowFingerprints(docs, "text", "doc_id")
        .groupBy("doc_id").agg(count(lit(1)).as("n"))
      val r = TextAnalysis.winnowFingerprintsRolling(docs, "text", "doc_id")
        .groupBy("doc_id").agg(count(lit(1)).as("nr"))
      val stats = m.join(r, Seq("doc_id"))
        .select(col("n"), col("nr"),
          (col("nr").cast("double") / col("n")).as("ratio"),
          abs(col("nr") - col("n")).as("absdiff"))
        .agg(min("ratio"), max("ratio"), max("absdiff"),
          min("n"), max("n"), count(lit(1)))
        .collect()(0)
      println(s"[winprobe] $dir ratio min/max=${stats.getDouble(0)}/" +
        s"${stats.getDouble(1)} absdiff max=${stats.getLong(2)} " +
        s"n min/max=${stats.getLong(3)}/${stats.getLong(4)} docs=${stats.getLong(5)}")

      // pipeline-level: the decontamination gate end-to-end on each
      // kernel (VERDICT r10 #5 — the kernel win must show up in a real
      // consumer), plus the flagged-set agreement behind
      // x_decontaminate_rolling's bound
      val bench = col("doc_id") % 7 === 0
      for (i <- 1 to 2) {
        time(s"$dir decon md5 #$i") {
          TextAnalysis.contaminationWithin(docs, "text", "doc_id", bench)
            .write.format("noop").mode("overwrite").save() }
        time(s"$dir decon rolling #$i") {
          TextAnalysis.contaminationWithin(docs, "text", "doc_id", bench,
              rolling = true)
            .write.format("noop").mode("overwrite").save() }
      }
      val mf = TextAnalysis.contaminationWithin(docs, "text", "doc_id", bench)
        .select("doc_id")
      val rf = TextAnalysis.contaminationWithin(docs, "text", "doc_id", bench,
        rolling = true).select("doc_id")
      val nInter = mf.join(rf, Seq("doc_id"), "left_semi").count()
      val nM = mf.count(); val nR = rf.count()
      val nUnion = nM + nR - nInter
      println(f"[winprobe] $dir flagged md5=$nM rolling=$nR inter=$nInter " +
        f"jaccard=${nInter.toDouble / math.max(nUnion, 1L)}%.4f")
    }
    spark.stop()
  }
}
