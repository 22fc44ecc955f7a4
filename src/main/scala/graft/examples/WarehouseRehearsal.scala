package graft.examples

import org.apache.spark.sql.SparkSession
import graft.streaming.Warehouse

/** SCALING §9 measurement: the concurrent warehouse under MULTI-BATCH
  * steady-state flow — the property st_warehouse_e2e's single-file gate
  * cannot see. The ODS log is sliced into N time-ordered chunks replayed
  * one per micro-batch (maxFilesPerTrigger=1), so all ten layer queries
  * run live simultaneously: BaseLog emits page files while UniqueVisit /
  * Bounce / the four DWS apps are already consuming earlier ones, and
  * every layer's checkpoint, state store, and trigger loop contend for
  * the same local[32] JVM.
  *
  * Reports, per layer, from StreamingQueryProgress: micro-batches run,
  * input rows, mean/max batch duration, and final keyed-state rows —
  * then the end-to-end wall and events/s. The oracle-relevant outputs
  * stay gated: after the run the same equivalence booleans as
  * st_warehouse_e2e are computed, so a steady-state number from a
  * diverging chain can never be reported (batching-invariance of every
  * layer is part of what this measures).
  *
  * Args: [sfDir] [chunks] [backend]  (default /root/testdata/sf0.1, 20,
  * hdfs; pass `rocksdb` to run the whole chain on the production state
  * backend — RocksDB with changelog checkpointing — and prove the same
  * conformance booleans hold there)
  */
object WarehouseRehearsal {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val chunks = args.lift(1).map(_.toInt).getOrElse(20)
    val rocks = args.lift(2).contains("rocksdb")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if (rocks) graft.streaming.Runner.useRocksDBStateStore(spark)

    val root = java.nio.file.Files.createTempDirectory("graft_whr").toString
    val lay = Warehouse.Layout(root)
    Warehouse.genBaseLog(spark, sfDir, lay, chunks = chunks)
    Warehouse.genBaseDb(spark, sfDir, lay)
    val t0 = System.nanoTime()
    val qs = Warehouse.start(spark, lay,
      odsOptions = Map("maxFilesPerTrigger" -> "1"))
    try {
      Warehouse.drainAll(spark, sfDir, lay, qs)
      val wall = (System.nanoTime() - t0) / 1e9
      var totalState = 0L
      println(f"[whr] layer           batches  rows     meanMs  maxMs  stateRows")
      for ((name, q) <- qs.toSeq.sortBy(_._1)) {
        val ps = q.recentProgress.toSeq.filter(_.numInputRows > 0)
        val rows = ps.map(_.numInputRows).sum
        val durs = ps.map(_.batchDuration)
        val state = q.recentProgress.lastOption.toSeq
          .flatMap(_.stateOperators.toSeq).map(_.numRowsTotal).sum
        totalState += state
        println(f"[whr] $name%-15s ${ps.size}%7d  $rows%7d  " +
          f"${if (durs.nonEmpty) durs.sum / durs.size else 0L}%6d  " +
          f"${if (durs.nonEmpty) durs.max else 0L}%5d  $state%9d")
      }
      val events = spark.read.parquet(s"$sfDir/events.parquet").count()
      println(f"[whr] chunks=$chunks backend=${if (rocks) "rocksdb" else "hdfs"} " +
        f"wall=$wall%.1f s  end-to-end ${events / wall}%.0f events/s  " +
        f"totalStateRows=$totalState")
      // conformance under multi-batch flow: same booleans as the gate query
      val gate = Warehouse.equivalenceGate(spark, lay).collect()(0)
      val names = Seq("uv_ok", "uj_ok", "order_ok", "payment_ok",
        "province_ok", "keyword_ok", "product_ok")
      val flags = names.zipWithIndex.map { case (n, i) =>
        s"$n=${gate.getBoolean(i)}" }
      println(s"[whr] conformance: ${flags.mkString(" ")}")
      require(names.indices.forall(gate.getBoolean),
        "multi-batch chain diverged from its batch twins")
    } finally qs.values.foreach(_.stop())
    spark.stop()
  }
}
