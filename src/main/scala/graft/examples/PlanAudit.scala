package graft.examples
import org.apache.spark.sql.SparkSession

/** One-off plan audit for newly added registry queries: prints the
  * physical-plan operator counts that matter at scale. */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", false)
      .appName("plan-audit").getOrCreate()
    val names = if (args.nonEmpty) args.toSeq
      else Seq("x_substring_dedup", "x_dsir_weights", "x_nb_classify")
    for (n <- names) {
      val df = graft.queries.Registry.byName(n).run(spark, "/root/testdata/sf0.001")
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      println(s"=== $n ===")
      println("  WindowExec:         " + "(?m)^.*Window ".r.findAllIn(plan).size)
      println("  BroadcastHashJoin:  " + "BroadcastHashJoin".r.findAllIn(plan).size)
      println("  SortMergeJoin:      " + "SortMergeJoin".r.findAllIn(plan).size)
      println("  ShuffledHashJoin:   " + "ShuffledHashJoin".r.findAllIn(plan).size)
      println("  hash Exchange:      " + "Exchange hashpartitioning".r.findAllIn(plan).size)
      println("  single Exchange:    " + "Exchange SinglePartition".r.findAllIn(plan).size)
    }
    spark.stop()
  }
}
