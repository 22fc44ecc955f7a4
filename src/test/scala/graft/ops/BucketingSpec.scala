package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Bucketed join must plan with zero shuffles (the co-location claim). */
class BucketingSpec extends SparkTestBase {
  import spark.implicits._

  test("equal-bucket join plans SortMergeJoin with NO Exchange") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.sources.bucketing.enabled", "true")
    try {
      val orders = (1L to 1000L).map(i => (i, s"o$i")).toDF("o_id", "o_payload")
      val details = (1L to 3000L).map(i => (i, i % 1000 + 1, s"d$i"))
        .toDF("d_id", "d_order_id", "d_payload")
      Bucketing.writeBucketed(orders, "b_orders", "o_id", 8)
      Bucketing.writeBucketed(details, "b_details", "d_order_id", 8)

      val joined = Bucketing.bucketedJoin(spark, "b_orders", "b_details",
        "o_id", "d_order_id")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange"), s"bucketed join shuffled:\n$plan")
      assert(joined.count() == 3000)

      // contrast: the same join on unbucketed data DOES shuffle
      val plain = orders.join(details, col("o_id") === col("d_order_id"))
      assert(plain.queryExecution.executedPlan.toString.contains("Exchange")
        || plain.queryExecution.toString.contains("Exchange"))
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_details")
    }
  }
}
