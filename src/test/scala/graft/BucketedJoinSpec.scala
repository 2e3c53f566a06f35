package graft

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.Exchange
import org.apache.spark.sql.execution.joins.SortMergeJoinExec
import org.apache.spark.sql.functions._

/** Bucketed co-located join: when both sides are bucketed into the same
  * bucket count on the join key, the sort-merge join must read buckets in
  * place — zero Exchange anywhere under the join. This is the SURVEY
  * "bucketing for co-located joins" scale path made checkable.
  */
class BucketedJoinSpec extends SparkSpec {

  test("same-bucketing join plans with no shuffle under the join") {
    Tables.register(spark, sfSmoke)
    Tables.dropManaged(spark, "bt_orders")
    Tables.dropManaged(spark, "bt_customer")
    spark.table("orders").write.mode("overwrite")
      .bucketBy(8, "o_custkey").sortBy("o_custkey").saveAsTable("bt_orders")
    spark.table("customer").write.mode("overwrite")
      .bucketBy(8, "c_custkey").sortBy("c_custkey").saveAsTable("bt_customer")
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val prev = spark.conf.get(key)
    spark.conf.set(key, "-1") // force the non-broadcast path
    try {
      val joined = spark.table("bt_orders")
        .join(spark.table("bt_customer"), expr("o_custkey = c_custkey"))
        .groupBy("c_mktsegment").agg(count("*").as("n"))
      val plan = joined.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.inputPlan
        case p => p
      }
      val joins = plan.collect { case j: SortMergeJoinExec => j }
      assert(joins.nonEmpty, s"expected a sort-merge join:\n$plan")
      joins.foreach { j =>
        val shuffles = j.collect { case e: Exchange => e }
        assert(shuffles.isEmpty,
          s"bucketed join still shuffles its inputs:\n$j")
      }
      // scans report bucket pruning metadata
      assert(plan.toString.contains("Bucketed: true"))
    } finally spark.conf.set(key, prev)
  }

  test("equality filter on the bucket key prunes to one bucket") {
    Tables.register(spark, sfSmoke)
    // bt_orders persists from the co-location test when suites share the
    // session; rebuild defensively if a lone run starts here
    if (!spark.catalog.tableExists("bt_orders")) {
      Tables.dropManaged(spark, "bt_orders")
      spark.table("orders").write.mode("overwrite")
        .bucketBy(8, "o_custkey").sortBy("o_custkey").saveAsTable("bt_orders")
    }
    // autoBucketedScan only weighs join/agg interest, not pruning — a
    // plain filter query must pin the bucketed read to get it (the same
    // setting a deployment uses for point-lookup-heavy bucketed tables)
    val key = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
    val prev = spark.conf.get(key)
    spark.conf.set(key, "false")
    try {
      val probe = spark.table("bt_orders").where(col("o_custkey") === 42L)
      val scan = probe.queryExecution.executedPlan.toString
      // the scan must read 1 of 8 buckets, not the whole table — the
      // predicate-to-bucket pruning that makes bucketed layouts pay at
      // read time, not only at join time
      assert(scan.contains("SelectedBucketsCount: 1 out of 8"),
        s"bucket pruning did not engage:\n$scan")
    } finally spark.conf.set(key, prev)
  }
}
