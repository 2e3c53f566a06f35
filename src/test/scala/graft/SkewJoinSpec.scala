package graft

import org.apache.spark.sql.functions._

/** AQE skew-join handling — the runtime re-plan that keeps a hot key from
  * serializing a join at scale. One key owning 90% of a 200k-row side
  * makes its shuffle partition dwarf the median; with test-scale
  * thresholds AQE must split that partition (the `skew=true` marker on
  * the sort-merge join) instead of letting one task do most of the work.
  */
class SkewJoinSpec extends SparkSpec {

  test("AQE splits the hot-key partition of a skewed join") {
    val confs = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "256KB",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2.0",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "256KB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val big = spark.range(0, 200000).select(
        expr("CASE WHEN id % 10 <> 0 THEN CAST(0 AS BIGINT) ELSE id END").as("k"),
        col("id").as("payload"))
      val dim = spark.range(0, 200000).select(
        col("id").as("k"), expr("id * 2").as("v"))
      val joined = big.join(dim, "k").select(sum("payload").as("s"), sum("v").as("sv"))
      val plan = finalPlan(joined)
      assert(plan.contains("skew=true"),
        s"AQE did not split the skewed partition:\n${plan.take(4000)}")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
