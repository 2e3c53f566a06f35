package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

/** One shared SparkSession for the whole test JVM (suites run sequentially;
  * see `Test / parallelExecution := false` in build.sbt — Tables.register
  * re-points the temp views when a suite switches scale factors, so two
  * suites must not interleave on different dirs).
  */
object TestSessions {
  lazy val spark: SparkSession = Session.local("graft-test")
}

trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSessions.spark
  val sfSmoke = "/root/testdata/sf0.001"
  val sfBench = "/root/testdata/sf0.1"

  /** Static physical plan (pre-execution: AQE initial plan). */
  def staticPlan(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  /** Full PushedFilters metadata of every parquet scan in the plan
    * (plan.toString truncates long filter lists).
    */
  def pushedFilters(df: DataFrame): String =
    df.queryExecution.sparkPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.metadata.getOrElse("PushedFilters", "")
    }.mkString("; ")

  /** Final adaptive plan: collect() drives df's own QueryExecution, after
    * which AdaptiveSparkPlanExec.toString renders the re-planned tree.
    */
  def finalPlan(df: DataFrame): String = {
    df.collect()
    df.queryExecution.executedPlan.toString
  }
}
