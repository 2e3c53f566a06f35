package graft

/** Plan-inspection harness: `runMain graft.Explain <sfDir> <query...>`
  * prints each declared query's final ADAPTIVE executed plan (after a
  * real run, so AQE re-plans and exchange reuse are visible) — the local
  * counterpart of the reference's `stages()`/`display_execution_plan`
  * introspection (reference `src/dataframe.rs:224-238`).
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = args.drop(1).toSeq
    val spark = Session.local("graft-explain")
    try names.foreach { n =>
      val df = SparkEntry.queries(n)(spark, dir)
      df.collect()
      println(s"==== $n ====")
      println(df.queryExecution.executedPlan.toString)
    } finally spark.stop()
  }
}
