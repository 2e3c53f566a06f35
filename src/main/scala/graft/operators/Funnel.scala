package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Ordered multi-step funnel — for each key (user), the earliest timestamp
  * of step 1, then the earliest step-2 event STRICTLY AFTER that (within an
  * optional horizon), then the earliest step-3 event after THAT, and so on
  * (the product-analytics "view → click → purchase" conversion funnel; the
  * sequential-pattern surface the reference's event-analytics users build
  * from window functions by hand).
  *
  * Composition (preference (a) — plain declarative ops, no custom plan):
  * one keyed min-aggregate per step, each joined to the previous step's
  * frontier. Every aggregate and join shuffles on the SAME key column, so
  * at cluster scale the exchanges line up (AQE reuses the partitioning
  * where sizes allow), and each step's input is the step-filtered event
  * subset — never the full corpus re-shuffled per step. No window over a
  * whole per-user timeline is needed, so one hyperactive user cannot
  * serialize a partition the way a naive `collect_list(sort)` funnel
  * would.
  *
  * Semantics (pinned by FunnelSpec and the `ts_funnel` differential
  * entry): step k+1 must be STRICTLY after step k (`ts > prev`), and
  * within `prev + horizon` when a horizon is given (inclusive upper
  * bound). Users missing step 1 entirely are absent from the output;
  * users who stall keep NULL timestamps for the steps they never reached.
  * The per-step timestamp is the frontier-greedy one (earliest step-1,
  * then earliest qualifying step-2, ...), which is the standard funnel
  * definition — NOT the global optimum over all orderings.
  */
object Funnel {

  /** @param events  the event frame
    * @param keyCol  grouping key (e.g. user_id)
    * @param tsCol   event-time column
    * @param steps   ordered (stepName, predicate) list; output carries one
    *                `<stepName>_ts` column per step
    * @param horizon optional max gap between consecutive steps, as a SQL
    *                interval expression (e.g. "INTERVAL 7 DAYS")
    */
  def ordered(events: DataFrame, keyCol: String, tsCol: String,
              steps: Seq[(String, Column)], horizon: Option[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")

    val head = events.where(steps.head._2)
      .groupBy(keyCol).agg(min(tsCol).as(s"${steps.head._1}_ts"))

    // Each later step: candidates = step-filtered events joined to the
    // previous frontier on the key, kept when they fall in the window
    // after the previous step, min-aggregated back to one row per key.
    val perStep = steps.tail.scanLeft((head, s"${steps.head._1}_ts")) {
      case ((prev, prevTs), (name, pred)) =>
        val after = col(tsCol) > col(prevTs)
        val inWindow = horizon match {
          case Some(h) => after && col(tsCol) <= expr(s"$prevTs + $h")
          case None    => after
        }
        val frontier = prev.select(col(keyCol), col(prevTs))
        val next = events.where(pred)
          .select(col(keyCol), col(tsCol))
          .join(frontier, keyCol)
          .where(inWindow)
          .groupBy(keyCol).agg(min(tsCol).as(s"${name}_ts"))
        (next, s"${name}_ts")
    }.map(_._1)

    // Left-join every step frame back onto the step-1 population so users
    // who stalled keep their partial progress (NULL later steps).
    perStep.tail.foldLeft(perStep.head) { (acc, step) =>
      acc.join(step, Seq(keyCol), "left")
    }
  }

  /** Convenience summary: per-step reach counts + conversion from step 1
    * (one tiny aggregate over `ordered`'s output — the dashboard row).
    */
  def summary(funnel: DataFrame, keyCol: String, stepNames: Seq[String]): DataFrame = {
    val aggs = stepNames.map(n => count(col(s"${n}_ts")).as(s"${n}_users"))
    val counts = funnel.agg(aggs.head, aggs.tail: _*)
    val first = col(s"${stepNames.head}_users")
    counts.select(
      stepNames.map(n => col(s"${n}_users")) ++
        stepNames.map(n =>
          round(col(s"${n}_users").cast("double") / nullif(first.cast("double"), lit(0.0)), 6)
            .as(s"${n}_rate")): _*)
  }

  private def nullif(c: Column, v: Column): Column = when(c === v, lit(null)).otherwise(c)
}
