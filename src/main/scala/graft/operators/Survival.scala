package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Survival analysis over right-censored spells — the time-to-event
  * toolbox (time to repeat purchase, time to churn, time to failure)
  * that product analytics runs next to the funnel/retention queries.
  *
  * Determinism discipline: every risk set and event count is an exact
  * integer; each Kaplan–Meier factor (1 − d/n) is ONE correctly-rounded
  * IEEE division, and the survival curve is the left-to-right product of
  * those factors in event-time order — a fixed IEEE tree any engine
  * reproduces bit-identically (same rule as the repo's other ordered
  * folds; no exp/log-of-sums shortcut, which libm would de-determinize).
  */
object Survival {

  /** Kaplan–Meier estimator. `spells`: one row per subject with
    * `dur` (integer duration, e.g. days) and `ev` (1 = event observed,
    * 0 = right-censored at `dur`). Output: one row per EVENT time —
    * (t_days, n_risk, n_events, surv) with surv = Π_{u≤t} (1 − d_u/n_u).
    *
    * Scale shape: the corpus-scale work is the per-duration aggregate
    * (map-side combined — one row per distinct duration crosses the
    * wire). The risk-set window and the prefix product run on the
    * DAY-GRANULAR table, bounded by the calendar span regardless of
    * subject count, so the single-partition fold is metadata-scale by
    * construction (the llm_mixture_temperature / ts_interval_union
    * bounded-table precedent). Prefix products are computed INSIDE the
    * one collected row via slice-folds — O(k²) multiplies on k event
    * times, never a k-copy array blow-up across rows.
    */
  def kaplanMeier(spells: DataFrame): DataFrame = {
    val byt = spells.groupBy(col("dur"))
      .agg(sum("ev").as("d"), count(lit(1)).as("c"))
    val wDesc = Window.orderBy(col("dur").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    byt.withColumn("n_risk", sum("c").over(wDesc))
      .where(col("d") > 0)
      .select(col("dur"), col("d"), col("n_risk"),
        expr("CAST(1.0 AS DOUBLE) - CAST(d AS DOUBLE) / CAST(n_risk AS DOUBLE)")
          .as("term"))
      .agg(expr("array_sort(collect_list(struct(dur, d, n_risk, term)))")
        .as("xs"))
      // Spark's sequence(1, 0) DESCENDS rather than returning empty —
      // an all-censored input (empty xs) must emit zero rows, not index
      // into the empty array
      .where(expr("size(xs) > 0"))
      .select(expr(
        """explode(transform(sequence(1, size(xs)), j -> struct(
          |  xs[j - 1].dur AS t_days,
          |  xs[j - 1].n_risk AS n_risk,
          |  xs[j - 1].d AS n_events,
          |  aggregate(transform(slice(xs, 1, j), v -> v.term),
          |            CAST(1.0 AS DOUBLE), (a, v) -> a * v) AS surv)))"""
          .stripMargin).as("r"))
      .select(col("r.t_days").as("t_days"),
        col("r.n_risk").as("n_risk"),
        col("r.n_events").as("n_events"),
        expr("CAST(ROUND(r.surv, 6) AS DOUBLE)").as("surv"))
  }
}
