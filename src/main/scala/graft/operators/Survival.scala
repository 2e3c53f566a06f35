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

  /** Two-group log-rank test — "do these two cohorts repeat/churn/fail
    * at the same rate?", the hypothesis test that ships next to every
    * [[kaplanMeier]] curve. `spells` adds a boolean `grp` (group-1
    * membership) to (dur, ev).
    *
    * At each event time t (duration with ≥1 event across both groups):
    * observed group-1 events d1_t, expected e1_t = d_t·n1_t/n_t under
    * H0, and hypergeometric variance
    * v_t = n1_t·(n_t−n1_t)·d_t·(n_t−d_t) / (n_t²·(n_t−1)), summed over
    * event times; χ² = (O1−E1)²/V. O1 is an exact integer; E1 and V are
    * day-ordered left-to-right folds of per-day IEEE terms whose inputs
    * (risk sets, event counts) are exact integers — the same
    * fixed-tree discipline as the KM prefix product, so any engine
    * reproduces them bit-identically.
    *
    * Scale shape: identical to [[kaplanMeier]] — corpus-scale work is
    * the one per-(duration)-aggregate (map-side combined); risk-set
    * windows and the ordered folds run on the day-granular table,
    * bounded by the calendar span regardless of subject count.
    */
  def logRank(spells: DataFrame): DataFrame = {
    val byt = spells.groupBy(col("dur"))
      .agg(sum("ev").as("d"),
        sum(when(col("grp"), col("ev")).otherwise(lit(0))).as("d1"),
        count(lit(1)).as("c"),
        sum(when(col("grp"), 1L).otherwise(0L)).as("c1"))
    val wDesc = Window.orderBy(col("dur").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    byt
      .withColumn("n_risk", sum("c").over(wDesc))
      .withColumn("n1_risk", sum("c1").over(wDesc))
      .where(col("d") > 0)
      .select(col("dur"), col("d"), col("d1"), col("n_risk"), col("n1_risk"),
        expr("CAST(d AS DOUBLE) * CAST(n1_risk AS DOUBLE) " +
          "/ CAST(n_risk AS DOUBLE)").as("e1"),
        expr("""CASE WHEN n_risk > 1 THEN
                |  CAST(n1_risk AS DOUBLE) * CAST(n_risk - n1_risk AS DOUBLE)
                |    * CAST(d AS DOUBLE) * CAST(n_risk - d AS DOUBLE)
                |    / (CAST(n_risk AS DOUBLE) * CAST(n_risk AS DOUBLE)
                |       * CAST(n_risk - 1 AS DOUBLE))
                |ELSE CAST(0.0 AS DOUBLE) END""".stripMargin).as("v"))
      .agg(expr("array_sort(collect_list(struct(dur, d, d1, e1, v)))").as("xs"))
      .where(expr("size(xs) > 0"))
      .select(
        expr("CAST(size(xs) AS BIGINT)").as("n_event_times"),
        expr("CAST(aggregate(xs, 0L, (a, x) -> a + x.d1) AS BIGINT)").as("o1"),
        expr("CAST(ROUND(aggregate(xs, CAST(0.0 AS DOUBLE), " +
          "(a, x) -> a + x.e1), 6) AS DOUBLE)").as("e1"),
        expr("CAST(ROUND(aggregate(xs, CAST(0.0 AS DOUBLE), " +
          "(a, x) -> a + x.v), 6) AS DOUBLE)").as("v"),
        expr("""CAST(ROUND(
                |  CASE WHEN aggregate(xs, CAST(0.0 AS DOUBLE), (a, x) -> a + x.v) > 0
                |  THEN (CAST(aggregate(xs, 0L, (a, x) -> a + x.d1) AS DOUBLE)
                |        - aggregate(xs, CAST(0.0 AS DOUBLE), (a, x) -> a + x.e1))
                |     * (CAST(aggregate(xs, 0L, (a, x) -> a + x.d1) AS DOUBLE)
                |        - aggregate(xs, CAST(0.0 AS DOUBLE), (a, x) -> a + x.e1))
                |     / aggregate(xs, CAST(0.0 AS DOUBLE), (a, x) -> a + x.v)
                |  ELSE CAST(0.0 AS DOUBLE) END, 6) AS DOUBLE)""".stripMargin)
          .as("chi2"))
  }
}
