package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Poisson bootstrap — the distributed bootstrap (Chamandy et al. 2012,
  * "Estimating Uncertainty for Massive Data Streams"): classic resampling
  * draws n rows with replacement B times, which is unshardable (every
  * resample needs global coordination); the Poisson approximation gives
  * each row an independent Poisson(1) multiplicity per replica, so the
  * whole procedure becomes ONE map-side pass — explode B replica tags,
  * weight each (row, replica) by a deterministic Poisson draw, partial-
  * aggregate per (group, replica). No shuffle of raw rows beyond the
  * group-by; replica state is B numbers per group.
  *
  * Determinism (the differential-oracle contract): the Poisson(1) draw is
  * an md5-uniform inverse-CDF lookup against DRIVER-computed cumulative
  * thresholds ([[Constraints.dpCumThresholds]]'s mechanism) — exp/
  * factorial never run in-plan, both engines embed identical literals and
  * replay the draw bit-identically. The multiplicity is truncated at 8
  * (P(X>8 | λ=1) ≈ 1e-6, the standard release-practical cut).
  */
object Bootstrap {

  /** Cumulative P(X ≤ k) for X ~ Poisson(1), k = 0 … bound−1, one fixed
    * driver-side fold; `#{t : u ≥ t}` over these thresholds draws the
    * truncated multiplicity in [0, bound].
    */
  def poissonCumThresholds(bound: Int = 8): Seq[Double] = {
    require(bound >= 1, "need bound >= 1")
    val probs = (0 until bound).scanLeft(math.exp(-1.0)) {
      (p, k) => p / (k + 1.0)
    }.take(bound) // P(0), P(1), ... P(bound-1)
    probs.scanLeft(0.0)(_ + _).drop(1)
  }

  /** Symmetric order-statistic CI indices for `replicas` sorted replica
    * means: (lo, hi) with lo = ceil(replicas·3/16) (so 16 → (3, 14), the
    * 75% percentile interval) and hi = replicas + 1 − lo — derived, never
    * hardcoded, so ci_lo < ci_hi holds for every legal replica count.
    */
  def ciIndices(replicas: Int): (Int, Int) = {
    require(replicas >= 4, "need >= 4 replicas")
    val lo = math.max(1, math.ceil(replicas * 3.0 / 16).toInt)
    (lo, replicas + 1 - lo)
  }

  /** Per-group bootstrap CI of the mean of `valueCents` (an exact-integer
    * column, e.g. money in cents): B=16 Poisson replicas, each replica's
    * mean one IEEE division, CI = the [[ciIndices]] order statistics of
    * the sorted replica means (16 → 3rd/14th, a 75% percentile interval).
    * Output: group cols, n, mean (exact-sum point estimate), ci_lo,
    * ci_hi — all means scaled by `scaleDiv` (100 for cents → currency
    * units). A replica whose every draw is 0 has no mean: both engines
    * FILTER the NULL replica mean before sorting (Spark's collect_list
    * drops nulls silently; DuckDB's list() keeps them — the explicit
    * filter pins identical order statistics), and the order-statistic
    * lookup is try_element_at so a shrunken array yields NULL bounds in
    * both engines instead of an ANSI error.
    */
  def poissonMeanCI(df: DataFrame, groupCols: Seq[String], valueCents: String,
                    idCol: String, seed: String, replicas: Int = 16,
                    scaleDiv: Int = 100): DataFrame = {
    require(groupCols.nonEmpty && replicas >= 4, "need groups and >= 4 replicas")
    // threshold count as a fixed comparison chain, NOT size(filter(...)):
    // the higher-order function skips whole-stage codegen, and this
    // projection sits on the exploded |rows|×B hot path (measured 21 s →
    // ~3 s at sf0.1 for the swap); the DuckDB oracle keeps list_filter —
    // identical counts either way
    val wExpr = poissonCumThresholds()
      .map(c => s"(CASE WHEN __u >= CAST(${c}D AS DOUBLE) THEN 1 ELSE 0 END)")
      .mkString(" + ")
    // spread before the explode (r16 opt): rows×B md5 draws + the
    // comparison chain are compute-amplified map work that serialized
    // into ONE task on the single-row-group fixtures (the cdc_chunks
    // precedent — TextAnalysis.spread is identity on multi-split tables)
    val boot = graft.llm.TextAnalysis.spread(df
      .select((groupCols.map(col) :+ col(valueCents).as("__v")) :+
        col(idCol).as("__id"): _*))
      .withColumn("__b", explode(expr(s"sequence(0, ${replicas - 1})")))
      .withColumn("__u", expr(
        s"CAST(conv(substr(md5(concat_ws('|', '$seed', __b, __id)), 1, 15), 16, 10) AS BIGINT)" +
          s" / CAST(${1L << 60} AS DOUBLE)"))
      .withColumn("__w", expr(wExpr))
      .groupBy(groupCols.map(col) :+ col("__b"): _*)
      .agg(sum(col("__w")).as("__nb"), sum(col("__w") * col("__v")).as("__sb"))
      .withColumn("__m", expr(
        s"CAST(ROUND(CAST(__sb AS DOUBLE) / NULLIF(__nb, 0) / $scaleDiv, 6) AS DOUBLE)"))
      .where(col("__m").isNotNull)
      .groupBy(groupCols.map(col): _*)
      .agg(sort_array(collect_list(col("__m"))).as("__ms"))
    val point = df
      .groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n"),
        sum(col(valueCents).cast("decimal(38,0)")).as("__s"))
      .withColumn("mean", expr(
        s"CAST(ROUND(CAST(__s AS DOUBLE) / n / $scaleDiv, 6) AS DOUBLE)"))
      .drop("__s")
    val (loIdx, hiIdx) = ciIndices(replicas)
    point.join(boot, groupCols)
      .select(groupCols.map(col) ++ Seq(col("n"), col("mean"),
        expr(s"try_element_at(__ms, $loIdx)").as("ci_lo"),
        expr(s"try_element_at(__ms, $hiIdx)").as("ci_hi")): _*)
  }
}
