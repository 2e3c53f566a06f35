package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Data-quality constraint validation — the admission gate a training-data
  * pipeline runs before a corpus snapshot is accepted (the role Deequ-style
  * checks play next to the reference's query surface). Every check returns
  * the same long-form verdict schema `(rule, n_checked, n_violations,
  * pass)` so heterogeneous checks union into one report.
  *
  * Scale shape, per check kind:
  *   - [[checkPredicates]]: N row-level rules cost ONE scan and ONE
  *     hash aggregation total (each rule is a conditional SUM inside the
  *     same agg — partial map-side, a single 1-row exchange). Adding a
  *     rule adds a codegen'd expression, not a pass over 100 TB.
  *   - [[checkUnique]]: one groupBy on the key (the unavoidable shuffle —
  *     same key layout a dedup would use) + a 1-row re-aggregation of the
  *     group counts.
  *   - [[checkForeignKey]]: child LEFT ANTI joins the parent's DISTINCT
  *     keys; the distinct collapses the parent map-side first, and AQE
  *     broadcasts it when (as for real dimension tables) it is small.
  *
  * NULL semantics are pinned: a rule must evaluate TRUE to pass — a NULL
  * predicate result counts as a violation (so `x BETWEEN 1 AND 50` flags
  * NULL x), and NULL foreign keys are excluded from `n_checked` (SQL FK
  * semantics: NULL references nothing and violates nothing).
  */
object Constraints {

  private val verdictCols = Seq("rule", "n_checked", "n_violations", "pass")

  private def verdict(df: DataFrame): DataFrame =
    df.select(col("rule"), col("n_checked"),
      coalesce(col("n_violations"), lit(0L)).as("n_violations"),
      (coalesce(col("n_violations"), lit(0L)) === 0L).as("pass"))

  /** Evaluate row-level boolean rules in one scan + one aggregation.
    * Output: one verdict row per rule.
    */
  def checkPredicates(df: DataFrame, rules: Seq[(String, Column)]): DataFrame = {
    require(rules.nonEmpty, "checkPredicates needs at least one rule")
    val aggs = count(lit(1)).as("__n") +: rules.map { case (name, c) =>
      sum(when(coalesce(c, lit(false)), 0L).otherwise(1L)).as(s"__v_$name")
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    // one row, 1+N columns -> N long-form rows; stack is a projection-time
    // generator over a single row, not a shuffle
    val stackArgs = rules.map { case (name, _) => s"'$name', __v_$name" }
    verdict(one.selectExpr(
      s"stack(${rules.size}, ${stackArgs.mkString(", ")}) AS (rule, n_violations)",
      "__n AS n_checked"))
  }

  /** Key-uniqueness check: `n_violations` = rows whose key occurs more
    * than once (every member of a duplicated key group counts).
    */
  def checkUnique(df: DataFrame, keyCols: Seq[String], name: String): DataFrame = {
    val grouped = df.groupBy(keyCols.map(col): _*).agg(count(lit(1)).as("__c"))
    verdict(grouped.agg(
        sum(col("__c")).as("n_checked"),
        sum(when(col("__c") > 1, col("__c")).otherwise(0L)).as("n_violations"))
      .withColumn("rule", lit(name)))
  }

  /** Referential-integrity check: non-null `fkCol` values of `child` must
    * exist in `parent.pkCol`.
    */
  def checkForeignKey(child: DataFrame, fkCol: String,
                      parent: DataFrame, pkCol: String,
                      name: String): DataFrame = {
    val keys = child.select(col(fkCol)).where(col(fkCol).isNotNull)
    val orphans = keys.join(
      parent.select(col(pkCol).as(fkCol)).distinct(), Seq(fkCol), "left_anti")
    verdict(keys.agg(count(lit(1)).as("n_checked"))
      .crossJoin(orphans.agg(count(lit(1)).as("n_violations")))
      .withColumn("rule", lit(name)))
  }

  /** Union heterogeneous check outputs into one ordered report. */
  def report(checks: Seq[DataFrame]): DataFrame = {
    require(checks.nonEmpty, "report needs at least one check")
    checks.map(_.select(verdictCols.map(col): _*))
      .reduce(_.unionAll(_)).orderBy("rule")
  }

  /** k-anonymity audit over a quasi-identifier combination: one row per
    * equivalence class with its size and whether it meets the k floor —
    * the privacy admission gate a corpus with user-derived metadata runs
    * before release (classes below k re-identify individuals; their rows
    * must be suppressed or generalized). One scan + one partial-aggregated
    * groupBy, like every other admission rule here.
    */
  def kAnonymity(df: DataFrame, quasiCols: Seq[String], k: Long): DataFrame = {
    require(quasiCols.nonEmpty, "quasiCols must be non-empty")
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("class_size"))
      .withColumn("k_ok", col("class_size") >= k)
  }

  /** l-diversity audit — [[kAnonymity]]'s companion: a k-anonymous
    * equivalence class still re-identifies its members' SENSITIVE
    * attribute if everyone in it shares one value (the homogeneity
    * attack); each class must carry at least `l` distinct sensitive
    * values. One scan + one partial-aggregated groupBy with a distinct
    * count — the same admission-gate shape as every rule here.
    */
  def lDiversity(df: DataFrame, quasiCols: Seq[String], sensitiveCol: String,
                 l: Long): DataFrame = {
    require(quasiCols.nonEmpty, "quasiCols must be non-empty")
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("class_size"),
        countDistinct(col(sensitiveCol)).as("n_sensitive"))
      .withColumn("l_ok", col("n_sensitive") >= l)
  }

  /** t-closeness audit — the third rung of the privacy ladder after
    * [[kAnonymity]] and [[lDiversity]]: an l-diverse class can still leak
    * if its sensitive-value DISTRIBUTION differs sharply from the
    * corpus-wide one (the skewness attack); each class's total-variation
    * distance to the global distribution must stay ≤ t. All arithmetic is
    * exact-integer until the single output division: with class counts
    * c_gv, class size n_g, global counts C_v and corpus size N,
    *   TVD·(2·N·n_g) = Σ_{v∈class} |c_gv·N − C_v·n_g| + (N − Σ_{v∈class} C_v)·n_g
    * (the second term folds every sensitive value ABSENT from the class —
    * no class×value cross join is ever materialized). The t gate compares
    * the rational t = tNum/tDen cross-multiplied in integers, so the
    * verdict never touches IEEE; products ride in DECIMAL so corpus-scale
    * N·c never overflows BIGINT. Plan shape: one scan → (quasi, sensitive)
    * partial-agg, a broadcast of the |V|-row global histogram, one class
    * window — the same admission-gate economics as every rule here.
    */
  def tCloseness(df: DataFrame, quasiCols: Seq[String], sensitiveCol: String,
                 tNum: Long, tDen: Long): DataFrame = {
    require(quasiCols.nonEmpty, "quasiCols must be non-empty")
    require(tNum >= 0 && tDen > 0, "t must be a non-negative rational")
    val cls = df.groupBy((quasiCols :+ sensitiveCol).map(col): _*)
      .agg(count(lit(1)).as("__c_gv"))
    val glob = df.groupBy(col(sensitiveCol))
      .agg(count(lit(1)).as("__c_v"))
    val tot = glob.agg(sum(col("__c_v")).cast("decimal(18,0)").as("__n"))
    val wCls = Window.partitionBy(quasiCols.map(col): _*)
    val dec = (c: String) => col(c).cast("decimal(18,0)")
    cls
      .join(broadcast(glob), Seq(sensitiveCol))
      .crossJoin(broadcast(tot))
      .withColumn("__n_g", sum(col("__c_gv")).over(wCls).cast("decimal(18,0)"))
      .groupBy(quasiCols.map(col): _*)
      .agg(
        max(col("__n_g")).as("__ng"),
        max(col("__n")).as("__nn"),
        sum(abs(dec("__c_gv") * dec("__n") - dec("__c_v") * dec("__n_g")))
          .as("__present"),
        sum(dec("__c_v")).as("__cv_present"))
      .withColumn("__num",
        col("__present") + (col("__nn") - col("__cv_present")) * col("__ng"))
      .withColumn("__den", lit(2).cast("decimal(18,0)") * col("__nn") * col("__ng"))
      .select(quasiCols.map(col) ++ Seq(
        col("__ng").cast("long").as("class_size"),
        round(col("__num").cast("double") / col("__den").cast("double"), 6)
          .as("tvd"),
        (col("__num") * lit(tDen).cast("decimal(18,0)") <=
          col("__den") * lit(tNum).cast("decimal(18,0)")).as("t_ok")): _*)
  }

  /** Cumulative inverse-CDF thresholds for the truncated two-sided
    * geometric distribution p(k) ∝ α^|k|, α = exp(-ε), support
    * [-bound, bound]: returns P(Z ≤ k) for k = -bound … bound-1, so
    * noise(u) = -bound + #{k : u ≥ t_k}. Computed DRIVER-side with one
    * fixed fold order — exp/pow never run inside either engine's plan;
    * both embed these exact doubles as literals, which is what makes
    * the differential oracle able to replay the draw bit-identically.
    */
  def dpCumThresholds(eps: Double, bound: Int): Seq[Double] = {
    require(eps > 0 && bound >= 1, "need eps > 0 and bound >= 1")
    val alpha = math.exp(-eps)
    val weights = (-bound to bound).map(k => math.pow(alpha, math.abs(k).toDouble))
    val z = weights.foldLeft(0.0)(_ + _)
    weights.scanLeft(0.0)(_ + _).drop(1).dropRight(1).map(_ / z)
  }

  /** ε-DP noisy histogram via the geometric mechanism (Ghosh/
    * Roughgarden/Sundararajan 2009 — the discrete Laplace analogue,
    * utility-optimal for counting queries): one partial-aggregated
    * groupBy builds the class counts, then a per-row projection adds
    * integer noise from the two-sided geometric with α = exp(-ε),
    * truncated to ±`bound` (the release-practical variant; truncation
    * leaves ≈α^bound tail mass, the usual (ε, δ) accounting). The draw
    * is DETERMINISTIC given (seed, class key): u = md5-uniform of the
    * seeded key, noise = inverse-CDF lookup against [[dpCumThresholds]]
    * literals. Seeded noise is also what a production release wants —
    * the same snapshot publishes the same histogram twice instead of
    * leaking a fresh draw per run. Counts are clamped at 0
    * (post-processing, DP-safe). The true count never leaves the plan.
    */
  def dpNoisyCounts(df: DataFrame, keyCols: Seq[String], eps: Double,
                    seed: String, bound: Int = 8): DataFrame = {
    require(keyCols.nonEmpty, "keyCols must be non-empty")
    val cumLit = dpCumThresholds(eps, bound)
      .map(c => s"CAST(${c}D AS DOUBLE)").mkString("array(", ", ", ")")
    val keyExpr = keyCols.map(c => s"CAST($c AS STRING)")
      .mkString(s"concat_ws('|', '$seed', ", ", ", ")")
    df.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("__cnt"))
      .withColumn("__u", expr(
        s"CAST(conv(substr(md5($keyExpr), 1, 15), 16, 10) AS BIGINT)" +
          s" / CAST(${1L << 60} AS DOUBLE)"))
      .withColumn("noise", expr(
        s"CAST(size(filter($cumLit, c -> __u >= c)) - $bound AS INT)"))
      .withColumn("noisy_count",
        expr("CAST(GREATEST(0, __cnt + noise) AS BIGINT)"))
      .drop("__cnt", "__u")
  }

  /** Benford expected leading-digit fractions log10(1 + 1/d), d = 1…9 —
    * computed ONCE on the driver (log never runs in-plan; both engines
    * embed the identical literals, the [[dpCumThresholds]] discipline).
    */
  def benfordFracs: Seq[Double] = (1 to 9).map(d => math.log10(1.0 + 1.0 / d))

  /** Benford's-law audit of a positive integer measure (fraud /
    * fabrication screening — synthesized or tampered financial columns
    * drift from the log-uniform leading-digit law): per leading digit,
    * the observed count, observed vs expected fraction, and the χ²
    * contribution (n_obs − n·e)²/(n·e). One scan into a 9-row aggregate;
    * the total-count frame broadcasts back into the projection. The
    * per-digit decomposition is emitted instead of the summed statistic
    * — strictly more informative, and it keeps every division a fixed
    * two-operand IEEE tree (a cross-digit sum would fold in aggregation
    * order).
    */
  def benford(df: DataFrame, centsCol: String): DataFrame = {
    val obs = df.where(col(centsCol) > 0)
      .select(expr(s"CAST(substr(CAST($centsCol AS STRING), 1, 1) AS INT)")
        .as("digit"))
      .groupBy("digit").agg(count(lit(1)).as("n_obs"))
    val expCase = benfordFracs.zipWithIndex
      .map { case (f, i) => s"WHEN ${i + 1} THEN CAST(${f}D AS DOUBLE)" }
      .mkString("CASE digit ", " ", " END")
    obs.crossJoin(broadcast(obs.agg(sum("n_obs").as("n"))))
      .withColumn("__e", expr(expCase))
      .select(col("digit"), col("n_obs"),
        expr("CAST(ROUND(CAST(n_obs AS DOUBLE) / CAST(n AS DOUBLE), 6) AS DOUBLE)")
          .as("obs_frac"),
        expr("CAST(ROUND(__e, 6) AS DOUBLE)").as("exp_frac"),
        expr("""CAST(ROUND(
          |  (CAST(n_obs AS DOUBLE) - CAST(n AS DOUBLE) * __e)
          |  * (CAST(n_obs AS DOUBLE) - CAST(n AS DOUBLE) * __e)
          |  / (CAST(n AS DOUBLE) * __e), 6) AS DOUBLE)""".stripMargin)
          .as("chi2_term"))
  }
}
