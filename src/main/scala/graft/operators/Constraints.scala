package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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
}
