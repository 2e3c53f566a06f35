package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Binned range join — the shuffle-parallel answer to interval-predicate
  * joins with NO equi key, which Catalyst can only plan as a broadcast
  * nested loop (or a cartesian product when neither side fits memory):
  * at 100 TB that is O(|points|·|intervals|) work on one pair of inputs
  * that never partitions. (The reference inherits the same NLJ fallback
  * from DataFusion's join planning; this operator is the standard
  * discretization fix, built Spark-first.)
  *
  * Mechanism: time is cut into `binSeconds` buckets. Each interval
  * [s, e) registers in every bin its span touches (`sequence` + explode
  * — ⌈len/bin⌉+1 rows, so pick the bin near the TYPICAL interval
  * length); each point registers in exactly ONE bin. The join becomes a
  * plain equi-join on the bin key — hash-partitioned, AQE-balanced,
  * broadcastable when one side is small — with the exact predicate
  * `s <= ts < e` re-checked as a residual. Because a point owns exactly
  * one bin and an interval registers each bin once, every qualifying
  * pair meets EXACTLY once: no dedup pass, output identical to the
  * nested-loop join by construction (property-tested in
  * RangeJoinSpec, differentially oracled by `join_range_binned`).
  */
object RangeJoin {

  /** Join `points` (timestamp column `pointTs`) to `intervals`
    * (half-open [`startTs`, `endTs`)) on containment. Output columns:
    * points.* ++ intervals.* — disambiguate BEFORE calling (as with any
    * self-join). Intervals with e <= s match nothing, like the
    * nested-loop form.
    */
  def pointInInterval(points: DataFrame, pointTs: String,
                      intervals: DataFrame, startTs: String, endTs: String,
                      binSeconds: Long): DataFrame = {
    require(binSeconds > 0, "binSeconds must be positive")
    val w = binSeconds * 1000000L // micros; `div` keeps int64 exactness
    val iv = intervals.withColumn("__bin", explode(sequence(
      expr(s"unix_micros($startTs) div $w"),
      // end bin from the inclusive last contained micro; the max() guard
      // keeps sequence() ascending for empty intervals (filtered by the
      // residual anyway)
      expr(s"greatest(unix_micros($startTs) div $w," +
        s" (unix_micros($endTs) - 1) div $w)"))))
    val pt = points.withColumn("__bin", expr(s"unix_micros($pointTs) div $w"))
    pt.join(iv, pt("__bin") === iv("__bin") &&
        pt(pointTs) >= iv(startTs) && pt(pointTs) < iv(endTs))
      .drop("__bin")
  }

  /** Interval × interval overlap join, same discretization: each side
    * registers in every bin its half-open span touches, the join keys on
    * the shared bin, and the pair is ATTRIBUTED to exactly one bin — the
    * later interval's start bin (`greatest` of the two start bins),
    * which overlapping intervals provably share — so each qualifying
    * pair meets exactly once with no dedup pass. Residual:
    * `ls < re AND rs < le` (the exact overlap test).
    */
  def intervalOverlap(left: DataFrame, lStart: String, lEnd: String,
                      right: DataFrame, rStart: String, rEnd: String,
                      binSeconds: Long): DataFrame = {
    require(binSeconds > 0, "binSeconds must be positive")
    val w = binSeconds * 1000000L
    def binned(df: DataFrame, s: String, e: String, binCol: String,
               startBinCol: String) =
      df.withColumn(startBinCol, expr(s"unix_micros($s) div $w"))
        .withColumn(binCol, explode(sequence(col(startBinCol),
          expr(s"greatest(unix_micros($s) div $w," +
            s" (unix_micros($e) - 1) div $w)"))))
    val l = binned(left, lStart, lEnd, "__lbin", "__lsb")
    val r = binned(right, rStart, rEnd, "__rbin", "__rsb")
    l.join(r, l("__lbin") === r("__rbin") &&
        l("__lbin") === greatest(l("__lsb"), r("__rsb")) &&
        l(lStart) < r(rEnd) && r(rStart) < l(lEnd))
      .drop("__lbin", "__rbin", "__lsb", "__rsb")
  }

  /** Proximity self-pairing: all (a, b) pairs with
    * |a.ts - b.ts| <= toleranceSeconds and a.id < b.id (each unordered
    * pair once), with no key to equi-join on. Expressed through
    * [[pointInInterval]]: b is a point, a spans [a.ts - tol, a.ts + tol]
    * (closed upper edge via +1 micro on the half-open end).
    */
  def proximityPairs(df: DataFrame, idCol: String, tsCol: String,
                     toleranceSeconds: Long): DataFrame = {
    val tolUs = toleranceSeconds * 1000000L
    val a = df.select(col(idCol).as("a_id"), col(tsCol).as("a_ts"))
      .withColumn("__s", expr(s"timestamp_micros(unix_micros(a_ts) - $tolUs)"))
      .withColumn("__e", expr(s"timestamp_micros(unix_micros(a_ts) + $tolUs + 1)"))
    val b = df.select(col(idCol).as("b_id"), col(tsCol).as("b_ts"))
    pointInInterval(b, "b_ts", a, "__s", "__e", toleranceSeconds.max(1L))
      .where(col("a_id") < col("b_id"))
      .drop("__s", "__e")
  }
}
