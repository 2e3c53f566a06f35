package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — each left row matched with the LATEST right row at or
  * before its timestamp for the same key (backward, inclusive; the
  * time-series attribution/enrichment join the brief names as a classic
  * engine extension).
  *
  * Spark-first composition (preference (a) — no custom physical
  * operator): tag both sides, union, and carry the right payload forward
  * with a running `last(ignoreNulls)` window, then keep the left rows.
  * ONE shuffle on the key, O(n log n) per partition, no range-condition
  * pair explosion — a range-join formulation would enumerate every
  * (left, right) pair within the window before picking the max.
  *
  * Contract: `right` must be unique per (key, ts) — pre-aggregate
  * duplicates first — or the tie among equal right timestamps is
  * unspecified. Right rows sort before left rows at the same instant, so
  * a right row AT the left timestamp matches (inclusive). Inner
  * semantics: left rows with no preceding right row are dropped (a
  * dedicated match marker is carried, so legitimately-NULL right values
  * do not drop rows).
  */
object AsOf {

  /** Latest right row at-or-BEFORE each left timestamp. */
  def joinBackward(left: DataFrame, right: DataFrame, key: String,
                   ts: String, rightVals: Seq[String]): DataFrame =
    joinDirected(left, right, key, ts, rightVals, backward = true)

  /** Earliest right row at-or-AFTER each left timestamp (the mirror
    * direction: next-event attribution, e.g. "first purchase after this
    * campaign view"). Same one-shuffle running-carry composition — the
    * window just scans time in reverse.
    */
  def joinForward(left: DataFrame, right: DataFrame, key: String,
                  ts: String, rightVals: Seq[String]): DataFrame =
    joinDirected(left, right, key, ts, rightVals, backward = false)

  private def joinDirected(left: DataFrame, right: DataFrame, key: String,
                           ts: String, rightVals: Seq[String],
                           backward: Boolean): DataFrame = {
    val lCols = left.columns.toSeq
    require(lCols.forall(c => !c.startsWith("__") && !c.startsWith("right_")),
      "left columns must not use the reserved __*/right_* prefixes")
    def nullOf(df: DataFrame, c: String): Column =
      lit(null).cast(df.schema(c).dataType).as(c)

    // SQL join semantics: NULL keys/timestamps never match (the window
    // partition would group NULL keys together, and a NULL-ts right row
    // sorts nulls-first and would become every left row's baseline match)
    val lNN = left.where(col(key).isNotNull && col(ts).isNotNull)
    val rNN = right.where(col(key).isNotNull && col(ts).isNotNull)

    val l = lNN.select(
      lCols.map(col) ++ Seq(lit(1).as("__side")) ++
        rightVals.map(c => nullOf(right, c).as(s"__r_$c")): _*)
    val r = rNN.select(
      lCols.map(c => if (c == key || c == ts) col(c) else nullOf(left, c)) ++
        Seq(lit(0).as("__side")) ++
        rightVals.map(c => col(c).as(s"__r_$c")): _*)

    // backward: scan time ascending, carry the latest preceding right row.
    // forward: scan time DESCENDING, so the running carry holds the
    // earliest FOLLOWING right row. Right rows (__side 0) sort before left
    // rows at the same instant in both directions => inclusive match.
    val tsOrd = if (backward) col(ts).asc else col(ts).desc
    val w = Window.partitionBy(key)
      .orderBy(tsOrd, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // the payload travels as ONE struct: non-null exactly when a right
    // row exists, even if every field inside is null — last(ignoreNulls)
    // over bare columns would skip a matched-but-null value and wrongly
    // resurrect an older one
    val packed = l.unionByName(r).withColumn("__pack",
      when(col("__side") === 0,
        struct(rightVals.map(c => col(s"__r_$c").as(c)): _*)))
    val carried = packed
      .withColumn("__c", last(col("__pack"), ignoreNulls = true).over(w))
    carried
      .where(col("__side") === 1 && col("__c").isNotNull)
      .select(lCols.map(col) ++
        rightVals.map(c => col("__c").getField(c).as(s"right_$c")): _*)
  }
}
