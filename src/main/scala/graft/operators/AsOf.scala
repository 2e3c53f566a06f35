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
    joinDirected(left, right, key, ts, rightVals, backward = true, None)

  /** Earliest right row at-or-AFTER each left timestamp (the mirror
    * direction: next-event attribution, e.g. "first purchase after this
    * campaign view"). Same one-shuffle running-carry composition — the
    * window just scans time in reverse.
    */
  def joinForward(left: DataFrame, right: DataFrame, key: String,
                  ts: String, rightVals: Seq[String]): DataFrame =
    joinDirected(left, right, key, ts, rightVals, backward = false, None)

  /** Skew-safe backward as-of (round-4 verdict #8): the plain variants
    * window-partition by the join key alone, so ONE hot key (a celebrity
    * user, a default device id) serializes its whole timeline into one
    * task. This variant carries within (key, coarse time bucket) first —
    * parallel across buckets — then stitches bucket boundaries through a
    * per-(key, bucket) summary that is |buckets| rows per key, not
    * |events|. Identical results to [[joinBackward]] by construction
    * (property-tested in AsOfSpec); requires a TIMESTAMP ts column.
    * Cost: a second (tiny) shuffle of the bucket summaries + a join back
    * on (key, bucket); the win is max task size dropping from |hot key|
    * to |hot key ∩ bucket|. Pick bucketSeconds so a busy key's bucket
    * fits a task comfortably (e.g. 86400 for daily buckets).
    *
    * WHICH VARIANT: use plain [[joinBackward]] when keys are roughly
    * balanced — the bucketed variant's two extra (small) shuffles cost
    * ~1.5x wall-clock on a skew-free fixture for no benefit. Switch to
    * bucketed when one key holds a large share of the timeline (a
    * celebrity user, a default/null-ish device id, a monitoring
    * heartbeat): the plain variant serializes that key's entire history
    * into ONE task (straggler, spill, possible OOM at 100 TB), while the
    * bucketed variant caps task size at |hot key ∩ bucket| regardless of
    * skew. `graft.ScaleProbe` measures both on a hot-key synthetic (80%
    * of rows on one key) — see SURVEY.md addendum for per-round numbers.
    */
  def joinBackwardBucketed(left: DataFrame, right: DataFrame, key: String,
                           ts: String, rightVals: Seq[String],
                           bucketSeconds: Long): DataFrame =
    joinDirected(left, right, key, ts, rightVals, backward = true,
      Some(bucketSeconds))

  /** Skew-safe forward as-of — [[joinForward]] with time-bucketed
    * pre-carry; see [[joinBackwardBucketed]].
    */
  def joinForwardBucketed(left: DataFrame, right: DataFrame, key: String,
                          ts: String, rightVals: Seq[String],
                          bucketSeconds: Long): DataFrame =
    joinDirected(left, right, key, ts, rightVals, backward = false,
      Some(bucketSeconds))

  private def joinDirected(left: DataFrame, right: DataFrame, key: String,
                           ts: String, rightVals: Seq[String],
                           backward: Boolean,
                           bucketSeconds: Option[Long]): DataFrame = {
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

    val carried = bucketSeconds match {
      case None =>
        packed.withColumn("__c", last(col("__pack"), ignoreNulls = true).over(w))

      case Some(sec) =>
        val us = sec * 1000000L
        val withB = packed.withColumn("__bkt", floor(unix_micros(col(ts)) / us))
        // phase 1: carry within (key, bucket) — parallel across buckets
        val wLocal = Window.partitionBy(col(key), col("__bkt"))
          .orderBy(tsOrd, col("__side").asc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val local = withB.withColumn("__c_loc",
          last(col("__pack"), ignoreNulls = true).over(wLocal))
        // phase 2: each bucket's final carry = the scan-order-last RIGHT
        // row's pack, computed straight from `packed` as a partial-
        // aggregated max_by (key: right-rows-first, then scan position —
        // forward scans time descending, so negate the micros). Deriving
        // it from the phase-1 output instead would re-run the window sort
        // over the full union a second time (seen in the final plan
        // before this shape). Left-only buckets keep a row with a NULL
        // carry so the phase-3 join still finds them and passes earlier
        // buckets' carry through.
        val scanOrd =
          if (backward) unix_micros(col(ts)) else -unix_micros(col(ts))
        val summary = withB.groupBy(col(key), col("__bkt"))
          .agg(max_by(col("__pack"),
            struct(col("__side") === 0, scanOrd, col("__side")))
            .as("__c_fin"))
        // phase 3: carry INTO each bucket = last non-null final carry of
        // any earlier bucket — a window over |buckets| summary rows per
        // key, not |events|, so a hot key no longer serializes its data
        val bktOrd = if (backward) col("__bkt").asc else col("__bkt").desc
        val wBkt = Window.partitionBy(key).orderBy(bktOrd)
          .rowsBetween(Window.unboundedPreceding, -1)
        val carryIn = summary
          .withColumn("__c_in", last(col("__c_fin"), ignoreNulls = true).over(wBkt))
          .select(col(key), col("__bkt"), col("__c_in"))
        local.join(carryIn, Seq(key, "__bkt"), "left")
          .withColumn("__c", coalesce(col("__c_loc"), col("__c_in")))
    }

    carried
      .where(col("__side") === 1 && col("__c").isNotNull)
      .select(lCols.map(col) ++
        rightVals.map(c => col("__c").getField(c).as(s"right_$c")): _*)
  }

  /** Nearest right row in EITHER direction (pandas merge_asof
    * direction='nearest'): one backward and one forward carry pass over
    * the same key shuffle, stitched on `leftId` (a unique left row id);
    * the winner is the side with the smaller absolute time distance —
    * exact integer micros, never float — tie → the backward (earlier)
    * match. Left rows matched in only one direction keep that side;
    * rows with neither are dropped (inner, like the directed variants).
    * `rightVals` MUST include `rightTs`, a copy of the right row's own
    * timestamp — the stitch needs it to measure the distance (and it
    * rides out as `right_<rightTs>` like any other carried value).
    * Output adds a `direction` column ('b' or 'f').
    */
  def joinNearest(left: DataFrame, right: DataFrame, key: String,
                  ts: String, leftId: String, rightVals: Seq[String],
                  rightTs: String): DataFrame =
    joinNearest(left, right, key, ts, leftId, rightVals, rightTs,
      Long.MaxValue)

  /** [[joinNearest]] with a max-gap `toleranceMicros` (pandas merge_asof
    * `tolerance=`): a directed match farther than the tolerance is
    * treated as ABSENT — so a backward match inside the window beats a
    * closer forward match outside it, and a left row whose only matches
    * are out of window is dropped, exactly pandas' rule. The tolerance is
    * a post-stitch predicate on the same exact integer-micros distances;
    * the two carry passes are unchanged (still one shuffle each, still no
    * range join), so the bound costs a comparison, not a plan.
    */
  def joinNearest(left: DataFrame, right: DataFrame, key: String,
                  ts: String, leftId: String, rightVals: Seq[String],
                  rightTs: String, toleranceMicros: Long): DataFrame = {
    require(rightVals.contains(rightTs),
      s"rightVals must carry the right timestamp column $rightTs")
    val b = joinBackward(left, right, key, ts, rightVals)
      .select(col(leftId) +:
        rightVals.map(c => col(s"right_$c").as(s"__b_$c")): _*)
    val f = joinForward(left, right, key, ts, rightVals)
      .select(col(leftId) +:
        rightVals.map(c => col(s"right_$c").as(s"__f_$c")): _*)
    val bTs = col(s"__b_$rightTs")
    val fTs = col(s"__f_$rightTs")
    val bDist = unix_micros(col(ts)) - unix_micros(bTs)
    val fDist = unix_micros(fTs) - unix_micros(col(ts))
    val bOk = bTs.isNotNull && bDist <= toleranceMicros
    val fOk = fTs.isNotNull && fDist <= toleranceMicros
    val useB = !fOk || (bOk && bDist <= fDist)
    val out: Seq[Column] =
      left.columns.toSeq.map(col) ++
        rightVals.map(c =>
          when(useB, col(s"__b_$c")).otherwise(col(s"__f_$c")).as(s"right_$c")) :+
        when(useB, lit("b")).otherwise(lit("f")).as("direction")
    left.join(b, Seq(leftId), "left")
      .join(f, Seq(leftId), "left")
      .where(bOk || fOk)
      .select(out: _*)
  }
}
