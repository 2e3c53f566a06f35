package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series resample + gap fill — bucket an event stream to a fixed
  * calendar grain per key, materialize the MISSING buckets, and carry the
  * last observed value forward (LOCF). The "regularize an irregular
  * series" operator every metrics/feature pipeline needs before
  * windowed models can consume event data.
  *
  * Composition (preference (a) — declarative only):
  *   1. one keyed aggregate to the (key, bucket) grain — partial
  *      aggregation map-side, one shuffle;
  *   2. the dense bucket spine = distinct keys × `sequence(min, max)` —
  *      the corpus min/max arrive via a 1-row broadcast cross join, and
  *      the spine's size is |keys| × |buckets|, independent of event
  *      volume (at 100 TB the events are the big side; the spine stays
  *      millions of rows, not billions);
  *   3. LEFT join spine → observed buckets on (key, bucket);
  *   4. LOCF via `last(value, ignoreNulls) OVER (PARTITION BY key ORDER
  *      BY bucket)` — running frame, one pass; the window partition is a
  *      single key's BUCKET COUNT (bounded by the date span), never its
  *      raw event count, so a hyperactive key cannot blow up a task.
  *
  * Determinism: the bucket metric is summed as DECIMAL and cast to DOUBLE
  * only at the edge, so fill values are bit-identical across engines and
  * aggregation orders.
  */
object Resample {

  /** Daily grain with zero-filled counts/sums and an LOCF running value.
    *
    * Output: key, `day` (DATE), `n_events` (0 on gap days), `day_sum`
    * (0.0 on gap days), `locf_sum` (last observed day_sum at or before
    * this day; NULL before the key's first observation).
    */
  def locfDaily(events: DataFrame, keyCol: String, tsCol: String,
                valueCol: String): DataFrame = {
    val daily = events
      .groupBy(col(keyCol), to_date(col(tsCol)).as("day"))
      .agg(count(lit(1)).as("n_events"),
        sum(col(valueCol).cast("decimal(18,2)")).as("day_sum_dec"))

    val bounds = daily.agg(min(col("day")).as("d0"), max(col("day")).as("d1"))

    val spine = events.select(col(keyCol)).distinct()
      .crossJoin(broadcast(bounds))
      .select(col(keyCol),
        explode(sequence(col("d0"), col("d1"), expr("INTERVAL 1 DAY"))).as("day"))

    val w = Window.partitionBy(keyCol).orderBy("day")
    spine.join(daily, Seq(keyCol, "day"), "left")
      .select(
        col(keyCol),
        col("day"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        coalesce(col("day_sum_dec"), lit(0).cast("decimal(18,2)"))
          .cast("double").as("day_sum"),
        last(col("day_sum_dec"), ignoreNulls = true).over(w)
          .cast("double").as("locf_sum"))
  }

  /** Largest-Triangle-One-Bucket downsampling (Steinarsson 2013, the
    * LTTB family's order-preserving sibling): per key, keep from each of
    * `buckets` equal-count buckets the point whose triangle with its
    * IMMEDIATE neighbors has the largest area — the visually dominant
    * point — plus both endpoints. One-bucket (not three-bucket) on
    * purpose: LTTB's anchor is the previous bucket's *average*, and a
    * floating-point average is aggregation-order-dependent, while the
    * neighbor triangle is three lag/lead values combined in one fixed
    * expression — bit-identical across engines and partitionings.
    *
    * Arithmetic: x = epoch micros as double (exact — |micros| < 2^53),
    * area = |(x−xₚ)·(yₙ−yₚ) − (xₙ−xₚ)·(y−yₚ)| with correctly-rounded
    * IEEE ops only, so cross-engine comparisons agree; bucket index is
    * pure integer math ((rn−1)·buckets div n). Ties: max area, then min
    * row. Plan: one shuffle on the key, three window passes over the SAME
    * (key, ts, id) sort order — a single sort feeds lag/lead, the bucket
    * arithmetic, and the per-bucket argmax; partitions are one key's
    * series (chunk a pathological mega-key upstream before calling).
    */
  def ltob(events: DataFrame, keyCol: String, tsCol: String, idCol: String,
           valueCol: String, buckets: Int): DataFrame = {
    require(buckets >= 2, "need at least 2 buckets")
    val wSer = Window.partitionBy(keyCol).orderBy(col(tsCol), col(idCol))
    val wAll = Window.partitionBy(keyCol)
    val staged = events
      .select(col(keyCol), col(tsCol), col(idCol),
        col(valueCol).cast("double").as("__y"),
        unix_micros(col(tsCol)).cast("double").as("__x"))
      .withColumn("__rn", row_number().over(wSer))
      .withColumn("__n", count(lit(1)).over(wAll))
      .withColumn("__px", lag("__x", 1).over(wSer))
      .withColumn("__py", lag("__y", 1).over(wSer))
      .withColumn("__nx", lead("__x", 1).over(wSer))
      .withColumn("__ny", lead("__y", 1).over(wSer))
      .withColumn("area", abs(
        (col("__x") - col("__px")) * (col("__ny") - col("__py")) -
          (col("__nx") - col("__px")) * (col("__y") - col("__py"))))
      .withColumn("bucket",
        expr(s"(CAST(__rn - 1 AS BIGINT) * $buckets) div __n"))
    val wBkt = Window.partitionBy(col(keyCol), col("bucket"))
      .orderBy(col("area").desc_nulls_last, col("__rn"))
    staged
      .withColumn("__pick", row_number().over(wBkt))
      .where(col("__pick") === 1 || col("__rn") === 1 || col("__rn") === col("__n"))
      .select(col(keyCol), col("bucket"), col(tsCol), col(idCol),
        col("__y").as("value"), col("area"))
  }
}
