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
}
