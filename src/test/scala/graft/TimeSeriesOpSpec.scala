package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import graft.operators.{Funnel, Resample}

/** Hand-checkable edge semantics for the funnel and resample/gap-fill
  * operators — strictness of the step ordering, the horizon bound, the
  * stalling-user NULLs, zero-filled gap days, and the LOCF carry.
  */
class TimeSeriesOpSpec extends SparkSpec {

  private def t(s: String) = Timestamp.valueOf(s)

  test("funnel: strict ordering, horizon bound, stalling users") {
    import spark.implicits._
    val ev = Seq(
      // u1: clean A -> B -> C conversion
      (1L, "a", t("2026-01-01 10:00:00")),
      (1L, "b", t("2026-01-01 11:00:00")),
      (1L, "c", t("2026-01-01 12:00:00")),
      // u2: B at the SAME instant as A -> strictly-after fails, stalls at 1
      (2L, "a", t("2026-01-02 10:00:00")),
      (2L, "b", t("2026-01-02 10:00:00")),
      // u3: B outside the 1-day horizon -> stalls at 1
      (3L, "a", t("2026-01-03 10:00:00")),
      (3L, "b", t("2026-01-05 10:00:01")),
      // u4: B exactly AT the horizon bound -> inclusive, reaches 2
      (4L, "a", t("2026-01-04 10:00:00")),
      (4L, "b", t("2026-01-05 10:00:00")),
      // u5: C before B -> frontier-greedy never sees it, stalls at 2
      (5L, "a", t("2026-01-06 10:00:00")),
      (5L, "c", t("2026-01-06 10:30:00")),
      (5L, "b", t("2026-01-06 11:00:00")),
      // u6: never does A -> absent from output
      (6L, "b", t("2026-01-07 10:00:00"))
    ).toDF("user_id", "event_type", "ts")

    val steps = Seq(
      "a" -> (col("event_type") === "a"),
      "b" -> (col("event_type") === "b"),
      "c" -> (col("event_type") === "c"))
    val out = Funnel.ordered(ev, "user_id", "ts", steps, Some("INTERVAL 1 DAY"))
      .selectExpr("user_id",
        "1 + CASE WHEN b_ts IS NULL THEN 0 ELSE 1 END" +
          " + CASE WHEN c_ts IS NULL THEN 0 ELSE 1 END AS reached")
      .orderBy("user_id")
      .as[(Long, Int)].collect().toSeq

    assert(out == Seq((1L, 3), (2L, 1), (3L, 1), (4L, 2), (5L, 2)))
  }

  test("funnel: later step binds to the frontier, not any earlier event") {
    import spark.implicits._
    // Two A events; the B between them must NOT match (it precedes the
    // frontier only if the funnel wrongly used the SECOND a) — frontier is
    // the EARLIEST a, so b at 11:00 qualifies.
    val ev = Seq(
      (1L, "a", t("2026-01-01 10:00:00")),
      (1L, "b", t("2026-01-01 11:00:00")),
      (1L, "a", t("2026-01-01 12:00:00"))
    ).toDF("user_id", "event_type", "ts")
    val out = Funnel.ordered(ev, "user_id", "ts",
        Seq("a" -> (col("event_type") === "a"), "b" -> (col("event_type") === "b")),
        None)
      .selectExpr("user_id", "CAST(a_ts AS STRING)", "CAST(b_ts AS STRING)")
      .as[(Long, String, String)].collect().toSeq
    assert(out == Seq((1L, "2026-01-01 10:00:00", "2026-01-01 11:00:00")))
  }

  test("funnel summary: reach counts and conversion rates") {
    import spark.implicits._
    val ev = Seq(
      (1L, "a", t("2026-01-01 10:00:00")), (1L, "b", t("2026-01-01 11:00:00")),
      (2L, "a", t("2026-01-02 10:00:00")),
      (3L, "a", t("2026-01-03 10:00:00")), (3L, "b", t("2026-01-03 11:00:00"))
    ).toDF("user_id", "event_type", "ts")
    val f = Funnel.ordered(ev, "user_id", "ts",
      Seq("a" -> (col("event_type") === "a"), "b" -> (col("event_type") === "b")), None)
    val row = Funnel.summary(f, "user_id", Seq("a", "b")).collect().head
    assert(row.getLong(0) == 3L && row.getLong(1) == 2L)
    assert(row.getDouble(2) == 1.0 && math.abs(row.getDouble(3) - 0.666667) < 1e-9)
  }

  test("gap fill: missing days are zero-filled and LOCF carries the sum") {
    import spark.implicits._
    val ev = Seq(
      (1L, t("2026-01-01 09:00:00"), 10.0),
      (1L, t("2026-01-01 10:00:00"), 2.5),
      (1L, t("2026-01-04 10:00:00"), 7.0), // 2-day gap before this
      (2L, t("2026-01-02 10:00:00"), 1.0)  // key absent on the corpus edges
    ).toDF("user_id", "ts", "value")

    val out = Resample.locfDaily(ev, "user_id", "ts", "value")
      .selectExpr("user_id", "CAST(day AS STRING) AS day", "n_events",
        "day_sum", "locf_sum")
      .orderBy("user_id", "day")
      .as[(Long, String, Long, Double, Option[Double])].collect().toSeq

    assert(out == Seq(
      (1L, "2026-01-01", 2L, 12.5, Some(12.5)),
      (1L, "2026-01-02", 0L, 0.0, Some(12.5)),
      (1L, "2026-01-03", 0L, 0.0, Some(12.5)),
      (1L, "2026-01-04", 1L, 7.0, Some(7.0)),
      (2L, "2026-01-01", 0L, 0.0, None), // before key 2's first observation
      (2L, "2026-01-02", 1L, 1.0, Some(1.0)),
      (2L, "2026-01-03", 0L, 0.0, Some(1.0)),
      (2L, "2026-01-04", 0L, 0.0, Some(1.0))))
  }

  test("ltob keeps both endpoints and each bucket's max-area point") {
    import spark.implicits._
    // 6 points, 2 buckets (rows 1-3, 4-6). y: flat except a spike at
    // row 3 (bucket 0 interior max) and a dip at row 5 (bucket 1 max)
    val ts0 = java.sql.Timestamp.valueOf("2026-01-01 10:00:00")
    def at(min: Int) = new java.sql.Timestamp(ts0.getTime + min * 60000L)
    val ys = Seq(1.0, 1.0, 9.0, 1.0, -7.0, 1.0)
    val ev = ys.zipWithIndex.map { case (y, i) => (1L, at(i), i.toLong, y) }
      .toDF("user_id", "ts", "event_id", "value")
    val got = Resample.ltob(ev, "user_id", "ts", "event_id", "value", 2)
      .select("event_id").as[Long].collect().toSet
    // endpoints 0 and 5; spike id2 wins bucket 0; dip id4 wins bucket 1
    assert(got == Set(0L, 2L, 4L, 5L), s"got $got")
  }

  test("ltob == per-key brute-force reference on a random series") {
    import spark.implicits._
    val rnd = new scala.util.Random(5)
    val ts0 = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
    val raw = for (k <- 1L to 4L; i <- 0 until (5 + rnd.nextInt(40))) yield
      (k, new java.sql.Timestamp(ts0.getTime + i * 60000L + k), i.toLong,
        rnd.nextInt(1000).toDouble)
    val buckets = 6
    val got = Resample.ltob(raw.toDF("user_id", "ts", "event_id", "value"),
        "user_id", "ts", "event_id", "value", buckets)
      .select("user_id", "event_id")
      .as[(Long, Long)].collect().toSet
    // .toSeq first: flatMap on a Map of (k, id) pairs would re-collapse
    // to one entry per key
    val want = raw.groupBy(_._1).toSeq.flatMap { case (k, rows) =>
      val srt = rows.sortBy(r => (r._2.getTime, r._3)).toIndexedSeq
      val n = srt.size
      def x(i: Int) = srt(i)._2.getTime * 1000.0
      def y(i: Int) = srt(i)._4
      val area = (i: Int) =>
        if (i == 0 || i == n - 1) None
        else Some(math.abs((x(i) - x(i - 1)) * (y(i + 1) - y(i - 1)) -
          (x(i + 1) - x(i - 1)) * (y(i) - y(i - 1))))
      val picks = srt.indices.groupBy(i => i.toLong * buckets / n).values.map {
        // area DESC NULLS LAST, then row order — endpoints (None) last
        idx => idx.minBy(i =>
          (if (area(i).isEmpty) 1 else 0, area(i).map(-_).getOrElse(0.0), i))
      }
      (picks.toSet + 0 + (n - 1)).map(i => k -> srt(i)._3)
    }.toSet
    assert(got == want, s"got ${got.diff(want)} extra, ${want.diff(got)} missing")
  }
}
