package graft

import java.sql.Timestamp

/** Pins Spark's session_window boundary semantics at EXACTLY the gap
  * (round-3 ADVICE): the fixture has no exact-gap pairs, so the
  * ts_session_window oracle's break condition was unexercised there.
  *
  * Probed on Spark 4.1: an event exactly `gap` after the previous one
  * MERGES into the same session — the raw per-event window is half-open
  * [ts, ts+gap), but the merge rule is touch-inclusive (start <= prevEnd),
  * so [t, t+30m) and [t+30m, t+60m) coalesce. The gaps-and-islands oracle
  * must therefore break on `ts - lag(ts) > gap` (STRICTLY greater), which
  * is what queries/Io.scala ships.
  */
class SessionWindowSpec extends SparkSpec {

  private def sessions(sql: String) = {
    import spark.implicits._
    Seq(
      // user 1: exact 30-min gaps — must all merge into ONE session
      (1L, "2024-01-01 00:00:00"),
      (1L, "2024-01-01 00:30:00"),
      (1L, "2024-01-01 01:00:00"),
      // user 2: one second over the gap — must SPLIT
      (2L, "2024-01-01 00:00:00"),
      (2L, "2024-01-01 00:30:01"),
      // user 3: one second under the gap — must merge
      (3L, "2024-01-01 00:00:00"),
      (3L, "2024-01-01 00:29:59"))
      .toDF("user_id", "ts_s")
      .selectExpr("user_id", "CAST(ts_s AS TIMESTAMP) AS ts")
      .createOrReplaceTempView("gap_events")
    spark.sql(sql).collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2), r.getLong(3)))
      .toSeq
  }

  private val expected = Seq(
    (1L, Timestamp.valueOf("2024-01-01 00:00:00"), Timestamp.valueOf("2024-01-01 01:30:00"), 3L),
    (2L, Timestamp.valueOf("2024-01-01 00:00:00"), Timestamp.valueOf("2024-01-01 00:30:00"), 1L),
    (2L, Timestamp.valueOf("2024-01-01 00:30:01"), Timestamp.valueOf("2024-01-01 01:00:01"), 1L),
    (3L, Timestamp.valueOf("2024-01-01 00:00:00"), Timestamp.valueOf("2024-01-01 00:59:59"), 2L))

  test("session_window merges an exact-gap event (touch-inclusive)") {
    val got = sessions(
      """SELECT user_id, session_window.start, session_window.end, COUNT(*) AS n
        |FROM gap_events
        |GROUP BY user_id, session_window(ts, '30 minutes')
        |ORDER BY user_id, session_window.start""".stripMargin)
    assert(got == expected)
  }

  test("gaps-and-islands with a STRICT > break reproduces session_window") {
    // the same shape as the ts_session_window DuckDB oracle, run in Spark
    // over the synthetic exact-gap frame: `>` matches; `>=` would split
    // user 1 into three sessions
    val got = sessions(
      """WITH x AS (SELECT user_id, ts,
        |             CASE WHEN lag(ts) OVER w IS NULL
        |                    OR ts - lag(ts) OVER w > INTERVAL '30' MINUTE
        |                  THEN 1 ELSE 0 END AS brk
        |           FROM gap_events
        |           WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        |y AS (SELECT user_id, ts,
        |             SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
        |                            ROWS UNBOUNDED PRECEDING) AS sess
        |      FROM x)
        |SELECT user_id, MIN(ts) AS session_start,
        |       MAX(ts) + INTERVAL '30' MINUTE AS session_end,
        |       COUNT(*) AS n
        |FROM y GROUP BY user_id, sess
        |ORDER BY user_id, session_start""".stripMargin)
    assert(got == expected)
  }
}
