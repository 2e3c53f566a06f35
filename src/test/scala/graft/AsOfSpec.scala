package graft

import java.sql.Timestamp

import graft.operators.AsOf

/** As-of join edge semantics: backward-inclusive match, no-match drops,
  * and a NULL right value that must still count as a match.
  */
class AsOfSpec extends SparkSpec {

  private def t(s: String) = Timestamp.valueOf(s"2026-01-01 $s:00")

  test("backward-inclusive as-of with null payloads and unmatched rows") {
    import spark.implicits._
    val left = Seq(
      (100L, 1L, t("10:30")), // between right rows -> 10:00's value
      (101L, 1L, t("11:00")), // exact tie -> inclusive, value is NULL but matched
      (102L, 2L, t("10:00")), // before the key's first right row -> dropped
      (103L, 3L, t("12:00"))  // key with no right rows -> dropped
    ).toDF("id", "k", "ts")
    val right = Seq(
      (1L, t("10:00"), Some(5.0)),
      (1L, t("11:00"), Option.empty[Double]),
      (2L, t("10:30"), Some(7.0))
    ).toDF("k", "ts", "v")

    val out = AsOf.joinBackward(left, right, "k", "ts", Seq("v"))
      .orderBy("id").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(3)) None else Some(r.getDouble(3))))
    assert(out.toSeq == Seq(100L -> Some(5.0), 101L -> None))
  }

  test("each left row takes the LATEST preceding right row") {
    import spark.implicits._
    val left = Seq((1L, 1L, t("12:00"))).toDF("id", "k", "ts")
    val right = Seq(
      (1L, t("09:00"), 1.0), (1L, t("10:00"), 2.0), (1L, t("11:00"), 3.0)
    ).toDF("k", "ts", "v")
    val out = AsOf.joinBackward(left, right, "k", "ts", Seq("v")).collect()
    assert(out.length == 1 && out(0).getDouble(3) == 3.0)
  }

  test("forward as-of takes the EARLIEST following right row, inclusive") {
    import spark.implicits._
    val left = Seq(
      (100L, 1L, t("10:30")), // between right rows -> 11:00's value
      (101L, 1L, t("11:00")), // exact tie -> inclusive
      (102L, 1L, t("11:30")), // after the key's last right row -> dropped
      (103L, 2L, t("12:00"))  // key with no right rows -> dropped
    ).toDF("id", "k", "ts")
    val right = Seq(
      (1L, t("10:00"), 1.0), (1L, t("11:00"), 2.0)
    ).toDF("k", "ts", "v")
    val out = AsOf.joinForward(left, right, "k", "ts", Seq("v"))
      .orderBy("id").collect().map(r => (r.getLong(0), r.getDouble(3)))
    assert(out.toSeq == Seq(100L -> 2.0, 101L -> 2.0))
  }

  test("randomized differential: forward matches a brute-force reference") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val rightRows = (for {
      k <- 1L to 5L; m <- 0 until 40 if rnd.nextBoolean()
    } yield (k, t(f"10:$m%02d"), k * 100.0 + m)).distinct
    val leftRows = (1 to 120).map { i =>
      (i.toLong, 1L + rnd.nextInt(6).toLong, t(f"10:${rnd.nextInt(40)}%02d"))
    }
    val got = AsOf.joinForward(
      leftRows.toDF("id", "k", "ts"), rightRows.toDF("k", "ts", "v"),
      "k", "ts", Seq("v"))
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    val byKey = rightRows.groupBy(_._1)
    val want = leftRows.flatMap { case (id, k, ts) =>
      byKey.getOrElse(k, Seq.empty)
        .filter(!_._2.before(ts)) // right.ts >= left.ts (inclusive)
        .sortBy(_._2.getTime)
        .headOption.map(r => id -> r._3)
    }.toMap
    assert(got == want)
  }

  test("bucketed pre-carry equals the plain composition, both directions") {
    import spark.implicits._
    // 300 s buckets cut the 40-minute timeline into 8 buckets, so matches
    // routinely cross bucket boundaries (carry-in path) AND land within
    // one bucket (local path); empty buckets exercise the ignoreNulls
    // stitch. Equality against the single-window composition is the whole
    // contract of the skew refinement.
    val rnd = new scala.util.Random(23)
    val rightRows = (for {
      k <- 1L to 4L; m <- 0 until 40 if rnd.nextInt(4) == 0
    } yield (k, t(f"10:$m%02d"), k * 100.0 + m)).distinct
    val leftRows = (1 to 150).map { i =>
      (i.toLong, 1L + rnd.nextInt(5).toLong, t(f"10:${rnd.nextInt(40)}%02d"))
    }
    val l = leftRows.toDF("id", "k", "ts")
    val r = rightRows.toDF("k", "ts", "v")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(x => (x.getLong(0), x.getLong(1), x.getTimestamp(2),
        x.getDouble(3))).toSet
    assert(rows(AsOf.joinBackwardBucketed(l, r, "k", "ts", Seq("v"), 300L))
      == rows(AsOf.joinBackward(l, r, "k", "ts", Seq("v"))))
    assert(rows(AsOf.joinForwardBucketed(l, r, "k", "ts", Seq("v"), 300L))
      == rows(AsOf.joinForward(l, r, "k", "ts", Seq("v"))))
  }

  test("bucketed as-of partitions by (key, bucket), not key alone") {
    import spark.implicits._
    val l = Seq((1L, 1L, t("10:00"))).toDF("id", "k", "ts")
    val r = Seq((1L, t("09:00"), 1.0)).toDF("k", "ts", "v")
    val plan = AsOf.joinBackwardBucketed(l, r, "k", "ts", Seq("v"), 3600L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("__bkt"),
      s"no (key, bucket) partitioning stage in plan:\n$plan")
  }

  test("joinNearest picks the closer side, ties backward, single-sided rows kept") {
    import spark.implicits._
    val left = Seq(
      (1L, 1L, t("10:30")), // b at 10:00 (30m), f at 10:40 (10m) -> f
      (2L, 1L, t("10:10")), // b at 10:00 (10m), f at 10:40 (30m) -> b
      (3L, 1L, t("10:20")), // exact tie 20m/20m -> backward
      (4L, 2L, t("09:00")), // only a forward match -> f
      (5L, 2L, t("11:00")), // only a backward match -> b
      (6L, 3L, t("10:00"))  // no right rows at all -> dropped
    ).toDF("id", "k", "ts")
    val right = Seq(
      (1L, t("10:00"), 10.0), (1L, t("10:40"), 40.0),
      (2L, t("10:30"), 30.0)
    ).toDF("k", "rts", "v").selectExpr("k", "rts AS ts", "rts", "v")
    val got = AsOf.joinNearest(left, right, "k", "ts", "id",
        Seq("rts", "v"), "rts")
      .collect().map(r => r.getLong(0) ->
        (r.getDouble(4), r.getString(5))).toMap
    assert(got == Map(
      1L -> (40.0, "f"), 2L -> (10.0, "b"), 3L -> (10.0, "b"),
      4L -> (30.0, "f"), 5L -> (30.0, "b")))
  }

  test("joinNearest tolerance masks each side before the pick (pandas rule)") {
    import spark.implicits._
    val left = Seq(
      (1L, 1L, t("10:30")), // b 30m (out), f 10m (in)  -> f
      (2L, 1L, t("10:10")), // b 10m (in),  f 30m (out) -> b
      (3L, 1L, t("10:20")), // 20m/20m both out of the 15m window -> dropped
      (4L, 2L, t("09:00")), // only f, 90m out -> dropped
      (5L, 2L, t("10:40"))  // only b, 10m in -> b
    ).toDF("id", "k", "ts")
    val right = Seq(
      (1L, t("10:00"), 10.0), (1L, t("10:40"), 40.0),
      (2L, t("10:30"), 30.0)
    ).toDF("k", "rts", "v").selectExpr("k", "rts AS ts", "rts", "v")
    val got = AsOf.joinNearest(left, right, "k", "ts", "id",
        Seq("rts", "v"), "rts", toleranceMicros = 15L * 60 * 1000000)
      .collect().map(r => r.getLong(0) ->
        (r.getDouble(4), r.getString(5))).toMap
    assert(got == Map(1L -> (40.0, "f"), 2L -> (10.0, "b"),
      5L -> (30.0, "b")), s"got $got")
  }

  test("joinNearest with MaxValue tolerance == unbounded joinNearest") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val left = (1 to 80).map { i =>
      (i.toLong, 1L + rnd.nextInt(4).toLong, t(f"10:${rnd.nextInt(50)}%02d"))
    }.toDF("id", "k", "ts")
    val right = (for { k <- 1L to 4L; m <- 0 until 50 if rnd.nextBoolean() }
      yield (k, t(f"10:$m%02d"), k * 10.0 + m)).toDF("k", "rts", "v")
      .selectExpr("k", "rts AS ts", "rts", "v")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getDouble(4), r.getString(5))).toSet
    assert(rows(AsOf.joinNearest(left, right, "k", "ts", "id",
        Seq("rts", "v"), "rts", Long.MaxValue))
      == rows(AsOf.joinNearest(left, right, "k", "ts", "id",
        Seq("rts", "v"), "rts")))
  }

  test("randomized differential: matches a brute-force reference") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    // right unique per (key, ts) by construction of the value map
    val rightRows = (for {
      k <- 1L to 5L; m <- 0 until 40 if rnd.nextBoolean()
    } yield (k, t(f"10:$m%02d"), k * 100.0 + m)).distinct
    val leftRows = (1 to 120).map { i =>
      (i.toLong, 1L + rnd.nextInt(6).toLong, t(f"10:${rnd.nextInt(40)}%02d"))
    }
    val got = AsOf.joinBackward(
      leftRows.toDF("id", "k", "ts"), rightRows.toDF("k", "ts", "v"),
      "k", "ts", Seq("v"))
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    val byKey = rightRows.groupBy(_._1)
    val want = leftRows.flatMap { case (id, k, ts) =>
      byKey.getOrElse(k, Seq.empty)
        .filter(!_._2.after(ts)) // right.ts <= left.ts (inclusive)
        .sortBy(_._2.getTime)
        .lastOption.map(r => id -> r._3)
    }.toMap
    assert(got == want)
  }
}
