package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.llm.TrainOrder

/** TrainOrder's bucketed two-phase permutation == the flat single-window
  * permutation, and the scale property: the row-level window partitions
  * by bucket (no corpus-sized single-task window).
  */
class TrainOrderSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq.tabulate(500)(i =>
    (i.toLong * 7 % 1000, s"doc $i")).toDF("doc_id", "text")

  test("shuffleOrder is the flat md5 permutation, stitched exactly") {
    val got = TrainOrder.shuffleOrder(docs, "seed-a").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val flat = docs.select(col("doc_id"),
        md5(concat(lit("seed-a"), lit(":"), col("doc_id").cast("string")))
          .as("k"))
      .withColumn("pos",
        row_number().over(Window.orderBy("k", "doc_id")).cast("long") - 1)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got == flat)
    assert(got.values.toSeq.sorted == (0L until got.size).toSeq,
      "pos is not a 0-based permutation")
  }

  test("same seed is stable; a different seed reorders") {
    val a1 = TrainOrder.shuffleOrder(docs, "s1").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val a2 = TrainOrder.shuffleOrder(docs, "s1").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = TrainOrder.shuffleOrder(docs, "s2").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a1 == a2, "same seed must reproduce the same order")
    assert(a1 != b, "different seeds should permute differently")
  }

  test("shards are contiguous runs of the order") {
    val rows = TrainOrder.shuffleShards(docs, "s1", shardDocs = 64L)
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    rows.foreach { case (pos, shard) => assert(shard == pos / 64) }
  }

  test("interleaveStride closed form equals the flat stride rank") {
    val mixed = Seq.tabulate(90)(i =>
      (i.toLong, s"s${i % 3}", s"doc $i")).toDF("doc_id", "source", "text")
    val wExpr = expr(
      "CASE source WHEN 's0' THEN 1 WHEN 's1' THEN 2 ELSE 3 END")
    val got = TrainOrder.interleaveStride(mixed, "source", wExpr, "mix")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    // flat reference: same keys, one global sort
    val weights = Map("s0" -> 1L, "s1" -> 2L, "s2" -> 3L)
    val ranked = mixed.select(col("doc_id"), col("source"),
        md5(concat(lit("mix"), lit(":"), col("doc_id").cast("string")))
          .as("k")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      .groupBy(_._2).toSeq.flatMap { case (src, rows) =>
        rows.sortBy(r => (r._3, r._1)).zipWithIndex.map { case (r, p) =>
          (r._1, src, (p + 1L) * (6L / weights(src)))
        }
      }
    val flat = ranked.sortBy { case (_, src, k) => (k, src) }
      .zipWithIndex.map { case ((id, _, _), pos) => id -> pos.toLong }.toMap
    assert(got == flat)
    assert(got.values.toSeq.sorted == (0L until 90L))
  }

  test("every prefix holds each source near its weight proportion") {
    val mixed = Seq.tabulate(120)(i =>
      (i.toLong, s"s${i % 2}", "")).toDF("doc_id", "source", "text")
    val wExpr = expr("CASE source WHEN 's0' THEN 1 ELSE 3 END")
    val order = TrainOrder.interleaveStride(mixed, "source", wExpr, "mx")
      .collect().sortBy(_.getLong(2)).map(_.getString(1))
    // s1 carries weight 3 of 4: any prefix while both sources remain
    // live holds s1 within ±2 of 3/4 — the stride-scheduling bound
    var n1 = 0
    order.take(80).zipWithIndex.foreach { case (src, i) =>
      if (src == "s1") n1 += 1
      val expected = (i + 1) * 3.0 / 4.0
      assert(math.abs(n1 - expected) <= 2.0,
        s"prefix ${i + 1}: s1=$n1, expected ~$expected")
    }
  }

  test("the row-level window partitions by hash bucket") {
    val plan = staticPlan(TrainOrder.shuffleOrder(docs, "s1"))
    assert(plan.contains("hashpartitioning(__bkt"),
      "per-bucket rank lost its bucket partitioning — would collapse " +
        "to one window task at scale")
  }

  test("interleaveStride's row window partitions by (source, bucket)") {
    // r9 verdict #4: a plain PARTITION BY source serializes a mega-source
    // through one window task; the rank must shard on the hash bucket too
    val mixed = Seq.tabulate(90)(i =>
      (i.toLong, s"s${i % 3}", s"doc $i")).toDF("doc_id", "source", "text")
    val wExpr = expr(
      "CASE source WHEN 's0' THEN 1 WHEN 's1' THEN 2 ELSE 3 END")
    val plan = staticPlan(
      TrainOrder.interleaveStride(mixed, "source", wExpr, "mix"))
    // the row-level rank must hash on BOTH (the offsets window may
    // legitimately partition by __src alone — it sees 16^k rows/source)
    assert("hashpartitioning\\(__src#\\d+, __bkt#\\d+".r
        .findFirstIn(plan).isDefined,
      s"within-source rank lost its (source, bucket) sharding:\n$plan")
  }

  test("weightedSample selects exactly the k smallest priorities") {
    import spark.implicits._
    val d = Seq.tabulate(300)(i => (i.toLong, 1L + i % 7)).toDF("doc_id", "wt")
    val got = TrainOrder.weightedSample(d, "doc_id", "wt", "sA", 40)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val flat = d.withColumn("priority", expr(
        "CAST(CAST(conv(substr(md5(concat('sA', ':', CAST(doc_id AS STRING))), 1, 15), 16, 10) AS BIGINT) AS DOUBLE) / CAST(wt AS DOUBLE)"))
      .orderBy("priority", "doc_id").limit(40)
      .collect().map(_.getLong(0)).toSet
    assert(got == flat && got.size == 40)
  }

  test("weightedSample favors heavy rows and reproduces exactly") {
    import spark.implicits._
    val d = Seq.tabulate(400)(i =>
      (i.toLong, if (i < 200) 1L else 100L)).toDF("doc_id", "wt")
    val pick = TrainOrder.weightedSample(d, "doc_id", "wt", "sB", 100)
      .select("doc_id").collect().map(_.getLong(0))
    val heavy = pick.count(_ >= 200)
    assert(heavy > 80, s"weight-100 rows underrepresented: $heavy of 100")
    val again = TrainOrder.weightedSample(d, "doc_id", "wt", "sB", 100)
      .select("doc_id").collect().map(_.getLong(0))
    assert(pick.toSeq == again.toSeq, "membership must be a pure function of (seed, id)")
  }

  test("weightedSample plans TakeOrdered — no global range sort") {
    val plan = staticPlan(
      TrainOrder.weightedSample(docs.withColumn("wt", expr("doc_id + 1")),
        "doc_id", "wt", "s1", 20))
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-k fell back from the per-partition heap merge:\n$plan")
    assert(!plan.contains("rangepartitioning"),
      s"weighted sample plans a corpus-wide range sort:\n$plan")
  }
}
