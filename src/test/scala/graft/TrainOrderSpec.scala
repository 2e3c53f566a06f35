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

  test("the row-level window partitions by hash bucket") {
    val plan = staticPlan(TrainOrder.shuffleOrder(docs, "s1"))
    assert(plan.contains("hashpartitioning(__bkt"),
      "per-bucket rank lost its bucket partitioning — would collapse " +
        "to one window task at scale")
  }
}
