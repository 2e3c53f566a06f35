package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic global training order — the reproducible "shuffle" every
  * training run needs: the same (corpus, seed) must yield the same
  * example order on any cluster size, any partitioning, any engine
  * version, or runs are not comparable and resume-from-step is
  * impossible. `rand()` gives none of that; sorting by a seeded md5 of
  * the stable doc id gives all of it (and md5 is the one hash both
  * engines share — the differential oracle recomputes the permutation).
  *
  * Scale shape: a naive `row_number() OVER (ORDER BY key)` collapses to
  * ONE window task at 100 TB. Instead the key's leading hex digits form
  * `16^bucketHexChars` ordered buckets (hash-uniform, so balanced by
  * construction): rank within each bucket in parallel, cumulate the tiny
  * per-bucket counts on the driver-side window (16^k rows, not corpus
  * rows), and add the offsets back — the same two-phase prefix sum
  * `TextAnalysis.packShards` uses, keyed by hash prefix instead of id
  * range so the ORDER ITSELF is the shuffled one.
  */
object TrainOrder {

  /** (doc_id, pos) — pos is the 0-based position of the doc in the
    * seeded pseudorandom permutation: ORDER BY md5(seed || ':' || id),
    * id (the id tiebreak makes collisions harmless).
    */
  def shuffleOrder(docs: DataFrame, seed: String,
                   bucketHexChars: Int = 2): DataFrame = {
    require(bucketHexChars >= 1 && bucketHexChars <= 8, "1..8 hex chars")
    val keyed = docs.select(col("doc_id"),
      md5(concat(lit(seed), lit(":"), col("doc_id").cast("string")))
        .as("__key"))
      // fixed-width lowercase hex: lexicographic prefix order == full-key
      // order restricted to the bucket boundary
      .withColumn("__bkt", substring(col("__key"), 1, bucketHexChars))
    val wIn = Window.partitionBy("__bkt").orderBy("__key", "doc_id")
    val intra = keyed.withColumn("__rn",
      row_number().over(wIn).cast("long"))
    val wB = Window.orderBy("__bkt")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = keyed.groupBy("__bkt").agg(count(lit(1)).as("__n"))
      .withColumn("__off", coalesce(sum("__n").over(wB), lit(0L)))
      .select(col("__bkt"), col("__off"))
    intra.join(offsets, Seq("__bkt"))
      .select(col("doc_id"), (col("__off") + col("__rn") - 1).as("pos"))
  }

  /** Training order + fixed-size shard assignment (`pos div shardDocs`)
    * — the write-side unit a dataloader streams sequentially.
    */
  def shuffleShards(docs: DataFrame, seed: String, shardDocs: Long,
                    bucketHexChars: Int = 2): DataFrame = {
    require(shardDocs > 0, "shardDocs must be positive")
    shuffleOrder(docs, seed, bucketHexChars)
      .withColumn("shard", expr(s"pos div $shardDocs"))
  }
}
