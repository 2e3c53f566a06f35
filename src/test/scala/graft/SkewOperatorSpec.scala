package graft

import graft.operators.Skew
import org.apache.spark.sql.functions._

/** Salted-join/aggregation correctness: output must equal the unsalted
  * equivalents row-for-row, while the shuffle key space fans the hot key
  * across `salts` partitions.
  */
class SkewOperatorSpec extends SparkSpec {

  test("saltedJoin equals the plain join on a hot-key dataset") {
    val big = spark.range(0, 20000).select(
      expr("CASE WHEN id % 4 <> 0 THEN CAST(7 AS BIGINT) ELSE id END").as("k"),
      col("id").as("payload"))
    val small = spark.range(0, 20000).select(col("id").as("k"), expr("id * 3").as("v"))
    val plain = big.join(small, "k")
    val salted = Skew.saltedJoin(big, small, "k", salts = 8)
    assert(salted.columns.toSeq == plain.columns.toSeq)
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("saltedJoin scatters a hot key of IDENTICAL rows across sub-keys") {
    // byte-identical rows (duplicated-event skew): a content-only salt
    // would park all of them on ONE salt; the partition-id term spreads them
    val big = spark.range(0, 8000).repartition(8)
      .select(lit(1L).as("k"), lit(0L).as("payload"))
    val small = spark.range(0, 4).select(col("id").as("k"), col("id").as("v"))
    val salted = big.withColumn("__salt", Skew.saltExpr(big, 8))
    assert(salted.select("__salt").distinct().count() >= 7)
    // and the salted join still returns exactly the plain-join rows
    assert(Skew.saltedJoin(big, small, "k", salts = 8).count()
      == big.join(small, "k").count())
  }

  test("saltedCountSum equals groupBy count/sum") {
    val df = spark.range(0, 50000).select(
      expr("CASE WHEN id % 3 = 0 THEN 'hot' ELSE CAST(id AS STRING) END").as("k"),
      col("id").as("v"))
    val expected = df.groupBy("k")
      .agg(count("*").as("n"), sum("v").as("s"))
    val salted = Skew.saltedCountSum(df, "k", "v", salts = 8)
    assert(salted.exceptAll(expected).isEmpty && expected.exceptAll(salted).isEmpty)
  }
}
