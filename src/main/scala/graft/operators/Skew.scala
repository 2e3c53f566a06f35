package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Manual skew mitigation — the explicit counterpart to AQE's runtime
  * skew-join split (SkewJoinSpec) for engines/paths where AQE can't help:
  * stream-static joins, aggregation state, or a known-hot key set.
  *
  * Salted join: the skewed (big) side scatters each hot key across
  * `salts` sub-keys; the small side replicates each row `salts` times so
  * every sub-key still finds its match. Join output is IDENTICAL to the
  * plain join — only the shuffle distribution changes: a key that owned
  * one partition now spreads over `salts` partitions, at the price of a
  * `salts`× blow-up of the (small) replicated side.
  *
  * The salt mixes a content hash with the input partition id: content
  * alone would put a hot group of IDENTICAL rows (duplicated events, the
  * classic skew case) on a single salt, re-creating the hotspot. RESULTS
  * stay deterministic — joins/aggregates are insensitive to which salt a
  * row lands on — even though the salt assignment itself varies with
  * input partitioning.
  */
object Skew {

  /** The salt: content hash + input partition id, each reduced modulo
    * `salts` BEFORE the addition (an unbounded xxhash64 + id could
    * overflow Long, which throws under ANSI mode). Exposed for tests —
    * the identical-rows scatter property is the whole point of the
    * partition-id term.
    */
  def saltExpr(df: org.apache.spark.sql.DataFrame, salts: Int)
      : org.apache.spark.sql.Column =
    pmod(pmod(xxhash64(struct(df.columns.map(col).toIndexedSeq: _*)), lit(salts))
      + spark_partition_id().cast("long"), lit(salts)).cast("int")

  /** Inner equi-join of `big` (skewed) with `small` on `key`, salted
    * `salts` ways. Columns out = big.* ++ small.* minus the duplicate key.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 salts: Int = 16): DataFrame = {
    require(salts > 0, "salts must be positive")
    val saltedBig = big.withColumn("__salt", saltExpr(big, salts))
    val saltedSmall = small
      .withColumn("__salt", explode(expr(s"sequence(0, ${salts - 1})")))
    saltedBig.join(saltedSmall, Seq(key, "__salt")).drop("__salt")
  }

  /** Two-phase salted aggregation for count/sum-style (algebraic)
    * aggregates when one group dwarfs the rest: partial-aggregate on
    * (key, salt), then final-aggregate on key. Spark's hash aggregate
    * already partial-aggregates map-side, so this matters when the
    * *partial state itself* is wide (e.g. collect-like buffers) or the
    * hot group overwhelms one reducer.
    */
  def saltedCountSum(df: DataFrame, key: String, valueCol: String,
                     salts: Int = 16): DataFrame =
    // content hash + partition id: either alone leaves a hot group of
    // identical rows on one salt — the exact hotspot this exists to split
    df.withColumn("__salt", saltExpr(df, salts))
      .groupBy(col(key), col("__salt"))
      .agg(count("*").as("__n"), sum(col(valueCol)).as("__s"))
      .groupBy(col(key))
      .agg(sum("__n").as("n"), sum("__s").as("s"))
}
