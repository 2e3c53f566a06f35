package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Fixture-table catalog: registers every parquet table under a scale-factor
  * directory as a temp view, mirroring the reference's `register_parquet`
  * (reference `src/context.rs:57-67`) and its TPC-H harness table loop
  * (reference `tpch/tpcbench.py:46-55`).
  *
  * Scale note: views are lazy — registering reads only parquet footers.
  * Filters/projections in queries reach the scan via Catalyst pushdown,
  * so the same registration works unchanged at 100 TB (directory paths
  * instead of single files; Spark's FileSourceScanExec handles splits,
  * partition pruning and predicate pushdown).
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** `events.ts` is TIMESTAMP(NANOS) parquet, which Spark's vectorized reader
    * rejects; read it as raw nanos (legacy conf) and floor-divide to
    * microsecond TimestampType — the same truncation DuckDB applies when
    * casting TIMESTAMP_NS to TIMESTAMP, keeping the oracle comparable.
    */
  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events" && df.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      df.withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
    else df
  }

  /** Register all fixture tables as temp views in `spark` for SQL access. */
  def register(spark: SparkSession, dir: String): Unit = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    all.foreach { t => load(spark, dir, t).createOrReplaceTempView(t) }
  }
}
