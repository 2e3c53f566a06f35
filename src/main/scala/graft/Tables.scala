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

  /** `events.ts` has shipped in two parquet generations: TIMESTAMP(NANOS)
    * (read as raw nanos via the legacy conf, floor-divided to micros — the
    * truncation DuckDB applies when casting TIMESTAMP_NS down) and, since
    * the round-9 fixtures, plain micros with isAdjustedToUTC=false, which
    * Spark infers as TIMESTAMP_NTZ. Event-time streaming (watermarks) and
    * unix_micros demand TimestampType, so the NTZ generation is cast to
    * session-time TIMESTAMP — the session is pinned UTC, so wall-clock
    * values are unchanged and stay identical to DuckDB's naive read.
    */
  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name != "events") df
    else df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        // `div` is exact int64 division (a double divide would lose
        // precision above 2^53 ns); post-epoch fixtures, trunc == floor.
        df.withColumn("ts", org.apache.spark.sql.functions.expr(
          "timestamp_micros(ts div 1000)"))
      case org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn("ts",
          org.apache.spark.sql.functions.col("ts").cast("timestamp"))
      case _ => df
    }
  }

  // Registration is idempotent per (session, dir): queries call register
  // defensively, but within one Verify/Bench session only the first call
  // reads footers / touches the catalog. At 100 TB a directory listing per
  // query is a real driver cost; this caps it at one per session.
  private val registered =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[SparkSession, String]())

  /** Recursive local delete (shared by dropManaged and the Arrow sink). */
  def deleteRecursively(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles).foreach(_.foreach(deleteRecursively))
    f.delete()
  }

  /** Drop a managed (saveAsTable) table AND its warehouse directory. With
    * the in-memory catalog a fresh session forgets the table but the files
    * survive, and a later CTAS fails with LOCATION_ALREADY_EXISTS —
    * callers writing bucketed tables must clear both.
    */
  def dropManaged(spark: SparkSession, name: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $name")
    val wh = spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:")
    deleteRecursively(new java.io.File(wh, name))
  }

  /** Register all fixture tables as temp views in `spark` for SQL access. */
  def register(spark: SparkSession, dir: String): Unit =
    if (registered.get(spark) != dir) {
      all.foreach { t => load(spark, dir, t).createOrReplaceTempView(t) }
      registered.put(spark, dir)
    }
}
