package graft

import org.apache.spark.sql.SparkSession

/** One shared SparkSession builder for Verify, Bench and tests, so the
  * benched plans are byte-identical to the verified ones (UTC pinned,
  * same shuffle partitioning, same AQE behavior). Mirrors the single
  * `SessionContext` the reference builds in `src/context.rs:42-52`.
  *
  * Scale notes (100 TB): AQE is explicitly on — at real scale it
  * re-plans sort-merge joins into broadcast joins from runtime stats,
  * coalesces undersized shuffle partitions and splits skewed ones
  * (`skewJoin.enabled`). `shuffle.partitions` defaults to the local
  * core count here; on a cluster it should be ~2-3x total cores —
  * it is env-overridable for that reason.
  */
object Session {
  def cpus: String = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")

  def local(appName: String = "graft"): SparkSession = {
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      // events.ts is TIMESTAMP(NANOS) parquet; see Tables.load.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // bucketed saveAsTable target (in-memory catalog, files under /tmp —
      // never the repo's cwd default spark-warehouse/)
      .config("spark.sql.warehouse.dir", "/tmp/graft_warehouse")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
