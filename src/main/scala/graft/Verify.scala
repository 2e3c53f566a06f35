package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // optional trailing args: run a SUBSET of queries (r16: the full dump
    // is ~35 min at sf0.01 — a per-change correctness loop needs the
    // same subset support Bench has). The driver calls with 2 args and
    // gets the full dump, unchanged. Unknown names fail loudly.
    val names = args.drop(2)
    val missing = names.filterNot(SparkEntry.queries.contains)
    require(missing.isEmpty, s"unknown queries: ${missing.mkString(",")}")
    val selected =
      if (names.isEmpty) SparkEntry.queries
      else SparkEntry.queries.view.filterKeys(names.contains).toMap
    val spark = Session.local("graft-verify")
    Tables.register(spark, sfDir)
    new java.io.File(outDir).mkdirs()
    def dump(name: String,
             fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Unit =
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    // Two-phase execution (r16 verdict #1: the serial full dump was ~35
    // min — too close to the driver's budget; the oracle replay never ran
    // that round). Spark schedules concurrent jobs fine (guide §2.6); what
    // is NOT safe to overlap is anything that mutates SESSION state, so:
    //   phase A — every non-Io entry through a small thread pool. These
    //     paths only read the session (audited: no conf.set, no catalog
    //     DDL, per-entry-unique temp view names; Tables.register is
    //     idempotent and SessionCatalog temp-view ops are synchronized).
    //   phase B — the Io-wired entries SERIALLY: streaming replays set
    //     spark.sql.shuffle.partitions + the RocksDB provider around each
    //     run, compaction tunes scan-split confs, bucketed_join does
    //     saveAsTable DDL — all session-global, so they never overlap
    //     with anything.
    // Each entry writes its own output directory, so results are byte-
    // identical to the serial dump regardless of completion order.
    val ioNames = graft.queries.Io.queries.keySet
    val (ioEntries, poolEntries) =
      selected.toSeq.partition { case (n, _) => ioNames.contains(n) }
    if (poolEntries.nonEmpty) {
      import scala.concurrent.{Await, ExecutionContext, Future}
      import scala.concurrent.duration.Duration
      val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
      implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
      try Await.result(
        Future.sequence(poolEntries.map { case (name, fn) =>
          Future(dump(name, fn))
        }), Duration.Inf): Unit
      finally pool.shutdown()
    }
    ioEntries.foreach { case (name, fn) => dump(name, fn) }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
