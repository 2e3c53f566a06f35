package graft

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.{Exchange, ReusedExchangeExec}
import org.apache.spark.sql.types.StructType

import scala.collection.mutable.ArrayBuffer
import scala.jdk.CollectionConverters._

/** User-facing session façade with the surface of the reference engine's
  * context (reference `src/context.rs:57-131`, `datafusion_ray/core.py:
  * 591-655`): register tables by name from files, run SQL, tweak session
  * config. Everything delegates to the SparkSession — registration is
  * lazy (footer/header reads only), so the same calls work unchanged
  * against a 100 TB directory tree.
  *
  * ==Object-store URL schemes==
  *
  * The reference auto-registers remote stores from the URL scheme
  * (`util.rs:523-580`: s3://, gs://, http(s)://). In Spark the same
  * capability is CONFIG-level: every `register*` here accepts a remote
  * URI and delegates to the Hadoop FileSystem for its scheme, which must
  * be on the classpath and configured:
  *
  * | scheme    | connector jar (matching Hadoop version)  | core config |
  * |-----------|------------------------------------------|-------------|
  * | `s3a://`  (use for `s3://` too) | `hadoop-aws` + AWS SDK bundle | `spark.hadoop.fs.s3a.access.key` / `.secret.key` (or an AWS credentials provider chain) |
  * | `gs://`   | `gcs-connector` (shaded)                 | `spark.hadoop.google.cloud.auth.service.account.json.keyfile` |
  * | `abfss://`| `hadoop-azure` + `azure-storage`         | `spark.hadoop.fs.azure.account.key.<account>.dfs.core.windows.net` |
  * | `http(s)://` | bundled (Hadoop's read-only `HttpFileSystem`, HADOOP-14383) | single-FILE reads only — the http FS cannot list directories or globs, so point it at one file (the reference streams http CSV through `object_store`, same single-object semantics) |
  *
  * `s3://` is rewritten to `s3a://` (the maintained Hadoop S3 connector —
  * `s3://`'s own FileSystem was removed from Hadoop). When the scheme's
  * FileSystem is not on the classpath (this offline build bundles only
  * the http one), registration fails fast with the table row above
  * instead of a lazy `ClassNotFoundException` at first read.
  */
class Context(val spark: SparkSession) {

  /** Validate/normalize a registration path by URL scheme: local paths
    * (no scheme, or file:) pass through; s3: rewrites to s3a:; remote
    * schemes require their Hadoop FileSystem on the classpath — checked
    * HERE so a missing connector fails at registration with the fix
    * (jar + config), not at first scan.
    */
  private[graft] def resolvePath(path: String): String = {
    // scheme extracted by regex, not java.net.URI — glob paths
    // (`/data/{a,b}.parquet`) are valid registration targets but not
    // valid URIs
    val SchemeRe = "^([A-Za-z][A-Za-z0-9+.-]*)://.*".r
    val scheme = path match {
      case SchemeRe(s) => s.toLowerCase
      case _ => null
    }
    scheme match {
      case null | "file" => path
      case _ =>
        val conf = spark.sparkContext.hadoopConfiguration
        def fsResolves(sch: String): Boolean =
          try {
            // consults fs.<scheme>.impl first, then the ServiceLoader
            // registry — so a deployment-configured FileSystem (e.g. an
            // EMRFS-style fs.s3.impl) wins over our s3->s3a rewrite
            org.apache.hadoop.fs.FileSystem.getFileSystemClass(sch, conf)
            true
          } catch { case _: Exception => false }
        if (fsResolves(scheme)) path
        else if (scheme == "s3" && fsResolves("s3a"))
          // no s3 FileSystem configured: fall back to the standard s3a
          // connector. Schemes are case-insensitive (RFC 3986): drop the
          // original spelling by LENGTH, never by literal prefix match
          "s3a://" + path.substring("s3://".length)
        else {
          val s = if (scheme == "s3") "s3a" else scheme
          val hint = Map(
            "s3a" -> "add the hadoop-aws + AWS SDK bundle jars and set spark.hadoop.fs.s3a.access.key/.secret.key",
            "gs" -> "add the shaded gcs-connector jar and set spark.hadoop.google.cloud.auth.service.account.json.keyfile",
            "abfss" -> "add hadoop-azure + azure-storage jars and set spark.hadoop.fs.azure.account.key.<account>.dfs.core.windows.net"
          ).getOrElse(s, s"add the Hadoop FileSystem jar for scheme '$s'")
          throw new IllegalArgumentException(
            s"cannot register '$path': no FileSystem for scheme '$s' on the " +
              s"classpath — $hint (see Context scaladoc)")
        }
    }
  }

  /** `register_parquet` (reference `context.rs:57-67`): a single file OR a
    * directory/glob of parquet files — Spark's listing handles both, which
    * also covers `register_listing_table` (`context.rs:82-107`).
    */
  def registerParquet(name: String, path: String): Unit =
    spark.read.parquet(resolvePath(path)).createOrReplaceTempView(name)

  /** Directory-of-files table (reference `register_listing_table`,
    * `context.rs:82-107`). Alias of registerParquet — a directory path IS
    * a listing table in Spark — kept as its own method for API parity.
    */
  def registerListingTable(name: String, dir: String): Unit =
    registerParquet(name, dir)

  /** `register_csv` (reference `context.rs:69-79`): header/delimiter
    * options with schema inference (pass `schema` to skip the inference
    * scan — at 100 TB inference reads every file once).
    */
  def registerCsv(name: String, path: String, header: Boolean = true,
                  delimiter: String = ",", schema: Option[StructType] = None): Unit = {
    val r = spark.read
      .option("header", header.toString)
      .option("sep", delimiter)
    val withSchema = schema.fold(r.option("inferSchema", "true"))(r.schema)
    withSchema.csv(resolvePath(path)).createOrReplaceTempView(name)
  }

  /** NDJSON registration (reference `NdJsonExec`, `util.rs:498-500`). */
  def registerJson(name: String, path: String, schema: Option[StructType] = None): Unit =
    schema.fold(spark.read)(spark.read.schema)
      .json(resolvePath(path)).createOrReplaceTempView(name)

  /** Arrow IPC registration (reference `ArrowExec`, `util.rs:504-506`),
    * via the engine's DataSource V2 [[graft.sources.ArrowIpcSource]].
    */
  def registerArrow(name: String, path: String): Unit =
    spark.read.format("graft.sources.ArrowIpcSource").load(resolvePath(path))
      .createOrReplaceTempView(name)

  /** Avro registration (reference `register_avro` via DataFusion,
    * `datafusion.proto:1025-1027`), via the engine's DataSource V2
    * [[graft.sources.AvroSource]] (built on the Avro core library — the
    * spark-avro module is absent from this environment).
    */
  def registerAvro(name: String, path: String): Unit =
    spark.read.format("graft.sources.AvroSource").load(resolvePath(path))
      .createOrReplaceTempView(name)

  /** Split a SQL script on top-level semicolons only: a `;` inside a
    * quoted literal (with `''` and backslash escapes — but NOT inside
    * backticks, which have no backslash escape), a `--` line comment or a
    * bracketed comment (nesting, as Spark's lexer does since 3.0) is
    * content, so `WHERE c = 'a;b'` and `-- note; note` stay in one
    * statement.
    */
  private def splitStatements(script: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    val cur = new StringBuilder
    var quote: Char = 0
    var lineComment = false
    var commentDepth = 0
    var i = 0
    def peek = if (i + 1 < script.length) script.charAt(i + 1) else 0.toChar
    while (i < script.length) {
      val c = script.charAt(i)
      if (lineComment) {
        cur += c
        if (c == '\n') lineComment = false
      } else if (commentDepth > 0) {
        cur += c
        if (c == '*' && peek == '/') { cur += '/'; i += 1; commentDepth -= 1 }
        else if (c == '/' && peek == '*') { cur += '*'; i += 1; commentDepth += 1 }
      } else if (quote != 0) {
        cur += c
        if (c == '\\' && quote != '`' && i + 1 < script.length) {
          cur += peek; i += 1
        } else if (c == quote)
          if (peek == quote) { cur += quote; i += 1 } // doubled-quote escape
          else quote = 0
      } else c match {
        case '\'' | '"' | '`' => quote = c; cur += c
        case '-' if peek == '-' => lineComment = true; cur += c
        case '/' if peek == '*' => commentDepth = 1; cur += c; cur += '*'; i += 1
        case ';' => out += cur.result(); cur.clear()
        case _ => cur += c
      }
      i += 1
    }
    out += cur.result()
    out.result().map(_.trim).filter(_.nonEmpty)
  }

  /** `ctx.sql(query)` (reference `context.rs:109-113`) — supports
    * multi-statement scripts (q15's `CREATE VIEW; SELECT; DROP VIEW`,
    * reference `tpch/tpcbench.py:110-114`): statements run in order and
    * the last RESULTFUL one is returned (commands like CREATE/DROP yield
    * empty-schema frames, so a script ending in DROP still hands back its
    * SELECT).
    */
  def sql(query: String): GraftDataFrame = {
    val stmts = splitStatements(query)
    require(stmts.nonEmpty, "empty SQL script")
    val frames = stmts.map(spark.sql)
    // "resultful" = an actual query, not a command: SET/SHOW/DESCRIBE
    // carry a non-empty schema, so a schema check alone would let a
    // trailing SET shadow the SELECT; the logical plan's Command trait is
    // the reliable discriminator (DROP VIEW => DropView, SET => SetCommand)
    def isQuery(f: DataFrame): Boolean = !f.queryExecution.logical
      .isInstanceOf[org.apache.spark.sql.catalyst.plans.logical.Command]
    new GraftDataFrame(frames.findLast(isQuery).getOrElse(frames.last))
  }

  /** Parameterized SQL (reference `PrepareNode`, proto 179-183). */
  def sql(query: String, args: Map[String, Any]): GraftDataFrame =
    new GraftDataFrame(spark.sql(query, args))

  /** Session config set/get (reference `context.rs:115-131`). */
  def set(key: String, value: String): Unit = spark.conf.set(key, value)
  def get(key: String): String = spark.conf.get(key)

  /** Catalog introspection — the reference enables `information_schema`
    * (`context.rs:44`) so clients can enumerate what they registered;
    * the Spark-native equivalents are the catalog API (here) and
    * `SHOW TABLES` / `DESCRIBE <table>` SQL text, which [[sql]] already
    * executes (both SHOW and DESCRIBE return resultful frames).
    */
  def tables(): Seq[String] =
    spark.catalog.listTables().collect().map(_.name).toSeq.sorted

  /** (column name, Spark SQL type string) per column — the
    * `information_schema.columns` equivalent for one registered table.
    */
  def columns(table: String): Seq[(String, String)] =
    spark.catalog.listColumns(table).collect()
      .map(c => (c.name, c.dataType)).toSeq

  /** Reference `get_target_partitions` — the shuffle fan-out knob. */
  def targetPartitions: Int = spark.conf.get("spark.sql.shuffle.partitions").toInt
}

object Context {
  def local(appName: String = "graft"): Context = new Context(Session.local(appName))
}

/** Handle to a pending query, mirroring the reference's `DFRayDataFrame`
  * inspection+execution surface (`dataframe.rs:90-263`, `core.py:466-555`):
  * `collect/show/schema/logical_plan/optimized_logical_plan/execution_plan/
  * stages`. No relational verbs — query construction is SQL, as in the
  * reference.
  */
class GraftDataFrame(val df: DataFrame) {

  def collect(): Array[Row] = df.collect()
  def show(n: Int = 20): Unit = df.show(n, truncate = false)
  def schema: StructType = df.schema

  /** Results as one Arrow IPC stream (the reference hands clients pyarrow
    * RecordBatches, `dataframe.rs:422-458`): rows are collected and
    * re-encoded through the same Arrow writer the sink uses, so any Arrow
    * consumer can read the bytes. Driver-side by design — this is the
    * client hand-off, not a data-plane path.
    */
  def collectArrow(batchRows: Int = 4096): Array[Byte] = {
    import org.apache.arrow.vector.ipc.ArrowStreamWriter
    import org.apache.arrow.memory.RootAllocator
    import org.apache.arrow.vector.VectorSchemaRoot
    require(batchRows > 0, s"batchRows must be positive, got $batchRows")
    // validate encodability BEFORE running the job — an unsupported output
    // type should fail at zero cost, not after a full collect
    val aSchema = new org.apache.arrow.vector.types.pojo.Schema(
      df.schema.fields.map(graft.sources.ArrowWrite.arrowField)
        .toSeq.asJava)
    val rows = df.collect()
    val alloc = new RootAllocator(Long.MaxValue)
    try {
      val root = VectorSchemaRoot.create(aSchema, alloc)
      try {
        val out = new java.io.ByteArrayOutputStream()
        val writer = new ArrowStreamWriter(root, null, out)
        try {
          writer.start()
          rows.grouped(batchRows).foreach { chunk =>
            root.allocateNew()
            chunk.zipWithIndex.foreach { case (row, i) =>
              graft.sources.ArrowWrite.setRow(root, df.schema, row, i)
            }
            root.setRowCount(chunk.length)
            writer.writeBatch()
          }
          writer.end()
        } finally writer.close()
        out.toByteArray
      } finally root.close()
    } finally alloc.close()
  }

  def logicalPlan: String = df.queryExecution.logical.toString
  def optimizedLogicalPlan: String = df.queryExecution.optimizedPlan.toString
  def executionPlan: String = df.queryExecution.executedPlan.toString

  /** Unwrap AQE so stage cutting sees the exchange tree (the current plan:
    * initial before execution, re-planned after).
    */
  private def physical: SparkPlan = df.queryExecution.executedPlan match {
    case a: AdaptiveSparkPlanExec => a.executedPlan
    case p => p
  }

  /** EXPLAIN ANALYZE parity (reference `AnalyzeNode`,
    * `datafusion.proto:223-227`): execute the query, then report each
    * physical operator with its observed output-row count. Operators
    * without a rows metric (exchanges report data size instead) are
    * listed with -1.
    */
  def analyze(): Seq[(String, Long)] = {
    // SQLMetrics are cumulative accumulators: without a reset, a prior
    // collect() (or a second analyze()) leaves its counts behind and the
    // raw-RDD execution below adds on top, inflating every operator
    def reset(p: SparkPlan): Unit = {
      p.metrics.values.foreach(_.reset())
      p match {
        case q: QueryStageExec => reset(q.plan)
        case _ => p.children.foreach(reset)
      }
    }
    reset(physical)
    // execute THIS QueryExecution's plan without materializing rows on
    // the driver (collect() would OOM on large results; a noop write
    // would execute a different QueryExecution whose metrics we can't see)
    df.queryExecution.toRdd.count()
    def walk(p: SparkPlan): Seq[(String, Long)] = {
      val here = (p.nodeName,
        p.metrics.get("numOutputRows").map(_.value).getOrElse(-1L))
      val kids = p match {
        case q: QueryStageExec => walk(q.plan)
        case _ => p.children.flatMap(walk)
      }
      here +: kids
    }
    walk(physical)
  }

  /** Exchange-delimited stage dump — the reference's `stages()` semantics
    * (`dataframe.rs:90-222`): every Exchange becomes a stage boundary; the
    * parent reads the child stage (the reference's `DFRayStageReaderExec`,
    * here the shuffle/broadcast fetch). Stages are numbered bottom-up, the
    * root stage last — same ordering the reference emits.
    */
  def stages(): Seq[String] = {
    val out = ArrayBuffer[String]()
    def emit(root: SparkPlan): Int = {
      val lines = ArrayBuffer[(Int, String)]()
      def walk(p: SparkPlan, depth: Int): Unit = p match {
        case e: Exchange =>
          val cid = emit(e.child)
          lines += depth -> s"${e.nodeName} [reads stage $cid]"
        case r: ReusedExchangeExec =>
          lines += depth -> s"${r.nodeName} [reuses earlier stage output]"
        case q: QueryStageExec =>
          walk(q.plan, depth)
        case other =>
          lines += depth -> other.simpleString(20)
          other.children.foreach(walk(_, depth + 1))
      }
      walk(root, 0)
      val id = out.length
      out += lines.map { case (d, s) => "  " * d + s }
        .mkString(s"Stage $id:\n", "\n", "")
      id
    }
    emit(physical)
    out.toSeq
  }
}
