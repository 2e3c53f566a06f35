package graft.sources

import java.io.{File, FileInputStream}
import java.util.{Map => JMap}

import scala.jdk.CollectionConverters._

import org.apache.arrow.memory.RootAllocator
import org.apache.arrow.vector._
import org.apache.arrow.vector.ipc.ArrowStreamReader
import org.apache.arrow.vector.types.pojo.{ArrowType, Field}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Arrow IPC (stream format) scan as a DataSource V2 `TableProvider` —
  * SURVEY §2.B's optional Arrow row (reference `ArrowExec`,
  * `util.rs:504-506`), built on the arrow-vector libraries Spark already
  * ships. Usage:
  *
  * {{{ spark.read.format("graft.sources.ArrowIpcSource").load(dirOrFile) }}}
  *
  * Scale design: one input partition per file (the IPC stream format has
  * no internal split points — at 100 TB you write MANY files, as with any
  * log-structured layout); schema inferred from one file header only;
  * column pruning pushed into the reader (`SupportsPushDownRequiredColumns`
  * — unprojected vectors are never copied out of the batch).
  *
  * Supported Arrow types: Int(64/32), FloatingPoint(single/double),
  * Utf8, Bool, and List of any of these (array columns — the embedding
  * interchange case). Extend `sparkTypeOf`/`valueAt` for more.
  */
class ArrowIpcSource extends TableProvider {
  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    ArrowIpc.inferSchema(ArrowIpc.listFiles(options.get("path")))

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: JMap[String, String]): Table =
    new ArrowIpcTable(schema, properties.get("path"),
      Option(properties.get("version")).map(_.trim.toInt))
}

private[sources] object ArrowIpc {

  def listFiles(path: String): Seq[String] = {
    require(path != null, "arrow source requires a path")
    val f = new File(path)
    val files =
      if (f.isDirectory)
        f.listFiles().toSeq
          .filter(x => x.isFile && !x.getName.startsWith(".") &&
            !x.getName.startsWith("_"))
      else if (f.isFile) Seq(f)
      else Seq.empty // write target that doesn't exist yet
    files.map(_.getAbsolutePath).sorted
  }

  /** TIME-TRAVEL listing: exactly the files `_v{version}.manifest`
    * recorded at commit time — a reader pinned to version N is immune to
    * later appends. Every recorded file must still exist (a truncate
    * since that snapshot invalidates it, and that must fail loudly, not
    * read half a snapshot).
    */
  def listFilesAt(path: String, version: Int): Seq[String] = {
    val dir = new File(path)
    TwoPhaseCommit.readManifest(dir, version).map { name =>
      val f = new File(dir, name)
      require(f.isFile,
        s"snapshot v$version references missing file $name (vacuumed by a later overwrite?)")
      f.getAbsolutePath
    }.sorted
  }

  def sparkTypeOf(field: Field): DataType = field.getType match {
    case t: ArrowType.Int if t.getBitWidth == 64 => LongType
    case t: ArrowType.Int if t.getBitWidth == 32 => IntegerType
    case t: ArrowType.FloatingPoint =>
      if (t.getPrecision.name == "DOUBLE") DoubleType else FloatType
    case _: ArrowType.Utf8 => StringType
    case _: ArrowType.Bool => BooleanType
    case _: ArrowType.List =>
      val child = field.getChildren.get(0)
      ArrayType(sparkTypeOf(child), child.isNullable)
    case other =>
      throw new UnsupportedOperationException(s"arrow type $other")
  }

  def inferSchema(files: Seq[String]): StructType = {
    // empty => a write target with nothing to infer from; the write path
    // gets its real schema from LogicalWriteInfo, reads of an empty dir
    // fail later with a clear empty-schema error
    if (files.isEmpty) return new StructType()
    val alloc = new RootAllocator(Long.MaxValue)
    val in = new FileInputStream(files.head)
    val reader = new ArrowStreamReader(in, alloc)
    try {
      val fields = reader.getVectorSchemaRoot.getSchema.getFields.asScala
      StructType(fields.map(f =>
        StructField(f.getName, sparkTypeOf(f), f.isNullable)).toSeq)
    } finally { reader.close(); in.close(); alloc.close() }
  }
}

private[sources] class ArrowIpcTable(schema: StructType, path: String,
                                     version: Option[Int] = None)
    extends Table with SupportsRead
    with org.apache.spark.sql.connector.catalog.SupportsWrite {
  override def name(): String = s"arrow:$path"
  override def schema(): StructType = schema
  override def capabilities(): java.util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.TRUNCATE, TableCapability.MICRO_BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ArrowScanBuilder(schema, path, version,
      Option(options.get("maxVersionsPerTrigger")).map(_.trim.toInt)
        .getOrElse(Int.MaxValue))
  override def newWriteBuilder(
      info: org.apache.spark.sql.connector.write.LogicalWriteInfo)
      : org.apache.spark.sql.connector.write.WriteBuilder =
    new ArrowWriteBuilder(info, path)
}

private[sources] class ArrowScanBuilder(fullSchema: StructType, path: String,
                                        version: Option[Int],
                                        maxVersionsPerTrigger: Int = Int.MaxValue)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = fullSchema
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan =
    new ArrowScan(required, path, version, maxVersionsPerTrigger)
}

private[sources] class ArrowScan(required: StructType, path: String,
                                 version: Option[Int],
                                 maxVersionsPerTrigger: Int = Int.MaxValue)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def toMicroBatchStream(checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    new CommitLogStream(path, maxVersionsPerTrigger,
      ArrowFilePartition.apply, new ArrowReaderFactory(required))
  override def planInputPartitions(): Array[InputPartition] = {
    val files = version.map(ArrowIpc.listFilesAt(path, _))
      .getOrElse(ArrowIpc.listFiles(path))
    // a missing/empty path must fail the READ loudly (inferSchema stays
    // lenient because the write path resolves the same table first)
    require(files.nonEmpty, s"no arrow files under $path")
    files.map(ArrowFilePartition.apply).toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new ArrowReaderFactory(required)
  override def description(): String =
    s"ArrowIpcScan $path${version.map(v => s" @v$v").getOrElse("")} " +
      required.simpleString
}

private[sources] case class ArrowFilePartition(file: String) extends InputPartition

/** Stream OFFSET = a snapshot version from the sink's commit log, plus
  * the log GENERATION that version belongs to. The generation rides in
  * the checkpointed json so that a resume across a truncate+rewrite is
  * detected even when the new generation has landed at least as many
  * commits as the old one (same `_vN.manifest` name, different history —
  * r10 ADVICE medium). Empty generation = legacy checkpoint written
  * before the token existed; the check is skipped for those.
  */
private[sources] case class ArrowVersionOffset(version: Int,
                                               generation: String = "")
    extends org.apache.spark.sql.connector.read.streaming.Offset {
  override def json(): String =
    if (generation.isEmpty) version.toString
    else s"""{"version":$version,"generation":"$generation"}"""
}

private[sources] object ArrowVersionOffset {
  private val Re = """\{"version":(\d+),"generation":"([^"]*)"\}""".r
  def parse(json: String): ArrowVersionOffset = json.trim match {
    case Re(v, g) => ArrowVersionOffset(v.toInt, g)
    case s => ArrowVersionOffset(s.toInt) // legacy plain-int checkpoint
  }
}

/** Micro-batch STREAMING source over the sinks' shared commit log:
  * every published `_v{N}.manifest` is one offset, and batch (start,
  * end] reads exactly `manifest(end) ∖ manifest(start)` — the files the
  * commits in that range landed. Exactly-once falls out of the commit
  * protocol itself: a file is visible iff its commit published a
  * manifest, uncommitted staging files are invisible, and replanning a
  * batch from the checkpointed offsets yields the same file set
  * (manifests are immutable). This is the "table format as streaming
  * source" pattern (a Delta/Iceberg CDC read, scaled to these sinks): a
  * continuous ingest tails the table the batch writers land into, with
  * no directory-diff races. APPEND-ONLY by contract — an overwrite
  * truncates the log, and a stream whose start offset no longer exists
  * fails loudly rather than silently re-reading the new generation.
  * `maxVersionsPerTrigger` paces recovery/backfill (admission control):
  * a stream starting against a long-committed history drains it
  * commit-by-commit instead of one giant batch. Format-agnostic: the
  * Arrow and Avro sources both plug in their own partition shape and
  * reader factory ([[TwoPhaseCommit]] writes the same log for both).
  */
private[sources] class CommitLogStream(path: String,
    maxVersionsPerTrigger: Int,
    mkPartition: String => InputPartition,
    readerFactory: PartitionReaderFactory)
    extends org.apache.spark.sql.connector.read.streaming.MicroBatchStream
    with org.apache.spark.sql.connector.read.streaming.SupportsAdmissionControl {
  import org.apache.spark.sql.connector.read.streaming.{Offset, ReadLimit}

  private def dir = new File(path)

  private def maxVersion: Int =
    TwoPhaseCommit.manifestVersions(dir).lastOption.getOrElse(0)

  /** The generation to stamp into an offset naming `version` — the
    * generation of THAT version's manifest, never the log's latest:
    * checkGeneration compares against generation(dir, offset.version), so
    * stamping the latest generation onto an admission-capped offset that
    * names an older (possibly pre-header legacy) manifest would make the
    * stream refuse its own offset on the next trigger (r11 ADVICE
    * medium: legacy history + one post-header append). A headerless
    * legacy manifest yields the empty generation, which checkGeneration
    * deliberately skips.
    */
  private def genAt(version: Int): String =
    if (version <= 0) TwoPhaseCommit.currentGeneration(dir).getOrElse("")
    else TwoPhaseCommit.generation(dir, version).getOrElse("")

  /** A non-legacy offset with version > 0 must still name a manifest of
    * ITS OWN generation — if the manifest vanished (truncate, no rewrite
    * yet) or reappeared under a different generation (truncate + enough
    * new commits), resuming would silently treat the new generation's
    * commits 1..N as already consumed. Fail loudly instead.
    */
  private def checkGeneration(off: ArrowVersionOffset, ctx: String): Unit =
    if (off.version > 0 && off.generation.nonEmpty) {
      val now = TwoPhaseCommit.generation(dir, off.version).getOrElse("<none>")
      if (now != off.generation) throw new IllegalStateException(
        s"commit-log stream ($ctx): checkpointed offset v${off.version} belongs to " +
          s"log generation '${off.generation}' but $path now carries '$now' — the " +
          "table was overwritten while the stream was down; resuming would drop the " +
          "new generation's first commits. Start the stream from a fresh checkpoint.")
    }

  override def initialOffset(): Offset = ArrowVersionOffset(0, genAt(0))

  override def getDefaultReadLimit: ReadLimit =
    if (maxVersionsPerTrigger == Int.MaxValue) ReadLimit.allAvailable()
    else ReadLimit.maxFiles(maxVersionsPerTrigger)

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(start, limit) is the admission-controlled entry point")

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val s = start.asInstanceOf[ArrowVersionOffset]
    checkGeneration(s, "latestOffset")
    val cap = limit match {
      case m: org.apache.spark.sql.connector.read.streaming.ReadMaxFiles =>
        m.maxFiles()
      case _ => Int.MaxValue
    }
    val end = math.min(maxVersion, s.version.toLong + cap).toInt
    ArrowVersionOffset(end, genAt(end))
  }

  override def reportLatestOffset(): Offset =
    ArrowVersionOffset(maxVersion, genAt(maxVersion))

  private def filesAt(v: Int): Set[String] =
    if (v <= 0) Set.empty
    else TwoPhaseCommit.readManifest(dir, v).toSet

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val so = start.asInstanceOf[ArrowVersionOffset]
    val eo = end.asInstanceOf[ArrowVersionOffset]
    checkGeneration(so, "planInputPartitions")
    checkGeneration(eo, "planInputPartitions")
    val e = eo.version
    (filesAt(e) -- filesAt(so.version)).toSeq.sorted.map { name =>
      val f = new File(dir, name)
      require(f.isFile, s"commit-log stream: file $name of snapshot v$e " +
        "is gone (table was overwritten mid-stream?)")
      mkPartition(f.getAbsolutePath)
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = readerFactory

  override def deserializeOffset(json: String): Offset =
    ArrowVersionOffset.parse(json)

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

private[sources] class ArrowReaderFactory(required: StructType)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new ArrowPartitionReader(required, p.asInstanceOf[ArrowFilePartition].file)
}

/** Streams one IPC file batch-by-batch; only the projected vectors are
  * read. Arrow memory is freed on close (task-completion guaranteed by
  * the DSv2 contract).
  */
private[sources] class ArrowPartitionReader(required: StructType, file: String)
    extends PartitionReader[InternalRow] {

  private val alloc = new RootAllocator(Long.MaxValue)
  private val in = new FileInputStream(file)
  private val reader = new ArrowStreamReader(in, alloc)
  private val root = reader.getVectorSchemaRoot
  private var rowIdx = 0
  private var rowCount = 0
  // projected vectors, resolved once per batch — per-row name lookups are
  // wasted work, and a null from getVector (schema drift: a file in the
  // directory lacking a projected column) must fail loudly, not NPE
  private var vectors: Array[FieldVector] = Array.empty

  override def next(): Boolean = {
    if (rowIdx < rowCount) true
    else if (reader.loadNextBatch()) {
      rowIdx = 0
      rowCount = root.getRowCount
      vectors = required.fields.map { f =>
        val v = root.getVector(f.name)
        if (v == null) throw new IllegalStateException(
          s"column '${f.name}' missing in arrow file $file (schema is " +
            "inferred from one file's header; all files in a directory " +
            "must carry the projected columns)")
        v
      }
      if (rowCount == 0) next() else true
    } else false
  }

  private def valueAt(v: FieldVector, i: Int): Any = v match {
    case x: BigIntVector => x.get(i)
    case x: IntVector => x.get(i)
    case x: Float8Vector => x.get(i)
    case x: Float4Vector => x.get(i)
    case x: BitVector => x.get(i) == 1
    case x: VarCharVector => UTF8String.fromBytes(x.get(i))
    case x: org.apache.arrow.vector.complex.ListVector =>
      // list row i = elements [start, end) of the child data vector
      val start = x.getElementStartIndex(i)
      val end = x.getElementEndIndex(i)
      val dv = x.getDataVector
      val out = new Array[Any](end - start)
      var k = 0
      while (k < out.length) {
        out(k) = if (dv.isNull(start + k)) null else valueAt(dv, start + k)
        k += 1
      }
      new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
    case other =>
      throw new UnsupportedOperationException(s"arrow vector ${other.getClass}")
  }

  override def get(): InternalRow = {
    val row = new GenericInternalRow(required.length)
    var j = 0
    while (j < required.length) {
      val v = vectors(j)
      if (v.isNull(rowIdx)) row.setNullAt(j)
      else row.update(j, valueAt(v, rowIdx))
      j += 1
    }
    rowIdx += 1
    row
  }

  override def close(): Unit = {
    reader.close(); in.close(); alloc.close()
  }
}
