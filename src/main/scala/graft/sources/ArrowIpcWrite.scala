package graft.sources

import java.io.{File, FileOutputStream}

import scala.jdk.CollectionConverters._

import org.apache.arrow.memory.RootAllocator
import org.apache.arrow.vector._
import org.apache.arrow.vector.ipc.ArrowStreamWriter
import org.apache.arrow.vector.types.FloatingPointPrecision
import org.apache.arrow.vector.types.pojo.{ArrowType, Field, FieldType, Schema}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types._

/** DSv2 write path for [[ArrowIpcSource]] — the real two-phase commit
  * protocol: each task streams its rows to an attempt-named `.tmp` file
  * and reports it in its commit message; the DRIVER publishes all temps
  * with atomic renames only once every task has succeeded, and deletes
  * them on abort. Speculative/retried attempts therefore never corrupt
  * or half-publish a file. `mode("overwrite")` maps to truncate (the
  * directory is cleared at commit time, before publishing).
  *
  * Types: long/int/double/float/string/boolean plus arrays of these
  * (Arrow List — mirrors the scan).
  */
private[graft] object ArrowWrite {
  def arrowField(f: StructField): Field = f.dataType match {
    case ArrayType(et, containsNull) =>
      val child = arrowField(StructField("item", et, containsNull))
      new Field(f.name, FieldType.nullable(ArrowType.List.INSTANCE),
        java.util.List.of(child))
    case dt =>
      val t = dt match {
        case LongType => new ArrowType.Int(64, true)
        case IntegerType => new ArrowType.Int(32, true)
        case DoubleType => new ArrowType.FloatingPoint(FloatingPointPrecision.DOUBLE)
        case FloatType => new ArrowType.FloatingPoint(FloatingPointPrecision.SINGLE)
        case StringType => new ArrowType.Utf8()
        case BooleanType => ArrowType.Bool.INSTANCE
        case other =>
          throw new UnsupportedOperationException(s"arrow write of $other")
      }
      new Field(f.name, FieldType.nullable(t), null)
  }

  /** Append one Spark ArrayData as list row `i` of a ListVector. */
  def setList(x: org.apache.arrow.vector.complex.ListVector, i: Int,
              arr: org.apache.spark.sql.catalyst.util.ArrayData): Unit = {
    val start = x.startNewValue(i)
    val dv = x.getDataVector
    val n = arr.numElements()
    var k = 0
    while (k < n) {
      if (arr.isNullAt(k)) dv match {
        case d: BaseFixedWidthVector => d.setNull(start + k)
        case d: BaseVariableWidthVector => d.setNull(start + k)
        case d => throw new UnsupportedOperationException(d.getClass.toString)
      } else dv match {
        case d: BigIntVector => d.setSafe(start + k, arr.getLong(k))
        case d: IntVector => d.setSafe(start + k, arr.getInt(k))
        case d: Float8Vector => d.setSafe(start + k, arr.getDouble(k))
        case d: Float4Vector => d.setSafe(start + k, arr.getFloat(k))
        case d: BitVector => d.setSafe(start + k, if (arr.getBoolean(k)) 1 else 0)
        case d => throw new UnsupportedOperationException(d.getClass.toString)
      }
      k += 1
    }
    x.endValue(i, n)
  }

  /** Populate row `i` of an allocated VectorSchemaRoot from an external
    * Row (driver-side encoding, e.g. GraftDataFrame.collectArrow; the
    * executor write path uses InternalRow directly).
    */
  def setRow(root: VectorSchemaRoot, schema: StructType,
             row: org.apache.spark.sql.Row, i: Int): Unit = {
    var j = 0
    while (j < schema.length) {
      val v = root.getVector(j)
      if (row.isNullAt(j)) v match {
        case x: BaseFixedWidthVector => x.setNull(i)
        case x: BaseVariableWidthVector => x.setNull(i)
        case x: org.apache.arrow.vector.complex.ListVector => x.setNull(i)
        case x => throw new UnsupportedOperationException(x.getClass.toString)
      } else v match {
        case x: BigIntVector => x.setSafe(i, row.getLong(j))
        case x: IntVector => x.setSafe(i, row.getInt(j))
        case x: Float8Vector => x.setSafe(i, row.getDouble(j))
        case x: Float4Vector => x.setSafe(i, row.getFloat(j))
        case x: BitVector => x.setSafe(i, if (row.getBoolean(j)) 1 else 0)
        case x: VarCharVector => x.setSafe(i, row.getString(j).getBytes("UTF-8"))
        case x: org.apache.arrow.vector.complex.ListVector =>
          setList(x, i, new org.apache.spark.sql.catalyst.util.GenericArrayData(
            row.getSeq[Any](j).toArray))
        case x => throw new UnsupportedOperationException(x.getClass.toString)
      }
      j += 1
    }
  }
}

private[sources] case class ArrowCommit(tmpPath: String, finalPath: String)
    extends TmpFileCommit

private[sources] class ArrowWriteBuilder(info: LogicalWriteInfo, path: String)
    extends WriteBuilder with SupportsTruncate {
  private var doTruncate = false
  override def truncate(): WriteBuilder = { doTruncate = true; this }
  override def build(): Write =
    new ArrowBatchWrite(info.schema(), path, info.queryId(), doTruncate)
}

private[sources] class ArrowBatchWrite(schema: StructType, path: String,
                                       queryId: String, truncate: Boolean)
    extends Write with BatchWrite {
  override def toBatch: BatchWrite = this

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new ArrowWriterFactory(schema, path, queryId)

  // driver-side publish shared with the Avro sink — see TwoPhaseCommit
  override def commit(messages: Array[WriterCommitMessage]): Unit =
    TwoPhaseCommit.publish(messages, path, truncate)

  override def abort(messages: Array[WriterCommitMessage]): Unit =
    TwoPhaseCommit.abort(messages)
}

private[sources] class ArrowWriterFactory(schema: StructType, path: String,
                                          queryId: String)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new ArrowDataWriter(schema, path, queryId, partitionId, taskId)
}

private[sources] class ArrowDataWriter(schema: StructType, path: String,
                                       queryId: String, partitionId: Int,
                                       taskId: Long)
    extends DataWriter[InternalRow] {

  new File(s"$path/_staging").mkdirs()
  private val tmp = new File(s"$path/_staging/part-$partitionId-task-$taskId.tmp")
  private val fin = s"$path/part-$queryId-$partitionId.arrows"
  private val alloc = new RootAllocator(Long.MaxValue)
  private val root = VectorSchemaRoot.create(
    new Schema(schema.fields.map(ArrowWrite.arrowField).toSeq.asJava), alloc)
  private val out = new FileOutputStream(tmp)
  private val writer = new ArrowStreamWriter(root, null, out)
  private var batchRow = 0
  private var any = false
  private val batchRows = 4096
  writer.start()

  override def write(row: InternalRow): Unit = {
    any = true
    if (batchRow == 0) root.allocateNew()
    var j = 0
    while (j < schema.length) {
      val v = root.getVector(j)
      if (row.isNullAt(j)) v match {
        case x: BaseFixedWidthVector => x.setNull(batchRow)
        case x: BaseVariableWidthVector => x.setNull(batchRow)
        case x: org.apache.arrow.vector.complex.ListVector => x.setNull(batchRow)
        case x => throw new UnsupportedOperationException(x.getClass.toString)
      } else v match {
        case x: BigIntVector => x.setSafe(batchRow, row.getLong(j))
        case x: IntVector => x.setSafe(batchRow, row.getInt(j))
        case x: Float8Vector => x.setSafe(batchRow, row.getDouble(j))
        case x: Float4Vector => x.setSafe(batchRow, row.getFloat(j))
        case x: BitVector => x.setSafe(batchRow, if (row.getBoolean(j)) 1 else 0)
        case x: VarCharVector => x.setSafe(batchRow, row.getUTF8String(j).getBytes)
        case x: org.apache.arrow.vector.complex.ListVector =>
          ArrowWrite.setList(x, batchRow, row.getArray(j))
        case x => throw new UnsupportedOperationException(x.getClass.toString)
      }
      j += 1
    }
    batchRow += 1
    if (batchRow == batchRows) flush()
  }

  private def flush(): Unit = if (batchRow > 0) {
    root.setRowCount(batchRow)
    writer.writeBatch()
    batchRow = 0
  }

  override def commit(): WriterCommitMessage = {
    flush()
    writer.end()
    close()
    if (any) ArrowCommit(tmp.getAbsolutePath, fin)
    else { // empty partition: publish nothing (a schema-only file would
           // cost a scan task per read forever)
      tmp.delete()
      ArrowCommit("", "")
    }
  }

  override def abort(): Unit = { close(); tmp.delete() }

  override def close(): Unit = {
    writer.close(); out.close(); root.close(); alloc.close()
  }
}
