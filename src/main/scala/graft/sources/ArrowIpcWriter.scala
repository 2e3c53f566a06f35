package graft.sources

import java.io.{File, FileOutputStream}

import scala.jdk.CollectionConverters._

import org.apache.arrow.memory.RootAllocator
import org.apache.arrow.vector._
import org.apache.arrow.vector.ipc.ArrowStreamWriter
import org.apache.arrow.vector.types.FloatingPointPrecision
import org.apache.arrow.vector.types.pojo.{ArrowType, Field, FieldType, Schema}
import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** Arrow IPC sink for SHARED-filesystem deployments (local mode, NFS):
  * every task streams its own partition to `dir/part-<pid>.arrows` in
  * `batchRows`-row record batches — no driver collect, no shuffle, the
  * mirror of [[ArrowIpcSource]]'s one-partition-per-file scan. Overwrite
  * semantics (the directory is cleared first). Retry-safe: tasks write a
  * `.tmp` file named by (partition, attempt) and atomically rename on
  * completion, so a speculative or retried attempt never corrupts a
  * finished file. On a multi-node cluster with per-executor local disks
  * this needs the Hadoop FileSystem API + a commit protocol instead of
  * java.io — the honest production path is a full DSv2
  * `SupportsWrite`/`BatchWrite`; this sink is the harness-scale mirror.
  * Types: long/int/double/float/string/boolean.
  */
object ArrowIpcWriter {

  private def arrowField(f: StructField): Field = {
    val t = f.dataType match {
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

  def write(df: DataFrame, dir: String, batchRows: Int = 4096): Unit = {
    val target = new File(dir)
    graft.Tables.deleteRecursively(target)
    target.mkdirs()
    val schema = df.schema
    df.foreachPartition { (rows: Iterator[Row]) =>
      if (rows.nonEmpty) {
        val ctx = TaskContext.get()
        val pid = ctx.partitionId()
        val tmp = new File(s"$dir/.part-$pid-attempt-${ctx.taskAttemptId()}.tmp")
        val alloc = new RootAllocator(Long.MaxValue)
        val aSchema = new Schema(schema.fields.map(arrowField).toSeq.asJava)
        val root = VectorSchemaRoot.create(aSchema, alloc)
        val out = new FileOutputStream(tmp)
        val writer = new ArrowStreamWriter(root, null, out)
        try {
          writer.start()
          rows.grouped(batchRows).foreach { chunk =>
            root.allocateNew()
            chunk.zipWithIndex.foreach { case (row, i) =>
              var j = 0
              while (j < schema.length) {
                val v = root.getVector(j)
                if (row.isNullAt(j)) v.asInstanceOf[FieldVector] match {
                  case x: BaseFixedWidthVector => x.setNull(i)
                  case x: BaseVariableWidthVector => x.setNull(i)
                  case x => throw new UnsupportedOperationException(x.getClass.toString)
                } else v match {
                  case x: BigIntVector => x.setSafe(i, row.getLong(j))
                  case x: IntVector => x.setSafe(i, row.getInt(j))
                  case x: Float8Vector => x.setSafe(i, row.getDouble(j))
                  case x: Float4Vector => x.setSafe(i, row.getFloat(j))
                  case x: BitVector => x.setSafe(i, if (row.getBoolean(j)) 1 else 0)
                  case x: VarCharVector =>
                    x.setSafe(i, row.getString(j).getBytes("UTF-8"))
                  case x => throw new UnsupportedOperationException(x.getClass.toString)
                }
                j += 1
              }
            }
            root.setRowCount(chunk.length)
            writer.writeBatch()
          }
          writer.end()
        } finally { writer.close(); out.close(); root.close(); alloc.close() }
        // atomic publish: the scan ignores dot-prefixed temp files, and a
        // concurrent attempt's rename simply wins or loses whole-file
        if (!tmp.renameTo(new File(s"$dir/part-$pid.arrows"))) tmp.delete()
        ()
      }
    }
  }
}
