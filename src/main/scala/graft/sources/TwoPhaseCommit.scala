package graft.sources

import java.io.File

import org.apache.spark.sql.connector.write.WriterCommitMessage

/** Commit message for file sinks staging to `.tmp` paths: empty tmpPath
  * means the task had no rows and published nothing.
  */
private[sources] trait TmpFileCommit extends WriterCommitMessage {
  def tmpPath: String
  def finalPath: String
}

/** Driver-side half of the two-phase commit shared by the Arrow and Avro
  * sinks: every task has already staged an attempt-named temp file and
  * reported it in its commit message; publish happens here with atomic
  * per-file renames only once ALL tasks succeeded, rolling the published
  * prefix back on any rename failure so readers never see a torn
  * generation. File names carry the queryId, so a new generation never
  * collides with existing files: append coexists, and overwrite
  * (truncate) keeps the old generation readable until the new one is
  * fully published — a crash cannot destroy already-committed data.
  * (Atomicity against a DRIVER crash between renames would need a
  * manifest file — out of scope for these sinks.)
  */
private[sources] object TwoPhaseCommit {

  def publish(messages: Array[WriterCommitMessage], path: String,
              truncate: Boolean): Unit = {
    val dir = new File(path)
    dir.mkdirs()
    val real = messages.collect {
      case c: TmpFileCommit if c.tmpPath.nonEmpty => c
    }
    val published = scala.collection.mutable.ArrayBuffer[File]()
    try {
      real.foreach { c =>
        val f = new File(c.finalPath)
        if (!new File(c.tmpPath).renameTo(f))
          throw new java.io.IOException(
            s"commit rename failed: ${c.tmpPath} -> ${c.finalPath}")
        published += f
      }
    } catch {
      case e: Throwable =>
        published.foreach(_.delete())
        throw e
    }
    val keep = published.map(_.getName).toSet
    if (truncate) Option(dir.listFiles).foreach(_.foreach { f =>
      if (f.getName != "_staging" && !keep.contains(f.getName))
        graft.Tables.deleteRecursively(f)
    })
    graft.Tables.deleteRecursively(new File(dir, "_staging"))
  }

  def abort(messages: Array[WriterCommitMessage]): Unit =
    messages.foreach {
      case c: TmpFileCommit => new File(c.tmpPath).delete()
      case _ =>
    }
}
