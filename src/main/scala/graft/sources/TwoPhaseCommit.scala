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
  *
  * SNAPSHOT MANIFESTS: each successful publish additionally records the
  * table's post-commit file set in an atomically-renamed
  * `_v{N}.manifest` — the commit log that gives the Arrow reader
  * version-pinned reads (time travel) across APPENDS: a reader holding
  * version N is immune to files landed by later commits. `truncate`
  * physically removes the old generation (the sinks' long-standing
  * overwrite contract), so it also clears prior manifests and restarts
  * the log at v1 — retention across overwrites is a VACUUM policy these
  * sinks deliberately do not carry. (Atomicity against a DRIVER crash
  * between renames would still need the manifest to be written FIRST and
  * the reader to trust only manifests — out of scope while the Avro
  * reader stays directory-listing-based.)
  */
private[sources] object TwoPhaseCommit {

  private val ManifestRe = """_v(\d+)\.manifest""".r
  private val GenRe = """#generation=(\S+)""".r

  /** Versioned manifests present under `dir`, ascending. */
  def manifestVersions(dir: File): Seq[Int] =
    Option(dir.listFiles).getOrElse(Array.empty).toSeq
      .flatMap(f => f.getName match {
        case ManifestRe(v) => Some(v.toInt)
        case _ => None
      }).sorted

  /** The data-file names recorded for snapshot `version`. */
  def readManifest(dir: File, version: Int): Seq[String] = {
    val f = new File(dir, s"_v$version.manifest")
    require(f.isFile,
      s"no snapshot _v$version.manifest under $dir " +
        s"(available: ${manifestVersions(dir).mkString(",")})")
    val src = scala.io.Source.fromFile(f, "UTF-8")
    // strip only the known header line — a data file whose name happens
    // to start with '#' must survive the round trip (r11 ADVICE low;
    // dataFiles() also refuses to adopt such names, see below)
    try src.getLines()
      .filter(l => l.nonEmpty && !l.startsWith("#generation=")).toList
    finally src.close()
  }

  /** The GENERATION token stamped into snapshot `version`'s manifest — a
    * random id minted when a log restarts (truncate, or the first commit
    * ever) and inherited by every append in that log. Two manifests with
    * the same version but different generations are different tables'
    * histories: the commit-log stream uses this to refuse resuming a
    * checkpoint across an overwrite (r10 ADVICE: if the new generation
    * lands >= as many commits as the checkpointed offset, `_vN.manifest`
    * exists again and a version-only offset would silently diff across
    * generations, dropping the new generation's commits 1..N). None for
    * pre-token manifests (no header line).
    */
  def generation(dir: File, version: Int): Option[String] = {
    val f = new File(dir, s"_v$version.manifest")
    if (!f.isFile) None
    else {
      val src = scala.io.Source.fromFile(f, "UTF-8")
      try src.getLines().collectFirst { case GenRe(g) => g }
      finally src.close()
    }
  }

  /** The generation of the log's latest snapshot (None: no manifests). */
  def currentGeneration(dir: File): Option[String] =
    manifestVersions(dir).lastOption.flatMap(generation(dir, _))

  private def newGeneration(): String =
    java.util.UUID.randomUUID().toString.substring(0, 8)

  private def dataFiles(dir: File): Seq[String] =
    Option(dir.listFiles).getOrElse(Array.empty).toSeq
      // '#' mirrors '.'/'_': manifests are line-oriented and '#'-prefixed
      // lines could collide with future header directives, so a stray
      // '#…' file in the directory is never adopted into a snapshot
      // (sink-written names carry the queryId and never start with '#')
      .filter(f => f.isFile && !f.getName.startsWith(".") &&
        !f.getName.startsWith("_") && !f.getName.startsWith("#"))
      .map(_.getName)

  private def writeManifest(dir: File, version: Int, names: Seq[String],
                            gen: String): Unit = {
    val tmp = new File(dir, s"._v$version.manifest.tmp")
    val w = new java.io.FileWriter(tmp)
    try w.write((s"#generation=$gen" +: names.sorted).mkString("\n"))
    finally w.close()
    val fin = new File(dir, s"_v$version.manifest")
    if (!tmp.renameTo(fin))
      throw new java.io.IOException(s"manifest rename failed: $fin")
  }

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
      if (!f.getName.startsWith("_") && !keep.contains(f.getName))
        graft.Tables.deleteRecursively(f)
    })
    graft.Tables.deleteRecursively(new File(dir, "_staging"))
    val versions = manifestVersions(dir)
    if (truncate) {
      versions.foreach(v => new File(dir, s"_v$v.manifest").delete())
      // truncate restarts the log AND the generation: any checkpoint
      // holding offsets from the old log must fail to resume here
      writeManifest(dir, 1, keep.toSeq, newGeneration())
    } else {
      // append snapshot = prior snapshot ∪ published (no prior manifest:
      // adopt the directory's current data-file set, which includes the
      // just-published names); generation is inherited from the prior
      // snapshot, minted fresh only on the log's very first commit
      val prev = versions.lastOption.map(readManifest(dir, _))
        .getOrElse(dataFiles(dir).filterNot(keep))
      val gen = versions.lastOption.flatMap(generation(dir, _))
        .getOrElse(newGeneration())
      writeManifest(dir, versions.lastOption.getOrElse(0) + 1,
        (prev ++ keep).distinct, gen)
    }
  }

  def abort(messages: Array[WriterCommitMessage]): Unit =
    messages.foreach {
      case c: TmpFileCommit => new File(c.tmpPath).delete()
      case _ =>
    }
}
