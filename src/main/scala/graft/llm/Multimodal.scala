package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: treat image/audio/video payloads as opaque
  * `binary` columns with typed metadata, and run decode / feature-extract
  * as a *batched per-partition* operator — the shape a real decoder
  * (libjpeg / ffmpeg via JNI, or a Python worker via Arrow batches) plugs
  * into. Extension surface beyond the reference engine (SURVEY.md §7
  * Phase 3).
  *
  * The decode step itself is a STUB: this container has no image/audio
  * codecs, so [[FakeDecoder]] derives deterministic pseudo-features from
  * the payload's md5 — chosen so the whole pipeline stays differentially
  * testable against a SQL oracle. The Spark-side plumbing is real:
  * binary column + metadata schema, partition-parallel batched execution,
  * typed Dataset output.
  *
  * 100 TB design: decode runs inside `mapPartitions` over whatever
  * partitioning the scan produced — no shuffle, no driver involvement,
  * batch-at-a-time memory footprint (`batchSize` payloads held at once,
  * matching how GPU/codec batching works).
  */
object Multimodal {

  /** A typed multimodal record: opaque payload + metadata. */
  case class Blob(doc_id: Long, payload: Array[Byte], n_bytes: Long)

  /** Decoded record: metadata + extracted pseudo-features. */
  case class Decoded(
      doc_id: Long,
      n_bytes: Long,
      content_md5: String,
      width: Int,
      height: Int,
      feature: Array[Double])

  /** Wrap a text corpus as opaque binary payloads (the fixture has no real
    * image bytes; utf-8 text bytes stand in as the payload).
    */
  def attach(docs: DataFrame): Dataset[Blob] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.selectExpr(
      "doc_id",
      "CAST(text AS BINARY) AS payload",
      "CAST(octet_length(CAST(text AS BINARY)) AS BIGINT) AS n_bytes")
      .as[Blob]
  }

  /** STUB decoder — deterministic md5-derived fake in place of a real
    * codec. Real deployment swaps `decodeOne` for the actual library call;
    * everything around it (batching, schema, partitioning) is unchanged.
    */
  object FakeDecoder {
    def md5Hex(bytes: Array[Byte]): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(bytes).map("%02x".format(_)).mkString

    def decodeOne(b: Blob): Decoded = {
      val h = md5Hex(b.payload)
      def hex(from: Int, len: Int): Long =
        java.lang.Long.parseLong(h.substring(from, from + len), 16)
      Decoded(
        doc_id = b.doc_id,
        n_bytes = b.n_bytes,
        content_md5 = h,
        width = (1 + hex(0, 4) % 64).toInt,
        height = (1 + hex(4, 4) % 64).toInt,
        // k/255.0 is a single IEEE division — bit-identical in any engine,
        // so the fake features are differentially checkable with no rounding.
        feature = Array.tabulate(8)(j => hex(j * 2, 2) / 255.0))
    }
  }

  /** Batched partition-parallel decode: groups each partition's rows into
    * `batchSize` chunks (the unit a real codec/GPU call would take) and
    * maps them through the decoder.
    */
  def decode(blobs: Dataset[Blob], batchSize: Int = 64): Dataset[Decoded] = {
    val spark = blobs.sparkSession
    import spark.implicits._
    blobs.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // a real decoder would process `batch` as one call here
        batch.map(FakeDecoder.decodeOne)
      }
    }
  }

  /** Deterministic "resize": rescale the decoded geometry to fit a
    * bounding box, preserving aspect ratio (integer floor math — exact in
    * every engine). A real implementation swaps the arithmetic for the
    * codec's rescale; the typed partition-parallel shape is identical.
    */
  def resize(decoded: Dataset[Decoded], maxSide: Int): Dataset[Decoded] = {
    val spark = decoded.sparkSession
    import spark.implicits._
    decoded.map { d =>
      val longSide = math.max(d.width, d.height)
      if (longSide <= maxSide) d
      else d.copy(
        width = math.max(1, d.width * maxSide / longSide),
        height = math.max(1, d.height * maxSide / longSide))
    }
  }

  /** One sampled frame of a "video" payload. */
  case class Frame(doc_id: Long, frame_idx: Int, frame_md5: String,
                   frame_bytes: Long)

  /** Deterministic frame sampling: treat the payload as `nFrames` equal
    * byte ranges and fingerprint each — the Spark-side shape of uniform
    * video frame extraction (split points and per-frame hashes are exact,
    * so the whole pipeline stays oracle-checkable). Short payloads yield
    * fewer frames (one per byte at most); empty payloads yield none.
    */
  def frameSample(blobs: Dataset[Blob], nFrames: Int = 4): Dataset[Frame] = {
    val spark = blobs.sparkSession
    import spark.implicits._
    blobs.flatMap { b =>
      val n = b.payload.length
      val frames = math.min(nFrames, n)
      (0 until frames).map { i =>
        val from = (n.toLong * i / frames).toInt
        val until = (n.toLong * (i + 1) / frames).toInt
        val slice = java.util.Arrays.copyOfRange(b.payload, from, until)
        Frame(b.doc_id, i, FakeDecoder.md5Hex(slice), (until - from).toLong)
      }
    }
  }
}
