package graft

/** RocksDB transformWithState floor probe (r13 verdict #5): after the
  * per-batch MapState batching and the HLL byte-path fix, the remaining
  * factor-100 streaming-sketch cost (topk ~60 s, hll ~47 s at the
  * 6M-event replay) is per-row-work bound. This main stages the
  * time-replicated events fixture once, then times the streaming sketch
  * entries under RocksDB conf variants — each variant set on the session
  * BEFORE the query starts (state-store confs snapshot at stream start),
  * unset after:
  *
  *   - `no_track_rows`: trackTotalNumberOfRows=false drops the
  *     get-before-put RocksDB does per write just to maintain the row
  *     count metric — the documented first lever for update-heavy state;
  *   - `changelog_ckpt`: changelog checkpointing uploads deltas instead
  *     of full snapshots per batch;
  *   - `block_cache_256` / `write_buffer_256`: memory headroom for the
  *     read path / memtable flush cadence.
  *
  * `runMain graft.TwsProbe [factor] [srcDir] [query...]` — defaults:
  * factor 100, the three MapState sketch entries. One JSON line of
  * `query__variant` seconds; record the table + verdict (conf win or
  * "this is the floor" with per-row µs) in SURVEY's addendum.
  */
object TwsProbe {

  def main(args: Array[String]): Unit = {
    val factor = args.headOption.map(_.toInt).getOrElse(100)
    val src = args.drop(1).headOption.getOrElse("/root/testdata/sf0.1")
    val queries =
      if (args.length > 2) args.drop(2).toSeq
      else Seq("ts_stream_topk", "ts_stream_hll", "ts_stream_bitmap_distinct")
    val out = s"/tmp/graft_twsprobe_x$factor"
    val spark = Session.local("graft-tws-probe")
    val P = "spark.sql.streaming.stateStore.rocksdb."
    val variants: Seq[(String, Map[String, String])] = Seq(
      ("baseline", Map.empty),
      ("no_track_rows", Map(P + "trackTotalNumberOfRows" -> "false")),
      ("changelog_ckpt", Map(P + "changelogCheckpointing.enabled" -> "true")),
      ("block_cache_256", Map(P + "blockCacheSizeMB" -> "256")),
      ("write_buffer_256", Map(P + "writeBufferSizeMB" -> "256",
        P + "maxWriteBufferNumber" -> "4")),
      ("combined", Map(P + "blockCacheSizeMB" -> "256",
        P + "writeBufferSizeMB" -> "256",
        P + "maxWriteBufferNumber" -> "4")))
    try {
      val tStage = {
        val t0 = System.nanoTime()
        ScaleBench.stage(spark, src, out, factor)
        (System.nanoTime() - t0) / 1e9
      }
      def run(q: String): Double = {
        // the Bench/ScaleBench off-the-clock hygiene
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = true))
        val t0 = System.nanoTime()
        SparkEntry.queries(q)(spark, out)
          .write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }
      queries.foreach(run) // warm codegen/JIT + page cache off the clock
      val items = for ((vn, confs) <- variants; q <- queries) yield {
        confs.foreach { case (k, v) => spark.conf.set(k, v) }
        val t =
          try run(q)
          finally confs.keys.foreach(spark.conf.unset)
        s""""${q}__$vn":${Fmt.sec(t)}"""
      }
      println(s"""{"factor":$factor,"stage_sec":${Fmt.sec(tStage, digits = 1)},""" +
        items.mkString(",") + "}")
    } finally {
      spark.stop()
      if (!sys.env.get("SPARK_GRAFT_KEEP_STAGE").contains("1"))
        ScaleBench.rmTree(out)
    }
  }
}
