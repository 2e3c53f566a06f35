package graft

import graft.llm.{Ivf, Similarity}

/** IVF ANN: determinism of seeded training, partition completeness of the
  * assignment, candidate containment, and recall against the brute-force
  * oracle on the fixture embeddings.
  */
class IvfSpec extends SparkSpec {

  private lazy val emb = {
    Tables.register(spark, sfSmoke)
    spark.table("embeddings")
  }
  private lazy val centroids = Ivf.train(emb, k = 8)

  test("training is deterministic for a fixed seed") {
    val a = centroids.orderBy("centroid_id").collect()
      .map(_.getSeq[Float](1).toSeq)
    val b = Ivf.train(emb, k = 8).orderBy("centroid_id").collect()
      .map(_.getSeq[Float](1).toSeq)
    assert(a.toSeq == b.toSeq)
    assert(a.length == 8)
  }

  test("assignment covers every vector exactly once") {
    val assigned = Ivf.assign(emb, centroids)
    assert(assigned.count() == emb.count())
    assert(assigned.select("vec_id").distinct().count() == emb.count())
    // every cluster id is one of the trained centroids
    assert(assigned.select("centroid_id").distinct().count() <= 8)
  }

  test("top-1 recall vs brute force clears 0.6 with nprobe=4 of 8") {
    val probes = emb.where("vec_id < 40")
    val ivf1 = Ivf.topK(probes, emb, centroids, k = 1, nprobe = 4)
      .select("probe_id", "cand_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val exact1 = Similarity.bruteForceTopK(probes, emb, 1)
      .select("probe_id", "cand_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val hits = exact1.count { case (p, c) => ivf1.get(p).contains(c) }
    val recall = hits.toDouble / exact1.size
    assert(recall >= 0.6, s"recall $recall ($hits/${exact1.size})")
  }

  test("annRecall: hand-built result sets score hit/partial/zero probes") {
    import spark.implicits._
    // probe 1: approx found both exact neighbors; probe 2: one of two;
    // probe 3: none (absent from approx entirely -> left-join zero path)
    val exact = Seq((1L, 10L), (1L, 11L), (2L, 20L), (2L, 21L), (3L, 30L))
      .toDF("probe_id", "cand_id")
    val approx = Seq((1L, 10L), (1L, 11L), (2L, 20L), (2L, 99L))
      .toDF("probe_id", "cand_id")
    val out = Similarity.annRecall(exact, approx).orderBy("probe_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(out.toSeq == Seq((1L, 2L, 2L, 1.0), (2L, 2L, 1L, 0.5), (3L, 1L, 0L, 0.0)))
  }

  test("nprobe = k degenerates to exact search") {
    val probes = emb.where("vec_id < 10")
    val all = Ivf.topK(probes, emb, centroids, k = 3, nprobe = 8)
      .select("probe_id", "rank", "cand_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val exact = Similarity.bruteForceTopK(probes, emb, 3)
      .select("probe_id", "rank", "cand_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(all == exact)
  }

  test("semanticDedup keeps the min-id vector per within-cluster duplicate set") {
    import spark.implicits._
    // two well-separated clusters on the axes; 10/11 near-identical in
    // cluster 0 (drop 11), 20/21 near-identical in cluster 1 (drop 21),
    // 12 in cluster 0 but dissimilar to 10/11 (survives) — cross-cluster
    // similarity never compares (10 vs 20 are orthogonal anyway)
    def v(xs: Double*): Seq[Float] = xs.map(_.toFloat)
    val cents = Seq((0, v(1.0, 0.0, 0.0)), (1, v(0.0, 1.0, 0.0)))
      .toDF("centroid_id", "centroid")
    val vecs = Seq(
      (10L, v(1.0, 0.05, 0.0)),
      (11L, v(0.99, 0.06, 0.0)),
      (12L, v(0.6, 0.0, 0.8)),  // nearest centroid 0, cos vs 10 ~ 0.6
      (20L, v(0.0, 1.0, 0.05)),
      (21L, v(0.01, 0.99, 0.05)))
      .toDF("vec_id", "embedding")
    val out = Ivf.semanticDedup(vecs, cents, minCosine = 0.9)
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(out == Set((10L, 0), (12L, 0), (20L, 1)))
    // at an exact-match threshold no pair clears (the near-identical
    // pairs sit at cos ~ 0.99994 < 1.0) and everything survives
    assert(Ivf.semanticDedup(vecs, cents, minCosine = 1.0)
      .count() == 5L)
  }

  test("exact-collapse keeps semanticDedup identical under verbatim copies") {
    import spark.implicits._
    def v(xs: Double*): Seq[Float] = xs.map(_.toFloat)
    val cents = Seq((0, v(1.0, 0.0, 0.0)), (1, v(0.0, 1.0, 0.0)))
      .toDF("centroid_id", "centroid")
    val base = Seq(
      10L -> v(1.0, 0.05, 0.0), 11L -> v(0.99, 0.06, 0.0),
      12L -> v(0.6, 0.0, 0.8), 20L -> v(0.0, 1.0, 0.05))
    // interleave verbatim copies with ids BELOW and ABOVE the originals:
    // copy ids must never change which representative survives
    val copies = base.flatMap { case (id, e) =>
      Seq((id + 100L) -> e, (id + 200L) -> e)
    } ++ Seq(5L -> v(0.99, 0.06, 0.0)) // a copy with the SMALLEST id wins
    val vecs = (base ++ copies).toDF("vec_id", "embedding")
    val got = Ivf.semanticDedup(vecs, cents, minCosine = 0.9)
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    // reference: the uncollapsed rule computed by brute force in Scala
    def cos(a: Seq[Float], b: Seq[Float]): Double = {
      val d = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
      def n(u: Seq[Float]) = math.sqrt(u.map(x => x.toDouble * x.toDouble).sum)
      BigDecimal(d / (n(a) * n(b)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val all = (base ++ copies)
    val cluster = all.map { case (id, e) =>
      id -> (if (cos(e, v(1.0, 0.0, 0.0)) >= cos(e, v(0.0, 1.0, 0.0))) 0 else 1)
    }.toMap
    val expect = all.filter { case (y, ey) =>
      !all.exists { case (x, ex) =>
        x < y && cluster(x) == cluster(y) && cos(ex, ey) >= 0.9
      }
    }.map { case (id, _) => (id, cluster(id)) }.toSet
    assert(got == expect)
    // the id-5 copy displaced 11 AND its later copies
    assert(got.map(_._1).contains(5L) && !got.map(_._1).exists(Set(11L, 111L, 211L)))
  }

  test("lloydIterate computes per-cluster member means exactly") {
    import spark.implicits._
    def v(xs: Double*): Seq[Float] = xs.map(_.toFloat)
    val vecs = Seq(
      (1L, v(1.0, 0.0)), (2L, v(0.9, 0.1)),   // cluster 10
      (3L, v(0.0, 1.0)), (4L, v(0.1, 0.9)))   // cluster 20
      .toDF("vec_id", "embedding")
    val cents = Seq((10L, v(1.0, 0.0)), (20L, v(0.0, 1.0)))
      .toDF("centroid_id", "centroid")
    val got = Ivf.lloydIterate(vecs, cents).collect()
      .map(r => (r.getLong(0), r.getInt(1)) ->
        ((r.getDouble(2), r.getLong(3)))).toMap
    assert(got((10L, 0)) == ((0.95, 2L)))
    assert(got((10L, 1)) == ((0.05, 2L)))
    assert(got((20L, 0)) == ((0.05, 2L)))
    assert(got((20L, 1)) == ((0.95, 2L)))
    assert(got.size == 4)
  }

  test("lloydLoop(1) == lloydIterate; well-separated clusters are a fixed point") {
    import spark.implicits._
    def v(xs: Double*): Seq[Float] = xs.map(_.toFloat)
    // two tight direction-clusters; seeds are members, so iteration 1
    // converges and every later iteration must reproduce its means
    val vecs = Seq(
      (0L, v(1.0, 0.0)), (1L, v(0.9, 0.1)), (2L, v(0.95, 0.05)),
      (10L, v(0.0, 1.0)), (11L, v(0.1, 0.9))
    ).toDF("vec_id", "embedding")
    val seed = Seq((0, v(1.0, 0.0)), (1, v(0.0, 1.0)))
      .toDF("centroid_id", "centroid")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("centroid_id", "dim").collect()
        .map(r => (r.getInt(0), r.getInt(1), r.getDouble(2), r.getLong(3)))
        .toSeq
    assert(rows(Ivf.lloydLoop(vecs, seed, 1)) ==
      rows(Ivf.lloydIterate(vecs, seed)))
    assert(rows(Ivf.lloydLoop(vecs, seed, 3)) ==
      rows(Ivf.lloydLoop(vecs, seed, 1)),
      "assignments stable => the loop must sit at the fixed point")
  }

  test("inertia matches the hand-computed within-cluster SSE") {
    import spark.implicits._
    def v(fs: Double*) = fs.map(_.toFloat).toArray
    // c0 claims (1,0) and (3,0): mean (2,0), SSE = 1+1 = 2;
    // c1 claims (0,5) alone: singleton inertia is exactly 0
    val vecs = Seq((1L, v(1.0, 0.0)), (2L, v(3.0, 0.0)), (3L, v(0.0, 5.0)))
      .toDF("vec_id", "embedding")
    val cents = Seq((0, v(1.0, 0.0)), (1, v(0.0, 1.0)))
      .toDF("centroid_id", "centroid")
    val got = Ivf.inertia(vecs, cents).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).toSeq.sortBy(_._1)
    assert(got == Seq((0, 2L, 2.0), (1, 1L, 0.0)), s"got $got")
  }
}
