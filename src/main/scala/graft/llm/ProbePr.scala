package graft.llm
import graft.{Session, Tables}

import org.apache.spark.sql.functions._

/** Temporary r17 measurement probe: per-piece timings of
  * llm_simhash_pr_curve (the suite's slowest entry). Not a deliverable.
  */
object ProbePr {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val s = Session.local("graft-probe-pr")
    Tables.register(s, d)
        def t[A](name: String)(body: => A): A = {
      s.sparkContext.setJobDescription(name)
      val t0 = System.nanoTime()
      val r = body
      println(f"[probe] $name%-32s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    for (round <- 1 to 2) {
      println(s"== round $round ==")
      s.catalog.clearCache()
      s.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
      val dd0 = s.table("documents")
      val dd = t("exact+survivor ckpt") {
        dd0.join(Dedup.exact(dd0).select(col("keep_id").as("doc_id")),
          Seq("doc_id")).localCheckpoint()
      }
      val sp = t("simhashCandidates ckpt") {
        Dedup.simhashCandidates(dd).localCheckpoint()
      }
      println(s"[count] candidate pairs = ${sp.count()}")
      println(s"[count] survivors = ${dd.count()}")
      println(s"[count] docs in pairs = ${sp.select(col("doc_a").as("i"))
        .union(sp.select(col("doc_b"))).distinct().count()}")
      val sh = Dedup.shingles(dd, 3)
      t("shingles noop") { noop(sh) }
      println(s"[count] shingle rows = ${sh.count()}")
      val shc = t("shingles ckpt") { sh.localCheckpoint() }
      t("sizes from ckpt (noop)") {
        noop(shc.groupBy("doc_id").agg(count("*").as("n_sh")))
      }
      val cand = sp.select("doc_a", "doc_b")
      t("intersect join from ckpt") {
        noop(cand.as("c")
          .join(shc.as("x"), expr("x.doc_id = c.doc_a"))
          .join(shc.as("y"), expr("y.doc_id = c.doc_b AND y.shingle = x.shingle"))
          .groupBy(col("c.doc_a"), col("c.doc_b"))
          .agg(count("*").as("n_both")))
      }
      t("jaccard inner LAZY (noop)") {
        noop(Dedup.jaccard(dd, cand))
      }
      t("jaccard from shingle ckpt") {
        noop(Dedup.jaccardFromShingles(shc, cand))
      }
    }
    s.stop()
  }
}
