package graft

import graft.llm.Similarity
import org.apache.spark.sql.functions._

/** The native graft_cosine Catalyst expression: registration through
  * SparkSessionExtensions, bit-equality with the higher-order-function
  * formulation (and hence with the DuckDB oracle), codegen participation,
  * and null/edge behavior.
  */
class VectorExpressionSpec extends SparkSpec {

  test("graft_cosine is registered via spark.sql.extensions") {
    import spark.implicits._
    val r = Seq((Array(1f, 0f), Array(0f, 2f)))
      .toDF("a", "b")
      .selectExpr("graft_cosine(a, b) AS c").collect()(0).getDouble(0)
    assert(r == 0.0)
  }

  test("bit-identical to the HOF formulation on real embeddings") {
    Tables.register(spark, sfSmoke)
    val emb = spark.table("embeddings")
    val both = emb.select(
      Similarity.cosine("embedding", "embedding").as("native"),
      Similarity.cosineHof("embedding", "embedding").as("hof"))
    assert(both.where("native <> hof OR (native IS NULL) <> (hof IS NULL)").count() == 0)
    // cross-vector pairs, not just self-similarity
    val pairs = emb.as("x").crossJoin(emb.as("y")).limit(500)
      .select(
        expr("graft_cosine(x.embedding, y.embedding)").as("native"),
        Similarity.cosineHof("x.embedding", "y.embedding").as("hofr"),
        expr(s"CAST(ROUND(${Similarity.dot("x.embedding", "y.embedding")} / " +
          s"(${Similarity.norm("x.embedding")} * ${Similarity.norm("y.embedding")}), 6) AS DOUBLE)")
          .as("hof"))
    assert(pairs.where("CAST(ROUND(native, 6) AS DOUBLE) <> hof").count() == 0)
  }

  test("participates in whole-stage codegen") {
    Tables.register(spark, sfSmoke)
    val df = spark.table("embeddings")
      .selectExpr("graft_cosine(embedding, embedding) AS c")
    val line = df.queryExecution.executedPlan.toString
      .linesIterator.find(_.contains("graft_cosine"))
    assert(line.isDefined, "expression missing from plan")
    assert(line.get.trim.startsWith("*"), // the codegen marker
      s"graft_cosine fell out of whole-stage codegen: ${line.get}")
  }

  test("null arrays propagate null") {
    import spark.implicits._
    val r = Seq((Some(Array(1f, 2f)), Option.empty[Array[Float]]))
      .toDF("a", "b").selectExpr("graft_cosine(a, b) AS c").collect()(0)
    assert(r.isNullAt(0))
  }
}
