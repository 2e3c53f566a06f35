package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` maps every implemented operator from SURVEY.md §2 to a function
  * (spark, sfDir) => DataFrame; `oracleSql` carries the DuckDB-equivalent SQL
  * for the driver's differential check (the role the reference's
  * `LocalValidator` plays, reference `src/util.rs:413-484`).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Tpch.queries("tpch_q1")(spark, "/root/testdata/sf0.001")

  private def fromSql(m: Map[String, String]): Map[String, (SparkSession, String) => DataFrame] =
    m.map { case (name, text) =>
      name -> ((spark: SparkSession, dir: String) => {
        Tables.register(spark, dir); spark.sql(text)
      })
    }

  /** One entry per implemented operator from SURVEY.md §2 + the LLM-pipeline
    * extension operators (graft.llm) + source/sink/session surface (Io).
    */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Tpch.queries ++
      fromSql(Windows.sql) ++
      fromSql(Relational.sql) ++ fromSql(Relational.sparkSql) ++
      Llm.queries ++
      Io.queries ++
      Ops.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys get a weaker rows-only check.
    */
  def oracleSql: Map[String, String] =
    Tpch.oracles ++
      Windows.sql ++
      Relational.sql ++ Relational.oracleOnlySql ++
      Llm.oracles ++
      Io.oracles ++
      Ops.oracles
}
