package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.Tables

/** The 22 SQLBench-H (TPC-H-derived) queries of the reference's validation
  * corpus (reference `tpch/queries/q1.sql` … `q22.sql`, CI-validated at SF1,
  * reference `.github/workflows/main.yml:115-135`), adapted to the fixture
  * schema (`FIXTURES.md`: no partsupp, no comment/phone/address/shipmode
  * columns, timestamps instead of dates, doubles instead of decimals).
  * Operator shapes are preserved query-for-query: multi-way joins, partial+
  * final hash aggregation, correlated/uncorrelated scalar subqueries,
  * EXISTS / NOT EXISTS / IN / NOT IN, group-having, case-when, like,
  * substring, interval arithmetic, top-k (order by + limit), view lifecycle
  * (q15).
  *
  * Cross-engine determinism: monetary math is computed on DECIMAL (exact,
  * order-independent sums — Spark and the DuckDB oracle agree bit-for-bit),
  * converted to DOUBLE only at the output edge, rounded to 2-4 decimals.
  * Every query has a total ORDER BY (unique tie-break chain) so LIMIT and
  * row hashes are deterministic.
  *
  * Scale: all queries are declarative Spark SQL — Catalyst plans two-phase
  * aggregation, broadcast joins for the small dimensions (region/nation/
  * supplier), shuffled hash/sort-merge joins on the fact tables, and pushes
  * filters + projections into the parquet scans. Nothing here holds state on
  * the driver, so the same text runs on a 1000-executor cluster unchanged.
  */
object Tpch {
  // Exact-decimal building blocks (see scaladoc above).
  private val EP   = "CAST(l_extendedprice AS DECIMAL(12,2))"
  private val QTY  = "CAST(l_quantity AS DECIMAL(12,2))"
  private val DISC = "CAST(l_discount AS DECIMAL(8,4))"
  private val TAX  = "CAST(l_tax AS DECIMAL(8,4))"
  private val REV  = s"$EP * (1 - $DISC)"
  private def r2(e: String, as: String) = s"CAST(ROUND($e, 2) AS DOUBLE) AS $as"
  private def r4(e: String, as: String) = s"CAST(ROUND($e, 4) AS DOUBLE) AS $as"

  /** SQL shared verbatim between Spark and the DuckDB oracle. */
  val sql: Map[String, String] = Map(
    // q1: pricing summary — scan + filter + 8-agg group-by (reference tpch/queries/q1.sql)
    "tpch_q1" -> s"""
      SELECT l_returnflag, l_linestatus,
        ${r2(s"SUM($QTY)", "sum_qty")},
        ${r2(s"SUM($EP)", "sum_base_price")},
        ${r2(s"SUM($REV)", "sum_disc_price")},
        ${r2(s"SUM($REV * (1 + $TAX))", "sum_charge")},
        ${r2(s"CAST(SUM($QTY) AS DOUBLE) / COUNT(*)", "avg_qty")},
        ${r2(s"CAST(SUM($EP) AS DOUBLE) / COUNT(*)", "avg_price")},
        ${r4(s"CAST(SUM($DISC) AS DOUBLE) / COUNT(*)", "avg_disc")},
        COUNT(*) AS count_order
      FROM lineitem
      WHERE l_shipdate <= TIMESTAMP '2001-09-02'
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus""",

    // q2: min-cost supplier — correlated scalar subquery (reference tpch/queries/q2.sql;
    // lineitem stands in for the missing partsupp table)
    "tpch_q2" -> s"""
      SELECT DISTINCT s_acctbal, s_name, n_name, p_partkey, p_name
      FROM part, supplier, lineitem, nation
      WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
        AND p_size = 15 AND p_type LIKE '%STANDARD%'
        AND s_nationkey = n_nationkey
        AND l_extendedprice = (SELECT MIN(l2.l_extendedprice)
                               FROM lineitem l2 WHERE l2.l_partkey = p_partkey)
      ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
      LIMIT 100""",

    // q3: shipping priority — 3-way join + group + top-k (reference tpch/queries/q3.sql)
    "tpch_q3" -> s"""
      SELECT l_orderkey, ${r2(s"SUM($REV)", "revenue")}, o_orderdate
      FROM customer, orders, lineitem
      WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey AND l_orderkey = o_orderkey
        AND o_orderdate < TIMESTAMP '1998-01-01' AND l_shipdate > TIMESTAMP '1998-01-01'
      GROUP BY l_orderkey, o_orderdate
      ORDER BY revenue DESC, o_orderdate, l_orderkey
      LIMIT 10""",

    // q4: order priority checking — correlated EXISTS (reference tpch/queries/q4.sql)
    "tpch_q4" -> s"""
      SELECT o_orderpriority, COUNT(*) AS order_count
      FROM orders
      WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1997-04-01'
        AND EXISTS (SELECT * FROM lineitem
                    WHERE l_orderkey = o_orderkey
                      AND l_shipdate > o_orderdate + INTERVAL '30' DAY)
      GROUP BY o_orderpriority
      ORDER BY o_orderpriority""",

    // q5: local supplier volume — 6-way join incl. region (reference tpch/queries/q5.sql)
    "tpch_q5" -> s"""
      SELECT n_name, ${r2(s"SUM($REV)", "revenue")}
      FROM customer, orders, lineitem, supplier, nation, region
      WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey AND l_suppkey = s_suppkey
        AND c_nationkey = s_nationkey AND s_nationkey = n_nationkey
        AND n_regionkey = r_regionkey AND r_name = 'ASIA'
        AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
      GROUP BY n_name
      ORDER BY revenue DESC, n_name""",

    // q6: forecasting revenue change — pure scan+filter+agg (reference tpch/queries/q6.sql)
    "tpch_q6" -> s"""
      SELECT ${r2(s"SUM($EP * $DISC)", "revenue")}
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
        AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""",

    // q7: volume shipping — bidirectional nation pair + year extract (reference tpch/queries/q7.sql)
    "tpch_q7" -> s"""
      SELECT supp_nation, cust_nation, l_year, ${r2("SUM(volume)", "revenue")}
      FROM (SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
              CAST(YEAR(l_shipdate) AS BIGINT) AS l_year, $REV AS volume
            FROM supplier, lineitem, orders, customer, nation n1, nation n2
            WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey AND c_custkey = o_custkey
              AND s_nationkey = n1.n_nationkey AND c_nationkey = n2.n_nationkey
              AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
                OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
              AND l_shipdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-12-31') shipping
      GROUP BY supp_nation, cust_nation, l_year
      ORDER BY supp_nation, cust_nation, l_year""",

    // q8: national market share — 8-way join + case-when share (reference tpch/queries/q8.sql)
    "tpch_q8" -> s"""
      SELECT o_year,
        ${r4("CAST(SUM(CASE WHEN nation = 'NATION_3' THEN volume ELSE 0 END) AS DOUBLE)" +
             " / CAST(SUM(volume) AS DOUBLE)", "mkt_share")}
      FROM (SELECT CAST(YEAR(o_orderdate) AS BIGINT) AS o_year, $REV AS volume,
              n2.n_name AS nation
            FROM part, supplier, lineitem, orders, customer, nation n1, nation n2, region
            WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey AND l_orderkey = o_orderkey
              AND o_custkey = c_custkey AND c_nationkey = n1.n_nationkey
              AND n1.n_regionkey = r_regionkey AND r_name = 'AMERICA'
              AND s_nationkey = n2.n_nationkey
              AND o_orderdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-12-31'
              AND p_type = 'ECONOMY') all_nations
      GROUP BY o_year
      ORDER BY o_year""",

    // q9: product type profit — like-filter + 5-way join + year group (reference
    // tpch/queries/q9.sql; p_retailprice stands in for the missing ps_supplycost)
    "tpch_q9" -> s"""
      SELECT nation, o_year, ${r2("SUM(amount)", "sum_profit")}
      FROM (SELECT n_name AS nation, CAST(YEAR(o_orderdate) AS BIGINT) AS o_year,
              $REV - CAST(p_retailprice AS DECIMAL(12,2)) * $QTY AS amount
            FROM part, supplier, lineitem, orders, nation
            WHERE s_suppkey = l_suppkey AND p_partkey = l_partkey AND o_orderkey = l_orderkey
              AND s_nationkey = n_nationkey AND p_name LIKE '%r%') profit
      GROUP BY nation, o_year
      ORDER BY nation, o_year DESC""",

    // q10: returned item reporting — top-20 customers by lost revenue (reference tpch/queries/q10.sql)
    "tpch_q10" -> s"""
      SELECT c_custkey, c_name, ${r2(s"SUM($REV)", "revenue")}, c_acctbal, n_name, c_mktsegment
      FROM customer, orders, lineitem, nation
      WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
        AND o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1997-04-01'
        AND l_returnflag = 'R' AND c_nationkey = n_nationkey
      GROUP BY c_custkey, c_name, c_acctbal, c_mktsegment, n_name
      ORDER BY revenue DESC, c_custkey
      LIMIT 20""",

    // q11: important stock identification — group-having vs uncorrelated scalar
    // subquery (reference tpch/queries/q11.sql; lineitem value per part stands in
    // for partsupp stock value)
    "tpch_q11" -> s"""
      SELECT l_partkey AS ps_partkey, ${r2("SUM(val)", "part_value")}
      FROM (SELECT l_partkey, $EP * $QTY AS val
            FROM lineitem, supplier, nation
            WHERE l_suppkey = s_suppkey AND s_nationkey = n_nationkey
              AND n_name = 'NATION_7') x
      GROUP BY l_partkey
      HAVING SUM(val) > (SELECT SUM($EP * $QTY) * 0.001
                         FROM lineitem, supplier, nation
                         WHERE l_suppkey = s_suppkey AND s_nationkey = n_nationkey
                           AND n_name = 'NATION_7')
      ORDER BY part_value DESC, ps_partkey""",

    // q12: shipping modes & priority — two-branch case-when counts (reference
    // tpch/queries/q12.sql; l_returnflag stands in for the missing l_shipmode)
    "tpch_q12" -> s"""
      SELECT l_returnflag,
        CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT' OR o_orderpriority = '2-HIGH'
                      THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        CAST(SUM(CASE WHEN o_orderpriority <> '1-URGENT' AND o_orderpriority <> '2-HIGH'
                      THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
      FROM orders, lineitem
      WHERE o_orderkey = l_orderkey AND l_returnflag IN ('A', 'N')
        AND l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
      GROUP BY l_returnflag
      ORDER BY l_returnflag""",

    // q13: customer distribution — left outer join + nested count (reference tpch/queries/q13.sql)
    "tpch_q13" -> s"""
      SELECT c_count, COUNT(*) AS custdist
      FROM (SELECT c_custkey, COUNT(o_orderkey) AS c_count
            FROM customer LEFT OUTER JOIN orders
              ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
            GROUP BY c_custkey) c_orders
      GROUP BY c_count
      ORDER BY custdist DESC, c_count DESC""",

    // q14: promotion effect — conditional share of revenue (reference tpch/queries/q14.sql)
    "tpch_q14" -> s"""
      SELECT ${r4("100.00 * CAST(SUM(CASE WHEN p_type = 'PROMO' THEN disc_price ELSE 0 END) AS DOUBLE)" +
                  " / CAST(SUM(disc_price) AS DOUBLE)", "promo_revenue")}
      FROM (SELECT p_type, $REV AS disc_price
            FROM lineitem, part
            WHERE l_partkey = p_partkey
              AND l_shipdate >= TIMESTAMP '1997-09-01' AND l_shipdate < TIMESTAMP '1997-10-01') pr""",

    // q16: parts/supplier relationship — NOT IN subquery + count distinct (reference tpch/queries/q16.sql)
    "tpch_q16" -> s"""
      SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
      FROM lineitem, part
      WHERE p_partkey = l_partkey AND p_brand <> 'Brand#1' AND p_type NOT LIKE 'MEDIUM%'
        AND p_size IN (1, 4, 7, 10, 14, 19, 23, 45)
        AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
      GROUP BY p_brand, p_type, p_size
      ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""",

    // q17: small-quantity-order revenue — correlated scalar subquery on avg
    // (reference tpch/queries/q17.sql; avg computed as exact-sum/count for
    // cross-engine determinism)
    "tpch_q17" -> s"""
      SELECT ${r2(s"CAST(SUM($EP) AS DOUBLE) / 7.0", "avg_yearly")}
      FROM lineitem, part
      WHERE p_partkey = l_partkey AND p_brand = 'Brand#3'
        AND l_quantity < (SELECT 0.2 * (CAST(SUM(CAST(l2.l_quantity AS DECIMAL(12,2))) AS DOUBLE)
                                        / COUNT(*))
                          FROM lineitem l2 WHERE l2.l_partkey = p_partkey)""",

    // q18: large volume customers — IN over group-having (reference tpch/queries/q18.sql)
    "tpch_q18" -> s"""
      SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
        ${r2(s"SUM($QTY)", "sum_qty")}
      FROM customer, orders, lineitem
      WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
                           GROUP BY l_orderkey HAVING SUM($QTY) > 180)
        AND c_custkey = o_custkey AND o_orderkey = l_orderkey
      GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
      ORDER BY o_totalprice DESC, o_orderdate, o_orderkey
      LIMIT 100""",

    // q19: discounted revenue — disjunctive multi-predicate join (reference tpch/queries/q19.sql)
    "tpch_q19" -> s"""
      SELECT ${r2(s"SUM($REV)", "revenue")}
      FROM lineitem, part
      WHERE (p_partkey = l_partkey AND p_brand = 'Brand#12'
             AND l_quantity BETWEEN 1 AND 11 AND p_size BETWEEN 1 AND 5)
         OR (p_partkey = l_partkey AND p_brand = 'Brand#23'
             AND l_quantity BETWEEN 10 AND 20 AND p_size BETWEEN 1 AND 10)
         OR (p_partkey = l_partkey AND p_brand = 'Brand#3'
             AND l_quantity BETWEEN 20 AND 30 AND p_size BETWEEN 1 AND 15)""",

    // q20: potential part promotion — nested IN over group-having (reference tpch/queries/q20.sql)
    "tpch_q20" -> s"""
      SELECT s_name, s_acctbal
      FROM supplier, nation
      WHERE s_suppkey IN (SELECT l_suppkey FROM lineitem, part
                          WHERE l_partkey = p_partkey AND p_name LIKE 'r%'
                          GROUP BY l_suppkey, l_partkey
                          HAVING SUM($QTY) > 30)
        AND s_nationkey = n_nationkey AND n_name = 'NATION_4'
      ORDER BY s_name""",

    // q21: suppliers who kept orders waiting — join + EXISTS + NOT EXISTS
    // (reference tpch/queries/q21.sql; returnflag stands in for the missing
    // receipt/commit-date comparison in the anti branch)
    "tpch_q21" -> s"""
      SELECT s_name, COUNT(*) AS numwait
      FROM supplier, lineitem l1, orders, nation
      WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
        AND o_orderstatus = 'F' AND l1.l_shipdate > o_orderdate
        AND EXISTS (SELECT * FROM lineitem l2
                    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
        AND NOT EXISTS (SELECT * FROM lineitem l3
                        WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
                          AND l3.l_returnflag = 'R')
        AND s_nationkey = n_nationkey AND n_name = 'NATION_1'
      GROUP BY s_name
      ORDER BY numwait DESC, s_name
      LIMIT 100""",

    // q22: global sales opportunity — substring buckets + scalar-subquery avg +
    // NOT EXISTS (reference tpch/queries/q22.sql; c_name digits stand in for the
    // missing c_phone country code)
    "tpch_q22" -> s"""
      SELECT cntrycode, COUNT(*) AS numcust, ${r2(s"SUM(CAST(c_acctbal AS DECIMAL(12,2)))", "totacctbal")}
      FROM (SELECT SUBSTRING(c_name, 17, 2) AS cntrycode, c_acctbal, c_custkey
            FROM customer
            WHERE SUBSTRING(c_name, 17, 2) IN ('01', '13', '25', '31', '44', '57', '90')
              AND c_acctbal > (SELECT CAST(SUM(CAST(c2.c_acctbal AS DECIMAL(12,2))) AS DOUBLE)
                                 / COUNT(*)
                               FROM customer c2
                               WHERE c2.c_acctbal > 0.00
                                 AND SUBSTRING(c2.c_name, 17, 2)
                                     IN ('01', '13', '25', '31', '44', '57', '90'))) custsale
      WHERE NOT EXISTS (SELECT * FROM orders
                        WHERE o_custkey = c_custkey AND o_orderstatus = 'P')
      GROUP BY cntrycode
      ORDER BY cntrycode"""
  )

  private val q15View = s"""
    SELECT l_suppkey AS supplier_no, SUM($REV) AS total_revenue_d
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1997-04-01'
    GROUP BY l_suppkey"""

  private val q15Select = s"""
    SELECT s_suppkey, s_name, ${r2("total_revenue_d", "total_revenue")}
    FROM supplier, revenue0
    WHERE s_suppkey = supplier_no
      AND total_revenue_d = (SELECT MAX(total_revenue_d) FROM revenue0)
    ORDER BY s_suppkey"""

  /** q15 exercises the multi-statement view lifecycle of the reference corpus
    * (reference `tpch/queries/q15.sql:3-14,33`, statement splitting at
    * `tpch/tpcbench.py:110-114`; the reference's own Spark harness rewrites
    * `create view` → `create temp view`, `k8s/spark_tpcbench.py:91`).
    */
  private def q15(spark: SparkSession, dir: String): DataFrame = {
    Tables.register(spark, dir)
    spark.sql(s"CREATE OR REPLACE TEMPORARY VIEW revenue0 AS $q15View")
    // Materialize before dropping the view so the shared session is left
    // clean (a later table named revenue0 must not resolve to this view).
    // The result is a handful of supplier rows, so the checkpoint is tiny.
    val out = spark.sql(q15Select).localCheckpoint(eager = true)
    spark.catalog.dropTempView("revenue0")
    out
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    sql.map { case (name, text) =>
      name -> ((spark: SparkSession, dir: String) => {
        Tables.register(spark, dir); spark.sql(text)
      })
    } + ("tpch_q15" -> (q15 _)) + ("tpch_q1" -> (q1 _))

  /** q1 runs the shared SQL text over a lineitem scan SPREAD to the
    * session's parallelism when the input is under-split (r16 opt, guide
    * §2.5 "input skew: one huge unsplittable file — repartition
    * immediately after the read"): the sf fixtures are single-row-group
    * parquet, i.e. ONE real mapper, so q1's 8-aggregate partial
    * aggregation — the heaviest scan-stage compute in the suite — ran
    * serially while 31 cores idled (measured 1.07 s vs 0.1 s for q6's
    * 1-agg pass over the same scan). Hash-repartitioning on l_orderkey
    * parallelizes the partial aggregation; the guard makes it identity
    * on any real multi-split table, so at scale the exchange never
    * exists. Results are unchanged: every q1 aggregate is DECIMAL /
    * COUNT (order-independent); the DuckDB oracle text stays identical.
    */
  private def q1(spark: SparkSession, dir: String): DataFrame = {
    Tables.register(spark, dir)
    val li = spark.table("lineitem")
    val target = spark.sparkContext.defaultParallelism
    val spread =
      if (li.rdd.getNumPartitions < target)
        li.repartition(target, org.apache.spark.sql.functions.col("l_orderkey"))
      else li
    spread.createOrReplaceTempView("lineitem_spread_q1")
    val rewritten = sql("tpch_q1").replace("FROM lineitem", "FROM lineitem_spread_q1")
    // loud guard (r16 ADVICE): if the shared q1 text is ever reformatted so
    // the textual rewrite no longer matches, the spread would silently stop
    // applying — still correct, but the documented perf fix evaporates
    require(rewritten != sql("tpch_q1"),
      "tpch_q1 spread rewrite did not apply — q1 SQL text changed shape")
    spark.sql(rewritten)
  }

  def oracles: Map[String, String] =
    sql + ("tpch_q15" -> s"WITH revenue0 AS ($q15View) $q15Select")
}
