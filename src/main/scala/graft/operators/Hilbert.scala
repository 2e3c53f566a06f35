package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Hilbert-curve index of two integer keys — [[ZOrder]]'s stronger
  * sibling: the Hilbert curve visits every cell of the 2^bits × 2^bits
  * grid with NO long jumps (consecutive indexes are always grid
  * neighbors), so range-partitioning by h gives strictly better file
  * min/max locality than Morton z-values, whose quadrant seams produce
  * distant cells at adjacent indexes. The standard lakehouse clustering
  * upgrade (Delta/Hudi both grew Hilbert after Z-order) built Spark-first.
  *
  * The classic xy2d loop carries rotation STATE across bit levels, so
  * unlike Morton there is no per-bit mask spread; instead the loop is
  * UNROLLED at plan-build into `bits` chained projections — each level a
  * handful of integer CASEs (codegen-friendly, no higher-order function,
  * no UDF), constants baked per level. XOR is avoided on purpose: Spark
  * spells it `^`, DuckDB `xor()`, so the quadrant index uses the
  * arithmetic identity (3·rx)⊕ry = rx=1 ? 3−ry : ry, keeping every
  * expression shared-verbatim between the plan and the differential
  * oracle ([[hilbertCtes]] emits the SAME per-level strings as chained
  * CTEs).
  */
object Hilbert {

  /** The three per-level column rewrites (hx, hy, hd) for side length
    * n = 2^bits at level s — shared verbatim by Spark and DuckDB.
    */
  private def stepExprs(s: Long, n: Long): (String, String, String) = {
    val rx = s"(CASE WHEN (hx & $s) > 0 THEN 1 ELSE 0 END)"
    val ry = s"(CASE WHEN (hy & $s) > 0 THEN 1 ELSE 0 END)"
    val q = s"(CASE WHEN $rx = 1 THEN 3 - $ry ELSE $ry END)" // (3·rx)⊕ry
    val newX = s"CASE WHEN $ry = 1 THEN hx WHEN $rx = 1 THEN ${n - 1} - hy ELSE hy END"
    val newY = s"CASE WHEN $ry = 1 THEN hy WHEN $rx = 1 THEN ${n - 1} - hx ELSE hx END"
    val newD = s"hd + ${s * s} * $q"
    (newX, newY, newD)
  }

  private def levels(bits: Int): Seq[Long] =
    (bits - 1 to 0 by -1).map(i => 1L << i)

  /** Append column `out` = Hilbert index of (xCol, yCol), both masked to
    * `bits` bits. One chained projection per bit level; Catalyst
    * collapses them into a single whole-stage-codegen'd expression tree.
    */
  def hilbertIndex(df: DataFrame, xCol: String, yCol: String, bits: Int,
                   out: String = "h"): DataFrame = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1, 31], got $bits")
    val n = 1L << bits
    val mask = n - 1
    val base = df
      .withColumn("hx", expr(s"CAST($xCol AS BIGINT) & $mask"))
      .withColumn("hy", expr(s"CAST($yCol AS BIGINT) & $mask"))
      .withColumn("hd", expr("CAST(0 AS BIGINT)"))
    levels(bits).foldLeft(base) { (d, s) =>
      val (nx, ny, nd) = stepExprs(s, n)
      // hx/hy/hd must update SIMULTANEOUSLY from the previous level
      d.select(d.columns.filterNot(Set("hx", "hy", "hd")).map(col) ++ Seq(
        expr(nx).as("hx"), expr(ny).as("hy"), expr(nd).as("hd")): _*)
    }.withColumn(out, col("hd")).drop("hx", "hy", "hd")
  }

  /** The write side, mirroring [[ZOrder.writeClustered]]: cluster `df` by
    * h(x, y) into `numFiles` parquet files via range partitioning + an
    * intra-file sort, so each file's min/max footer stats bound BOTH
    * keys tightly (the curve has no quadrant seams, so the per-file key
    * boxes are smaller than Morton's — LayoutOperatorSpec's skipping
    * gate measures the payoff: a box predicate intersects only the files
    * whose h-range crosses the box). One range shuffle + local sort —
    * the cost of any global sort, which is what clustering IS.
    */
  def writeClustered(df: DataFrame, xCol: String, yCol: String, bits: Int,
                     outDir: String, numFiles: Int): Unit = {
    require(numFiles > 0, "numFiles must be positive")
    hilbertIndex(df, xCol, yCol, bits, out = "__h")
      .repartitionByRange(numFiles, col("__h"))
      .sortWithinPartitions("__h")
      .drop("__h")
      .write.mode("overwrite").parquet(outDir)
  }

  /** The identical unrolled walk as chained SQL CTEs for the oracle:
    * `base` must expose columns hx, hy (pre-masked) and any carry
    * columns; returns CTE text `h1 AS (...), …, hN AS (...)` whose last
    * CTE carries the finished index as `hd`. `carry` columns pass
    * through every level.
    */
  def hilbertCtes(bits: Int, base: String, carry: Seq[String]): String = {
    val n = 1L << bits
    val keep = carry.mkString(", ")
    levels(bits).zipWithIndex.map { case (s, i) =>
      val (nx, ny, nd) = stepExprs(s, n)
      val src = if (i == 0) base else s"h$i"
      s"""h${i + 1} AS (SELECT $keep, $nx AS hx, $ny AS hy,
         |  $nd AS hd FROM $src)""".stripMargin
    }.mkString(",\n")
  }

  /** Plain-Scala reference (the textbook loop) for property tests. */
  def hilbertRef(bits: Int, x0: Long, y0: Long): Long = {
    val n = 1L << bits
    var (x, y) = (x0 & (n - 1), y0 & (n - 1))
    var d = 0L
    var s = n / 2
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3 * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) { x = n - 1 - x; y = n - 1 - y }
        val t = x; x = y; y = t
      }
      s /= 2
    }
    d
  }
}
