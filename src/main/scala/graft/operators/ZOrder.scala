package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Morton (Z-order) interleave of two integer keys — the multi-dimensional
  * data-layout primitive: sorting by z-value clusters rows that are close
  * in BOTH dimensions into the same file/row-group, so min/max file
  * statistics prune scans with predicates on either key. (An extension
  * family: the reference ships file-level parquet layout via its shuffle
  * writer, `src/shuffle.rs`, but no multi-dimensional clustering; this is
  * the standard lakehouse technique built Spark-first.)
  *
  * 21 bits per dimension → a 42-bit z-value that stays well inside an
  * exact BIGINT in both Spark and DuckDB (the differential oracle
  * recomputes it via [[zvalueSql]]). The interleave uses the classic
  * magic-mask spread — O(log bits) shifts, codegen-friendly, no loops —
  * and BOTH engines evaluate the same mask table, so one wrong constant
  * breaks the `layout_zorder` hash compare.
  */
object ZOrder {

  /** Bits kept per dimension. 2^21 = 2,097,152 covers TPC-H part/supp
    * keys up to SF~10; beyond that, bucket the key first (the layout only
    * needs relative order, not full key fidelity).
    */
  val Bits = 21

  private val lowMask: Long = (1L << Bits) - 1

  /** Shift/mask pairs that spread bit i of a 21-bit value to bit 2i. */
  private val spreadSteps: Seq[(Int, Long)] = Seq(
    16 -> 0x0000FFFF0000FFFFL,
    8 -> 0x00FF00FF00FF00FFL,
    4 -> 0x0F0F0F0F0F0F0F0FL,
    2 -> 0x3333333333333333L,
    1 -> 0x5555555555555555L)

  private def spread(c: Column): Column =
    spreadSteps.foldLeft(c.cast("bigint").bitwiseAND(lit(lowMask))) {
      case (x, (s, m)) => x.bitwiseOR(shiftleft(x, s)).bitwiseAND(lit(m))
    }

  /** z = interleave(a → even bits, b → odd bits). */
  def zvalue(a: Column, b: Column): Column =
    spread(a).bitwiseOR(shiftleft(spread(b), 1))

  /** The same interleave as a SQL expression string (DuckDB-compatible
    * operators only: CAST / & / | / <<), generated from the SAME mask
    * table as [[zvalue]] so the two engines cannot drift.
    */
  def zvalueSql(a: String, b: String): String = {
    def spreadSql(col: String): String =
      spreadSteps.foldLeft(s"(CAST($col AS BIGINT) & $lowMask)") {
        case (x, (s, m)) => s"(($x | ($x << $s)) & $m)"
      }
    s"(${spreadSql(a)} | (${spreadSql(b)} << 1))"
  }

  /** Plain-Scala reference interleave for property tests. */
  def zvalueRef(a: Long, b: Long): Long = {
    var z = 0L
    var i = 0
    while (i < Bits) {
      z |= ((a >> i) & 1L) << (2 * i)
      z |= ((b >> i) & 1L) << (2 * i + 1)
      i += 1
    }
    z
  }

  /** The write side: cluster `df` by z(a, b) into `numFiles` parquet
    * files. `repartitionByRange` samples the z distribution (one extra
    * pass over a sample, not the data) so file boundaries are z-range
    * splits — each file's parquet min/max footer stats then bound BOTH
    * key columns, and a predicate on either key prunes whole files
    * before any row is read. The intra-file sort keeps row groups
    * equally clustered for row-group-level pruning. Scales as one range
    * shuffle + local sort — the same cost as any global sort, which is
    * what clustering IS.
    */
  def writeClustered(df: org.apache.spark.sql.DataFrame, a: String,
                     b: String, outDir: String, numFiles: Int): Unit = {
    require(numFiles > 0, "numFiles must be positive")
    df.withColumn("__z", zvalue(col(a), col(b)))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(outDir)
  }

  /** Standard geohash alphabet (no a/i/l/o). */
  val GeohashAlphabet = "0123456789bcdefghjkmnpqrstuvwxyz"

  /** 6-character geohash from integer CENTI-degree coordinates — geohash
    * IS a Morton code in base32 dress (lon bit leads), so this reuses the
    * same mask-table interleave: 15 quantization bits per axis = 30 bits
    * = 6 base32 chars, and everything stays exact-integer until the
    * substr lookups. Centi-degrees in, so the quantization
    * `(c + offset) · 2^15 div span` is an integer division — no float
    * rounding can disagree across engines. The geo blocking/clustering
    * primitive: equal prefixes = nearby cells, so a prefix equi-join is
    * the spatial candidate generator.
    */
  def geohashSql(latCentiCol: String, lonCentiCol: String): String = {
    // LEAST(..., 32767) pins the domain boundary: lat=+90.00° (9000
    // centideg) or lon=+180.00° would quantize to 32768 — bit 15 set,
    // above the 30 bits the 6-char hash reads — and alias the opposite
    // extreme; geohashRef clamps the same way (min 32767).
    val latBits = s"LEAST((($latCentiCol) + 9000) * 32768 div 18000, 32767)"
    val lonBits = s"LEAST((($lonCentiCol) + 18000) * 32768 div 36000, 32767)"
    // z with lat at even bits, lon at odd → MSB (bit 29) is lon bit 14,
    // exactly geohash's lon-first bit order
    val z = zvalueSql(latBits, lonBits)
    val chars = (0 until 6).map { i =>
      s"substr('$GeohashAlphabet', CAST((($z) >> ${25 - 5 * i}) & 31 AS INT) + 1, 1)"
    }
    chars.mkString("concat(", ", ", ")")
  }

  /** The same geohash for DuckDB: identical except integer division
    * spelling (`//` for Spark's `div`).
    */
  def geohashDuckSql(latCentiCol: String, lonCentiCol: String): String =
    geohashSql(latCentiCol, lonCentiCol)
      .replace(" div 18000", " // 18000")
      .replace(" div 36000", " // 36000")

  /** Plain-Scala reference for property tests (textbook bit loop). */
  def geohashRef(latDeg: Double, lonDeg: Double): String = {
    val lat = ((latDeg + 90.0) / 180.0 * 32768).toLong min 32767
    val lon = ((lonDeg + 180.0) / 360.0 * 32768).toLong min 32767
    val bits = (0 until 30).map { i =>
      // MSB first, lon leads on even sequence positions
      if (i % 2 == 0) (lon >> (14 - i / 2)) & 1
      else (lat >> (14 - i / 2)) & 1
    }
    bits.grouped(5).map { g =>
      GeohashAlphabet.charAt(g.foldLeft(0L)((a, b) => a * 2 + b).toInt)
    }.mkString
  }
}
