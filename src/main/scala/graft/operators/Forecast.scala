package graft.operators

/** Holt linear-trend forecasting as a DRIVER-UNROLLED linear filter.
  *
  * Holt's recurrence with dyadic smoothing (α = β = 1/2),
  *
  *   ℓ_t = (x_t + ℓ_{t-1} + b_{t-1}) / 2
  *   b_t = ((ℓ_t − ℓ_{t-1}) + b_{t-1}) / 2
  *
  * is LINEAR in the observations, so over a fixed window of the last n
  * points its level/trend/1-step-forecast are fixed rational dot products
  * c·x with dyadic coefficients. Running the recurrence symbolically ONCE
  * on the driver (exact BigInt rationals) turns the whole model into one
  * integer dot product per key in-plan: micro-unit observations × integer
  * coefficient literals, a single closing IEEE division — bit-identical
  * across engines (the ts_ewma dyadic mechanism extended to a stateful
  * model). No per-row state, no UDF, no iterative job: forecasting a
  * billion keys is one aggregation.
  *
  * The window is truncated (default n = 8, init ℓ₁ = x₁, b₁ = 0) for the
  * same reason ts_ewma truncates: an unbounded recurrence's coefficients
  * decay geometrically, so the filter tail beyond n points contributes
  * below output rounding; a fixed n keeps the coefficient table finite and
  * the per-key work O(n).
  */
object Forecast {

  /** Exact dyadic coefficient vectors over the last `n` chronological
    * observations (x₁ oldest … x_n newest), all brought to ONE common
    * power-of-two denominator: (level, trend, forecast₁, denominator)
    * where forecast₁ = level + trend.
    */
  def holtCoefficients(n: Int): (Seq[BigInt], Seq[BigInt], Seq[BigInt], BigInt) = {
    require(n >= 2, "need at least 2 observations")
    // vectors scaled by 2^(2n): every halving stays integral
    val scale = BigInt(2).pow(2 * n)
    var l = Vector.tabulate(n)(i => if (i == 0) scale else BigInt(0))
    var b = Vector.fill(n)(BigInt(0))
    for (t <- 1 until n) {
      val xt = Vector.tabulate(n)(i => if (i == t) scale else BigInt(0))
      val lNew = Vector.tabulate(n)(i => (xt(i) + l(i) + b(i)) / 2)
      val bNew = Vector.tabulate(n)(i => ((lNew(i) - l(i)) + b(i)) / 2)
      l = lNew; b = bNew
    }
    val f = Vector.tabulate(n)(i => l(i) + b(i))
    // strip the common power of two across every coefficient + denominator
    val all = (l ++ b ++ f).filter(_ != 0)
    var g = scale
    all.foreach { c => g = g.gcd(c) }
    (l.map(_ / g), b.map(_ / g), f.map(_ / g), scale / g)
  }

  /** The (xk → coefficient) dot product as SQL shared VERBATIM by Spark
    * and DuckDB: integer products and left-to-right integer additions
    * (exact), one closing division by `den × microScale` (the only
    * rounding), ROUND(…, 6) at the edge. `xCol(k)` names the k-th
    * chronological micro-unit observation column.
    */
  def dotSql(coefs: Seq[BigInt], den: BigInt, microScale: Long,
             xCol: Int => String): String = {
    val terms = coefs.zipWithIndex.collect {
      case (c, i) if c != 0 => s"$c * ${xCol(i + 1)}"
    }
    s"""CAST(ROUND(CAST(${terms.mkString(" + ")} AS DOUBLE)
       | / ${den * microScale}.0, 6) AS DOUBLE)""".stripMargin
  }
}
