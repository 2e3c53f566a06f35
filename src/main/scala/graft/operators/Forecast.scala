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

  /** Simple-exponential-smoothing coefficients (α = 1/2, init ℓ₁ = x₁)
    * over the last n observations — the smoother Croston's
    * intermittent-demand method runs twice (demand sizes, inter-demand
    * intervals). Same mechanism as [[holtCoefficients]], one state
    * variable. Returns (coefs oldest→newest, denominator).
    */
  def sesCoefficients(n: Int): (Seq[BigInt], BigInt) = {
    require(n >= 2, "need at least 2 observations")
    val scale = BigInt(2).pow(n)
    var l = Vector.tabulate(n)(i => if (i == 0) scale else BigInt(0))
    for (t <- 1 until n) {
      val xt = Vector.tabulate(n)(i => if (i == t) scale else BigInt(0))
      l = Vector.tabulate(n)(i => (xt(i) + l(i)) / 2)
    }
    var g = scale
    l.filter(_ != 0).foreach(c => g = g.gcd(c))
    (l.map(_ / g), scale / g)
  }

  /** The RAW integer dot product (no closing division) — for ratios of
    * two smoothed series sharing one denominator (Croston's demand ÷
    * interval), where the single IEEE division happens on the RATIO and
    * the common `den` cancels exactly.
    */
  def dotIntSql(coefs: Seq[BigInt], xCol: Int => String): String =
    coefs.zipWithIndex.collect {
      case (c, i) if c != 0 => s"$c * ${xCol(i + 1)}"
    }.mkString(" + ")

  /** Holt–Winters ADDITIVE seasonal coefficients, same mechanism as
    * [[holtCoefficients]]: with dyadic α = β = γ = 1/2 and a
    * power-of-two period m, the recurrence
    *
    *   ℓ_t = ((x_t − s_{t−m}) + ℓ_{t−1} + b_{t−1}) / 2
    *   b_t = ((ℓ_t − ℓ_{t−1}) + b_{t−1}) / 2
    *   s_t = ((x_t − ℓ_t) + s_{t−m}) / 2
    *
    * over the last n observations (init: ℓ_m = mean of the first
    * period — exact because m | 2^k; s_i = x_i − ℓ_m; b_m = 0) is
    * linear in x, so level / trend / next-season / 1-step forecast
    * (ℓ + b + s_{n+1−m}) are fixed rational dot products — the
    * SEASONAL model also costs one integer dot per key in-plan.
    * Every halving is checked exact (a parity failure would silently
    * break linearity); the power-of-two period is what guarantees it.
    *
    * Returns (level, trend, season_next, forecast₁, denominator).
    */
  def holtWintersCoefficients(n: Int, m: Int)
      : (Seq[BigInt], Seq[BigInt], Seq[BigInt], Seq[BigInt], BigInt) = {
    require(m >= 2 && (m & (m - 1)) == 0, "period must be a power of two")
    require(n > m, "need more than one period of observations")
    val scale = BigInt(2).pow(2 * n) * m
    def half(v: BigInt): BigInt = {
      require(v.testBit(0) == false, s"non-dyadic halving of $v")
      v / 2
    }
    var l = Vector.tabulate(n)(j => if (j < m) scale / m else BigInt(0))
    var b = Vector.fill(n)(BigInt(0))
    val s = Array.tabulate(m)(i =>
      Vector.tabulate(n)(j => (if (j == i) scale else BigInt(0)) - l(j)))
    for (t <- m until n) {
      val sPrev = s(t % m)
      val xt = Vector.tabulate(n)(j => if (j == t) scale else BigInt(0))
      val lNew = Vector.tabulate(n)(j => half((xt(j) - sPrev(j)) + l(j) + b(j)))
      val bNew = Vector.tabulate(n)(j => half((lNew(j) - l(j)) + b(j)))
      val sNew = Vector.tabulate(n)(j => half((xt(j) - lNew(j)) + sPrev(j)))
      l = lNew; b = bNew; s(t % m) = sNew
    }
    val sNext = s(n % m)
    val f = Vector.tabulate(n)(i => l(i) + b(i) + sNext(i))
    val all = (l ++ b ++ sNext ++ f).filter(_ != 0)
    var g = scale
    all.foreach { c => g = g.gcd(c) }
    (l.map(_ / g), b.map(_ / g), sNext.map(_ / g), f.map(_ / g), scale / g)
  }
}
