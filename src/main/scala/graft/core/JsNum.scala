package graft.core

/** JavaScript-compatible numeric helpers.
  *
  * The reference engine (mapbox/carmen) computes scores/relevances with JS
  * `Number` semantics (IEEE-754 double) plus a couple of quirks we must
  * reproduce exactly for golden parity:
  * `Math.fround` (float32 round-trip, used by the 3-bit log-scale score codec,
  * reference lib/text-processing/termops.js:966-974) and `Math.round`
  * (round-half-toward-+Inf, used by mercator pixel math,
  * reference lib/util/proximity.js:74-82 via @mapbox/sphericalmercator).
  */
object JsNum {
  /** Math.fround: nearest float32, returned as double. */
  @inline def fround(d: Double): Double = d.toFloat.toDouble

  /** JS Math.round: floor(x + 0.5), i.e. half-up toward +Infinity. */
  @inline def jsRound(d: Double): Double = math.floor(d + 0.5)

  // 10^k for the digit counts roundTo is ever called with — math.pow's
  // FdLibm path allocates a spill array per call, and roundTo runs once
  // per grid in the coalesce kernels (JFR: ~0.5 GB per 10k-query batch)
  private val pow10: Array[Double] = Array.tabulate(16)(k => math.pow(10, k))

  /** carmen's round-to helper (lib/util/round-to.js:10-13):
    * `Math.round(value * 10^digits) / 10^digits` with JS Math.round.
    */
  def roundTo(value: Double, digits: Int): Double = {
    val p = if (digits >= 0 && digits < 16) pow10(digits) else math.pow(10, digits)
    jsRound(value * p) / p
  }

  /** JS parseInt(s, 10): leading optional sign + digits; NaN if none. */
  def parseIntPrefix(s: String): Double = {
    val t = s.trim
    var i = 0
    var sign = 1
    if (i < t.length && (t.charAt(i) == '+' || t.charAt(i) == '-')) {
      if (t.charAt(i) == '-') sign = -1
      i += 1
    }
    val start = i
    while (i < t.length && t.charAt(i).isDigit) i += 1
    if (i == start) Double.NaN
    else sign * t.substring(start, i).toDouble
  }

  /** JS Number(s) coercion: full-string numeric parse; NaN otherwise. */
  def jsNumber(s: String): Double = {
    val t = s.trim
    if (t.isEmpty) 0.0
    else try t.toDouble catch { case _: NumberFormatException => Double.NaN }
  }

  /** `parseFloat(x.toFixed(1))` as used by grid decode
    * (reference lib/util/grid.js:35). Inputs are small non-negative values
    * (0.4/0.6/0.8/1.0) so simple half-even at 1 decimal is exact; we use the
    * same digit-string route as JS toFixed for safety.
    */
  def toFixed1(d: Double): Double =
    new java.math.BigDecimal(d)
      .setScale(1, java.math.RoundingMode.HALF_UP)
      .doubleValue()

  /** `toFixed1(0.4 + k * 0.2)` for k = 0..3 — the COMPLETE input domain of
    * the 2-bit grid relev decode (grid.js:35). Precomputed through the same
    * BigDecimal route so the per-grid decode is exact-by-construction AND
    * allocation-free: the BigDecimal/BigInteger churn of calling toFixed1
    * per decoded grid measured ~32 GB of a 10k-query forward batch's
    * allocation (JFR ObjectAllocationSample), all of it from this one
    * 4-value function.
    */
  val relev2Bit: Array[Double] = Array.tabulate(4)(k => toFixed1(0.4 + k * 0.2))
}
