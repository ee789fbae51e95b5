package graft.core

/** Packed grid-entry codec and the 3-bit log-scale score codec.
  *
  * Bit layout (53-bit, IEEE-double-safe; fits natively in a Spark Long):
  * relev(2b)<<51 | score(3b)<<48 | y(14b)<<34 | x(14b)<<20 | id(20b)
  * — semantics of reference lib/util/grid.js:16-41; golden-testable against
  * reference bench/fixtures/coalesce.json.
  */
object GridCodec {
  final case class Grid(x: Int, y: Int, relev: Double, score: Int, id: Long)

  private val mp51 = 1L << 51
  private val mp48 = 1L << 48
  private val mp34 = 1L << 34
  private val mp20 = 1L << 20
  private val mp14 = 1L << 14

  def encode(g: Grid): Long = {
    require(g.id < mp20, "id must be < 2^20")
    require(g.x < mp14, "x must be < 2^14")
    require(g.y < mp14, "y must be < 2^14")
    require(g.x >= 0, "x must be > 0")
    require(g.y >= 0, "y must be > 0")
    require(g.relev <= 1 && g.relev >= 0.4, "relev must be between 0.4 and 1")
    val relev = math.max(0, math.min(3, JsNum.jsRound((g.relev - 0.4) / 0.2).toLong))
    val score = math.max(0, math.min(7, g.score)).toLong
    relev * mp51 + score * mp48 + g.y.toLong * mp34 + g.x.toLong * mp20 + g.id
  }

  def decode(num: Long): Grid = Grid(
    relev = JsNum.relev2Bit((num / mp51).toInt),
    score = ((num % mp51) / mp48).toInt,
    x = ((num % mp34) / mp20).toInt,
    y = ((num % mp48) / mp34).toInt,
    id = num % mp20
  )

  /** 3-bit log-scale score encode. The float32 (`Math.fround`) round-trip of
    * both logs is semantically load-bearing (reference
    * lib/text-processing/termops.js:966-974; e.g. score 100 of max 200
    * encodes to 7, not 6 — test/unit/indexer/indexdocs.test.js:48).
    */
  def encode3BitLogScale(num: Double, max: Double): Int = {
    if (num <= 0 || num.isNaN || max == 0 || max.isNaN) return 0
    if (num == 1) return 1
    math.ceil(7 * JsNum.fround(StrictMath.log(num)) / JsNum.fround(StrictMath.log(max))).toInt
  }

  def decode3BitLogScale(num: Double, max: Double): Double = {
    if (num == 0 || max == 0) return 0
    StrictMath.pow(max, num / 7.0)
  }

  def decode3BitLogScaleRounded(num: Double, max: Double): Double = {
    if (num == 0 || max == 0) return 0
    JsNum.jsRound(StrictMath.pow(max, num / 7.0))
  }

  /** Global per-feature key: idx << 25 | id24
    * (reference lib/geocoder/context.js:2,423,501).
    */
  def tmpid(idx: Int, id24: Long): Long = idx.toLong * (1L << 25) + id24

  /** Feature-store shard key: abs(id) % 2^24
    * (reference lib/text-processing/termops.js:133-135).
    */
  def id24(id: Long): Long = math.abs(id) % (1L << 24)
}
