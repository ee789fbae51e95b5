package graft.core

/** Token bitmask permutation sets (reference lib/util/permute.js:17-67).
  * Masks are ints over at most 20 query tokens (lib/constants.js:8).
  */
object Permute {
  private val cacheAll = new java.util.concurrent.ConcurrentHashMap[Int, Vector[Int]]()
  private val cacheCont = new java.util.concurrent.ConcurrentHashMap[Int, Vector[Int]]()

  /** All non-zero subsets, sorted by popcount desc then value asc. */
  def all(length: Int): Vector[Int] =
    cacheAll.computeIfAbsent(length, _ => {
      val masks = (1 until (1 << length)).toVector
      masks.sortBy(m => (-Integer.bitCount(m), m))
    })

  /** All contiguous windows: full cover first, then shorter windows by
    * decreasing length, each slid from bit 0 upward.
    */
  def continuous(length: Int): Vector[Int] =
    cacheCont.computeIfAbsent(length, _ => {
      val masks = Vector.newBuilder[Int]
      var cover = (1 << length) - 1
      masks += cover
      var i = 1
      while (i < length) {
        cover = cover >> 1
        var j = 0
        while (j <= i) {
          masks += (cover << j)
          j += 1
        }
        i += 1
      }
      masks.result()
    })
}
