package graft.core

import scala.collection.mutable

/** Address / housenumber / intersection term machinery — ports of the
  * reference termops address surface (reference
  * lib/text-processing/termops.js:276-363, 712-734, 847-943, 994-1009).
  */
object AddressTokens {

  /** One numTokenize variant: tokens with the address token waffled, plus the
    * original token + its position (reference termops.js:847-863).
    */
  final case class NumTokenized(tokens: Vector[String], position: Int, number: String)

  /** numTokenize v3: each address-looking token yields a variant with that
    * token replaced by its numTokenV3 waffle.
    */
  def numTokenize(text: Vector[String]): Vector[NumTokenized] = {
    val out = Vector.newBuilder[NumTokenized]
    var i = 0
    while (i < text.length) {
      if (TextNormalize.isAddressNumber(text(i))) {
        TextNormalize.parseSemiNumber(text(i)).foreach { num =>
          out += NumTokenized(text.updated(i, TextNormalize.numTokenV3(num.toString)),
            i, text(i))
        }
      }
      i += 1
    }
    out.result()
  }

  /** numTokenizePrefix v3 (reference termops.js:917-943): single-token
    * numeric prefixes yield the waffle variants they could be a prefix of.
    */
  def numTokenizePrefix(text: Vector[String]): Vector[Vector[String]] = {
    if (text.length != 1) return Vector.empty
    if (!TextNormalize.isAddressNumber(text.head)) return Vector.empty
    TextNormalize.parseSemiNumber(text.head) match {
      case None => Vector.empty
      case Some(num) =>
        val strNum = num.toString
        val variants = mutable.LinkedHashSet.empty[String]
        for (suffix <- Seq("", "0", "00")) {
          val waffled = TextNormalize.numTokenV3(strNum + suffix)
          variants += waffled.substring(0, math.min(strNum.length, waffled.length))
        }
        variants.toVector.filter(_ != text.head).map(v => text.updated(0, v))
    }
  }

  /** getHousenumRangeV3 (reference termops.js:299-363). Returns the sorted
    * distinct numToken waffles covering carmen:addressnumber points and
    * carmen:rangetype TIGER ranges; empty = the reference's `false`.
    *
    * @param addressNumbers outer array aligned with geometry parts; null
    *                       entries as empty vectors
    * @param ranges         (lfromhn, ltohn, rfromhn, rtohn) outer arrays
    *                       aligned with `numGeometries` geometry parts
    */
  def getHousenumRangeV3(addressNumbers: Vector[Vector[String]],
                         hasRangeType: Boolean = false,
                         lfromhn: Vector[Vector[String]] = Vector.empty,
                         ltohn: Vector[Vector[String]] = Vector.empty,
                         rfromhn: Vector[Vector[String]] = Vector.empty,
                         rtohn: Vector[Vector[String]] = Vector.empty,
                         numGeometries: Int = 0): Vector[String] = {
    val used = mutable.LinkedHashSet.empty[String]

    for (part <- addressNumbers; key <- part) {
      TextNormalize.parseSemiNumber(key).foreach { n =>
        used += TextNormalize.numTokenV3(n.toString)
      }
    }

    if (hasRangeType) {
      val props = Seq((lfromhn, ltohn), (rfromhn, rtohn))
      var cIt = 0
      while (cIt < numGeometries) {
        for ((fromP, toP) <- props if fromP.nonEmpty) {
          val a = if (cIt < fromP.length) fromP(cIt) else Vector.empty
          val b = if (cIt < toP.length) toP(cIt) else Vector.empty
          var k = 0
          while (k < a.length) {
            val valA = TextNormalize.parseSemiNumber(a(k))
            val valB = if (k < b.length) TextNormalize.parseSemiNumber(b(k)) else None
            (valA, valB) match {
              case (Some(va), Some(vb)) =>
                val min = math.min(va, vb)
                val max = math.max(va, vb)
                used += TextNormalize.numTokenV3(max.toString)
                var v = min
                while (v < max) {
                  used += TextNormalize.numTokenV3(v.toString)
                  v += (if (v < 10) 10 else 100)
                }
              case _ =>
            }
            k += 1
          }
        }
        cIt += 1
      }
    }
    used.toVector.sorted // JS Array.sort = lexicographic
  }

  /** getIntersectionText (reference termops.js:994-1009): each cross-street
    * becomes a "+intersection <name> , " indexing string.
    */
  def getIntersectionText(intersections: Vector[Vector[String]]): Vector[String] =
    for (part <- intersections; name <- part) yield s"+intersection $name , "

  /** addressPermutations (reference termops.js:712-734): drop permutations
    * with a masked number mid-phrase, dedupe, longest first (stable).
    */
  def addressPermutations(permutations: Vector[Phrases.Perm]): Vector[Phrases.Perm] = {
    val memo = mutable.HashSet.empty[String]
    val ret = Vector.newBuilder[Phrases.Perm]
    for (p <- permutations) {
      val midNum = (1 until p.terms.length - 1).exists(j => p.terms(j).contains('#'))
      if (!midNum) {
        val key = s"${p.terms.mkString(",")}-${p.ender}-${p.mask}-${p.relev}"
        if (!memo.contains(key)) {
          memo += key
          ret += p
        }
      }
    }
    ret.result().sortBy(-_.terms.length)
  }

  /** intersectionPermutations (reference termops.js:872-902): for each inner
    * occurrence of the intersection token, emit "+intersection a b , c d..."
    * prefixes with masks anchored at the query start.
    */
  def intersectionPermutations(tokens: Vector[String],
                               intersectionToken: String): Vector[Phrases.Perm] = {
    if (tokens.length < 3) return Vector.empty
    val ret = Vector.newBuilder[Phrases.Perm]
    var i = 1
    while (i < tokens.length - 1) {
      if (tokens(i) == intersectionToken) {
        val replaced = "+intersection" +: tokens.updated(i, ",")
        var j = i + 2
        while (j < replaced.length) {
          ret += Phrases.Perm(
            terms = replaced.take(j + 1),
            mask = (1 << j) - 1,
            ender = j == replaced.length - 1,
            relev = 0.0)
          j += 1
        }
      }
      i += 1
    }
    ret.result()
  }
}
