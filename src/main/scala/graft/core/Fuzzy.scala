package graft.core

/** Word-level fuzzy phrase matching with Damerau-Levenshtein distance <= 1 —
  * the semantics of the reference's fuzzy-phrase store
  * (reference docs/index-structure.md:10-12), re-expressed as a
  * symmetric-delete (SymSpell-style) candidate table + exact DL verification:
  * two words within DL distance 1 always share a 1-character-deletion
  * variant, so candidate generation is an equi-join on variant strings and
  * verification is a cheap bounded check. At scale the variant table is a
  * second inverted index partitioned like the phrase table.
  */
object Fuzzy {
  /** MIN_CORRECTION_LENGTH (reference lib/constants.js:16): single words
    * shorter than this are never fuzzy-corrected.
    */
  val MinCorrectionLength = 4

  /** The word itself + every 1-character deletion. */
  def deleteVariants(word: String): Vector[String] = {
    if (word.length < 2) return Vector(word)
    val b = Vector.newBuilder[String]
    b += word
    var i = 0
    while (i < word.length) {
      b += word.substring(0, i) + word.substring(i + 1)
      i += 1
    }
    b.result().distinct
  }

  /** Phrase-level variants: one word at a time replaced by its deletion
    * variants (a fuzzy budget of one edited word per phrase, matching
    * fuzzy-phrase's windowed lookup behavior).
    */
  def phraseVariants(phrase: String): Vector[String] = {
    val words = phrase.split(" ", -1).toVector
    val out = Vector.newBuilder[String]
    out += phrase
    var i = 0
    while (i < words.length) {
      if (words(i).length >= MinCorrectionLength) {
        deleteVariants(words(i)).foreach { v =>
          if (v != words(i)) out += words.updated(i, v).mkString(" ")
        }
      }
      i += 1
    }
    out.result().distinct
  }

  /** Restricted Damerau-Levenshtein distance, capped at 2 (we only need
    * <= 1 decisions; returns 2 for anything worse).
    */
  def dlDistanceLe1(a: String, b: String): Int = {
    if (a == b) return 0
    val la = a.length
    val lb = b.length
    if (math.abs(la - lb) > 1) return 2
    if (la == lb) {
      // one substitution or one adjacent transposition
      var i = 0
      while (i < la && a.charAt(i) == b.charAt(i)) i += 1
      // i = first mismatch
      if (i == la) return 0
      // substitution at i?
      if (a.regionMatches(i + 1, b, i + 1, la - i - 1)) return 1
      // transposition at i?
      if (i + 1 < la && a.charAt(i) == b.charAt(i + 1) && a.charAt(i + 1) == b.charAt(i) &&
        a.regionMatches(i + 2, b, i + 2, la - i - 2)) return 1
      2
    } else {
      val (s, l) = if (la < lb) (a, b) else (b, a) // s shorter by 1
      var i = 0
      while (i < s.length && s.charAt(i) == l.charAt(i)) i += 1
      if (s.regionMatches(i, l, i + 1, s.length - i)) 1 else 2
    }
  }

  /** Word-level DL distance between phrases with a one-edited-word budget:
    * returns Some(distance) when at most one word differs and that word is
    * within DL 1 (and both sides respect MinCorrectionLength for
    * single-word phrases — reference phrasematch.js:117-126); None otherwise.
    */
  def phraseDistance(query: String, candidate: String): Option[Int] = {
    if (query == candidate) return Some(0)
    val qw = query.split(" ", -1)
    val cw = candidate.split(" ", -1)
    if (qw.length != cw.length) return None
    var edits = 0
    var i = 0
    while (i < qw.length) {
      if (qw(i) != cw(i)) {
        if (edits > 0) return None
        val d = dlDistanceLe1(qw(i), cw(i))
        if (d > 1) return None
        if (qw(i).length < MinCorrectionLength || cw(i).length < MinCorrectionLength)
          return None
        edits += d
      }
      i += 1
    }
    Some(edits)
  }

  /** Classic Levenshtein distance (the `leven` dependency the reference
    * uses for cover->feature disambiguation, lib/util/feature.js:356-366).
    */
  def levenshtein(a: String, b: String): Int = {
    if (a == b) return 0
    if (a.isEmpty) return b.length
    if (b.isEmpty) return a.length
    val prev = new Array[Int](b.length + 1)
    val curr = new Array[Int](b.length + 1)
    var j = 0
    while (j <= b.length) { prev(j) = j; j += 1 }
    var i = 1
    while (i <= a.length) {
      curr(0) = i
      j = 1
      while (j <= b.length) {
        val cost = if (a.charAt(i - 1) == b.charAt(j - 1)) 0 else 1
        curr(j) = math.min(math.min(curr(j - 1) + 1, prev(j) + 1), prev(j - 1) + cost)
        j += 1
      }
      System.arraycopy(curr, 0, prev, 0, b.length + 1)
      i += 1
    }
    prev(b.length)
  }

  /** Fuzzy weight penalty (reference phrasematch.js:328-345):
    * max((len(original) - ed/2) / len(original), 0.75).
    */
  def editPenalty(original: String, editDistance: Int): Double =
    if (editDistance == 0) 1.0
    else math.max((original.length - editDistance / 2.0) / original.length, 0.75)
}
