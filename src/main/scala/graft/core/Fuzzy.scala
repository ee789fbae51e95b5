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

  /** Digit-bearing tokens (house numbers, route numbers) are never
    * fuzzy-edited — the reference's fuzzy-phrase store treats them as
    * exact-only (a query for "101 main st" must not correct to "103 main
    * st"; the reference fuzzy corpus contains letter typos only).
    */
  def fuzzable(word: String): Boolean = !word.exists(_.isDigit)

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
    * fuzzy-phrase's windowed lookup behavior). Words of ANY length vary:
    * fuzzy-phrase corrects short words inside multi-word phrases ("stn" ->
    * "st" in "30th stn", reference fuzzy-with-tokens-and-autocomplete);
    * the MIN_CORRECTION_LENGTH guard applies only to single-word PHRASES
    * (reference phrasematch.js:117-126,248-258) and lives in
    * [[phraseDistance]]'s verification.
    */
  def phraseVariants(phrase: String): Vector[String] = {
    val words = phrase.split(" ", -1).toVector
    val out = Vector.newBuilder[String]
    out += phrase
    var i = 0
    while (i < words.length) {
      if ((words.length > 1 || words(i).length >= MinCorrectionLength) &&
        fuzzable(words(i))) {
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
    * within DL 1; None otherwise. The MIN_CORRECTION_LENGTH guard applies
    * to single-word PHRASES only (reference phrasematch.js:117-126,
    * 248-258) — short words inside multi-word phrases may be corrected.
    */
  def phraseDistance(query: String, candidate: String): Option[Int] = {
    if (query == candidate) return Some(0)
    val qw = query.split(" ", -1)
    val cw = candidate.split(" ", -1)
    if (qw.length != cw.length) return None
    val singleWord = qw.length == 1
    var edits = 0
    var i = 0
    while (i < qw.length) {
      if (qw(i) != cw(i)) {
        if (edits > 0) return None
        if (!fuzzable(qw(i)) || !fuzzable(cw(i))) return None
        val d = dlDistanceLe1(qw(i), cw(i))
        if (d > 1) return None
        if (singleWord && (qw(i).length < MinCorrectionLength ||
          cw(i).length < MinCorrectionLength)) return None
        edits += d
      }
      i += 1
    }
    Some(edits)
  }

  /** Fuzzy-prefix verification for autocomplete ender windows (the
    * reference's anyPrefix / wordBoundaryPrefix ending types fed into the
    * fuzzy store, phrasematch.js:83-96,106,235-247): the typed window may
    * spend its one-word DL<=1 budget on ANY word — including the final,
    * partially-typed one, which matches prefixes of the indexed word —
    * while the window as a whole prefix-matches the candidate phrase.
    *
    * Returns Some((editDistance, coverText)) where editDistance >= 1 (a
    * zero-edit match belongs to the exact prefix branch) and coverText is
    * the corrected window text (matched phrase words; the final word stays
    * as typed when it exact-prefixes, else the corrected word/prefix).
    * Returns None for matches owned by other branches: exact prefixes
    * (edits == 0) and whole-phrase fuzzy matches (equal word counts with a
    * complete final word — the non-prefix fuzzy join produces those).
    */
  def fuzzyPrefixMatch(query: String, phrase: String,
                       wordBoundary: Boolean): Option[(Int, String)] = {
    val qs = query.split(" ", -1)
    val ps = phrase.split(" ", -1)
    if (ps.length < qs.length || qs.isEmpty) return None
    var edits = 0
    var i = 0
    while (i < qs.length - 1) {
      // non-final words imply a multi-word phrase, where short-word
      // corrections are allowed (MIN_CORRECTION_LENGTH guards only
      // single-word phrases, reference phrasematch.js:117-126)
      if (qs(i) != ps(i)) {
        if (edits > 0) return None
        if (!fuzzable(qs(i)) || !fuzzable(ps(i))) return None
        val d = dlDistanceLe1(qs(i), ps(i))
        if (d > 1) return None
        edits += d
      }
      i += 1
    }
    val wk = qs(qs.length - 1)
    val w = ps(qs.length - 1)
    val sameLen = ps.length == qs.length
    val finalText: String =
      if (wk == w) {
        // complete final word: equal word counts = the exact phrase (or a
        // gap the exact branch handles); extension phrases are fine
        if (sameLen) return None
        wk
      } else if (wordBoundary) {
        // wordBoundaryPrefix ending: the final typed word ended at a
        // boundary (separator or a replaced last word) and must match a
        // complete indexed word EXACTLY — no partial prefixes, no final-
        // word edits (observable: '30th station' -> replaced '30th stn'
        // gets ZERO results against indexed '30th st stn' while the typed
        // anyPrefix '30th stn' fuzzy-matches; reference
        // fuzzy-with-tokens-and-autocomplete.js:81-110)
        return None
      } else if (w.startsWith(wk)) {
        wk // exact partial prefix; any edit was spent earlier
      } else {
        // anyPrefix fuzzy final: DL<=1 against a prefix of the indexed
        // word, preferring the complete word, then same-length / longer /
        // shorter prefixes (the corrected cover text reads naturally).
        // Single-word phrases keep the MIN_CORRECTION_LENGTH guard
        // (reference phrasematch.js:117-126); short final words inside
        // multi-word phrases may be corrected ('30th stn' -> '30th st').
        if (edits > 0) return None
        if (!fuzzable(wk) || !fuzzable(w)) return None
        if (ps.length == 1 && (wk.length < MinCorrectionLength ||
          w.length < MinCorrectionLength)) return None
        val cands = (Vector(w.length, wk.length, wk.length + 1, wk.length - 1)
          .filter(l => l >= 1 && l <= w.length)).distinct
        cands.iterator
          .map(l => w.substring(0, l))
          .find(p => dlDistanceLe1(wk, p) <= 1) match {
          case Some(p) =>
            if (sameLen && p == w) return None // whole-phrase fuzzy owns it
            edits += 1
            p
          case None => return None
        }
      }
    if (edits == 0) None
    else Some((edits, (ps.take(qs.length - 1) :+ finalText).mkString(" ")))
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
