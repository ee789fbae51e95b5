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
  def dlDistanceLe1(a: String, b: String): Int =
    dlRegionLe1(a, 0, a.length, b, 0, b.length)

  // --- allocation-free region kernels -------------------------------------
  // The fuzzy verifiers run once per candidate pair inside the phrasematch
  // join (millions of calls per forward batch); JFR attributed ~9% of the
  // measured forward-batch allocation to their String.split word arrays.
  // These kernels walk [start, end) regions of the original strings instead:
  // the reject path (the overwhelmingly common case) allocates nothing, and
  // accept paths allocate only the returned result.

  @inline private def regionEq(a: String, a0: Int, a1: Int,
                               b: String, b0: Int, b1: Int): Boolean =
    (a1 - a0) == (b1 - b0) && a.regionMatches(a0, b, b0, a1 - a0)

  @inline private def fuzzableRegion(s: String, i0: Int, i1: Int): Boolean = {
    var i = i0
    while (i < i1) {
      if (s.charAt(i).isDigit) return false
      i += 1
    }
    true
  }

  /** Word count under split(" ", -1) semantics: spaces + 1. */
  @inline private def wordCount(s: String): Int = {
    var c = 1; var i = 0
    while (i < s.length) { if (s.charAt(i) == ' ') c += 1; i += 1 }
    c
  }

  /** End of the word starting at `from` (index of the next space, or
    * s.length).
    */
  @inline private def wordEnd(s: String, from: Int): Int = {
    val i = s.indexOf(' ', from)
    if (i < 0) s.length else i
  }

  /** [[dlDistanceLe1]] over string regions a[a0,a1) vs b[b0,b1). */
  def dlRegionLe1(a: String, a0: Int, a1: Int,
                  b: String, b0: Int, b1: Int): Int = {
    val la = a1 - a0
    val lb = b1 - b0
    if (math.abs(la - lb) > 1) return 2
    if (la == lb) {
      var i = 0
      while (i < la && a.charAt(a0 + i) == b.charAt(b0 + i)) i += 1
      // i = first mismatch
      if (i == la) return 0
      // substitution at i?
      if (a.regionMatches(a0 + i + 1, b, b0 + i + 1, la - i - 1)) return 1
      // transposition at i?
      if (i + 1 < la && a.charAt(a0 + i) == b.charAt(b0 + i + 1) &&
        a.charAt(a0 + i + 1) == b.charAt(b0 + i) &&
        a.regionMatches(a0 + i + 2, b, b0 + i + 2, la - i - 2)) return 1
      2
    } else {
      // s = shorter by 1, l = longer
      val (s, s0, sl, l, l0) =
        if (la < lb) (a, a0, la, b, b0) else (b, b0, lb, a, a0)
      var i = 0
      while (i < sl && s.charAt(s0 + i) == l.charAt(l0 + i)) i += 1
      if (s.regionMatches(s0 + i, l, l0 + i + 1, sl - i)) 1 else 2
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
    val nq = wordCount(query)
    if (nq != wordCount(candidate)) return None
    val singleWord = nq == 1
    var edits = 0
    var q0 = 0; var c0 = 0
    var i = 0
    while (i < nq) {
      val q1 = wordEnd(query, q0)
      val c1 = wordEnd(candidate, c0)
      if (!regionEq(query, q0, q1, candidate, c0, c1)) {
        if (edits > 0) return None
        if (!fuzzableRegion(query, q0, q1) ||
          !fuzzableRegion(candidate, c0, c1)) return None
        val d = dlRegionLe1(query, q0, q1, candidate, c0, c1)
        if (d > 1) return None
        if (singleWord && (q1 - q0 < MinCorrectionLength ||
          c1 - c0 < MinCorrectionLength)) return None
        edits += d
      }
      q0 = q1 + 1; c0 = c1 + 1
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
    val nq = wordCount(query)
    val np = wordCount(phrase)
    if (np < nq) return None
    var edits = 0
    var q0 = 0; var p0 = 0
    var i = 0
    while (i < nq - 1) {
      // non-final words imply a multi-word phrase, where short-word
      // corrections are allowed (MIN_CORRECTION_LENGTH guards only
      // single-word phrases, reference phrasematch.js:117-126)
      val q1 = wordEnd(query, q0)
      val p1 = wordEnd(phrase, p0)
      if (!regionEq(query, q0, q1, phrase, p0, p1)) {
        if (edits > 0) return None
        if (!fuzzableRegion(query, q0, q1) ||
          !fuzzableRegion(phrase, p0, p1)) return None
        val d = dlRegionLe1(query, q0, q1, phrase, p0, p1)
        if (d > 1) return None
        edits += d
      }
      q0 = q1 + 1; p0 = p1 + 1
      i += 1
    }
    // final typed word wk = query[q0, q1); its phrase twin w = phrase[p0, p1)
    val q1 = query.length
    val p1 = wordEnd(phrase, p0)
    val kLen = q1 - q0
    val wLen = p1 - p0
    val sameLen = np == nq
    // the accepted cover text is always ps.take(nq-1) :+ finalText, and
    // finalText is always a prefix of w — i.e. the cover text is
    // phrase.substring(0, p0 + finalLen): a single allocation on accept
    val finalLen: Int =
      if (regionEq(query, q0, q1, phrase, p0, p1)) {
        // complete final word: equal word counts = the exact phrase (or a
        // gap the exact branch handles); extension phrases are fine
        if (sameLen) return None
        kLen
      } else if (wordBoundary) {
        // wordBoundaryPrefix ending: the final typed word ended at a
        // boundary (separator or a replaced last word) and must match a
        // complete indexed word EXACTLY — no partial prefixes, no final-
        // word edits (observable: '30th station' -> replaced '30th stn'
        // gets ZERO results against indexed '30th st stn' while the typed
        // anyPrefix '30th stn' fuzzy-matches; reference
        // fuzzy-with-tokens-and-autocomplete.js:81-110)
        return None
      } else if (kLen <= wLen && phrase.regionMatches(p0, query, q0, kLen)) {
        kLen // exact partial prefix; any edit was spent earlier
      } else {
        // anyPrefix fuzzy final: DL<=1 against a prefix of the indexed
        // word, preferring the complete word, then same-length / longer /
        // shorter prefixes (the corrected cover text reads naturally).
        // Single-word phrases keep the MIN_CORRECTION_LENGTH guard
        // (reference phrasematch.js:117-126); short final words inside
        // multi-word phrases may be corrected ('30th stn' -> '30th st').
        if (edits > 0) return None
        if (!fuzzableRegion(query, q0, q1) ||
          !fuzzableRegion(phrase, p0, p1)) return None
        if (np == 1 && (kLen < MinCorrectionLength ||
          wLen < MinCorrectionLength)) return None
        // candidate prefix lengths in preference order (duplicates and
        // out-of-range lengths skipped; re-testing a duplicate is a no-op)
        var chosen = -1
        var ci = 0
        while (ci < 4 && chosen < 0) {
          val l = ci match {
            case 0 => wLen
            case 1 => kLen
            case 2 => kLen + 1
            case _ => kLen - 1
          }
          ci += 1
          if (l >= 1 && l <= wLen &&
            dlRegionLe1(query, q0, q1, phrase, p0, p0 + l) <= 1) chosen = l
        }
        if (chosen < 0) return None
        if (sameLen && chosen == wLen) return None // whole-phrase fuzzy owns it
        edits += 1
        chosen
      }
    if (edits == 0) None
    else Some((edits, phrase.substring(0, p0 + finalLen)))
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
