package graft.core

import scala.collection.mutable

/** Index-side phrase enumeration — ports of the reference's
  * getMinimalIndexableText / getWeights / permutations / getIndexablePhrases
  * (reference lib/text-processing/termops.js:388-780). Token-replacer and
  * intersection/housenumber expansion hooks are carried as parameters so the
  * v1 no-replacer path stays byte-faithful.
  */
object Phrases {

  /** One indexable text variant: tokens + languages + source-phrase hash. */
  final case class IndexableText(
      tokens: Vector[String],
      languages: Vector[String],
      hash: Int,
      reduceRelevance: Boolean
  )

  final case class IndexablePhrase(relev: Double, phrase: String, hash: Int)

  /** Term frequency table: term -> count, plus __COUNT__ and __MAX__.
    * `defaultCount` is the lookup fallback — 1 normally; when the broadcast
    * vocabulary was capped at web scale it is the cutoff count (an upper
    * bound on any dropped term's true count).
    */
  final case class Freq(counts: Map[String, Long], total: Long,
                        maxScore: Double, defaultCount: Long = 1)

  /** getMinimalIndexableText (reference termops.js:555-604), no-replacer path:
    * tokenized synonym texts used for corpus frequency counting.
    */
  def minimalIndexableText(text: String): Vector[Vector[String]] =
    minimalIndexableTextFull(SimpleReplacer(Map.empty), Vector.empty,
      Vector.empty, text)

  /** getMinimalIndexableText with replacers (reference termops.js:555-604):
    * one token list per distinct synonym after query-style replacement, with
    * housenum-range expansion.
    */
  def minimalIndexableTextFull(simpleReplacer: SimpleReplacer,
                               complexQueryReplacer: Vector[ReplaceRule],
                               globalReplacer: Vector[ReplaceRule],
                               defaultText: String,
                               langTexts: Seq[(String, String)] = Nil,
                               housenumRange: Vector[String] = Vector.empty): Vector[Vector[String]] = {
    val uniq = mutable.LinkedHashSet.empty[String]
    val out = mutable.ArrayBuffer.empty[Vector[String]]
    def add(tokens: Vector[String]): Unit = {
      val key = tokens.mkString(" ")
      if (tokens.nonEmpty && !uniq.contains(key)) {
        uniq += key
        out += tokens
      }
    }
    val texts = defaultText.split(",", -1).toVector ++
      langTexts.flatMap(_._2.split(",", -1))
    for (text0 <- texts) {
      val text =
        if (globalReplacer.nonEmpty)
          TokenReplace.replaceGlobalTokens(globalReplacer, text0).trim
        else text0
      val tokenized = TokenReplace.replaceToken(complexQueryReplacer,
        TextNormalize.tokenize(text))
      val tokens = simpleReplacer(tokenized.tokens).filter(_.nonEmpty)
      if (tokens.nonEmpty) {
        if (housenumRange.nonEmpty) {
          var l = housenumRange.length - 1
          while (l >= 0) { add(housenumRange(l) +: tokens); l -= 1 }
        } else add(tokens)
      }
    }
    out.toVector
  }

  /** getWeights (reference termops.js:798-837): IDF-ish weights normalized
    * to sum 1; '#'-masked number tokens pinned at 0.2 with the rest scaled
    * into 0.8.
    */
  def getWeights(tokens: Vector[String], freq: Freq): Vector[Double] = {
    val weights = new Array[Double](tokens.length)
    var weightsum = 0.0
    var numTokens = false
    var i = tokens.length - 1
    while (i >= 0) {
      if (tokens(i).contains('#')) {
        numTokens = true
        weights(i) = -1
      } else {
        val termfreq = freq.counts.getOrElse(tokens(i), freq.defaultCount).toDouble
        val total = if (freq.total == 0) 1.0 else freq.total.toDouble
        weights(i) = StrictMath.log(1 + total / termfreq)
        weightsum += weights(i)
      }
      i -= 1
    }
    i = weights.length - 1
    if (numTokens) {
      while (i >= 0) {
        if (weights(i) == -1) weights(i) = 0.2
        else weights(i) = weights(i) / weightsum * 0.8
        i -= 1
      }
    } else {
      while (i >= 0) { weights(i) = weights(i) / weightsum; i -= 1 }
    }
    weights.toVector
  }

  // --- P2 mask algebra (reference lib/geocoder/phrasematch.js:407-562) ---

  /** Start/end of the first continuous 1-bit run ((-1,-1) for mask 0). */
  def findMaskBounds(mask: Int, limit: Int): (Int, Int) = {
    if (mask == 0) return (-1, -1)
    var start = -1
    var end = limit - 1
    var i = 0
    var done = false
    while (i < limit && !done) {
      if (start == -1) {
        if ((mask & (1 << i)) != 0) start = i
      } else if ((mask & (1 << i)) == 0) {
        end = i - 1
        done = true
      }
      i += 1
    }
    (start, end)
  }

  /** Bitmask covering [start, start+len). */
  def buildMask(start: Int, len: Int): Int = {
    var mask = 0
    var i = 0
    while (i < len) { mask |= 1 << (start + i); i += 1 }
    mask
  }

  /** Masks of normalized-token runs sharing an owner (one original token
    * expanded by replacement): permutations must cover such a run fully or
    * not at all (phrasematch.js:448-478).
    */
  def requiredMasks(normalized: TokenizedQuery): Vector[Int] = {
    val ret = mutable.ArrayBuffer.empty[Int]
    var prev = -1
    var i = 0
    while (i < normalized.owner.length) {
      val curr = normalized.owner(i)
      if (prev == curr) {
        val m = buildMask(i - 1, 2)
        if (ret.nonEmpty && (m & ret.last) != 0) ret(ret.length - 1) |= m
        else ret += m
      } else prev = curr
      i += 1
    }
    ret.toVector
  }

  /** Masks (in pre-normalization token positions) covering gaps left by
    * token replacements that removed tokens, each extended one token left
    * or right (phrasematch.js:487-512).
    */
  def gapMasks(replaced: TokenizedQuery): Vector[Int] = {
    val ret = mutable.ArrayBuffer.empty[Int]
    val len = replaced.tokens.length
    var gapStart = -1
    var i = 0
    while (i < len) {
      if (replaced.tokens(i).isEmpty) {
        if (gapStart == -1) gapStart = i
      } else if (gapStart != -1) {
        if (gapStart > 0) ret += buildMask(gapStart - 1, i - gapStart + 1)
        ret += buildMask(gapStart, i - gapStart + 1)
        gapStart = -1
      }
      i += 1
    }
    if (gapStart != -1) ret += buildMask(gapStart - 1, len - gapStart + 1)
    ret.toVector
  }

  /** True if the mask covers each required window fully or not at all
    * (phrasematch.js:521-527).
    */
  def demandWindows(requiredWindows: Vector[Int], mask: Int): Boolean =
    requiredWindows.forall { v =>
      val overlap = mask & v
      overlap == 0 || overlap == v
    }

  /** A permutation of terms (reference termops.js:639-704). */
  final case class Perm(
      terms: Vector[String],
      mask: Int,
      ender: Boolean,
      relev: Double,
      addressPos: Option[Int] = None,
      numberOrder: Option[String] = None,
      addressNumber: Option[String] = None
  )

  /** permutations(terms, weights, all, frequentWords). `addressPosition` /
    * `addressNumber` mirror the reference's `terms.address` attachment from
    * numTokenize (termops.js:855-858).
    */
  def permutations(terms: Vector[String], weights: Option[Vector[Double]],
                   all: Boolean, reduceRelevance: Boolean = false,
                   frequentWords: Set[String] = Set.empty,
                   addressPosition: Option[Int] = None,
                   addressNumber: Option[String] = None): Vector[Perm] = {
    val length = terms.length
    val minRelevance = 0.8
    val masks =
      if (all && length <= 8) Permute.all(length) else Permute.continuous(length)
    masks.map { mask =>
      var wordDropped = false
      val kept = Vector.newBuilder[String]
      var keptLen = 0
      var relev = 0.0
      var addr: Option[Int] = None
      var j = 0
      while (j < length) {
        if ((mask & (1 << j)) == 0) {
          if (frequentWords.contains(terms(j))) wordDropped = true
        } else {
          kept += terms(j)
          keptLen += 1
          if (addressPosition.contains(j)) addr = Some(j)
          weights.foreach(w => relev += w(j))
        }
        j += 1
      }
      var permTerms = kept.result()
      var ender = (mask & (1 << (length - 1))) != 0
      var numberOrder: Option[String] = if (addr.isDefined) Some("first") else None
      val permRelev = weights match {
        case Some(_) =>
          if (reduceRelevance && keptLen == length) minRelevance
          else if (wordDropped && keptLen == length - 1)
            math.max(minRelevance, JsNum.jsRound(relev * 5) / 5)
          else JsNum.jsRound(relev * 5) / 5
        case None => 0.0
      }
      // trailing numToken swap-to-front (index optimization)
      if (addr.isDefined) {
        if (permTerms.length > 1) {
          if (permTerms.last.contains('#')) {
            permTerms = permTerms.last +: permTerms.init
            ender = false
            numberOrder = Some("last")
          }
        } else numberOrder = None
      }
      Perm(permTerms, mask, ender, permRelev, addr, numberOrder,
        if (addr.isDefined) addressNumber else None)
    }
  }

  /** getIndexablePhrases (reference termops.js:712-780): all-subset perms of
    * a text variant, keep relev >= 0.8, dedupe keeping the highest relev.
    */
  def getIndexablePhrases(text: IndexableText, freq: Freq,
                          frequentWords: Set[String] = Set.empty): Vector[IndexablePhrase] = {
    if (text.tokens.headOption.contains("+intersection")) {
      return Vector(IndexablePhrase(1.0,
        TextNormalize.normalizeText(text.tokens.mkString(" ")), text.hash))
    }
    val perms = permutations(text.tokens, Some(getWeights(text.tokens, freq)),
      all = true, reduceRelevance = text.reduceRelevance, frequentWords = frequentWords)
      .sortBy(-_.relev)
    val uniq = mutable.HashSet.empty[String]
    val out = Vector.newBuilder[IndexablePhrase]
    var break = false
    for (p <- perms if !break) {
      if (p.relev < 0.8) break = true
      else {
        val etext = TextNormalize.normalizeText(p.terms.mkString(" "))
        if (!uniq.contains(etext)) {
          uniq += etext
          out += IndexablePhrase(p.relev, etext, text.hash)
        }
      }
    }
    out.result()
  }

  /** getIndexableText, no-replacer convenience (round-1 v1 path). */
  def getIndexableText(defaultText: String,
                       langTexts: Map[String, String] = Map.empty,
                       autoPopulate: Vector[String] = Vector.empty): Vector[IndexableText] =
    getIndexableTextFull(SimpleReplacer(Map.empty), Vector.empty, Vector.empty,
      defaultText, langTexts.toVector.sortBy(_._1), autoPopulate)

  /** getIndexableText with replacers (reference termops.js:388-540): global
    * replacement, complex-replacer variant enumeration, simple replacement,
    * intersection and housenum-range key expansion, language accumulation.
    *
    * @param langTexts property-order (lang, text) pairs; lang may be
    *                  "universal" (treated as language "all")
    * @param intersections output of [[AddressTokens.getIntersectionText]]
    * @param housenumRange output of [[AddressTokens.getHousenumRangeV3]]
    */
  def getIndexableTextFull(simpleReplacer: SimpleReplacer,
                           complexReplacer: Vector[ReplaceRule],
                           globalReplacer: Vector[ReplaceRule],
                           defaultText: String,
                           langTexts: Seq[(String, String)] = Nil,
                           defaultLanguages: Seq[String] = Nil,
                           categories: Set[String] = Set.empty,
                           intersections: Vector[String] = Vector.empty,
                           housenumRange: Vector[String] = Vector.empty): Vector[IndexableText] = {
    val langKeys = ("default" +: langTexts.map(_._1)).toSet
    val autoPopulate = defaultLanguages.filterNot(langKeys.contains)

    // synonym text -> accumulated languages (insertion order)
    val texts = mutable.LinkedHashMap.empty[String, mutable.ArrayBuffer[String]]
    val hashes = mutable.HashMap.empty[String, Int]
    for ((langKey, prop) <- ("default" -> defaultText) +: langTexts.toVector) {
      val synonyms = prop.split(",", -1)
      var i = 0
      while (i < synonyms.length) {
        val text = synonyms(i)
        hashes(text) = Murmur3.phraseHash(text)
        val lang =
          if (langKey == "universal" || (i > 0 && categories.contains(text))) "all"
          else langKey
        val buf = texts.getOrElseUpdate(text, mutable.ArrayBuffer.empty)
        buf += lang
        if (lang == "default" && autoPopulate.nonEmpty) autoPopulate.foreach(buf += _)
        i += 1
      }
    }

    val indexableText = mutable.LinkedHashMap.empty[String, mutable.LinkedHashSet[String]]
    val indexableHashes = mutable.HashMap.empty[String, Int]
    val indexableReduce = mutable.HashMap.empty[String, Boolean]
    // accumulates across synonym entries, as in the reference (termops.js:392)
    val intersectionText = mutable.ArrayBuffer.empty[Vector[String]]

    for ((rawText, langs) <- texts) {
      var text = rawText.trim
      if (globalReplacer.nonEmpty)
        text = TokenReplace.replaceGlobalTokens(globalReplacer, text).trim

      if (intersections.nonEmpty) {
        var l = intersections.length - 1
        while (l >= 0) {
          val ivariants = TokenReplace.enumerateTokenReplacements(complexReplacer,
            TextNormalize.tokenize(intersections(l)))
          for (iv <- ivariants if !iv.reduceRelevance) {
            val encoded = TextNormalize.normalizeQuery(
              TextNormalize.tokenize(iv.phrase)).tokens
            val itoks = simpleReplacer(encoded)
            // '+' is a separator, so re-mark the intersection head and tail
            intersectionText += (("+intersection" +: itoks.drop(1)) :+ ",")
          }
          l -= 1
        }
      }

      val variants = TokenReplace.enumerateTokenReplacements(complexReplacer,
        TextNormalize.tokenize(text))
      for (variant <- variants) {
        val encoded = TextNormalize.normalizeQuery(
          TextNormalize.tokenize(variant.phrase)).tokens
        val tokens = simpleReplacer(encoded)
        if (tokens.nonEmpty) {
          val keys = mutable.ArrayBuffer(tokens.mkString(" "))
          for (it <- intersectionText) keys += (it ++ tokens).mkString(" ")
          var l = housenumRange.length - 1
          while (l >= 0) {
            keys += (housenumRange(l) +: tokens).mkString(" ")
            l -= 1
          }
          for (key <- keys) {
            val set = indexableText.getOrElseUpdate(key, mutable.LinkedHashSet.empty)
            langs.foreach(set += _)
            if (!indexableReduce.contains(key)) indexableReduce(key) = variant.reduceRelevance
            if (!indexableHashes.contains(key)) indexableHashes(key) = hashes(rawText)
          }
        }
      }
    }

    val out = Vector.newBuilder[IndexableText]
    for ((key, langSet) <- indexableText)
      out += IndexableText(key.split(" ", -1).toVector, langSet.toVector,
        indexableHashes(key), indexableReduce(key))
    out.result()
  }

  /** generateFrequency (reference lib/indexer/indexdocs.js:508-540). */
  def generateFrequency(docs: Iterable[(String, Double)]): Freq = {
    val counts = mutable.HashMap.empty[String, Long]
    var total = 0L
    var maxScore = 0.0
    for ((text, score) <- docs) {
      if (score > maxScore) maxScore = score
      for (terms <- minimalIndexableText(text); term <- terms) {
        counts(term) = counts.getOrElse(term, 0L) + 1
        total += 1
      }
    }
    Freq(counts.toMap, total, maxScore)
  }
}
