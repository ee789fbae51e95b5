package graft.core

import java.util.regex.Pattern
import scala.collection.mutable

/** Value side of a geocoder_tokens entry (reference
  * lib/text-processing/token.js ReplaceRule inputs). A bare-string config
  * value maps to `TokenSpec(text, plain = true)`; an object value carries
  * the extra options and `plain = false`.
  */
final case class TokenSpec(
    text: String,
    plain: Boolean = true,
    regex: Boolean = false,
    spanBoundaries: Option[Int] = None,
    skipBoundaries: Boolean = false,
    skipDiacriticStripping: Boolean = false,
    reduceRelevance: Boolean = false
)

/** A compiled replace rule (reference token.js:10-17).
  *
  * @param pattern  for word-anchored rules the source is compiled with a
  *                 trailing `\z` and applied with `lookingAt()` — the Java
  *                 equivalent of the reference's sticky `from + "$"` regex
  *                 (token.js:119); for `skipBoundaries` rules the raw source
  *                 applied globally (token.js:117)
  */
final case class ReplaceRule(
    pattern: Pattern,
    isGlobal: Boolean,
    spanBoundaries: Option[Int],
    to: String,
    inverse: Boolean,
    reduceRelevance: Boolean,
    fromSrc: String
)

/** Simple whole-word dictionary replacer (reference token.js:159-175). */
final case class SimpleReplacer(tokens: Map[String, String]) {
  def apply(words: Vector[String]): Vector[String] =
    words.map(w => tokens.getOrElse(w, w))
}

/** Ports of the reference token-replacement surface
  * (reference lib/text-processing/token.js:41-487): createSimpleReplacer,
  * createComplexReplacer, replaceToken, enumerateTokenReplacements,
  * createGlobalReplacer/replaceGlobalTokens, categorizeTokenReplacements.
  */
object TokenReplace {

  private val strippable = Pattern.compile("[‘’ʼʻ＇'.^]")
  private val jsFlags = Pattern.CASE_INSENSITIVE | Pattern.UNICODE_CASE

  /** escapeRegExp (reference lib/text-processing/closest-lang.js:84-86). */
  def escapeRegExp(str: String): String =
    str.replaceAll("[.*+?^${}()|\\[\\]\\\\]", "\\\\$0")

  /** Sanitize a JS replacement string for Java's appendReplacement:
    * backslashes become literal; `$` not starting a group ref becomes literal.
    */
  private def javaReplacement(to: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < to.length) {
      val c = to.charAt(i)
      if (c == '\\') sb.append("\\\\")
      else if (c == '$') {
        val next = if (i + 1 < to.length) to.charAt(i + 1) else ' '
        if (next.isDigit || next == '{') sb.append('$') else sb.append("\\$")
      } else sb.append(c)
      i += 1
    }
    sb.toString
  }

  /** createComplexReplacer (reference token.js:41-146). */
  def createComplexReplacer(tokens0: Seq[(String, TokenSpec)],
                            includeUnambiguous: Boolean = false,
                            includeRelevanceReduction: Boolean = false): Vector[ReplaceRule] = {
    val entries = mutable.ArrayBuffer.empty[(String, TokenSpec)]
    entries ++= tokens0
    val isInverse = mutable.HashSet.empty[String]

    if (includeUnambiguous) {
      // collect to -> [from-spec]; unique tos that aren't froms get inverted
      val froms = tokens0.map(_._1).toSet
      val tos = mutable.LinkedHashMap.empty[String, mutable.ArrayBuffer[TokenSpec]]
      for ((fromStr, spec) <- tokens0) {
        val (toKey, fromSpec) =
          if (!spec.plain) (spec.text, spec.copy(text = fromStr))
          else (spec.text, TokenSpec(fromStr))
        tos.getOrElseUpdate(toKey, mutable.ArrayBuffer.empty) += fromSpec
      }
      for ((to, fromSpecs) <- tos) {
        if (fromSpecs.length == 1 && !froms.contains(to) &&
          !to.exists(c => c == '(' || c == ')' || c == '$')) {
          entries += ((to, fromSpecs.head))
          isInverse += to
        }
      }
    }

    val replacers = mutable.ArrayBuffer.empty[ReplaceRule]
    for ((fromStr0, spec) <- entries) {
      var from = fromStr0
      var proceed = true
      if (!spec.plain && spec.text == null) proceed = false
      if (proceed && !spec.plain && spec.reduceRelevance && !includeRelevanceReduction) proceed = false
      if (proceed) {
        val origTo = spec.text.toLowerCase(java.util.Locale.ROOT)
        if (!spec.regex) from = strippable.matcher(from).replaceAll("")
        val inverse = isInverse.contains(from)

        var u = 0
        while (u < 2) {
          var skip = false
          if (u == 1) {
            val stripped = TextNormalize.removeDiacritics(from)
            if (from == stripped || spec.skipDiacriticStripping) skip = true
            else from = stripped.toLowerCase(java.util.Locale.ROOT)
          }
          if (!skip) {
            val src = if (spec.regex) from else escapeRegExp(from)
            val rule =
              if (spec.skipBoundaries)
                ReplaceRule(Pattern.compile(src, jsFlags), isGlobal = true,
                  spanBoundaries = None, to = origTo, inverse = inverse,
                  reduceRelevance = spec.reduceRelevance && includeRelevanceReduction,
                  fromSrc = from)
              else
                ReplaceRule(Pattern.compile(src + "\\z", jsFlags), isGlobal = false,
                  spanBoundaries = Some(spec.spanBoundaries.getOrElse(
                    from.split("\\s", -1).length - 1)),
                  to = origTo, inverse = inverse,
                  reduceRelevance = spec.reduceRelevance && includeRelevanceReduction,
                  fromSrc = from)
            replacers += rule
          }
          u += 1
        }
      }
    }

    // stable: non-global first, then by replacement length (token.js:139-143)
    replacers.toVector.sortBy(r => (r.isGlobal, r.to.length))
  }

  /** createSimpleReplacer (reference token.js:159-175). */
  def createSimpleReplacer(pairs: Seq[(String, String)]): SimpleReplacer =
    SimpleReplacer(pairs.map { case (f, t) =>
      (f.toLowerCase(java.util.Locale.ROOT), t.toLowerCase(java.util.Locale.ROOT))
    }.toMap)

  /** Anchored (sticky `from$`) replace: Some(replaced) iff the rule matches
    * at position 0 through the end of `part`.
    */
  private def stickyReplace(rule: ReplaceRule, part: String): Option[String] = {
    val m = rule.pattern.matcher(part)
    if (m.lookingAt()) {
      val sb = new java.lang.StringBuffer
      m.appendReplacement(sb, javaReplacement(rule.to))
      m.appendTail(sb)
      Some(sb.toString)
    } else None
  }

  /** replaceToken (reference token.js:185-233). */
  def replaceToken(replacements: Seq[ReplaceRule], query: TokenizedQuery): TokenizedQuery = {
    val tokens = query.tokens.toArray
    val owner = query.owner.toArray
    var lastWord = query.lastWord
    val l = tokens.length

    var i = 0
    while (i < l) {
      for (rule <- replacements) {
        val cnt = 1 + rule.spanBoundaries.getOrElse(0)
        if (cnt > 1 && i + cnt <= l) {
          // multi-token window: join with separators, anchored replace
          val sb = new StringBuilder
          var j = i
          while (j < i + cnt - 1) {
            sb.append(tokens(j)).append(query.separators(j)); j += 1
          }
          sb.append(tokens(i + cnt - 1))
          stickyReplace(rule, sb.toString) match {
            case Some(replaced) =>
              tokens(i) = replaced
              var j2 = i + 1
              while (j2 < i + cnt) { tokens(j2) = ""; owner(j2) = i; j2 += 1 }
              if (i + cnt == l) lastWord = true
            case None =>
          }
        } else {
          if (rule.isGlobal) {
            val replaced = rule.pattern.matcher(tokens(i)).replaceAll(javaReplacement(rule.to))
            if (replaced != tokens(i)) tokens(i) = replaced
          } else {
            stickyReplace(rule, tokens(i)) match {
              case Some(replaced) =>
                tokens(i) = replaced
                if (i + 1 == l) lastWord = true
              case None =>
            }
          }
        }
      }
      i += 1
    }
    TokenizedQuery(tokens.toVector, query.separators, owner.toVector, lastWord)
  }

  final case class Variant(phrase: String, reduceRelevance: Boolean)

  /** enumerateTokenReplacements (reference token.js:247-347), including its
    * offset-reset recursion and depth/output caps.
    */
  def enumerateTokenReplacements(replacers: Vector[ReplaceRule],
                                 text: TokenizedQuery): Vector[Variant] = {
    if (text.tokens.isEmpty) return Vector.empty
    val outLimit = 8
    val depthLimit = 8

    final case class Term(t: String, l: Int, d: Int, reduceRelevance: Boolean)
    val terms = Array.fill(text.tokens.length)(mutable.ArrayBuffer.empty[Term])
    for (i <- text.tokens.indices)
      terms(i) += Term(text.tokens(i), 1, 0, reduceRelevance = false)

    // (tokens, separators, changes)
    def replace(rs: Vector[ReplaceRule], tTokens: Vector[String],
                tSeps: Vector[String], tChanges: Option[Int], offset: Int): Unit = {
      if (rs.isEmpty) return
      var k = 0
      while (k < rs.length) {
        val rule = rs(k)
        val cnt = 1 + rule.spanBoundaries.getOrElse(0)
        var i = 0
        while (i < tTokens.length) {
          val segTokens = tTokens.slice(i, i + cnt)
          val segSeps = tSeps.slice(i, i + cnt)
          val segment = TokenizedQuery(segTokens, segSeps,
            segTokens.indices.toVector, lastWord = false)
          val altered = replaceToken(Seq(rule), segment)
          if (altered.tokens.head != tTokens(i)) {
            val changes =
              if (rule.inverse) tChanges.map(_ - 1).getOrElse(-1)
              else tChanges.map(_ + 1).getOrElse(1)
            terms(i + offset) += Term(altered.tokens.head, cnt, changes,
              rule.reduceRelevance)
            if (terms(i + offset).length < depthLimit) {
              // faithful to the reference: the recursion's offset is the
              // local i, not i + offset (token.js:303)
              replace(rs.drop(k + 1).filter(v => rule.to != v.fromSrc),
                altered.tokens, altered.separators, Some(changes), i)
            }
          }
          i += 1
        }
        k += 1
      }
    }
    replace(replacers, text.tokens, text.separators, None, 0)

    // most-replaced variants first; shorter text breaks ties (stable)
    val sorted = terms.map(buf => buf.sortBy(t => (-t.d, t.t.length)))

    val out = mutable.ArrayBuffer.empty[Variant]
    def assemble(i: Int, o: String, reduceRel: Boolean): Unit = {
      var j = 0
      val len = sorted(i).length
      while (j < len) {
        if (out.length >= outLimit) return
        val term = sorted(i)(j)
        val r = if (term.reduceRelevance) true else reduceRel
        // JS-falsy: an empty accumulated phrase restarts like the first token
        val s = if (o == null || o.isEmpty) term.t else s"$o ${term.t}"
        if (i + term.l < sorted.length) assemble(i + term.l, s, r)
        else out += Variant(s, r)
        j += 1
      }
    }
    assemble(0, null, reduceRel = false)
    out.toVector
  }

  /** createGlobalReplacer (reference token.js:386-401). */
  def createGlobalReplacer(patterns: Seq[(String, String)]): Vector[ReplaceRule] =
    patterns.map { case (from, to) =>
      ReplaceRule(Pattern.compile(from, jsFlags), isGlobal = true,
        spanBoundaries = None, to = to, inverse = false,
        reduceRelevance = false, fromSrc = from)
    }.toVector

  /** replaceGlobalTokens (reference token.js:410-415). */
  def replaceGlobalTokens(replacers: Seq[ReplaceRule], text: String): String = {
    var t = text
    for (r <- replacers)
      t = r.pattern.matcher(t).replaceAll(javaReplacement(r.to))
    t
  }

  /** simplify (reference token.js:423-425). */
  private def simplify(s: String): String =
    TextNormalize.removeDiacritics(
      strippable.matcher(s.toLowerCase(java.util.Locale.ROOT)).replaceAll(""))

  private val innerWordBoundary = Pattern.compile("[^-\\s][-\\s][^-\\s]", jsFlags)
  private val groupRef = Pattern.compile("\\$(\\d+|\\{\\w+\\})")

  /** categorizeTokenReplacements (reference token.js:439-487). */
  def categorizeTokenReplacements(tokens: Seq[(String, TokenSpec)])
    : (Vector[(String, String)], Vector[(String, TokenSpec)]) = {
    val simple = Vector.newBuilder[(String, String)]
    val complex = Vector.newBuilder[(String, TokenSpec)]
    for ((from, spec) <- tokens) {
      val isComplex =
        spec.spanBoundaries.exists(_ != 0) ||
          spec.skipBoundaries || spec.skipDiacriticStripping || spec.regex ||
          (spec.plain && (
            groupRef.matcher(spec.text).find() ||
              innerWordBoundary.matcher(from).find() ||
              innerWordBoundary.matcher(spec.text).find()))
      if (isComplex) complex += ((from, spec))
      else {
        val sTo = simplify(spec.text)
        val sFrom = simplify(from)
        if (sTo != sFrom) simple += ((sFrom, sTo))
      }
    }
    (simple.result(), complex.result())
  }
}
