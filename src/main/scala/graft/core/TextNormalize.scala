package graft.core

import java.util.regex.Pattern
import scala.collection.mutable
import scala.io.Source

/** Tokenized query IR (reference lib/text-processing/token.js:19-27). */
final case class TokenizedQuery(
    tokens: Vector[String],
    separators: Vector[String],
    owner: Vector[Int],
    lastWord: Boolean
)

/** Byte-exact port of the reference text-normalization surface
  * (reference lib/text-processing/termops.js:158-268,
  * lib/text-processing/remove-diacritics.js). This defines the per-url
  * byte-identity invariant: same Unicode classes, same replacement ordering,
  * same tokenizer state machine.
  */
object TextNormalize {
  val MaxQueryTokens = 20 // reference lib/constants.js:8

  /** JS \s with the 'u' flag (explicit, Java's \s differs). */
  private val JsWhitespace =
    "\\u0009-\\u000D\\u0020\\u00A0\\u1680\\u2000-\\u200A\\u2028\\u2029\\u202F\\u205F\\u3000\\uFEFF"

  /** WORD_SEPARATOR char-class body (reference termops.js:158-185). */
  val WordSeparator: String =
    JsWhitespace +
      "\\u2000-\\u206F" + // General Punctuation
      "\\u2E00-\\u2E7F" + // Supplemental Punctuation
      "\\u0021-\\u002F" + // !"#$%&'()*+-./,
      "\\u003A-\\u0040" + // :;<=>?@
      "\\u005B-\\u0060" + // [\]^_`
      "\\u007B-\\u007E" + // {|}~
      "\\uFF01-\\uFF0F" + // fullwidth forms
      "\\uFF1A-\\uFF20" +
      "\\uFF3B-\\uFF40" +
      "\\uFF5B-\\uFF65"

  private val apostrophes = Pattern.compile("[‘’ʼʻ＇'.^]")
  private val leadingSep = Pattern.compile(s"^[$WordSeparator]+")
  private val stickyToken = Pattern.compile(s"\\G([^$WordSeparator]+)([$WordSeparator]+|\\z)")
  private val numberCompound = Pattern.compile("^(\\d+)(-|/)(\\d+)((-|/)(\\d+))?[a-z]?$")

  @inline private def isCJK(c: Char): Boolean = c >= '一' && c <= '鿿'

  /** JS String.split with a single-char capturing group: returns alternating
    * non-matching segments and matched chars, including empty segments.
    */
  private def jsSplitKeep(s: String, isSep: Char => Boolean): Vector[String] = {
    val out = mutable.ArrayBuffer.empty[String]
    val cur = new StringBuilder
    s.foreach { c =>
      if (isSep(c)) {
        out += cur.toString; cur.clear()
        out += c.toString
      } else cur += c
    }
    out += cur.toString
    out.toVector
  }

  // --- diacritics ------------------------------------------------------

  private lazy val diaMap: Map[Char, String] = {
    val src = Source.fromInputStream(
      getClass.getResourceAsStream("/graft/diacritics.tsv"), "UTF-8")
    try src.getLines().map { line =>
      val Array(cp, repl) = line.split("\t", 2)
      (Integer.parseInt(cp, 16).toChar, repl)
    }.toMap
    finally src.close()
  }

  /** removeDiacritics (reference lib/text-processing/remove-diacritics.js):
    * table-fold then strip combining marks U+0300-036F that follow a
    * non-whitespace char.
    */
  def removeDiacritics(s: String): String = {
    val folded = new StringBuilder(s.length)
    s.foreach { c =>
      diaMap.get(c) match {
        case Some(r) => folded ++= r
        case None    => folded += c
      }
    }
    // (\S)([̀-ͯ]+) -> $1 : combining marks after non-whitespace drop
    val in = folded.toString
    val out = new StringBuilder(in.length)
    var i = 0
    while (i < in.length) {
      val c = in.charAt(i)
      val isCombining = c >= '̀' && c <= 'ͯ'
      if (isCombining && out.nonEmpty && !isJsSpace(out.charAt(out.length - 1))) {
        // drop
      } else out += c
      i += 1
    }
    out.toString
  }

  @inline private def isJsSpace(c: Char): Boolean =
    (c >= '\u0009' && c <= '\u000D') || c == '\u0020' || c == '\u00A0' ||
      c == '\u1680' || (c >= '\u2000' && c <= '\u200A') || c == '\u2028' ||
      c == '\u2029' || c == '\u202F' || c == '\u205F' || c == '\u3000' ||
      c == '\uFEFF' 

  // --- emoji -----------------------------------------------------------

  /** removeEmoji (reference termops.js:61-63). Hand-rolled scanner because
    * the JS pattern uses lone-surrogate alternations Java regex rejects.
    */
  def removeEmoji(str: String): String = {
    val out = new StringBuilder(str.length)
    var i = 0
    val n = str.length
    @inline def isVariant(c: Char) = c >= '︀' && c <= '﻿'
    while (i < n) {
      val c = str.charAt(i)
      // ([#0-9]⃣)
      if ((c == '#' || (c >= '0' && c <= '9')) && i + 1 < n && str.charAt(i + 1) == '⃣') {
        i += 2
      } else if (c == '©' || c == '®' || c == '‼' ||
        (c >= '⁇' && c <= '⁉') || c == '™' || c == 'ℹ' ||
        c == '〰' || c == '〽' || c == '㊗' || c == '㊙' ||
        (c >= '←' && c <= '⇿') || (c >= '⌀' && c <= '⏿') ||
        (c >= '①' && c <= '⓿') || (c >= '■' && c <= '◿') ||
        (c >= '☀' && c <= '➿') || (c >= '⤀' && c <= '⥿') ||
        (c >= '⬀' && c <= '⯰')) {
        i += 1
        if (i < n && isVariant(str.charAt(i))) i += 1
      } else if ((c == '\uD83C' && i + 1 < n && str.charAt(i + 1) >= '\uDC00' && str.charAt(i + 1) <= '\uDFFF') ||
        (c == '\uD83D' && i + 1 < n && str.charAt(i + 1) >= '\uDC00' && str.charAt(i + 1) <= '\uDEFF')) {
        i += 2
        if (i < n && isVariant(str.charAt(i))) i += 1
      } else {
        out += c
        i += 1
      }
    }
    out.toString
  }

  // --- tokenize --------------------------------------------------------

  /** tokenize (reference termops.js:194-268). */
  def tokenize(query: String): TokenizedQuery = {
    val tokens = mutable.ArrayBuffer.empty[String]
    val separators = mutable.ArrayBuffer.empty[String]

    var normalized = query.toLowerCase(java.util.Locale.ROOT)
    normalized = apostrophes.matcher(normalized).replaceAll("")
    normalized = leadingSep.matcher(normalized).replaceFirst("")

    val m = stickyToken.matcher(normalized)
    var tail: Option[(String, String)] = None
    var pos = 0
    var continue = true
    while (continue && pos <= normalized.length) {
      m.region(pos, normalized.length)
      if (m.lookingAt()) {
        var t = m.group(1)
        val s = m.group(2)
        pos = m.end
        if (pos == m.start) continue = false // zero-width safety

        tail match {
          case Some((tt, ts)) =>
            if (ts == "-" || ts == "/") {
              val combined = tt + ts + t
              if (numberCompound.matcher(combined).matches()) t = combined
              else { tokens += tt; separators += ts }
            } else { tokens += tt; separators += ts }
          case None =>
        }
        tail = None

        if (t.nonEmpty && removeEmoji(t).nonEmpty) {
          val sub = jsSplitKeep(t, isCJK)
          if (sub.length > 1) {
            sub.foreach { st =>
              if (st.nonEmpty) { tokens += st; separators += "" }
            }
          } else if (s == "-" || s == "/") {
            tail = Some((t, s))
          } else {
            tokens += t
            separators += s
          }
        }
      } else continue = false
    }
    tail.foreach { case (tt, ts) => tokens += tt; separators += ts }

    TokenizedQuery(tokens.toVector, separators.toVector,
      tokens.indices.toVector, lastWord = false)
  }

  private val wsRun = Pattern.compile(s"[$JsWhitespace]+")

  /** JS String.trim / \s semantics (Unicode whitespace incl. NBSP, BOM). */
  private def jsTrim(s: String): String = {
    var a = 0
    var b = s.length
    while (a < b && isJsSpace(s.charAt(a))) a += 1
    while (b > a && isJsSpace(s.charAt(b - 1))) b -= 1
    s.substring(a, b)
  }

  /** normalizeText (reference termops.js:123-125). */
  def normalizeText(s: String): String =
    wsRun.matcher(jsTrim(removeEmoji(removeDiacritics(s)))).replaceAll(" ")

  /** normalizeQuery (reference termops.js:72-115). */
  def normalizeQuery(q: TokenizedQuery): TokenizedQuery = {
    val tokens = mutable.ArrayBuffer.empty[String]
    val owner = mutable.ArrayBuffer.empty[Int]
    val separators = mutable.ArrayBuffer.empty[String]
    var i = 0
    var break = false
    while (i < q.tokens.length && !break) {
      val tok = q.tokens(i)
      if (tok.isEmpty) { /* removed by replacement */ }
      else if (tokens.length == MaxQueryTokens) break = true
      else {
        var handled = false
        if (tok.contains(' ')) {
          val words = tok.split(" ", -1)
          if (tokens.length + words.length <= MaxQueryTokens) {
            words.foreach { w =>
              tokens += normalizeText(w); owner += q.owner(i); separators += " "
            }
            handled = true
          }
        }
        if (!handled) {
          val words = jsSplitKeep(tok, isCJK)
          if (words.length > 1 && tokens.length + words.length <= MaxQueryTokens) {
            words.foreach { w =>
              if (w.nonEmpty) {
                tokens += normalizeText(w); owner += q.owner(i); separators += ""
              }
            }
          } else {
            tokens += normalizeText(tok)
            separators += q.separators(i)
            owner += q.owner(i)
          }
        }
      }
      i += 1
    }
    TokenizedQuery(tokens.toVector, separators.toVector, owner.toVector, q.lastWord)
  }

  // --- number tokens ---------------------------------------------------

  /** numTokenV3 "waffle" (reference termops.js:950-958). */
  def numTokenV3(str: String): String = {
    if (str.isEmpty) return ""
    if (str.length == 1) return "#"
    if (str.length == 2) return "##"
    val lead = if (str.length == 3) 1 else 2
    str.substring(0, lead) + "#" * (str.length - lead)
  }

  private val addressPattern = Pattern.compile(
    "^\\d+[a-z]?$|^(\\d+)-(\\d+)[a-z]?$|^(\\d+)([nsew])(\\d+)[a-z]?$|^([nesw])(\\d+)([nesw]\\d+)?$|^\\d+(к\\d+)?(с\\d+)?$")

  /** House-number detector (reference termops.js:276-291). */
  def isAddressNumber(token: String): Boolean = addressPattern.matcher(token).matches()

  /** parseSemiNumber (reference termops.js:613-622): Russian-style strings
    * (containing с/к) parse leading digits only; otherwise all non-digits
    * are stripped first ("9th" -> 9).
    */
  def parseSemiNumber(s: String): Option[Long] = {
    @inline def ascii(c: Char) = c >= '0' && c <= '9' // JS \d is ASCII-only
    val cleaned =
      if (s.exists(c => c == 'с' || c == 'к')) s.takeWhile(ascii)
      else s.filter(ascii)
    if (cleaned.isEmpty) None
    else
      try Some(java.lang.Long.parseLong(cleaned.take(18)))
      catch { case _: NumberFormatException => None }
  }

  def phraseHash(phrase: String): Int = Murmur3.phraseHash(phrase)
}
