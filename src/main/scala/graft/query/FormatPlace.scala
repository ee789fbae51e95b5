package graft.query

import graft.core.{ClosestLang, Fuzzy, Murmur3}

/** place_name assembly — port of the reference getPlaceName
  * (reference lib/geocoder/format-features.js:50-112): either the default
  * "number name, name, ..." join or a geocoder_format template rendered by
  * a small handlebars-subset evaluator — `{{type.name}}` / `{{type.number}}`
  * / `{{type.properties.key}}` / `{{worldview}}` substitutions, the
  * comparison block helpers the reference imports (handlebars-helpers
  * 'comparison' group: eq/ne/is/isnt/gt/gte/lt/lte/and/or/contains, plus
  * if/unless), the built-in `moveNumberToEnd` helper and user-supplied
  * inline helpers (reference lib/util/helpers.js:1-12, opts.formatHelpers)
  * — and the reference's cleanup chain for unfilled placeholders.
  */
object FormatPlace {

  /** One context element: the feature's layer type, display name, its
    * resolved address number ("" when none), and raw feature properties
    * (the `{{type.properties.key}}` template surface).
    */
  final case class CtxFeat(typ: String, name: String, number: String,
                           props: Map[String, String] = Map.empty)

  /** moveNumberToEnd (reference lib/util/helpers.js:5-10): "1 main st" ->
    * "main st 1"; strings with multiple numbers pass through.
    */
  def moveNumberToEnd(s: String): String =
    if (s == null) s
    else s.replaceFirst("^(\\d+) ([^\\d]+)$", "$2 $1")

  // --- handlebars-subset template AST ---
  private sealed trait Node
  private final case class TextN(s: String) extends Node
  private final case class VarN(path: String) extends Node
  private final case class CallN(helper: String, args: Vector[String]) extends Node
  private final case class BlockN(helper: String, args: Vector[String],
                                  body: Vector[Node],
                                  inverse: Vector[Node]) extends Node

  private val mustache =
    "\\{\\{!--[\\s\\S]*?--\\}\\}|\\{\\{[^{}]*\\}\\}".r

  /** Split a mustache body into whitespace-separated args, respecting
    * single/double-quoted string literals.
    */
  private def splitArgs(s: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    val n = s.length
    while (i < n) {
      while (i < n && s.charAt(i).isWhitespace) i += 1
      if (i < n) {
        val c = s.charAt(i)
        if (c == '"' || c == '\'') {
          val end = s.indexOf(c, i + 1)
          val stop = if (end < 0) n else end
          out += s.substring(i, math.min(stop + 1, n))
          i = stop + 1
        } else {
          var j = i
          while (j < n && !s.charAt(j).isWhitespace) j += 1
          out += s.substring(i, j)
          i = j
        }
      }
    }
    out.result()
  }

  private def parse(template: String): Vector[Node] = {
    // token stream: (textBefore, mustacheBody or null)
    val tokens = Vector.newBuilder[Either[String, String]]
    var last = 0
    for (m <- mustache.findAllMatchIn(template)) {
      if (m.start > last) tokens += Left(template.substring(last, m.start))
      tokens += Right(m.matched)
      last = m.end
    }
    if (last < template.length) tokens += Left(template.substring(last))
    val ts = tokens.result()

    var pos = 0
    def parseNodes(inBlock: Boolean): (Vector[Node], Vector[Node], String) = {
      val body = Vector.newBuilder[Node]
      val inverse = Vector.newBuilder[Node]
      var inElse = false
      def add(n: Node): Unit = if (inElse) inverse += n else body += n
      while (pos < ts.length) {
        ts(pos) match {
          case Left(text) => add(TextN(text)); pos += 1
          case Right(raw) =>
            val inner = raw.stripPrefix("{{").stripSuffix("}}").trim
            pos += 1
            if (inner.startsWith("!")) () // comment
            else if (inner.startsWith("#")) {
              val parts = splitArgs(inner.drop(1))
              val (b, inv, _) = parseNodes(inBlock = true)
              add(BlockN(parts.head, parts.tail, b, inv))
            } else if (inner == "else") {
              if (inBlock) inElse = true else add(TextN(""))
            } else if (inner.startsWith("/")) {
              if (inBlock) return (body.result(), inverse.result(), inner.drop(1))
              // stray close tag: drop
            } else {
              val parts = splitArgs(inner)
              if (parts.length <= 1) add(VarN(inner))
              else add(CallN(parts.head, parts.tail))
            }
        }
      }
      (body.result(), inverse.result(), "")
    }
    parseNodes(inBlock = false)._1
  }

  def placeName(context: Vector[CtxFeat], template: String,
                helpers: Map[String, String => String] = Map.empty,
                worldview: String = ""): String = {
    if (template.isEmpty) {
      val prefix = context.headOption.filter(_.number.nonEmpty)
        .map(_.number + " ").getOrElse("")
      (prefix + context.map(_.name).filter(_.nonEmpty).mkString(", ")).trim
    } else {
      val byType = scala.collection.mutable.LinkedHashMap.empty[String, CtxFeat]
      for (f <- context if !byType.contains(f.typ)) byType(f.typ) = f

      // arg resolution: quoted/numeric literal, `worldview`, or a
      // renderObj path (type.name / type.number / type.properties.key)
      def resolve(arg: String): Option[String] = {
        if (arg.length >= 2 &&
          ((arg.head == '"' && arg.last == '"') ||
            (arg.head == '\'' && arg.last == '\'')))
          return Some(arg.substring(1, arg.length - 1))
        if (arg.nonEmpty && (arg.head.isDigit || arg.head == '-') &&
          arg.matches("-?\\d+(\\.\\d+)?")) return Some(arg)
        if (arg == "worldview")
          return if (worldview.nonEmpty) Some(worldview) else None
        val segs = arg.split("\\.", -1)
        byType.get(segs(0)).flatMap { f =>
          segs.toList.drop(1) match {
            case "name" :: Nil => Some(f.name)
            case "number" :: Nil => Some(f.number)
            case "properties" :: rest if rest.nonEmpty =>
              f.props.get(rest.mkString("."))
            case _ => None
          }
        }
      }
      def truthy(v: Option[String]): Boolean = v.exists(_.nonEmpty)
      def numOr(v: Option[String]): Either[String, Double] = {
        val s = v.getOrElse("")
        try Right(s.toDouble) catch { case _: NumberFormatException => Left(s) }
      }
      def cmp(a: Option[String], b: Option[String]): Option[Int] =
        (numOr(a), numOr(b)) match {
          case (Right(x), Right(y)) => Some(java.lang.Double.compare(x, y))
          case _ => for (x <- a; y <- b) yield x.compareTo(y)
        }
      def blockTest(helper: String, args: Vector[String]): Boolean = {
        def a = resolve(args.lift(0).getOrElse(""))
        def b = resolve(args.lift(1).getOrElse(""))
        helper match {
          case "eq" | "is" => a.isDefined && a == b
          case "ne" | "isnt" => a != b
          case "gt" => cmp(a, b).exists(_ > 0)
          case "gte" => cmp(a, b).exists(_ >= 0)
          case "lt" => cmp(a, b).exists(_ < 0)
          case "lte" => cmp(a, b).exists(_ <= 0)
          case "and" => truthy(a) && truthy(b)
          case "or" => truthy(a) || truthy(b)
          case "contains" =>
            (for (x <- a; y <- b) yield x.contains(y)).getOrElse(false)
          case "if" => truthy(a)
          case "unless" => !truthy(a)
          case _ => false
        }
      }
      val allHelpers: Map[String, String => String] =
        helpers + ("moveNumberToEnd" -> (moveNumberToEnd(_)))

      // missing paths render EMPTY, as handlebars does — the cleanup chain
      // below then repairs stray commas/spaces (format-features.js:111)
      val sb = new StringBuilder
      def render(nodes: Vector[Node]): Unit = nodes.foreach {
        case TextN(s) => sb ++= s
        case VarN(path) => sb ++= resolve(path).getOrElse("")
        case CallN(h, args) =>
          allHelpers.get(h) match {
            case Some(fn) =>
              sb ++= fn(resolve(args.headOption.getOrElse("")).getOrElse(""))
            case None => ()
          }
        case BlockN(h, args, body, inverse) =>
          if (blockTest(h, args)) render(body) else render(inverse)
      }
      render(parse(template))

      // cleanup chain (format-features.js:111)
      sb.toString
        .replaceAll("\\{.+?\\}", "")
        .replaceAll(", \\s*$", "")
        .replaceAll(" , ", ", ")
        .replaceAll(" {2}", " ")
        .replaceFirst(", -", ",")
        .replaceAll(", ,", "")
        .replaceFirst("^,", "")
        .replaceFirst(",,", ",")
        .trim
        .replaceFirst(",$", "")
    }
  }

  /** getMatchingText (reference format-features.js:383-479): when the
    * matched synonym differs from the displayed text, recover it via the
    * grid's source phrase hash, breaking hash ties by Levenshtein distance
    * to the cover text; suppressed for category matches and when the match
    * already is the displayed text.
    */
  def getMatchingText(requestedLanguage: Option[String], fullText: String,
                      langTexts: Map[String, String], matchesLanguage: Boolean,
                      sourcePhraseHash: Int, queryText: String,
                      categories: Set[String]): Option[String] = {
    val props: Vector[(String, String)] =
      ("carmen:text" -> fullText) +:
        langTexts.toVector.sortBy(_._1).map { case (k, v) => ("carmen:text_" + k, v) }
    val propMap = props.toMap
    val closest = requestedLanguage.flatMap(l =>
      ClosestLang.closestLangLabel(l.replace("-", "_"), props.map(_._1), "carmen:text_"))
    val textKey = closest.map("carmen:text_" + _).getOrElse("carmen:text")
    val closestTextFull = propMap.getOrElse(textKey, fullText)
    val closestText = closestTextFull.split(",")(0)
    val hasMultiple = closestTextFull.contains(",")
    val langOk = requestedLanguage match {
      case Some(rl) => closest.contains(rl.replace("-", "_"))
      case None => true
    }
    if (matchesLanguage && langOk && !hasMultiple) return None

    val textKeys = props.map(_._1)
    val hashMatches =
      scala.collection.mutable.LinkedHashMap.empty[String, scala.collection.mutable.ArrayBuffer[String]]
    for (key <- textKeys; src <- propMap(key).split(",") if src.nonEmpty) {
      if (Murmur3.phraseHash(src) == sourcePhraseHash)
        hashMatches.getOrElseUpdate(src,
          scala.collection.mutable.ArrayBuffer.empty[String]) += key
    }
    if (hashMatches.isEmpty) return None
    val bestPhrase =
      if (hashMatches.size == 1) hashMatches.head._1
      else {
        val qt = queryText.toLowerCase
        hashMatches.keys.map(a => (a, Fuzzy.levenshtein(qt, a.toLowerCase)))
          .minBy(_._2)._1 // first-encountered min (JS stable sort)
      }
    val matchKeys = hashMatches(bestPhrase).toVector
    var best: Option[String] = requestedLanguage match {
      case Some(rl) =>
        ClosestLang.closestLangLabel(rl.replace("-", "_"), matchKeys, "carmen:text_")
          .map("carmen:text_" + _)
      case None => Some("carmen:text").filter(matchKeys.contains)
    }
    if (best.isEmpty) {
      best =
        if (matchKeys.contains("carmen:text") && matchKeys.size == 1)
          Some("carmen:text")
        else matchKeys.filter(_ != "carmen:text").sorted.headOption
    }
    best.flatMap { b =>
      val matchingText = bestPhrase.trim
      if (b == "carmen:text" && categories.contains(matchingText)) None
      else if (matchingText.isEmpty || matchingText == closestText) None
      else Some(matchingText)
    }
  }
}
