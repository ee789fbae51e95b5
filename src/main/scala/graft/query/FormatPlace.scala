package graft.query

import graft.core.{ClosestLang, Fuzzy, Murmur3}

/** place_name assembly — port of the reference getPlaceName
  * (reference lib/geocoder/format-features.js:50-112): either the default
  * "number name, name, ..." join or a geocoder_format template with
  * `{{type.name}}` / `{{type.number}}` substitutions and the reference's
  * cleanup chain for unfilled placeholders.
  */
object FormatPlace {

  /** One context element: the feature's layer type, display name, and its
    * resolved address number ("" when none).
    */
  final case class CtxFeat(typ: String, name: String, number: String)

  private val placeholder = "\\{\\{([A-Za-z0-9_]+)\\.([A-Za-z0-9_]+)\\}\\}".r

  def placeName(context: Vector[CtxFeat], template: String): String = {
    if (template.isEmpty) {
      val prefix = context.headOption.filter(_.number.nonEmpty)
        .map(_.number + " ").getOrElse("")
      (prefix + context.map(_.name).filter(_.nonEmpty).mkString(", ")).trim
    } else {
      val byType = scala.collection.mutable.LinkedHashMap.empty[String, CtxFeat]
      for (f <- context if !byType.contains(f.typ)) byType(f.typ) = f
      val rendered = placeholder.replaceAllIn(template, m => {
        val out = byType.get(m.group(1)) match {
          case Some(f) if m.group(2) == "name" => f.name
          case Some(f) if m.group(2) == "number" => f.number
          case _ => "{}" // unfilled -> removed by the cleanup chain
        }
        java.util.regex.Matcher.quoteReplacement(out)
      })
      // cleanup chain (format-features.js:111)
      rendered
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
