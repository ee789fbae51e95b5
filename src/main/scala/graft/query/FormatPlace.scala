package graft.query

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
}
