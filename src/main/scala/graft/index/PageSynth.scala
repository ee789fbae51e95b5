package graft.index

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Geom
import graft.model.{GeoDoc, LayerConfig}

/** Deterministic synthetic web-page corpus + geo-entity extraction — the
  * graft input surface (BASELINE.json input_hint): an Iceberg-style table
  * (url, warc_ts, html, text, lang) whose pages embed geo entities; the
  * entities play the role of carmen's GeoJSON docs.
  *
  * The per-url invariant: `text` is carried through extraction byte-
  * identically (tested); carmen-style normalization applies only to the
  * derived index phrases.
  */
object PageSynth {

  /** The deterministic gazetteer: a 4-layer world (country/region/place/
    * street) with nested geometries. Pure data, fixed seed — no external
    * inputs.
    */
  final case class Entity(layer: String, id: Long, name: String, score: Double,
                          geomJson: String, lon: Double, lat: Double)

  private def box(w: Double, s: Double, e: Double, n: Double): String =
    s"""{"type":"Polygon","coordinates":[[[$w,$s],[$e,$s],[$e,$n],[$w,$n],[$w,$s]]]}"""
  private def line(pts: (Double, Double)*): String =
    s"""{"type":"LineString","coordinates":[${pts.map(p => s"[${p._1},${p._2}]").mkString(",")}]}"""
  private def point(lon: Double, lat: Double): String =
    s"""{"type":"Point","coordinates":[$lon,$lat]}"""

  val gazetteer: Vector[Entity] = Vector(
    Entity("country", 1, "United States,US,USA", 1000,
      box(-125, 24, -66, 49), -98, 39),
    Entity("country", 2, "Canada", 800, box(-139, 49, -53, 62), -106, 56),
    Entity("region", 10, "New Jersey,NJ", 400, box(-75.6, 38.9, -73.9, 41.4), -74.5, 40.1),
    Entity("region", 11, "Pennsylvania,PA", 420, box(-80.5, 39.7, -74.7, 42.3), -77.6, 41.0),
    Entity("region", 12, "Texas,TX", 450, box(-106.6, 25.8, -93.5, 36.5), -99.0, 31.2),
    Entity("place", 100, "Englewood", 200, box(-74.05, 40.85, -73.95, 40.95), -74.0, 40.9),
    Entity("place", 101, "Chester", 120, box(-74.75, 40.75, -74.65, 40.85), -74.7, 40.8),
    Entity("place", 102, "Springfield", 150, box(-75.35, 39.9, -75.25, 40.0), -75.3, 39.95),
    Entity("place", 103, "West Town", 90, box(-75.0, 40.0, -74.9, 40.1), -74.95, 40.05),
    Entity("place", 104, "Lakewood", 110, box(-98.6, 29.9, -98.5, 30.0), -98.55, 29.95),
    Entity("street", 1001, "West Lake View Rd", 10,
      line((-74.02, 40.90), (-73.98, 40.91)), -74.0, 40.905),
    Entity("street", 1002, "Main St", 8,
      line((-74.72, 40.78), (-74.68, 40.79)), -74.7, 40.785),
    Entity("street", 1003, "Englewood St", 5,
      line((-75.32, 39.93), (-75.28, 39.94)), -75.3, 39.935),
    Entity("street", 1004, "Fulton St", 6,
      line((-98.58, 29.93), (-98.52, 29.94)), -98.55, 29.935),
    Entity("street", 1005, "Lake View Terrace", 4,
      line((-74.96, 40.03), (-74.92, 40.05)), -74.94, 40.04)
  )

  val layerConfigs: Vector[LayerConfig] = Vector(
    LayerConfig("country", idx = 0, zoom = 6, typ = "country"),
    LayerConfig("region", idx = 1, zoom = 6, typ = "region"),
    LayerConfig("place", idx = 2, zoom = 12, typ = "place"),
    LayerConfig("street", idx = 3, zoom = 14, typ = "street")
  )

  /** Deterministic pages table: page i mentions entity (i % |gazetteer|),
    * with the entity's GeoJSON embedded in a script tag.
    *
    * Allocation-lean by measurement (round-4 ingest-scaling experiment):
    * the per-entity constants (display name, geo payload, url prefix) are
    * precomputed once per partition, the page html is assembled in ONE
    * reused StringBuilder and encoded straight to bytes — no interpolated
    * intermediate String, no stripMargin second copy, no per-row split.
    */
  def pages(spark: SparkSession, nPages: Int): DataFrame = {
    import spark.implicits._
    val gaz = gazetteer
    spark.range(nPages).as[Long].mapPartitions { it =>
      val displays = gaz.map(_.name.split(",")(0))
      val geos = gaz.map(e =>
        s"""{"layer":"${e.layer}","id":${e.id},"name":"${e.name}","score":${e.score},"lon":${e.lon},"lat":${e.lat},"geometry":${e.geomJson}}""")
      val urlPrefixes = gaz.map(e => s"https://example.org/${e.layer}/${e.id}/page-")
      val locSuffixes = gaz.map(e => s". Located at ${e.lon},${e.lat}.")
      val sb = new java.lang.StringBuilder(1024)
      it.map { i =>
        val k = (i % gaz.length).toInt
        val display = displays(k)
        val url = urlPrefixes(k) + i
        // deterministic pseudo-timestamp: seconds offset from a fixed epoch
        val ts = new java.sql.Timestamp(1577836800000L + i * 60000L)
        sb.setLength(0)
        sb.append("<html><head><title>").append(display)
          .append("</title></head><body>\n<h1>").append(display)
          .append("</h1><p>Page ").append(i).append(" about ").append(display)
          .append(".</p>\n<script type=\"application/geo+json\">")
          .append(geos(k))
          .append("</script>\n</body></html>")
        val html = utf8Bytes(sb)
        sb.setLength(0)
        sb.append("Page ").append(i).append(" about ").append(display)
          .append(locSuffixes(k))
        val text = sb.toString
        (url, ts, html, text, "en")
      }
    }.toDF("url", "warc_ts", "html", "text", "lang")
  }

  /** Encode a StringBuilder to UTF-8 without the intermediate String:
    * single-pass ASCII fast path, String fallback otherwise.
    */
  private def utf8Bytes(sb: java.lang.StringBuilder): Array[Byte] = {
    val n = sb.length
    val out = new Array[Byte](n)
    var i = 0
    while (i < n) {
      val c = sb.charAt(i)
      if (c >= 0x80) return sb.toString.getBytes("UTF-8")
      out(i) = c.toByte
      i += 1
    }
    out
  }

  private val GeoScriptOpen =
    "<script type=\"application/geo+json\">".getBytes("UTF-8")
  private val GeoScriptClose = "</script>".getBytes("UTF-8")

  /** Parsed geo payload (mutable holder reused per partition — the row
    * tuple copies the fields out, so reuse is safe).
    */
  private final class GeoPayload {
    var layer: String = null; var id = 0L; var name: String = null
    var score = 0.0; var lon = 0.0; var lat = 0.0; var geometry: String = null
  }

  /** Minimal single-pass JSON scanner for the flat geo payload: scalar
    * fields (string/number, any order) plus raw-span capture of the one
    * nested value ("geometry"). Replaces Jackson readTree in the ingest
    * hot loop — the round-4/5 allocation measurement showed the per-doc
    * node tree + geometry re-serialization dominating ingest allocation
    * (the stage's 8->32 scaling is memory-bandwidth-bound, so bytes/doc
    * is the scaling lever, not just CPU). Standard JSON: whitespace,
    * string escapes, nested objects/arrays in skipped fields all handled;
    * returns false (caller falls back or drops) on malformed input.
    */
  private def parseGeoPayload(b: Array[Byte], from: Int, to: Int,
                              out: GeoPayload): Boolean = {
    // reset the reused holder so a missing field can't inherit the
    // previous row's value
    out.layer = null; out.id = 0L; out.name = null
    out.score = 0.0; out.lon = 0.0; out.lat = 0.0; out.geometry = null
    var i = from
    def skipWs(): Unit = {
      while (i < to && (b(i) == ' ' || b(i) == '\n' || b(i) == '\t' || b(i) == '\r')) i += 1
    }
    // returns the decoded string and advances i past the closing quote
    def readString(): String = {
      if (i >= to || b(i) != '"') return null
      i += 1
      val start = i
      var hasEsc = false
      while (i < to && b(i) != '"') {
        if (b(i) == '\\') { hasEsc = true; i += 2 } else i += 1
      }
      if (i >= to) return null
      val raw = i
      i += 1 // past closing quote
      if (!hasEsc) new String(b, start, raw - start, java.nio.charset.StandardCharsets.UTF_8)
      else {
        val sb = new java.lang.StringBuilder(raw - start)
        var j = start
        while (j < raw) {
          val c = b(j)
          if (c == '\\' && j + 1 < raw) {
            j += 1
            (b(j): @annotation.switch) match {
              case 'n' => sb.append('\n'); case 't' => sb.append('\t')
              case 'r' => sb.append('\r'); case 'b' => sb.append('\b')
              case 'f' => sb.append('\f')
              case 'u' =>
                if (j + 4 < raw) {
                  val hex = new String(b, j + 1, 4, java.nio.charset.StandardCharsets.US_ASCII)
                  sb.append(Integer.parseInt(hex, 16).toChar); j += 4
                }
              case other => sb.append(other.toChar)
            }
            j += 1
          } else {
            // multi-byte UTF-8 inside an escaped string: decode just this
            // one sequence (the remainder may hold more escapes)
            if (c < 0) {
              val len =
                if ((c & 0xE0) == 0xC0) 2
                else if ((c & 0xF0) == 0xE0) 3
                else if ((c & 0xF8) == 0xF0) 4
                else 1
              val end = math.min(j + len, raw)
              sb.append(new String(b, j, end - j, java.nio.charset.StandardCharsets.UTF_8))
              j = end
            } else { sb.append(c.toChar); j += 1 }
          }
        }
        sb.toString
      }
    }
    def readNumber(): Double = {
      val start = i
      while (i < to && (b(i) == '-' || b(i) == '+' || b(i) == '.' ||
        b(i) == 'e' || b(i) == 'E' || (b(i) >= '0' && b(i) <= '9'))) i += 1
      if (i == start) Double.NaN
      else java.lang.Double.parseDouble(
        new String(b, start, i - start, java.nio.charset.StandardCharsets.US_ASCII))
    }
    // skip any JSON value; returns false on malformed input
    def skipValue(): Boolean = {
      skipWs()
      if (i >= to) return false
      b(i) match {
        case '"' => readString() != null
        case '{' | '[' =>
          var depth = 0
          var inStr = false
          while (i < to) {
            val c = b(i)
            if (inStr) {
              if (c == '\\') i += 1
              else if (c == '"') inStr = false
            } else c match {
              case '"' => inStr = true
              case '{' | '[' => depth += 1
              case '}' | ']' =>
                depth -= 1
                if (depth == 0) { i += 1; return true }
              case _ =>
            }
            i += 1
          }
          false
        case _ =>
          while (i < to && b(i) != ',' && b(i) != '}' && b(i) != ']' &&
            b(i) != ' ' && b(i) != '\n' && b(i) != '\t' && b(i) != '\r') i += 1
          true
      }
    }
    skipWs()
    if (i >= to || b(i) != '{') return false
    i += 1
    var done = false
    while (!done) {
      skipWs()
      if (i >= to) return false
      if (b(i) == '}') { i += 1; done = true }
      else {
        val fname = readString()
        if (fname == null) return false
        skipWs()
        if (i >= to || b(i) != ':') return false
        i += 1
        skipWs()
        fname match {
          case "layer" => out.layer = readString(); if (out.layer == null) return false
          case "name" => out.name = readString(); if (out.name == null) return false
          case "id" => out.id = readNumber().toLong
          case "score" => out.score = readNumber()
          case "lon" => out.lon = readNumber()
          case "lat" => out.lat = readNumber()
          case "geometry" =>
            val start = i
            if (!skipValue()) return false
            out.geometry = new String(b, start, i - start,
              java.nio.charset.StandardCharsets.UTF_8)
          case _ => if (!skipValue()) return false
        }
        skipWs()
        if (i < to && b(i) == ',') i += 1
      }
    }
    out.layer != null && out.name != null && out.geometry != null
  }

  private def indexOfBytes(hay: Array[Byte], needle: Array[Byte], from: Int): Int = {
    val limit = hay.length - needle.length
    var i = math.max(from, 0)
    while (i <= limit) {
      var j = 0
      while (j < needle.length && hay(i + j) == needle(j)) j += 1
      if (j == needle.length) return i
      i += 1
    }
    -1
  }

  /** Extraction job: pages -> (layer, GeoDoc) rows + pass-through text.
    * Deterministic, one pass, no shuffle; dedup by (layer, id) happens in a
    * single aggregate.
    *
    * The hot loop is allocation-lean by design (the ingest stage is the
    * most 100 TB-shaped path): the geo payload is located with a byte-level
    * marker scan — no full-page String materialization, no DOTALL regex —
    * and the single-pass scanner parses the payload span directly from the
    * page bytes (no per-doc node tree).
    */
  def extract(spark: SparkSession, pages: DataFrame): DataFrame = {
    import spark.implicits._
    val parsed = pages.select(col("url"), col("html"), col("text")).as[(String, Array[Byte], String)]
      .mapPartitions { it =>
        // one reusable payload holder per partition; per-doc allocation is
        // the output strings only (no Jackson node tree, no geometry
        // re-serialization — the measured ingest allocation hot spot)
        val payload = new GeoPayload
        it.flatMap { case (url, html, text) =>
          val open = indexOfBytes(html, GeoScriptOpen, 0)
          if (open < 0) None
          else {
            val jsonStart = open + GeoScriptOpen.length
            val end = indexOfBytes(html, GeoScriptClose, jsonStart)
            if (end < 0) None
            else if (parseGeoPayload(html, jsonStart, end, payload))
              Some((url, text, payload.layer, payload.id, payload.name,
                payload.score, payload.geometry, payload.lon, payload.lat))
            else None
          }
        }
      }
      .toDF("url", "text", "layer", "id", "name", "score", "geometry", "lon", "lat")
    parsed
  }

  /** Distinct geo docs per layer from the extraction output. */
  def docsByLayer(spark: SparkSession, extracted: DataFrame): Map[String, org.apache.spark.sql.Dataset[GeoDoc]] = {
    import spark.implicits._
    layerConfigs.map { cfg =>
      cfg.name -> extracted.where(col("layer") === cfg.name)
        .groupBy(col("id"))
        .agg(first(col("name")).as("text"), first(col("score")).as("score"),
          first(col("geometry")).as("geometry"),
          first(col("lon")).as("centerLon"), first(col("lat")).as("centerLat"))
        .select(col("id"), col("text"), col("score"), col("geometry"),
          col("centerLon"), col("centerLat"))
        .as[(Long, String, Double, String, Double, Double)]
        .map { case (id, text, score, geom, lon, lat) =>
          GeoDoc(id, text, score, geom, lon, lat)
        }
    }.toMap
  }

  /** Convenience: build the full index from n synthetic pages. */
  def buildIndex(spark: SparkSession, nPages: Int): IndexBuilder.CarmenIndex = {
    val p = pages(spark, nPages)
    val docs = docsByLayer(spark, extract(spark, p))
    IndexBuilder.build(spark, layerConfigs.map(c => (c, docs(c.name))))
  }
}
