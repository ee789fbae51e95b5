package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
import graft.model.{GeoDoc, LayerConfig}
import scala.jdk.CollectionConverters._

/** Carmen-compatible document export/import + directory source loader
  * (I17 + S3): a layer round-trips through carmen-style GeoJSON features
  * with the reference's storable-property whitelist, and a directory of
  * sources loads back into (LayerConfig, Dataset[GeoDoc]) pairs ready for
  * IndexBuilder.build (reference lib/util/feature.js:263-311,
  * lib/sources/loader.js:9-35).
  *
  * On-disk layout (the engine's analog of a tilelive source directory —
  * one subdirectory per source):
  * {{{
  *   dir/<source>/config.json   # LayerConfig fields (geocoder_* naming)
  *   dir/<source>/docs.jsonl    # one carmen GeoJSON feature per line
  * }}}
  */
object CarmenSource {

  private val KnownCarmen: Set[String] = Set(
    "carmen:reverse_only", "carmen:score", "carmen:types", "carmen:center",
    "carmen:geocoder_stack")
  private val FeatureOnlyCarmen: Set[String] = Set(
    "carmen:addressprops", "carmen:addressnumber", "carmen:address_style",
    "carmen:address_styles", "carmen:intersections", "carmen:rangetype",
    "carmen:parityl", "carmen:parityr", "carmen:lfromhn", "carmen:rfromhn",
    "carmen:ltohn", "carmen:rtohn", "carmen:zxy", "carmen:proximity_radius")

  /** storableProperties (reference feature.js:263-311): nulls drop,
    * non-carmen props keep, carmen:text* / carmen:format* keep, whitelisted
    * carmen:* keep — the feature-only set only when `typ != "vector"`.
    */
  def storableKeep(key: String, isNull: Boolean, typ: String = "feature"): Boolean = {
    if (isNull) false
    else if (!key.startsWith("carmen:")) true
    else if (key.startsWith("carmen:text")) true
    else if (key.startsWith("carmen:format")) true
    else if (KnownCarmen.contains(key)) true
    else if (FeatureOnlyCarmen.contains(key)) typ != "vector"
    else false
  }

  // ---------------------------------------------------------------- export

  private def nestedArr(mapper: ObjectMapper, v: Seq[Seq[String]]): ArrayNode = {
    val outer = mapper.createArrayNode()
    v.foreach { inner =>
      // empty inner vectors mark the reference's null entries
      if (inner == null || inner.isEmpty) outer.addNull()
      else {
        val a = mapper.createArrayNode()
        inner.foreach(a.add)
        outer.add(a)
      }
    }
    outer
  }

  /** One GeoDoc as a carmen GeoJSON feature line. */
  def toCarmenJson(mapper: ObjectMapper, d: GeoDoc): String = {
    val f = mapper.createObjectNode()
    f.put("id", d.id)
    f.put("type", "Feature")
    val props = f.putObject("properties")
    props.put("carmen:text", d.text)
    props.put("carmen:score", d.score)
    val center = props.putArray("carmen:center")
    center.add(d.centerLon); center.add(d.centerLat)
    if (d.types.nonEmpty) {
      val t = props.putArray("carmen:types"); d.types.foreach(t.add)
    }
    d.langTexts.toVector.sortBy(_._1).foreach { case (lang, text) =>
      props.put(s"carmen:text_$lang", text)
    }
    d.overrides.toVector.sortBy(_._1).foreach { case (k, v) => props.put(k, v) }
    if (d.addressnumber.nonEmpty)
      props.set[JsonNode]("carmen:addressnumber", nestedArr(mapper, d.addressnumber))
    if (d.rangetype.nonEmpty) props.put("carmen:rangetype", d.rangetype)
    if (d.lfromhn.nonEmpty) props.set[JsonNode]("carmen:lfromhn", nestedArr(mapper, d.lfromhn))
    if (d.ltohn.nonEmpty) props.set[JsonNode]("carmen:ltohn", nestedArr(mapper, d.ltohn))
    if (d.rfromhn.nonEmpty) props.set[JsonNode]("carmen:rfromhn", nestedArr(mapper, d.rfromhn))
    if (d.rtohn.nonEmpty) props.set[JsonNode]("carmen:rtohn", nestedArr(mapper, d.rtohn))
    if (d.parityl.nonEmpty) props.set[JsonNode]("carmen:parityl", nestedArr(mapper, d.parityl))
    if (d.parityr.nonEmpty) props.set[JsonNode]("carmen:parityr", nestedArr(mapper, d.parityr))
    if (d.intersections.nonEmpty)
      props.set[JsonNode]("carmen:intersections", nestedArr(mapper, d.intersections))
    if (d.addressprops.nonEmpty) {
      val ap = props.putObject("carmen:addressprops")
      d.addressprops.toVector.sortBy(_._1).foreach { case (prop, m) =>
        val o = ap.putObject(prop)
        // "" encodes the reference's null (delete the base prop)
        m.toVector.sortBy(_._1).foreach { case (i, v) =>
          if (v.isEmpty) o.putNull(i.toString) else o.put(i.toString, v)
        }
      }
    }
    f.set[JsonNode]("geometry", mapper.readTree(d.geometry))
    mapper.writeValueAsString(f)
  }

  /** Export a layer's docs as carmen GeoJSON lines: (id, json). */
  def exportDocs(spark: SparkSession, docs: Dataset[GeoDoc]): DataFrame = {
    import spark.implicits._
    docs.mapPartitions { it =>
      val mapper = new ObjectMapper()
      it.map(d => (d.id, toCarmenJson(mapper, d)))
    }.toDF("id", "json")
  }

  // ---------------------------------------------------------------- import

  private def nestedSeq(n: JsonNode): Seq[Seq[String]] =
    if (n == null || !n.isArray) Nil
    else n.asScala.toVector.map { inner =>
      if (inner == null || inner.isNull) Vector.empty[String]
      else inner.asScala.toVector.map(_.asText())
    }

  /** Parse a carmen GeoJSON feature line applying the storable-property
    * whitelist: unknown carmen:* keys and nulls are dropped exactly like
    * the reference does on putFeatures.
    */
  def fromCarmenJson(mapper: ObjectMapper, json: String): GeoDoc = {
    val f = mapper.readTree(json)
    val props = f.get("properties")
    val kept = mapper.createObjectNode()
    props.properties().iterator().asScala.foreach { e =>
      if (storableKeep(e.getKey, e.getValue == null || e.getValue.isNull))
        kept.set[JsonNode](e.getKey, e.getValue)
    }
    def nested(k: String) = nestedSeq(kept.get(k))
    val center = kept.get("carmen:center")
    val langTexts = kept.properties().iterator().asScala
      .filter(e => e.getKey.startsWith("carmen:text_"))
      .map(e => e.getKey.stripPrefix("carmen:text_") -> e.getValue.asText())
      .toVector.toMap
    val overrides = props.properties().iterator().asScala
      .filter(e => e.getKey.startsWith("override:") && !e.getValue.isNull)
      .map(e => e.getKey -> e.getValue.asText()).toVector.toMap
    val addressprops: Map[String, Map[Int, String]] = {
      val ap = kept.get("carmen:addressprops")
      if (ap == null || !ap.isObject) Map.empty
      else ap.properties().iterator().asScala.map { e =>
        e.getKey -> e.getValue.properties().iterator().asScala.map { m =>
          m.getKey.toInt -> (if (m.getValue.isNull) "" else m.getValue.asText())
        }.toMap
      }.toMap
    }
    GeoDoc(
      id = f.get("id").asLong(),
      text = Option(kept.get("carmen:text")).map(_.asText()).getOrElse(""),
      score = Option(kept.get("carmen:score")).map(_.asDouble()).getOrElse(0.0),
      geometry = f.get("geometry").toString,
      centerLon = if (center != null && center.size() == 2) center.get(0).asDouble() else 0.0,
      centerLat = if (center != null && center.size() == 2) center.get(1).asDouble() else 0.0,
      addressnumber = nested("carmen:addressnumber"),
      rangetype = Option(kept.get("carmen:rangetype")).map(_.asText()).getOrElse(""),
      lfromhn = nested("carmen:lfromhn"),
      ltohn = nested("carmen:ltohn"),
      rfromhn = nested("carmen:rfromhn"),
      rtohn = nested("carmen:rtohn"),
      parityl = nested("carmen:parityl"),
      parityr = nested("carmen:parityr"),
      intersections = nested("carmen:intersections"),
      langTexts = langTexts,
      overrides = overrides,
      addressprops = addressprops,
      types = Option(kept.get("carmen:types")).map(_.asScala.toVector.map(_.asText()))
        .getOrElse(Nil))
  }

  def importDocs(spark: SparkSession, lines: Dataset[String]): Dataset[GeoDoc] = {
    import spark.implicits._
    lines.mapPartitions { it =>
      val mapper = new ObjectMapper()
      it.map(json => fromCarmenJson(mapper, json))
    }
  }

  // ---------------------------------------------------------------- config

  /** LayerConfig <-> carmen geocoder_* config json. */
  def configToJson(mapper: ObjectMapper, cfg: LayerConfig): String = {
    val o = mapper.createObjectNode()
    o.put("name", cfg.name)
    o.put("idx", cfg.idx)
    o.put("maxzoom", cfg.zoom)
    o.put("type", cfg.typ)
    if (cfg.geocoderName.nonEmpty) o.put("geocoder_name", cfg.geocoderName)
    if (cfg.stack.nonEmpty) { val a = o.putArray("geocoder_stack"); cfg.stack.foreach(a.add) }
    if (cfg.geocoderAddress) o.put("geocoder_address", 1)
    if (cfg.geocoderTypes.nonEmpty) { val a = o.putArray("geocoder_types"); cfg.geocoderTypes.foreach(a.add) }
    if (cfg.worldview.nonEmpty) o.put("geocoder_worldview", cfg.worldview)
    if (cfg.intersectionToken.nonEmpty) o.put("geocoder_intersection_token", cfg.intersectionToken)
    if (cfg.languages.nonEmpty) { val a = o.putArray("geocoder_languages"); cfg.languages.foreach(a.add) }
    if (cfg.autoPopulate.nonEmpty) { val a = o.putArray("geocoder_languages_from_default"); cfg.autoPopulate.foreach(a.add) }
    if (cfg.categories.nonEmpty) { val a = o.putArray("geocoder_categories"); cfg.categories.toVector.sorted.foreach(a.add) }
    if (cfg.expectedNumberOrder.nonEmpty) o.put("geocoder_expected_number_order", cfg.expectedNumberOrder)
    if (cfg.geocoderFormat.nonEmpty) o.put("geocoder_format", cfg.geocoderFormat)
    if (cfg.geocoderInheritScore) o.put("geocoder_inherit_score", true)
    if (!cfg.geocoderGrantScore) o.put("geocoder_grant_score", false)
    if (cfg.geocoderIgnoreOrder) o.put("geocoder_ignore_order", true)
    if (cfg.geocoderRoutable) o.put("geocoder_routable", true)
    if (cfg.coalesceRadius > 0) o.put("geocoder_coalesce_radius", cfg.coalesceRadius)
    if (cfg.geocoderTokens.nonEmpty) {
      val t = o.putObject("geocoder_tokens")
      cfg.geocoderTokens.foreach { case (from, spec) => t.put(from, spec.text) }
    }
    if (cfg.bounds != Seq(-180.0, -85.0, 180.0, 85.0)) {
      val b = o.putArray("bounds"); cfg.bounds.foreach(b.add)
    }
    mapper.writeValueAsString(o)
  }

  def configFromJson(mapper: ObjectMapper, json: String): LayerConfig = {
    val o = mapper.readTree(json)
    def strs(k: String): Seq[String] =
      Option(o.get(k)).filter(_.isArray).map(_.asScala.toVector.map(_.asText()))
        .getOrElse(Nil)
    LayerConfig(
      name = o.get("name").asText(),
      idx = o.get("idx").asInt(),
      zoom = o.get("maxzoom").asInt(),
      typ = o.get("type").asText(),
      stack = strs("geocoder_stack"),
      geocoderAddress = Option(o.get("geocoder_address")).exists(_.asInt() == 1),
      geocoderTokens = Option(o.get("geocoder_tokens")).filter(_.isObject)
        .map(_.properties().iterator().asScala.map(e =>
          e.getKey -> graft.core.TokenSpec(e.getValue.asText())).toVector)
        .getOrElse(Nil),
      intersectionToken = Option(o.get("geocoder_intersection_token")).map(_.asText()).getOrElse(""),
      languages = strs("geocoder_languages"),
      autoPopulate = strs("geocoder_languages_from_default"),
      categories = strs("geocoder_categories").toSet,
      expectedNumberOrder = Option(o.get("geocoder_expected_number_order")).map(_.asText()).getOrElse(""),
      scoreranges = Map.empty,
      geocoderFormat = Option(o.get("geocoder_format")).map(_.asText()).getOrElse(""),
      geocoderInheritScore = Option(o.get("geocoder_inherit_score")).exists(_.asBoolean()),
      geocoderGrantScore = Option(o.get("geocoder_grant_score")).forall(_.asBoolean()),
      geocoderIgnoreOrder = Option(o.get("geocoder_ignore_order")).exists(_.asBoolean()),
      geocoderRoutable = Option(o.get("geocoder_routable")).exists(_.asBoolean()),
      bounds = Option(o.get("bounds")).filter(_.isArray)
        .map(_.asScala.toVector.map(_.asDouble()))
        .getOrElse(Seq(-180.0, -85.0, 180.0, 85.0)),
      geocoderTypes = strs("geocoder_types"),
      worldview = Option(o.get("geocoder_worldview")).map(_.asText()).getOrElse(""),
      coalesceRadius = Option(o.get("geocoder_coalesce_radius"))
        .map(_.asDouble()).getOrElse(0.0))
  }

  // ---------------------------------------------------------------- dirs

  /** Export sources to a directory: one subdir per layer with config.json
    * + docs.jsonl.
    */
  def exportDir(spark: SparkSession, dir: String,
                layers: Seq[(LayerConfig, Dataset[GeoDoc])]): Unit = {
    val mapper = new ObjectMapper()
    layers.foreach { case (cfg, docs) =>
      val sub = new java.io.File(dir, cfg.name)
      sub.mkdirs()
      java.nio.file.Files.write(
        new java.io.File(sub, "config.json").toPath,
        configToJson(mapper, cfg).getBytes("UTF-8"))
      val lines = exportDocs(spark, docs)
        .orderBy(col("id")).select(col("json"))
        .collect().map(_.getString(0))
      java.nio.file.Files.write(
        new java.io.File(sub, "docs.jsonl").toPath,
        lines.mkString("\n").getBytes("UTF-8"))
    }
  }

  /** autodir (reference loader.js:18-35): read every source subdirectory
    * of `dir` into (LayerConfig, docs) pairs, ordered by idx — ready for
    * IndexBuilder.build. Docs load distributed via spark.read.text.
    */
  def autodir(spark: SparkSession, dir: String): Seq[(LayerConfig, Dataset[GeoDoc])] = {
    import spark.implicits._
    val mapper = new ObjectMapper()
    val subs = Option(new java.io.File(dir).listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && !f.getName.startsWith("."))
      .sortBy(_.getName)
    subs.toSeq.map { sub =>
      val cfgJson = new String(java.nio.file.Files.readAllBytes(
        new java.io.File(sub, "config.json").toPath), "UTF-8")
      val cfg = configFromJson(mapper, cfgJson)
      val docs = importDocs(spark,
        spark.read.textFile(new java.io.File(sub, "docs.jsonl").getAbsolutePath))
      (cfg, docs)
    }.sortBy(_._1.idx)
  }
}
