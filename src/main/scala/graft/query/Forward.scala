package graft.query

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core._
import graft.index.IndexBuilder
import graft.index.IndexBuilder.CarmenIndex
import graft.model._

/** Batch forward geocode: a Dataset of queries joined against the phrase
  * index, then per-query stack+coalesce+format. This is the geocode-join:
  * the throughput metric's unit of work.
  *
  * Stages (mirrors reference lib/geocoder/geocode.js:341-493):
  *  1. tokenize + per-layer-group token replacement + subquery window
  *     enumeration (flatMap; pure port). Address-capable groups add
  *     numTokenized and intersection permutations
  *     (reference phrasematch.js:176-260)
  *  2. phrasematch: subqueries x postings equi-join (exact) + bounded
  *     prefix-key equi-join (autocomplete) + symmetric-delete fuzzy join
  *  3. per-query spatialmatch (stackable + coalesce + rebalance) in
  *     flatMapGroups — distributes over queries; grids per query are bounded
  *     by the same caps as the reference
  *  4. verify + format: lead covers joined to features, address-cluster/ITP
  *     resolution (reference verifymatch.js:397-492), reverse-context fill,
  *     per-query strict/loose re-rank
  */
object Forward {

  final case class Options(
      limit: Int = 5,
      autocomplete: Boolean = true,
      fuzzy: Boolean = true,
      proximity: Option[(Double, Double)] = None,
      limitVerify: Int = 10,
      language: Option[String] = None,
      types: Seq[String] = Nil,                       // F2/F3 layer-type filter
      stacks: Seq[String] = Nil,                      // F2 country-stack filter
      bbox: Option[(Double, Double, Double, Double)] = None // F4/F5 (W,S,E,N)
  )

  /** Query-side fuzzy variant row. */
  final case class FuzzVar(queryId: Long, subquery: String, mask: Int,
                           ender: Boolean, weight: Double, qlen: Int,
                           qsig: String, variant: String)

  private val phraseDistUdf = udf((q: String, c: String) =>
    Fuzzy.phraseDistance(q, c).getOrElse(-1))
  private val penaltyUdf = udf((original: String, ed: Int) =>
    Fuzzy.editPenalty(original, ed))

  /** Subquery window row. addrPos = -1 when the window carries no masked
    * house number; partial marks a proximity partial-number search.
    */
  final case class SubQ(queryId: Long, subquery: String, mask: Int,
                        ender: Boolean, weight: Double, qlen: Int,
                        addrPos: Int, addrNum: String, partial: Boolean,
                        qsig: String)

  /** Joined phrasematch grid row (input to per-query spatialmatch). */
  final case class PmRow(queryId: Long, layer: String, subquery: String,
                         mask: Int, weight: Double, prefix: Boolean,
                         qlen: Int, relev: Double, score3: Int,
                         id24: Long, x: Int, y: Int, phraseHash: Int,
                         addrPos: Int, addrNum: String, partial: Boolean,
                         langSet: String)

  /** Spatialmatch output row: one result with its covers. */
  final case class ResultRow(queryId: Long, rank: Int, relev: Double,
                             scoredist: Double, covers: Seq[CoverRow])
  final case class CoverRow(idx: Int, layer: String, id24: Long, x: Int, y: Int,
                            zoom: Int, relev: Double, score: Double,
                            tmpid: Long, mask: Int, text: String,
                            addrNum: String, partial: Boolean)

  /** Tagged row feeding the per-query verify re-rank (kind: 0=cover,
    * 1=context feature, 2=lead feature). */
  final case class VRowT(query_id: Long, position: Int, kind: Int, tmpid: Long,
                         idx: Int, mask: Int, relev: Double, text: String,
                         zoom: Int, smRelev: Double, scoredist: Double,
                         featureId: Long, lon: Double, lat: Double,
                         display: String, number: String,
                         fullText: String, fscore: Double)

  final case class FinalRow(query_id: Long, rank: Int, relev: Double,
                            scoredist: Double, place_name: String,
                            feature_id: Long, center_lon: Double,
                            center_lat: Double, lead_idx: Int)

  /** One query-side text-processing group: layers sharing geocoder_tokens /
    * address behavior share one enumerated-subquery set.
    */
  final case class QueryGroup(qsig: String, replacers: IndexBuilder.Replacers,
                              geocoderAddress: Boolean, intersectionToken: String)

  private def queryGroups(index: CarmenIndex): Vector[QueryGroup] =
    index.layers.map(_.config).groupBy(_.querySignature).map { case (sig, cfgs) =>
      val c = cfgs.head
      QueryGroup(sig, IndexBuilder.replacersFor(c), c.geocoderAddress,
        c.intersectionToken)
    }.toVector

  private val onlyDigits = java.util.regex.Pattern.compile("^\\d+$")
  private val digitsHash = java.util.regex.Pattern.compile("^[\\d#]+$")

  /** T18 whitespace corrector (reference lib/util/whitespace.js): split
    * letters+digits fused tokens ("fake123" -> "fake 123") as a second
    * zero-fuzz hypothesis for address indexes.
    */
  private val numberLetter = java.util.regex.Pattern.compile(
    "^(([A-Za-z\u00C0-\u00D6\u00D8-\u00F6\u00F8-\u00FF]{3,})([0-9]+)|([0-9]+)([A-Za-z\u00C0-\u00D6\u00D8-\u00F6\u00F8-\u00FF]{4,}))$")

  private def whitespaceCorrect(tokens: Vector[String]): Option[Vector[String]] = {
    var found = false
    val out = tokens.flatMap { t =>
      val m = numberLetter.matcher(t)
      if (m.matches()) {
        found = true
        if (m.group(2) != null) Vector(m.group(2), m.group(3))
        else Vector(m.group(4), m.group(5))
      } else Vector(t)
    }
    if (found) Some(out) else None
  }

  def subqueries(spark: SparkSession, queries: DataFrame,
                 groups: Vector[QueryGroup],
                 proximityDefined: Boolean): DataFrame = {
    import spark.implicits._
    val groupsBc = spark.sparkContext.broadcast(groups)
    queries.select(col("query_id").cast("long"), col("query").cast("string"))
      .as[(Long, String)]
      .flatMap { case (qid, q) =>
        groupsBc.value.iterator.flatMap { g =>
          val replaced = TokenReplace.replaceToken(g.replacers.complexQuery,
            TextNormalize.tokenize(q))
          // simple word replacements apply inside the reference's fuzzy
          // matcher (carmen-core word_replacements); here, to the query terms
          val tokens = g.replacers.simple(
            TextNormalize.normalizeQuery(replaced).tokens)
          if (tokens.isEmpty) Iterator.empty
          else {
            val qlen = tokens.length
            var partial = false
            def permsOf(tokens: Vector[String]): Vector[Phrases.Perm] =
              if (!g.geocoderAddress) Phrases.permutations(tokens, None, all = false)
              else if (tokens.length > 1) {
                // housenum-tokenized + intersection perms
                // (reference phrasematch.js:191-206)
                var all = Phrases.permutations(tokens, None, all = false)
                for (v <- AddressTokens.numTokenize(tokens))
                  all = all ++ Phrases.permutations(v.tokens, None, all = false,
                    addressPosition = Some(v.position),
                    addressNumber = Some(v.number))
                all = AddressTokens.addressPermutations(all)
                if (g.intersectionToken.nonEmpty)
                  all = all ++ AddressTokens.intersectionPermutations(tokens,
                    g.intersectionToken)
                all
              } else if (onlyDigits.matcher(tokens.head).matches() && proximityDefined) {
                // proximity partial-number search (phrasematch.js:207-217)
                partial = true
                var all = Phrases.permutations(tokens, None, all = false)
                for (v <- AddressTokens.numTokenizePrefix(tokens))
                  all = all ++ Phrases.permutations(v, None, all = false)
                all
              } else Phrases.permutations(tokens, None, all = false)
            // T18: one whitespace-corrected hypothesis for address groups
            // (reference phrasematch.js:62-77, lib/util/whitespace.js);
            // its masks/weights live in its own token space — dedupe by
            // (terms, ender, mask) across hypotheses like alreadyTried
            val hypotheses: Vector[(Vector[Phrases.Perm], Int)] = {
              val base = (permsOf(tokens), qlen)
              if (!g.geocoderAddress) Vector(base)
              else whitespaceCorrect(tokens) match {
                case Some(corrected)
                  if corrected.length <= TextNormalize.MaxQueryTokens =>
                  Vector(base, (permsOf(corrected), corrected.length))
                case _ => Vector(base)
              }
            }
            val tried = scala.collection.mutable.HashSet.empty[(Vector[String], Boolean, Int)]
            hypotheses.iterator.flatMap { case (perms, hlen) =>
              perms.iterator
                // no number-only single-token phrases in address indexes
                // unless partial-number (phrasematch.js:224-226)
                .filter(p => !g.geocoderAddress || partial || p.terms.length != 1 ||
                  !digitsHash.matcher(p.terms.head).matches())
                .filter(p => tried.add((p.terms, p.ender, p.mask)))
                .map { p =>
                  SubQ(qid, p.terms.mkString(" "), p.mask, p.ender,
                    Integer.bitCount(p.mask).toDouble / hlen, hlen,
                    p.addressPos.getOrElse(-1), p.addressNumber.getOrElse(""),
                    partial, g.qsig)
                }
            }
          }
        }
      }.toDF()
  }

  /** Lead cover joined to its feature, pre-address-resolution. */
  final case class LeadRaw(
      query_id: Long, position: Int, tmpid: Long, idx: Int, mask: Int,
      relev: Double, text: String, zoom: Int, smRelev: Double,
      scoredist: Double, addrNum: String, partial: Boolean,
      featureId: Long, lon: Double, lat: Double, display: String,
      fFullText: String, fScore: Double,
      fGeometry: String, fAddrnum: Seq[Seq[String]], fRangetype: String,
      fLfromhn: Seq[Seq[String]], fLtohn: Seq[Seq[String]],
      fRfromhn: Seq[Seq[String]], fRtohn: Seq[Seq[String]],
      fParityl: Seq[Seq[String]], fParityr: Seq[Seq[String]],
      addressLayer: Boolean)

  final case class LeadOut(
      query_id: Long, position: Int, kind: Int, tmpid: Long, idx: Int,
      mask: Int, relev: Double, text: String, zoom: Int, smRelev: Double,
      scoredist: Double, featureId: Long, lon: Double, lat: Double,
      display: String, number: String, fullText: String, fscore: Double,
      addrPenalty: Boolean)

  /** Address-cluster/ITP resolution for one lead feature (reference
    * verifymatch.js:397-492): exact cluster match, then range interpolation,
    * then a street-fallback 0.99 relevance penalty; partial-number searches
    * use prefix matching with a proximity pick.
    */
  private def resolveLead(r: LeadRaw,
                          proximity: Option[(Double, Double)]): LeadOut = {
    val noPenalty = LeadOut(r.query_id, r.position, 2, r.tmpid, r.idx, r.mask,
      r.relev, r.text, r.zoom, r.smRelev, r.scoredist, r.featureId, r.lon,
      r.lat, r.display, number = "", fullText = r.fFullText,
      fscore = r.fScore, addrPenalty = false)
    val hasAddressData = r.fAddrnum.nonEmpty || r.fRangetype.nonEmpty
    if (!r.addressLayer || r.featureId < 0 || !hasAddressData) return noPenalty
    if (r.addrNum.isEmpty && !r.partial) return noPenalty

    val parts: Vector[Geom] = Geom.fromJson(r.fGeometry) match {
      case Geom.Collection(gs) => gs
      case _ => Vector.empty
    }
    val clusterParts = r.fAddrnum.toVector.zipWithIndex.map { case (nums, k) =>
      parts.lift(k) match {
        case Some(Geom.MultiPoint(pts)) =>
          AddressCluster.Part(nums.toVector, pts, isMultiPoint = true)
        case _ => AddressCluster.Part(nums.toVector, Vector.empty, isMultiPoint = false)
      }
    }

    // the queried number: for partial searches the (single) query token is in
    // the subquery text; otherwise the numTokenize-captured original token
    val number = if (r.partial) r.text.split(" ").head else r.addrNum

    val resolved: Option[(Double, Double, String)] =
      if (r.partial && clusterParts.nonEmpty) {
        val distFn: (Double, Double) => Double = (lon, lat) => proximity match {
          case Some((plon, plat)) =>
            Proximity.distance(plon, plat, lon, lat, 0, 0, r.zoom)
          case None => 0.0
        }
        // partial matches display the matched cluster number
        // (verifymatch.js:410 via forwardPrefixFiltered's carmen:address)
        AddressCluster.forwardPrefixFiltered(clusterParts, number, distFn)
          .map(p => (p._1.lon, p._1.lat, p._1.number))
      } else {
        // exact matches display the QUERY's number token: the reference sets
        // carmen:address = address.number before the lookup
        // (verifymatch.js:418) and only queens style overrides it
        val exact = AddressCluster.forward(clusterParts, number).headOption
          .map(m => (m.lon, m.lat, number))
        exact.orElse {
          if (r.fRangetype.nonEmpty) {
            val itpParts = parts.zipWithIndex.map { case (g, k) =>
              val lines = g match {
                case Geom.MultiLineString(ls) => ls
                case _ => Vector.empty[Vector[(Double, Double)]]
              }
              def at(v: Seq[Seq[String]]): Vector[String] =
                if (k < v.length) v(k).toVector else Vector.empty
              AddressItp.Part(lines, at(r.fLfromhn), at(r.fLtohn),
                at(r.fRfromhn), at(r.fRtohn), at(r.fParityl), at(r.fParityr),
                isMultiLineString = lines.nonEmpty)
            }
            AddressItp.forward(itpParts, number)
              .map(p => (p.lon, p.lat, number))
          } else None
        }
      }

    resolved match {
      case Some((lon, lat, matchedNum)) =>
        noPenalty.copy(lon = lon, lat = lat, number = matchedNum)
      case None =>
        // street fallback (verifymatch.js:456-460, 489-492)
        noPenalty.copy(addrPenalty = true)
    }
  }

  def forward(spark: SparkSession, index: CarmenIndex, queries: DataFrame,
              opts: Options = Options()): DataFrame = {
    import spark.implicits._

    // F1/F2: prune layers by types/stacks up front (reference
    // filter-sources.js:23-57) — search joins run on the allowed subset;
    // context fill still sees every layer
    val allowedLayers = index.layers.filter { l =>
      val stackOk = opts.stacks.isEmpty || l.config.stack.isEmpty ||
        l.config.stack.exists(opts.stacks.contains)
      val typeOk = opts.types.isEmpty || opts.types.contains(l.config.typ)
      stackOk && typeOk
    }
    val searchIndex =
      if (allowedLayers.length == index.layers.length) index
      else CarmenIndex(allowedLayers)
    val groups = queryGroups(searchIndex)

    // localCheckpoint (not cache): materializes once and truncates lineage
    // without registering with the CacheManager — repeated forward() calls
    // with cache() degrade as every new plan is matched against all
    // previously cached plans (measured 10s -> 27s per call)
    val subs = subqueries(spark, queries, groups, opts.proximity.isDefined)
      .localCheckpoint()

    def tagSig(dfOf: IndexBuilder.LayerIndex => DataFrame): DataFrame =
      searchIndex.layers.map { l =>
        dfOf(l).withColumn("qsig", lit(l.config.querySignature))
      }.reduce(_ unionByName _)

    // 2. phrasematch joins: exact + (strict) prefix for autocomplete enders.
    // The prefix branch equi-joins on bounded-length prefix keys (the
    // distributed analog of the reference's sorted phrase_id_range,
    // docs/index-structure.md:10-12) with a residual startsWith filter for
    // prefixes longer than the key — no nested-loop scan of the postings.
    val postings = tagSig(_.postings)
    // F4/F5: bbox in tile space at the max layer zoom; spatialmatch prunes
    // covers whose ancestor/descendant tiles fall outside
    val tileBbox: Option[(Int, Int, Int, Int, Int)] = opts.bbox.map {
      case (w, s0, e, n) =>
        val z = searchIndex.maxZoom
        def tx(lon: Double) = math.floor((lon + 180.0) / 360.0 * (1 << z)).toInt
        def ty(lat: Double) = {
          val r = math.toRadians(lat)
          math.floor((1.0 - math.log(math.tan(r) + 1.0 / math.cos(r)) / math.Pi)
            / 2.0 * (1 << z)).toInt
        }
        (z, tx(w), ty(n), tx(e), ty(s0))
    }
    val exact = postings.join(subs,
        postings("phrase") === subs("subquery") &&
          postings("qsig") === subs("qsig"))
      .drop(postings("qsig")).drop(subs("qsig"))
      .withColumn("is_prefix", lit(false))
    val withPrefix =
      if (!opts.autocomplete) exact
      else {
        val maxPfx = IndexBuilder.MaxPrefixLen
        val pfxSubs = subs.where(col("ender"))
          .withColumn("pfx", substring(col("subquery"), 1, maxPfx))
          .withColumn("pfx_len", least(length(col("subquery")), lit(maxPfx)))
        val cand = tagSig(_.prefixes).join(pfxSubs, Seq("pfx", "pfx_len", "qsig"))
          .where(col("phrase").startsWith(col("subquery")) &&
            col("phrase") =!= col("subquery"))
          .drop("pfx", "pfx_len", "qsig")
        val prefixMatched = searchIndex.allPostings.join(cand, Seq("layer", "phrase"))
          .withColumn("is_prefix", lit(true))
        exact.unionByName(prefixMatched.select(exact.columns.map(col): _*))
      }

    // fuzzy branch (P6): symmetric-delete candidate join + DL<=1 verify +
    // levenshtein-ratio weight penalty (reference phrasematch.js:328-345)
    val matched =
      if (!opts.fuzzy) withPrefix
      else {
        val qVariants = subs.as[SubQ]
          .filter(s => s.addrPos < 0 && !s.partial) // fuzzy on plain windows
          .flatMap { s =>
            Fuzzy.phraseVariants(s.subquery).map(v =>
              FuzzVar(s.queryId, s.subquery, s.mask, s.ender, s.weight, s.qlen,
                s.qsig, v))
          }.toDF()
        val cand = tagSig(_.deletes).join(qVariants, Seq("variant", "qsig"))
          .where(col("phrase") =!= col("subquery"))
          .select(col("layer").as("cand_layer"), col("phrase").as("cand_phrase"),
            col("queryId"), col("subquery"), col("mask"), col("ender"),
            col("weight"), col("qlen"))
          .distinct()
          .withColumn("edit", phraseDistUdf(col("subquery"), col("cand_phrase")))
          .where(col("edit") === 1)
          .withColumn("weight", col("weight") * penaltyUdf(col("subquery"), col("edit")))
          .withColumn("addrPos", lit(-1))
          .withColumn("addrNum", lit(""))
          .withColumn("partial", lit(false))
        val ap = searchIndex.allPostings
        val fuzzyMatched = ap.join(cand,
            ap("layer") === cand("cand_layer") &&
              ap("phrase") === cand("cand_phrase"))
          .drop("cand_layer", "cand_phrase", "edit")
          .withColumn("is_prefix", lit(false))
        withPrefix.unionByName(fuzzyMatched.select(withPrefix.columns.map(col): _*))
      }

    val cfgByLayer = index.layers.map(l =>
      l.config.name -> (l.config, l.scorefactor)).toMap
    // language target per layer (reference phrasematch.js:297-310): the
    // requested language resolves to the layer's closest configured label,
    // else "unmatched"; grids tagged with other languages take the x0.96
    // coalesce penalty
    val langTargetByLayer: Map[String, String] = {
      val languageName = opts.language.map(_.replace("-", "_")).getOrElse("default")
      index.layers.map { l =>
        val langMap = "default" +: l.config.languages.map(_.replace("-", "_")).sorted.toVector
        val target =
          if (langMap.contains(languageName)) languageName
          else ClosestLang.closestLangLabel(languageName, langMap).getOrElse("unmatched")
        l.config.name -> target
      }.toMap
    }
    val ndxByName = index.layers.map(_.config.name).distinct.zipWithIndex.toMap
    val cfgBc = spark.sparkContext.broadcast((cfgByLayer, ndxByName))
    val langTargetBc = spark.sparkContext.broadcast(langTargetByLayer)

    val pmRows = matched.select(
      col("queryId"), col("layer"), col("subquery"), col("mask"), col("weight"),
      col("is_prefix").as("prefix"), col("qlen"), col("relev"), col("score3"),
      col("id24"), col("x"), col("y"), col("phrase_hash").as("phraseHash"),
      col("addrPos"), col("addrNum"), col("partial"),
      col("lang_set").as("langSet")
    ).as[PmRow]

    val proximity = opts.proximity
    val limitVerify = opts.limitVerify
    val bboxB = tileBbox

    // 3. per-query spatialmatch
    val results = pmRows.groupByKey(_.queryId).flatMapGroups { (qid, it) =>
      val (cfgs, ndxs) = cfgBc.value
      val rows = it.toVector
      val qlen = rows.iterator.map(_.qlen).min // base hypothesis length
      val pms = rows.groupBy(r => (r.layer, r.mask, r.subquery, r.prefix,
          r.addrNum, r.partial))
        .map { case ((layer, mask, subq, pfx, addrNum, partial), grs) =>
          val (cfg, scorefactor) = cfgs(layer)
          StackCoalesce.Pm(layer, cfg.idx, ndxs(layer), cfg.nonOverlapping,
            cfg.zoom, subq, mask, grs.head.weight, pfx,
            math.max(scorefactor, 1.0),
            grs.map { g =>
              val target = langTargetBc.value.getOrElse(layer, "default")
              val langs = g.langSet.split(",")
              StackCoalesce.GridRow(g.x, g.y, g.relev, g.score3,
                g.id24, g.phraseHash,
                matchesLanguage = g.langSet.isEmpty ||
                  langs.contains("all") || langs.contains(target))
            }.toVector,
            addrNum, partial)
        }.toVector
      val sms = StackCoalesce.spatialmatch(qlen, pms, proximity, bboxB)
      sms.take(limitVerify).zipWithIndex.map { case (sm, i) =>
        ResultRow(qid, i + 1, JsNum.roundTo(sm.relev, 4), sm.scoredist,
          sm.covers.map(c => CoverRow(c.idx, layerOf(cfgs, c.idx), c.id24,
            c.x, c.y, c.zoom, c.relev, c.score, c.tmpid, c.mask, c.text,
            c.addrNum, c.partial)))
      }.iterator
    }.toDF()
      // reused by cover/lead/context branches below — materialize once
      .localCheckpoint()

    // 4. verify + format (reference verifymatch.js): join lead covers to
    // features, resolve address numbers, reverse-context fill, per-query
    // strict/loose re-rank
    val featuresAll = index.layers.map { l =>
      l.features.select(lit(l.config.idx).as("f_idx"), col("id24").as("f_id24"),
        col("id").as("feature_id"), col("text").as("f_text"),
        col("center_lon"), col("center_lat"),
        col("geometry").as("f_geometry"),
        col("score").as("f_score"),
        col("addressnumber").as("f_addrnum"),
        col("rangetype").as("f_rangetype"),
        col("lfromhn").as("f_lfromhn"), col("ltohn").as("f_ltohn"),
        col("rfromhn").as("f_rfromhn"), col("rtohn").as("f_rtohn"),
        col("parityl").as("f_parityl"), col("parityr").as("f_parityr"),
        lit(l.config.geocoderAddress).as("f_is_address"))
    }.reduce(_ unionByName _)

    val exploded = results.select(col("queryId").as("query_id"),
        col("rank").as("position"), col("relev").as("smRelev"), col("scoredist"),
        posexplode(col("covers")).as(Seq("pos", "cover")))
      .select(col("query_id"), col("position"), col("smRelev"), col("scoredist"),
        col("pos"), col("cover.*"))

    // lead rows (kind 2): pos==0 cover joined to its feature on the
    // (idx, id24) key — a plain equi-join so AQE broadcasts small layers
    // and shuffles big ones (address/POI layers cannot broadcast at scale)
    val leadJoined = exploded.where(col("pos") === 0)
      .join(featuresAll,
        exploded("idx") === featuresAll("f_idx") &&
          exploded("id24") === featuresAll("f_id24"), "left")
    val emptyNested = lit(array()).cast("array<array<string>>")
    val leadRaw = leadJoined.select(col("query_id"), col("position"),
      col("tmpid"), col("idx"), col("mask"), col("relev"), col("text"),
      col("zoom"), col("smRelev"), col("scoredist"), col("addrNum"),
      col("partial"),
      coalesce(col("feature_id"), lit(-1L)).as("featureId"),
      coalesce(col("center_lon"), lit(0.0)).as("lon"),
      coalesce(col("center_lat"), lit(0.0)).as("lat"),
      coalesce(substring_index(col("f_text"), ",", 1), lit("")).as("display"),
      coalesce(col("f_text"), lit("")).as("fFullText"),
      coalesce(col("f_score"), lit(0.0)).as("fScore"),
      coalesce(col("f_geometry"), lit("")).as("fGeometry"),
      coalesce(col("f_addrnum"), emptyNested).as("fAddrnum"),
      coalesce(col("f_rangetype"), lit("")).as("fRangetype"),
      coalesce(col("f_lfromhn"), emptyNested).as("fLfromhn"),
      coalesce(col("f_ltohn"), emptyNested).as("fLtohn"),
      coalesce(col("f_rfromhn"), emptyNested).as("fRfromhn"),
      coalesce(col("f_rtohn"), emptyNested).as("fRtohn"),
      coalesce(col("f_parityl"), emptyNested).as("fParityl"),
      coalesce(col("f_parityr"), emptyNested).as("fParityr"),
      coalesce(col("f_is_address"), lit(false)).as("addressLayer"))
      .as[LeadRaw]
    val leadOut = leadRaw.map(r => resolveLead(r, proximity)).toDF()
      .localCheckpoint()

    val leadRows = leadOut.select(col("query_id"), col("position"), col("kind"),
      col("tmpid"), col("idx"), col("mask"), col("relev"), col("text"),
      col("zoom"), col("smRelev"), col("scoredist"), col("featureId"),
      col("lon"), col("lat"), col("display"), col("number"),
      col("fullText"), col("fscore"))

    // cover rows (kind 0); the pos==0 cover takes the street-fallback
    // penalty when its address number failed to resolve
    val penalties = leadOut.select(col("query_id"), col("position"),
      col("addrPenalty"))
    val coverRows = exploded
      .join(penalties, Seq("query_id", "position"), "left")
      .select(col("query_id"), col("position"),
      lit(0).as("kind"), col("tmpid"), col("idx"), col("mask"),
      when(col("pos") === 0 && coalesce(col("addrPenalty"), lit(false)),
        col("relev") * 0.99).otherwise(col("relev")).as("relev"),
      col("text"), col("zoom"), col("smRelev"), col("scoredist"),
      lit(-1L).as("featureId"), lit(0.0).as("lon"), lit(0.0).as("lat"),
      lit("").as("display"), lit("").as("number"),
      lit("").as("fullText"), lit(0.0).as("fscore"))

    // context rows (kind 1): reverse-lookup of the lead center in every
    // layer coarser than the lead (reference verifymatch.js:542-559)
    val leadPts = leadRows.select(col("query_id"), col("position"),
      col("idx").as("lead_idx"), col("lon"), col("lat"))
    val contextRows =
      Reverse.picks(leadPts, index, Seq("query_id", "position"), radiusMiles = 0.0)
        .join(leadPts.select(col("query_id"), col("position"), col("lead_idx")),
          Seq("query_id", "position"))
        .where(col("idx") < col("lead_idx"))
        .select(col("query_id"), col("position"), lit(1).as("kind"),
          (col("idx").cast("long") * (1L << 25) +
            pmod(abs(col("feature_id")), lit(1L << 24))).as("tmpid"),
          col("idx"), lit(0).as("mask"), lit(0.0).as("relev"),
          col("text"), lit(0).as("zoom"), lit(0.0).as("smRelev"),
          lit(0.0).as("scoredist"), col("feature_id").as("featureId"),
          col("center_lon").as("lon"), col("center_lat").as("lat"),
          substring_index(col("text"), ",", 1).as("display"),
          lit("").as("number"), col("text").as("fullText"),
          col("score").as("fscore"))

    val tagged = coverRows.unionByName(leadRows).unionByName(contextRows)
      .as[VRowT]

    val limit = opts.limit
    val finals = tagged.groupByKey(_.query_id).flatMapGroups { (qid, it) =>
      val (cfgs, ndxs) = cfgBc.value
      def ndxOf(idx: Int): Int =
        cfgs.collectFirst { case (name, (c, _)) if c.idx == idx => ndxs(name) }
          .getOrElse(idx)
      val rows = it.toVector
      def typFmtOf(idx: Int): (String, String) =
        cfgs.collectFirst { case (_, (c, _)) if c.idx == idx =>
          (c.typ, c.geocoderFormat) }.getOrElse(("", ""))
      val byPos = rows.groupBy(_.position)
      val vresults = byPos.toVector.sortBy(_._1).flatMap { case (posn, rs) =>
        val covers = rs.filter(_.kind == 0).map(r =>
          VerifyRank.VCover(r.tmpid, r.idx, r.mask, r.relev, r.text, r.zoom))
        val leadOpt = rs.find(_.kind == 2)
        leadOpt.map { lead =>
          def flagsOf(idx: Int): (Boolean, Boolean) =
            cfgs.collectFirst { case (_, (c2, _)) if c2.idx == idx =>
              (c2.geocoderInheritScore, c2.geocoderGrantScore) }
              .getOrElse((false, true))
          val ctx = rs.filter(_.kind == 1).sortBy(-_.idx)
          val context = {
            val (li, lg) = flagsOf(lead.idx)
            VerifyRank.VCtx(lead.tmpid, lead.idx, ndxOf(lead.idx),
              lead.display, fullText = lead.fullText, score = lead.fscore,
              inheritScore = li, grantScore = lg) +:
              ctx.map { r =>
                val (ci, cg) = flagsOf(r.idx)
                VerifyRank.VCtx(r.tmpid, r.idx, ndxOf(r.idx), r.display,
                  fullText = r.fullText, score = r.fscore,
                  inheritScore = ci, grantScore = cg)
              }.toVector
          }
          // O1: geocoder_format template of the lead layer, else the
          // default "number name, name..." join (format-features.js:50-112)
          val ctxFeats = (lead +: ctx).map(r =>
            FormatPlace.CtxFeat(typFmtOf(r.idx)._1, r.display, r.number)).toVector
          val placeName = FormatPlace.placeName(ctxFeats, typFmtOf(lead.idx)._2)
          (VerifyRank.VResult(posn, lead.smRelev, lead.scoredist,
            covers.toVector, context, lead.featureId, ndxOf(lead.idx),
            addressNull = lead.number.isEmpty),
            (placeName, lead.featureId, lead.lon, lead.lat, lead.idx))
        }
      }
      val meta = vresults.map { case (vr, m) => vr.position -> m }.toMap
      val ranked = VerifyRank.rank(vresults.map(_._1), proximity.isDefined)
      // dedupe by place_name keeping the best (reference format-features O2)
      val seen = scala.collection.mutable.HashSet.empty[String]
      ranked.iterator.flatMap { v =>
        val (placeName, fid, lon, lat, leadIdx) = meta(v.position)
        if (seen.contains(placeName)) None
        else {
          seen += placeName
          Some((v, placeName, fid, lon, lat, leadIdx))
        }
      }.take(limit).zipWithIndex.map { case ((v, placeName, fid, lon, lat, leadIdx), i) =>
        FinalRow(qid, i + 1, v.relevance, v.scoredist, placeName, fid, lon, lat,
          leadIdx)
      }
    }

    finals.toDF()
      .select(col("query_id"), col("rank"), col("relev"), col("scoredist"),
        col("place_name"), col("feature_id"), col("center_lon"),
        col("center_lat"), col("lead_idx"))
      .orderBy(col("query_id"), col("rank"))
  }

  private def layerOf(cfgs: Map[String, (LayerConfig, Double)], idx: Int): String =
    cfgs.collectFirst { case (name, (c, _)) if c.idx == idx => name }.getOrElse("?")
}
