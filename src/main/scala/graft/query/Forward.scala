package graft.query

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core._
import graft.index.IndexBuilder.CarmenIndex
import graft.model._

/** Batch forward geocode: a Dataset of queries joined against the phrase
  * index, then per-query stack+coalesce+format. This is the geocode-join:
  * the throughput metric's unit of work.
  *
  * Stages (mirrors reference lib/geocoder/geocode.js:341-493):
  *  1. tokenize + subquery window enumeration (flatMap; pure port)
  *  2. phrasematch: subqueries x postings equi-join (exact) + prefix range
  *     join (autocomplete) — the subquery side is broadcast
  *  3. per-query spatialmatch (stackable + coalesce + rebalance) in
  *     flatMapGroups — distributes over queries; grids per query are bounded
  *     by the same caps as the reference
  *  4. verify-lite + format: covers joined back to feature tables, context
  *     assembled fine->coarse
  */
object Forward {

  final case class Options(
      limit: Int = 5,
      autocomplete: Boolean = true,
      fuzzy: Boolean = true,
      proximity: Option[(Double, Double)] = None,
      limitVerify: Int = 10
  )

  /** Query-side fuzzy variant row. */
  final case class FuzzVar(queryId: Long, subquery: String, mask: Int,
                           ender: Boolean, weight: Double, qlen: Int,
                           variant: String)

  private val phraseDistUdf = udf((q: String, c: String) =>
    Fuzzy.phraseDistance(q, c).getOrElse(-1))
  private val penaltyUdf = udf((original: String, ed: Int) =>
    Fuzzy.editPenalty(original, ed))

  /** Subquery window row. */
  final case class SubQ(queryId: Long, subquery: String, mask: Int,
                                ender: Boolean, weight: Double, qlen: Int)

  /** Joined phrasematch grid row (input to per-query spatialmatch). */
  final case class PmRow(queryId: Long, layer: String, subquery: String,
                                 mask: Int, weight: Double, prefix: Boolean,
                                 qlen: Int, relev: Double, score3: Int,
                                 id24: Long, x: Int, y: Int, phraseHash: Int)

  /** Spatialmatch output row: one result with its covers. */
  final case class ResultRow(queryId: Long, rank: Int, relev: Double,
                             scoredist: Double, covers: Seq[CoverRow])
  final case class CoverRow(idx: Int, layer: String, id24: Long, x: Int, y: Int,
                            zoom: Int, relev: Double, score: Double,
                            tmpid: Long, mask: Int, text: String)

  /** Tagged row feeding the per-query verify re-rank (kind: 0=cover,
    * 1=context feature, 2=lead feature). */
  final case class VRowT(query_id: Long, position: Int, kind: Int, tmpid: Long,
                         idx: Int, mask: Int, relev: Double, text: String,
                         zoom: Int, smRelev: Double, scoredist: Double,
                         featureId: Long, lon: Double, lat: Double,
                         display: String)

  final case class FinalRow(query_id: Long, rank: Int, relev: Double,
                            scoredist: Double, place_name: String,
                            feature_id: Long, center_lon: Double,
                            center_lat: Double, lead_idx: Int)

  def subqueries(spark: SparkSession, queries: DataFrame): DataFrame = {
    import spark.implicits._
    queries.select(col("query_id").cast("long"), col("query").cast("string"))
      .as[(Long, String)]
      .flatMap { case (qid, q) =>
        val tokens = TextNormalize.normalizeQuery(TextNormalize.tokenize(q)).tokens
        if (tokens.isEmpty) Iterator.empty
        else {
          val qlen = tokens.length
          Phrases.permutations(tokens, None, all = false).iterator.map { p =>
            SubQ(qid, p.terms.mkString(" "), p.mask, p.ender,
              Integer.bitCount(p.mask).toDouble / qlen, qlen)
          }
        }
      }.toDF()
  }

  def forward(spark: SparkSession, index: CarmenIndex, queries: DataFrame,
              opts: Options = Options()): DataFrame = {
    import spark.implicits._

    // localCheckpoint (not cache): materializes once and truncates lineage
    // without registering with the CacheManager — repeated forward() calls
    // with cache() degrade as every new plan is matched against all
    // previously cached plans (measured 10s -> 27s per call)
    val subs = subqueries(spark, queries).localCheckpoint()

    // 2. phrasematch joins: exact + (strict) prefix for autocomplete enders.
    // The prefix branch equi-joins on bounded-length prefix keys (the
    // distributed analog of the reference's sorted phrase_id_range,
    // docs/index-structure.md:10-12) with a residual startsWith filter for
    // prefixes longer than the key — no nested-loop scan of the postings.
    val postings = index.allPostings
    val exact = postings.join(subs, postings("phrase") === subs("subquery"))
      .withColumn("is_prefix", lit(false))
    val withPrefix =
      if (!opts.autocomplete) exact
      else {
        val maxPfx = graft.index.IndexBuilder.MaxPrefixLen
        val pfxSubs = subs.where(col("ender"))
          .withColumn("pfx", substring(col("subquery"), 1, maxPfx))
          .withColumn("pfx_len", least(length(col("subquery")), lit(maxPfx)))
        val cand = index.allPrefixes.join(pfxSubs, Seq("pfx", "pfx_len"))
          .where(col("phrase").startsWith(col("subquery")) &&
            col("phrase") =!= col("subquery"))
          .drop("pfx", "pfx_len")
        val prefixMatched = postings.join(cand, Seq("layer", "phrase"))
          .withColumn("is_prefix", lit(true))
        exact.unionByName(prefixMatched.select(exact.columns.map(col): _*))
      }

    // fuzzy branch (P6): symmetric-delete candidate join + DL<=1 verify +
    // levenshtein-ratio weight penalty (reference phrasematch.js:328-345)
    val matched =
      if (!opts.fuzzy) withPrefix
      else {
        val qVariants = subs.as[SubQ].flatMap { s =>
          Fuzzy.phraseVariants(s.subquery).map(v =>
            FuzzVar(s.queryId, s.subquery, s.mask, s.ender, s.weight, s.qlen, v))
        }.toDF()
        val cand = index.allDeletes.join(qVariants, Seq("variant"))
          .where(col("phrase") =!= col("subquery"))
          .select(col("layer").as("cand_layer"), col("phrase").as("cand_phrase"),
            col("queryId"), col("subquery"), col("mask"), col("ender"),
            col("weight"), col("qlen"))
          .distinct()
          .withColumn("edit", phraseDistUdf(col("subquery"), col("cand_phrase")))
          .where(col("edit") === 1)
          .withColumn("weight", col("weight") * penaltyUdf(col("subquery"), col("edit")))
        val fuzzyMatched = postings.join(cand,
            postings("layer") === cand("cand_layer") &&
              postings("phrase") === cand("cand_phrase"))
          .drop("cand_layer", "cand_phrase", "edit")
          .withColumn("is_prefix", lit(false))
        withPrefix.unionByName(fuzzyMatched.select(withPrefix.columns.map(col): _*))
      }

    val cfgByLayer = index.layers.map(l =>
      l.config.name -> (l.config, l.scorefactor)).toMap
    val ndxByName = index.layers.map(_.config.name).distinct.zipWithIndex.toMap
    val cfgBc = spark.sparkContext.broadcast((cfgByLayer, ndxByName))

    val pmRows = matched.select(
      col("queryId"), col("layer"), col("subquery"), col("mask"), col("weight"),
      col("is_prefix").as("prefix"), col("qlen"), col("relev"), col("score3"),
      col("id24"), col("x"), col("y"), col("phrase_hash").as("phraseHash")
    ).as[PmRow]

    val proximity = opts.proximity
    val limitVerify = opts.limitVerify

    // 3. per-query spatialmatch
    val results = pmRows.groupByKey(_.queryId).flatMapGroups { (qid, it) =>
      val (cfgs, ndxs) = cfgBc.value
      val rows = it.toVector
      val qlen = rows.head.qlen
      val pms = rows.groupBy(r => (r.layer, r.mask, r.subquery, r.prefix, r.weight))
        .map { case ((layer, mask, subq, pfx, _), grs) =>
          val (cfg, scorefactor) = cfgs(layer)
          StackCoalesce.Pm(layer, cfg.idx, ndxs(layer), cfg.nonOverlapping,
            cfg.zoom, subq, mask, grs.head.weight, pfx,
            math.max(scorefactor, 1.0),
            grs.map(g => StackCoalesce.GridRow(g.x, g.y, g.relev, g.score3,
              g.id24, g.phraseHash, matchesLanguage = true)).toVector)
        }.toVector
      val sms = StackCoalesce.spatialmatch(qlen, pms, proximity)
      sms.take(limitVerify).zipWithIndex.map { case (sm, i) =>
        ResultRow(qid, i + 1, JsNum.roundTo(sm.relev, 4), sm.scoredist,
          sm.covers.map(c => CoverRow(c.idx, layerOf(cfgs, c.idx), c.id24,
            c.x, c.y, c.zoom, c.relev, c.score, c.tmpid, c.mask, c.text)))
      }.iterator
    }.toDF()
      // reused by cover/lead/context branches below — materialize once
      .localCheckpoint()

    // 4. verify + format (reference verifymatch.js): join lead covers to
    // features, reverse-context fill, per-query strict/loose re-rank
    val featuresAll = index.layers.map { l =>
      l.features.select(lit(l.config.idx).as("f_idx"), col("id24").as("f_id24"),
        col("id").as("feature_id"), col("text").as("f_text"),
        col("center_lon"), col("center_lat"))
    }.reduce(_ unionByName _)

    val exploded = results.select(col("queryId").as("query_id"),
        col("rank").as("position"), col("relev").as("smRelev"), col("scoredist"),
        posexplode(col("covers")).as(Seq("pos", "cover")))
      .select(col("query_id"), col("position"), col("smRelev"), col("scoredist"),
        col("pos"), col("cover.*"))

    // cover rows (kind 0)
    val coverRows = exploded.select(col("query_id"), col("position"),
      lit(0).as("kind"), col("tmpid"), col("idx"), col("mask"), col("relev"),
      col("text"), col("zoom"), col("smRelev"), col("scoredist"),
      lit(-1L).as("featureId"), lit(0.0).as("lon"), lit(0.0).as("lat"),
      lit("").as("display"))

    // lead rows (kind 2): pos==0 cover joined to its feature on the
    // (idx, id24) key — a plain equi-join so AQE broadcasts small layers
    // and shuffles big ones (address/POI layers cannot broadcast at scale)
    val leadJoined = exploded.where(col("pos") === 0)
      .join(featuresAll,
        exploded("idx") === featuresAll("f_idx") &&
          exploded("id24") === featuresAll("f_id24"), "left")
    val leadRows = leadJoined.select(col("query_id"), col("position"),
      lit(2).as("kind"), col("tmpid"), col("idx"), col("mask"), col("relev"),
      col("text"), col("zoom"), col("smRelev"), col("scoredist"),
      coalesce(col("feature_id"), lit(-1L)).as("featureId"),
      coalesce(col("center_lon"), lit(0.0)).as("lon"),
      coalesce(col("center_lat"), lit(0.0)).as("lat"),
      coalesce(substring_index(col("f_text"), ",", 1), lit("")).as("display"))
      .localCheckpoint()

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
          substring_index(col("text"), ",", 1).as("display"))

    val tagged = coverRows.unionByName(leadRows).unionByName(contextRows)
      .as[VRowT]

    val limit = opts.limit
    val finals = tagged.groupByKey(_.query_id).flatMapGroups { (qid, it) =>
      val (cfgs, ndxs) = cfgBc.value
      def ndxOf(idx: Int): Int =
        cfgs.collectFirst { case (name, (c, _)) if c.idx == idx => ndxs(name) }
          .getOrElse(idx)
      val rows = it.toVector
      val byPos = rows.groupBy(_.position)
      val vresults = byPos.toVector.sortBy(_._1).flatMap { case (posn, rs) =>
        val covers = rs.filter(_.kind == 0).map(r =>
          VerifyRank.VCover(r.tmpid, r.idx, r.mask, r.relev, r.text, r.zoom))
        val leadOpt = rs.find(_.kind == 2)
        leadOpt.map { lead =>
          val ctx = rs.filter(_.kind == 1).sortBy(-_.idx)
          val context = VerifyRank.VCtx(lead.tmpid, lead.idx, ndxOf(lead.idx),
            lead.display) +:
            ctx.map(r => VerifyRank.VCtx(r.tmpid, r.idx, ndxOf(r.idx), r.display)).toVector
          val placeName = (lead.display +: ctx.map(_.display)).filter(_.nonEmpty)
            .mkString(", ")
          (VerifyRank.VResult(posn, lead.smRelev, lead.scoredist,
            covers.toVector, context, lead.featureId, ndxOf(lead.idx)),
            (placeName, lead.featureId, lead.lon, lead.lat, lead.idx))
        }
      }
      val meta = vresults.map { case (vr, m) => vr.position -> m }.toMap
      val ranked = VerifyRank.rank(vresults.map(_._1))
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
