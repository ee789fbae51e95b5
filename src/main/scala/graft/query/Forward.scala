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
                            zoom: Int, relev: Double, score: Double)

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

    val subs = subqueries(spark, queries)

    // 2. phrasematch joins: exact + (strict) prefix for autocomplete enders
    val postings = index.allPostings
    val exact = postings.join(broadcast(subs), postings("phrase") === subs("subquery"))
      .withColumn("is_prefix", lit(false))
    val withPrefix =
      if (!opts.autocomplete) exact
      else exact.unionByName(
        postings.join(broadcast(subs.where(col("ender"))),
          postings("phrase").startsWith(subs("subquery")) &&
            postings("phrase") =!= subs("subquery"))
          .withColumn("is_prefix", lit(true)))

    // fuzzy branch (P6): symmetric-delete candidate join + DL<=1 verify +
    // levenshtein-ratio weight penalty (reference phrasematch.js:328-345)
    val matched =
      if (!opts.fuzzy) withPrefix
      else {
        val qVariants = subs.as[SubQ].flatMap { s =>
          Fuzzy.phraseVariants(s.subquery).map(v =>
            FuzzVar(s.queryId, s.subquery, s.mask, s.ender, s.weight, s.qlen, v))
        }.toDF()
        val cand = index.allDeletes.join(broadcast(qVariants), Seq("variant"))
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
            c.x, c.y, c.zoom, c.relev, c.score)))
      }.iterator
    }.toDF()

    // 4. verify-lite + format: join lead + context covers to features
    val featuresAll = index.layers.map { l =>
      l.features.select(lit(l.config.idx).as("f_idx"), col("id24").as("f_id24"),
        col("id").as("feature_id"), col("text").as("f_text"),
        col("center_lon"), col("center_lat"))
    }.reduce(_ unionByName _)

    val exploded = results.select(col("queryId").as("query_id"), col("rank"),
        col("relev"), col("scoredist"), posexplode(col("covers")).as(Seq("pos", "cover")))
      .select(col("query_id"), col("rank"), col("relev"), col("scoredist"),
        col("pos"), col("cover.idx"), col("cover.id24"))

    val withFeatures = exploded.join(broadcast(featuresAll),
      exploded("idx") === featuresAll("f_idx") && exploded("id24") === featuresAll("f_id24"),
      "left")
      .withColumn("display", substring_index(col("f_text"), ",", 1))

    // context fill (reference verifymatch.js:542-559): reverse-lookup the
    // lead feature's center in every layer coarser than the lead, to
    // complete the hierarchy for layers the query text did not match
    val leads = withFeatures.where(col("pos") === 0)
      .select(col("query_id"), col("rank"), col("idx").as("lead_idx"),
        col("center_lon").as("lon"), col("center_lat").as("lat"))
    val contextRows =
      Reverse.picks(leads, index, Seq("query_id", "rank"), radiusMiles = 0.0)
        .join(leads.select(col("query_id"), col("rank"), col("lead_idx")),
          Seq("query_id", "rank"))
        .where(col("idx") < col("lead_idx"))
        .select(col("query_id"), col("rank"), col("idx"),
          substring_index(col("text"), ",", 1).as("display"))
        .withColumn("src", lit(1))

    val matchedRows = withFeatures
      .select(col("query_id"), col("rank"), col("relev"), col("scoredist"),
        col("pos"), col("idx"), col("feature_id"), col("center_lon"),
        col("center_lat"), col("display"))

    // prefer the matched cover's feature over the context pick per idx
    val contextPruned = contextRows.as("c")
      .join(matchedRows.select(col("query_id"), col("rank"), col("idx")).as("m"),
        Seq("query_id", "rank", "idx"), "left_anti")

    val allNames = matchedRows
      .select(col("query_id"), col("rank"), col("idx"), col("display"))
      .unionByName(contextPruned.select(col("query_id"), col("rank"),
        col("idx"), col("display")))

    val names = allNames
      .groupBy(col("query_id"), col("rank"))
      .agg(concat_ws(", ", transform(array_sort(collect_list(
        struct((lit(100) - col("idx")).as("ord"), col("display")))),
        s => s.getField("display"))).as("place_name"))

    matchedRows.where(col("pos") === 0)
      .select(col("query_id"), col("rank"), col("relev"), col("scoredist"),
        col("feature_id"), col("center_lon"), col("center_lat"),
        col("idx").as("lead_idx"))
      .join(names, Seq("query_id", "rank"))
      .where(col("rank") <= opts.limit)
      .select(col("query_id"), col("rank"), col("relev"), col("scoredist"),
        col("place_name"), col("feature_id"), col("center_lon"),
        col("center_lat"), col("lead_idx"))
      .orderBy(col("query_id"), col("rank"))
  }

  private def layerOf(cfgs: Map[String, (LayerConfig, Double)], idx: Int): String =
    cfgs.collectFirst { case (name, (c, _)) if c.idx == idx => name }.getOrElse("?")
}
