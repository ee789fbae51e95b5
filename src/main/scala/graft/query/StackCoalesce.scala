package graft.query

import scala.collection.mutable
import graft.core._
import graft.model._

/** Per-query spatial stacking + coalesce — the semantics of the reference's
  * native stackAndCoalesce (reference lib/geocoder/spatialmatch.js:41,
  * docs/how-carmen-works.md:151-199, legacy
  * test/unit/geocoder/spatialmatch.stackable.test.js).
  *
  * Runs on one query's phrasematches+grids (small, bounded by the same
  * limits as the reference: STACKABLE_LIMIT=100, SPATIALMATCH_STACK_LIMIT=40).
  * The Spark pipeline distributes over queries; the per-cell equi-join
  * variant is the documented scale path for single hot queries.
  */
object StackCoalesce {
  val StackableLimit = 100        // reference lib/constants.js:20
  val SpatialmatchStackLimit = 40 // reference lib/constants.js:21

  /** One phrasematch with its fetched grids. */
  final case class Pm(
      layer: String,
      idx: Int,
      ndx: Int,
      nonOverlapping: Set[Int],
      zoom: Int,
      subquery: String,
      mask: Int,
      weight: Double,
      prefix: Boolean,
      scorefactor: Double,
      grids: Vector[GridRow],
      addrNum: String = "",     // numTokenize-captured house number token
      partial: Boolean = false, // proximity partial-number search
      catMatch: Boolean = false,// subquery matches a layer category
      addrPos: Int = -1,        // number-token position in the query (V12 sort)
      fuzzy: Boolean = false,   // fuzzy-matched (edit distance > 0)
      nPhrases: Int = 1,        // distinct index phrases merged into this Pm
      // geocoder_coalesce_radius of the source (miles); 0 = zoom-scaled
      // default (reference index.js:381 -> carmen-core coalesce)
      radius: Double = 0.0
  )

  /** One inverted-index grid row (decoded). */
  final case class GridRow(x: Int, y: Int, relev: Double, score3: Int,
                           id24: Long, phraseHash: Int, matchesLanguage: Boolean)

  /** stackable: enumerate phrasematch combinations with (a) disjoint token
    * masks, (b) distinct ndx groups, (c) no mutual non_overlapping_indexes,
    * capped at StackableLimit, explored best-potential-relev-first.
    */
  def stackable(pms: Vector[Pm]): Vector[Vector[Pm]] = {
    // order by weight desc so the cap keeps the highest-potential stacks;
    // subquery/fuzzy complete the key so ties don't depend on upstream
    // grouping (HashMap) iteration order
    val sorted = pms.sortBy(pm => (-pm.weight, pm.idx, pm.mask,
      pm.subquery, pm.fuzzy))
    val out = mutable.ArrayBuffer.empty[Vector[Pm]]

    def extend(start: Int, acc: List[Pm], mask: Int, ndxs: Set[Int],
               idxs: Set[Int], banned: Set[Int]): Unit = {
      if (out.length >= StackableLimit) return
      if (acc.nonEmpty) out += acc.reverse.toVector
      var i = start
      while (i < sorted.length && out.length < StackableLimit) {
        val pm = sorted(i)
        val ok = (mask & pm.mask) == 0 &&
          !ndxs.contains(pm.ndx) &&
          !banned.contains(pm.idx) &&
          pm.nonOverlapping.intersect(idxs).isEmpty
        if (ok) extend(i + 1, pm :: acc, mask | pm.mask, ndxs + pm.ndx,
          idxs + pm.idx, banned ++ pm.nonOverlapping)
        i += 1
      }
    }
    extend(0, Nil, 0, Set.empty, Set.empty, Set.empty)
    out.toVector
  }

  /** coalesce one stack: contexts where every member contributes one grid
    * and coarser-zoom grids are tile-ancestors of the finest grid
    * (x >> dz containment). Returns at most `cap` best contexts.
    */
  def coalesceStack(stack: Vector[Pm], proximity: Option[(Double, Double)],
                    bbox: Option[(Int, Int, Int, Int, Int)],
                    cap: Int = SpatialmatchStackLimit): Vector[StackResult] = {
    val byZoom = stack.sortBy(pm => (pm.zoom, pm.idx))
    val finest = byZoom.last
    val coarser = byZoom.init

    // per coarser member: best grid per tile (relev, then score, then id)
    val lookups: Vector[(Pm, Map[(Int, Int), GridRow])] = coarser.map { pm =>
      val m = mutable.HashMap.empty[(Int, Int), GridRow]
      pm.grids.foreach { g =>
        val k = (g.x, g.y)
        val cur = m.get(k)
        if (cur.isEmpty || better(g, cur.get)) m(k) = g
      }
      (pm, m.toMap)
    }

    val results = mutable.ArrayBuffer.empty[StackResult]
    finest.grids.foreach { g =>
      if (inBbox(g, finest.zoom, bbox)) {
        var entries = Vector.newBuilder[CoverEntry]
        var relevSum = 0.0
        var complete = true
        // lead entry: the finest member's grid
        val lead = mkEntry(finest, g, proximity)
        entries += lead
        relevSum += lead.relev
        lookups.foreach { case (pm, m) =>
          if (complete) {
            val dz = finest.zoom - pm.zoom
            val key = (g.x >> dz, g.y >> dz)
            m.get(key) match {
              case Some(pg) =>
                val e = mkEntry(pm, pg, proximity)
                entries += e
                relevSum += e.relev
              case None => complete = false
            }
          }
        }
        if (complete) {
          // covers[0] is the feature verify loads (reference
          // verifymatch.js:239) — order by contribution, most specific first
          val covers = entries.result()
            .sortBy(c => (-c.relev, -c.zoom, -c.idx))
          // C8: partial-number stacks boost the stack scoredist x300 so
          // nearby bare-number address matches surface despite their
          // uninformative score (reference spatialmatch.js:193-198)
          val sd = covers.head.scoredist
          val boosted = if (covers.exists(_.partial)) sd * 300 else sd
          results += StackResult(0L, JsNum.roundTo(relevSum, 8), boosted, covers)
        }
      }
    }
    // ties break by descending packed grid value (y, x, id) — the legacy
    // gridstore ordering observable in the reference's proximity fixtures
    // (country.2 at y=1 sorts before country.1 at y=0)
    val sorted = results.sortBy { r =>
      val c = r.covers.head
      (-r.relev, -r.scoredist, -((c.y.toLong << 34) | (c.x.toLong << 20) | c.id24))
    }
    // one context per lead feature BEFORE the cap (carmen-core keeps the
    // best grid per feature id): a multi-tile feature's many near grids
    // must not crowd other features out of the capped window — observable
    // in geocode-unit.proximity-polygon (341-tile polygons, 3 features)
    val seen = mutable.HashSet.empty[Long]
    val deduped = sorted.filter(r => seen.add(r.covers.head.tmpid))
    deduped.take(cap).toVector
  }

  private def better(a: GridRow, b: GridRow): Boolean =
    a.relev > b.relev ||
      (a.relev == b.relev && (a.score3 > b.score3 ||
        (a.score3 == b.score3 && a.id24 < b.id24)))

  private def inBbox(g: GridRow, zoom: Int,
                     bbox: Option[(Int, Int, Int, Int, Int)]): Boolean = bbox match {
    case None => true
    case Some((bz, minX, minY, maxX, maxY)) =>
      val dz = zoom - bz
      val px = if (dz >= 0) g.x >> dz else g.x << -dz
      val py = if (dz >= 0) g.y >> dz else g.y << -dz
      px >= minX && px <= maxX && py >= minY && py <= maxY
  }

  /** Language-mismatch penalty on a grid's relevance (carmen-core coalesce;
    * observable in reference acceptance expectations, e.g.
    * test/acceptance/geocode-unit.promote-language.test.js:107).
    */
  val LanguagePenalty = 0.96

  private def mkEntry(pm: Pm, g: GridRow,
                      proximity: Option[(Double, Double)]): CoverEntry = {
    val score = GridCodec.decode3BitLogScale(g.score3, pm.scorefactor)
    val gridRelev = if (g.matchesLanguage) g.relev else g.relev * LanguagePenalty
    val (dist, scoredist) = proximity match {
      case Some((plon, plat)) =>
        val d = Proximity.distance(plon, plat,
          tileCenterLon(g.x, pm.zoom), tileCenterLat(g.y, pm.zoom),
          g.x, g.y, pm.zoom)
        (d, Proximity.scoredist(score, 0, math.max(pm.scorefactor, 1.01), d,
          pm.zoom, pm.radius))
      case None => (0.0, score)
    }
    CoverEntry(g.x, g.y,
      relev = JsNum.roundTo(gridRelev * pm.weight, 8),
      score = score, id24 = g.id24, idx = pm.idx,
      tmpid = GridCodec.tmpid(pm.idx, g.id24), mask = pm.mask,
      distance = dist, scoredist = scoredist,
      matchesLanguage = g.matchesLanguage, phraseHash = g.phraseHash,
      zoom = pm.zoom, text = pm.subquery, prefix = pm.prefix,
      addrNum = pm.addrNum, partial = pm.partial, catMatch = pm.catMatch,
      addrPos = pm.addrPos)
  }

  private def tileCenterLon(x: Int, z: Int): Double =
    Mercator.ll((x + 0.5) * Mercator.TileSize, 0, z)._1
  private def tileCenterLat(y: Int, z: Int): Double =
    Mercator.ll(0, (y + 0.5) * Mercator.TileSize, z)._2

  /** rebalance (reference lib/geocoder/spatialmatch.js:98-136): re-weight
    * cover relevs toward equal stack shares; clamp total to 1.
    */
  def rebalance(queryLength: Int, result: StackResult): StackResult = {
    var stackMask = 0
    result.covers.foreach(c => stackMask |= c.mask)
    val coverage = Integer.bitCount(stackMask)
    val missing = queryLength - coverage
    val stackLength = result.covers.length
    val stackWeight = if (missing > 0) 1.0 / (stackLength + 1) else 1.0 / stackLength

    var totalWeight = 0.0
    var expectedWeight = 0.0
    val newCovers = result.covers.map { c =>
      expectedWeight += c.relev
      val entryWeight = Integer.bitCount(c.mask).toDouble / queryLength
      val discount = c.relev / entryWeight
      val newRelev = JsNum.roundTo((c.relev + 1.25 * stackWeight * discount) / 2.25, 8)
      totalWeight += newRelev
      c.copy(relev = newRelev)
    }
    val stackPenalty = expectedWeight - result.relev
    result.copy(relev = math.min(JsNum.roundTo(totalWeight - stackPenalty, 8), 1.0),
      covers = newCovers)
  }

  /** Full per-query spatialmatch: stackable -> coalesce each stack ->
    * rebalance -> sort -> directional dedupe (one ascending + one descending
    * + one single result per lead tmpid — reference spatialmatch.js:43-82).
    */
  def spatialmatch(queryLength: Int, pms: Vector[Pm],
                   proximity: Option[(Double, Double)] = None,
                   bbox: Option[(Int, Int, Int, Int, Int)] = None,
                   stackLimit: Int = SpatialmatchStackLimit): Vector[StackResult] = {
    val stacks = stackable(pms)
    // single-member stacks keep up to 40 contexts (carmen-core
    // coalesce_single MAX_CONTEXTS — observable in geocode-unit.limit:
    // 20 same-phrase places must all surface); multi-member stacks cap 4
    val all = stacks.flatMap(s =>
      coalesceStack(s, proximity, bbox, cap = if (s.length == 1) 40 else 4))
      .map(r => rebalance(queryLength, r))
      // category bump: a small relevance bump for queries matching a layer's
      // geocoder_categories, clamped at 1 (reference phrasematch.js:348-355
      // computes the flag; the "small score bump" + its >1 clamp are
      // documented in CHANGELOG.md 25.8.1 and docs/data-sources.md:28)
      .map { r =>
        if (r.covers.exists(_.catMatch))
          r.copy(relev = math.min(JsNum.roundTo(r.relev + 0.01, 8), 1.0))
        else r
      }
      .sortBy { r =>
        val c = r.covers.head
        (-r.relev, -r.scoredist, c.idx, -avgIdx(r),
          -((c.y.toLong << 34) | (c.x.toLong << 20) | c.id24))
      }

    val doneAsc = mutable.HashSet.empty[Long]
    val doneDesc = mutable.HashSet.empty[Long]
    val doneSingle = mutable.HashSet.empty[Long]
    val out = Vector.newBuilder[StackResult]
    var n = 0
    all.foreach { sm =>
      val covers = sm.covers
      val tmpid = covers.head.tmpid
      if (n < stackLimit) {
        if (covers.length > 1 && covers.head.idx > covers(1).idx && !doneDesc.contains(tmpid)) {
          doneDesc += tmpid; out += sm; n += 1
        } else if (covers.length > 1 && covers.head.idx < covers(1).idx && !doneAsc.contains(tmpid)) {
          doneAsc += tmpid; out += sm; n += 1
        } else if (covers.length == 1 && !doneAsc.contains(tmpid) &&
          !doneDesc.contains(tmpid) && !doneSingle.contains(tmpid)) {
          doneSingle += tmpid; out += sm; n += 1
        }
      }
    }
    out.result()
  }

  private def avgIdx(r: StackResult): Double =
    if (r.covers.isEmpty) 0 else r.covers.map(_.idx).sum.toDouble / r.covers.length
}
