package graft.query

import scala.collection.mutable
import graft.core.JsNum

/** The verify-stage context re-rank — port of the reference's
  * verifyContext / verifyContexts / sortContext state machine
  * (reference lib/geocoder/verifymatch.js:574-977, 1003-1053):
  * strict/loose relevance accumulation over mask-disjoint matches, the
  * "backy" direction penalty (x0.5), near-alignment half credit
  * ("closeButNoCigar"), and the direction bonus vs geocoder_address_order.
  *
  * [[rankChunk]] processes ONE verify chunk of at most limit_verify results
  * with chunk-scoped peers (V14, verifymatch.js:574-672): squishy score
  * inheritance and override:{type} peer bumps only see the chunk's own
  * verified leads, the loose `sets` map is mutated by the bumps (persisting
  * into later chunks), and the ghost-text dedupe runs per chunk.
  */
object VerifyRank {

  /** A cover from the spatialmatch stack (strict candidates). */
  final case class VCover(tmpid: Long, idx: Int, mask: Int, relev: Double,
                          text: String, zoom: Int,
                          // matched-grid phrase hash (matching-text recovery)
                          phraseHash: Int = 0)

  /** One context element; position 0 is the candidate feature itself,
    * the rest the reverse-context hierarchy sorted low-to-high.
    * `fullText` is the feature's comma-joined carmen:text (for textAlike);
    * `score`/`inheritScore`/`grantScore` feed squishy score inheritance.
    */
  final case class VCtx(tmpid: Long, idx: Int, ndx: Int, text: String,
                        ignoreOrder: Boolean = false,
                        fullText: String = "", score: Double = 0.0,
                        inheritScore: Boolean = false,
                        grantScore: Boolean = false,
                        langTexts: Map[String, String] = Map.empty)

  /** textAlike (reference verifymatch.js:1069-1084), language-aware: the
    * target's first synonym is contained in the candidate's for ANY shared
    * carmen:text* field (default text or the same language key).
    */
  def textAlike(target: String, candidate: String): Boolean = {
    val t = target.split(",")(0)
    val c = candidate.split(",")(0)
    t.nonEmpty && c.nonEmpty && c.contains(t)
  }

  def textAlikeCtx(target: VCtx, candidate: VCtx): Boolean = {
    if (textAlike(target.fullText, candidate.fullText)) return true
    target.langTexts.exists { case (lang, t) =>
      candidate.langTexts.get(lang).exists(c => textAlike(t, c))
    }
  }

  /** One spatialmatch result awaiting verification. The address flags feed
    * the full sortContext tie-break chain (V12).
    *
    * `appliedOverrides` lists the override:{type} substitutions this
    * result's context took — the matching-peer bump count is resolved per
    * chunk in [[rankChunk]] (verifymatch.js:617-631). `leadType` is the
    * lead's SOURCE index type (peer matching keys on it), `dedupeText` the
    * language-selected full text for the chunk ghost dedupe.
    */
  final case class VResult(position: Int, smRelev: Double, scoredist: Double,
                           covers: Vector[VCover], context: Vector[VCtx],
                           leadFeatureId: Long, leadNdx: Int,
                           addressNull: Boolean = true,
                           ghost: Boolean = false,
                           hasAddress: Boolean = false, addressPos: Int = -1,
                           fromCluster: Boolean = false,
                           interpolated: Boolean = false,
                           omitted: Boolean = false,
                           appliedOverrides: Vector[(String, String)] = Vector.empty,
                           leadType: String = "",
                           leadScore: Double = 0.0,
                           dedupeText: String = "",
                           // the reference's carmen:position (verify load
                           // order; may repeat across chunks) — the
                           // sortContext position key, while `position`
                           // stays the unique result identity
                           sortPos: Int = 0,
                           // lead layer's geocoder_address_order
                           addressOrder: String = "ascending")

  final case class Verified(position: Int, relevance: Double, scoredist: Double,
                            typeindex: Int, leadFeatureId: Long,
                            hasAddress: Boolean = false, addressPos: Int = -1,
                            fromCluster: Boolean = false,
                            interpolated: Boolean = false,
                            omitted: Boolean = false,
                            // spatialmatch relev: countGoodContexts compares
                            // the verified relevance against it
                            smRelev: Double = 0.0,
                            // carmen:position (sortContext key)
                            sortPos: Int = 0)

  /** verifyContext (reference verifymatch.js:749-977). `strict` are this
    * result's own covers; `loose` the best cover per tmpid across all
    * spatialmatches (pass empty for the strict-only invocation);
    * `peerScores` the chunk's verified leads by tmpid — squishy score
    * inheritance only credits context elements that are themselves chunk
    * peers, using the peer's REAL loaded score (verifymatch.js:867-876).
    */
  def verifyContext(context: Vector[VCtx], strict: collection.Map[Long, VCover],
                    loose: collection.Map[Long, VCover],
                    addressOrder: String = "ascending",
                    peerScores: Map[Long, Double] = Map.empty): Double =
    verifyContextSquishy(context, strict, loose, addressOrder, peerScores)._1

  /** verifyContext returning (relevance, squishy score bonus) — squishy
    * score inheritance for same-named nested features
    * (reference verifymatch.js:813-838, 939-972).
    */
  // collection.Map so the per-chunk caller can pass its live mutable loose
  // map directly (it was snapshot-copied per context row before — pure
  // allocation; this pass only reads)
  def verifyContextSquishy(context: Vector[VCtx],
                           strict: collection.Map[Long, VCover],
                           loose: collection.Map[Long, VCover],
                           addressOrder: String = "ascending",
                           peerScores: Map[Long, Double] = Map.empty): (Double, Double) = {
    var usedmask = 0
    var closemask = 0
    var lastmask = -1
    var lastgroup = -1
    var lastText: String = null
    var relevance = 0.0
    var closeRelevance = 0.0
    var direction: String = null
    var squishy = 0.0
    val squishyTarget: Option[VCtx] =
      context.headOption.filter(_.inheritScore)
    var contextSquishyTarget: Option[VCtx] = None
    var contextSquishy = false

    val strictByIdx = strict.values.map(c => c.idx -> c).toMap

    var haveLastMatched = false
    var lastMatchedIgnore = false
    var c = 0
    while (c < context.length) {
      var backy = false
      var closeButNoCigar = false
      val feat = context(c)
      // geocoder_ignore_order: either side of the comparison opts out of the
      // backy direction penalty (verifymatch.js:804-811)
      val ignoreOrder = haveLastMatched && (feat.ignoreOrder || lastMatchedIgnore)
      var matchedOpt = strict.get(feat.tmpid).orElse(loose.get(feat.tmpid))
      var skip = false

      if (matchedOpt.isEmpty) {
        strictByIdx.get(feat.idx) match {
          case Some(m) =>
            // same-index near-alignment: partial credit unless low-zoom or
            // very short text (reference verifymatch.js:782-793)
            if (m.zoom <= 8 || (m.text != null && m.text.length <= 3)) skip = true
            else { matchedOpt = Some(m); closeButNoCigar = true }
          case None =>
            // CONTEXT SQUISHY (verifymatch.js:794-800)
            if (contextSquishyTarget.isDefined && !contextSquishy &&
              feat.grantScore &&
              textAlikeCtx(contextSquishyTarget.get, feat))
              contextSquishy = true
            skip = true
        }
      }

      if (!skip) {
        // SQUISHY (verifymatch.js:865-876): the same-named nested element
        // must be a verified CHUNK PEER; its real loaded score is inherited
        if (squishyTarget.isDefined && c > 0 && feat.grantScore &&
          peerScores.contains(feat.tmpid) &&
          textAlikeCtx(squishyTarget.get, feat))
          squishy += math.max(peerScores(feat.tmpid), 0.0)
        // CONTEXT SQUISHY target (verifymatch.js:878-894)
        if (contextSquishyTarget.isEmpty && c > 0 && feat.inheritScore &&
          !closeButNoCigar)
          contextSquishyTarget = Some(feat)
      }

      if (!skip) {
        val matched = matchedOpt.get
        val conflict =
          if (closeButNoCigar) (closemask & matched.mask) != 0
          else (usedmask & matched.mask) != 0
        if (!conflict) {
          if (direction == null && !ignoreOrder && c > 0) {
            direction = if (lastmask < matched.mask) "ascending" else "descending"
          }
          if (lastgroup > -1 && matched.text != lastText) {
            if (direction == "ascending") backy = lastmask > matched.mask
            else if (direction == "descending") backy = lastmask < matched.mask
          }
          if (closeButNoCigar) closemask |= matched.mask
          else usedmask |= matched.mask
          lastmask = matched.mask
          lastgroup = feat.ndx
          lastText = matched.text
          haveLastMatched = true
          lastMatchedIgnore = feat.ignoreOrder

          var penalty = 1.0
          if (backy && !ignoreOrder) penalty *= 0.5
          if (closeButNoCigar) {
            penalty *= 0.5
            closeRelevance += matched.relev * penalty
          } else {
            relevance += matched.relev * penalty
          }
        }
      }
      c += 1
    }

    if (closemask != 0 && (closemask & usedmask) == 0) relevance += closeRelevance
    if (contextSquishy) relevance += 0.01 // verifymatch.js:970-972
    if (direction != null) relevance -= 0.01
    if (direction != null && addressOrder == direction) relevance += 0.01
    (math.max(relevance, 0.0), squishy)
  }

  /** Build the loose `sets` map — best cover per tmpid (spatialmatch.js:64-68).
    * The caller passes covers from ALL spatialmatch results (the reference's
    * matched.sets), not just the verified slice.
    */
  def looseSets(covers: Iterable[VCover]): mutable.HashMap[Long, VCover] = {
    val sets = mutable.HashMap.empty[Long, VCover]
    for (cv <- covers) {
      val cur = sets.get(cv.tmpid)
      if (cur.isEmpty || cur.get.relev < cv.relev) sets(cv.tmpid) = cv
    }
    sets
  }

  /** One verifyContexts chunk (reference verifymatch.js:574-672, called per
    * batch of at most limit_verify results by verifyContextChunk):
    *
    *  - peers map from the CHUNK's verified leads only;
    *  - per result, in chunk order: override:{type} peer bumps mutate the
    *    shared `loose` sets (each matching peer adds 1/MAX_QUERY_TOKENS to
    *    the result's lead cover relev, clamped at 1 — the mutation persists
    *    into later chunks), THEN the strict + loose verifyContext passes;
    *  - 6-dp rounding, drop relevance 0;
    *  - chunk sortContext sort;
    *  - chunk-scoped ghost-text dedupe (scoredist < 0 results whose text
    *    duplicates a better non-ghost result in the SAME chunk).
    *
    * Returns (verified, relev+scoredist composite) pairs in chunk-sorted
    * order; the caller accumulates chunks and applies the final global
    * sortContext + limit_verify slice.
    */
  def rankChunk(chunk: Vector[VResult],
                loose: mutable.HashMap[Long, VCover],
                proximitySet: Boolean = false): Vector[(Verified, Double)] = {
    // chunk peers: tmpid -> (source type, full text, loaded score)
    val peers: Vector[(Long, String, String, Double)] = chunk.flatMap { r =>
      r.context.headOption.map(lead =>
        (lead.tmpid, r.leadType, lead.fullText, r.leadScore))
    }
    val peerScores: Map[Long, Double] =
      peers.map(p => (p._1, p._4)).toMap

    val verified = chunk.flatMap { r =>
      // override:{type} peer bumps BEFORE this result's own loose pass
      // (verifymatch.js:607-631: the substitution loop precedes the
      // verifyContext calls for the same context)
      if (r.appliedOverrides.nonEmpty) {
        for (lead <- r.context.headOption; (typ, ov) <- r.appliedOverrides) {
          val bumps = peers.count(p => p._2 == typ && p._3 == ov)
          if (bumps > 0) loose.get(lead.tmpid).foreach { cv =>
            var relev = cv.relev
            var i = 0
            while (i < bumps) {
              relev = math.min(relev + 1.0 / 20, 1.0) // 1/MAX_QUERY_TOKENS
              i += 1
            }
            loose(lead.tmpid) = cv.copy(relev = relev)
          }
        }
      }
      val strict = r.covers.map(c => c.tmpid -> c).toMap
      val (strictRelev, sq1) =
        verifyContextSquishy(r.context, strict, Map.empty, r.addressOrder,
          peerScores = peerScores)
      val (looseRelev, sq2) =
        verifyContextSquishy(r.context, strict, loose, r.addressOrder,
          peerScores = peerScores)
      val squishy = math.max(sq1, sq2)
      val relevance = JsNum.roundTo(math.max(strictRelev, looseRelev), 6)
      // X9: proximity searches sort by the relev+scoredist composite before
      // raw scoredist (reference verifymatch.js:512-517, sortContext:986)
      val composite =
        if (proximitySet)
          graft.core.Proximity.relevanceScore(r.smRelev, r.scoredist,
            r.addressNull, ghost = r.ghost)
        else 0.0
      // squishy bumps the lead's effective score: without proximity the
      // reference adds it straight onto scoredist (verifymatch.js:958-960)
      val scoredist = r.scoredist + (if (squishy > 0) squishy else 0.0)
      if (relevance > 0)
        Some((Verified(r.position, relevance, scoredist, r.leadNdx,
          r.leadFeatureId, r.hasAddress, r.addressPos, r.fromCluster,
          r.interpolated, r.omitted, r.smRelev, r.sortPos), composite,
          r.dedupeText, r.ghost))
      else None
    }

    val sorted = verified.sortWith { case ((a, ac, _, _), (b, bc, _, _)) =>
      sortContextLt(a, ac, b, bc) }
    // chunk ghost dedupe (verifymatch.js:659-672): keyed on scoredist >= 0
    // and the language-selected full text, within this chunk only
    val byText = mutable.HashSet.empty[String]
    sorted.flatMap { case (v, c, text, ghost) =>
      val nonGhost = !ghost
      if (nonGhost || !byText.contains(text)) {
        if (nonGhost) byText += text
        Some((v, c))
      } else None
    }
  }

  /** sortContext "a before b" (reference verifymatch.js:1003-1053):
    * relevance, relev+scoredist composite, omitted, scoredist, typeindex,
    * then for address pairs: query position of the number, cluster over
    * ITP, non-interpolated; finally spatialmatch position and id. (The
    * reference defers the omitted check past scoredist when the two
    * results differ in carmen:inside_radius; inside_radius is only set on
    * proximity radius searches, which this engine folds into scoredist.)
    */
  def sortContextLt(a: Verified, ac: Double, b: Verified, bc: Double): Boolean =
    if (a.relevance != b.relevance) a.relevance > b.relevance
    else if (ac != bc) ac > bc
    else if (a.omitted != b.omitted) !a.omitted
    else if (a.scoredist != b.scoredist) a.scoredist > b.scoredist
    else if (a.typeindex != b.typeindex) a.typeindex < b.typeindex
    else if (a.hasAddress && b.hasAddress && a.addressPos != b.addressPos)
      a.addressPos < b.addressPos
    else if (a.hasAddress && b.hasAddress && a.fromCluster != b.fromCluster)
      a.fromCluster
    else if (a.hasAddress && b.hasAddress && a.interpolated != b.interpolated)
      !a.interpolated
    else if (a.sortPos != b.sortPos) a.sortPos < b.sortPos
    else a.leadFeatureId < b.leadFeatureId

  /** Final cross-chunk sort (sortContext over the accumulated results,
    * verifymatch.js:292-297).
    */
  def sortAll(results: Vector[(Verified, Double)]): Vector[(Verified, Double)] =
    results.sortWith { case ((a, ac), (b, bc)) => sortContextLt(a, ac, b, bc) }
}
