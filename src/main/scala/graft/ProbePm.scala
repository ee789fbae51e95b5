package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** pm_join branch attribution: times the exact / prefix / fuzzy /
  * fuzzy-prefix candidate branches and the postings probe separately, plus
  * index-table cardinalities, for the BigGazetteer bench workloads.
  */
object ProbePm {
  def main(args: Array[String]): Unit = {
    val cpus = if (args.nonEmpty) args(0) else "32"
    val nq = if (args.length > 1) args(1).toInt else 2000
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val index = graft.index.BigGazetteer.buildIndex(spark, 22000)
    index.layers.foreach { l =>
      l.postings.count(); l.tileFeatures.count(); l.features.count()
      l.deletes.count(); l.prefixes.count()
      l.prefixDeletes.count()
    }
    println(s"PROBE sizes postings=${index.allPostings.count()} " +
      s"deletes=${index.allDeletes.count()} " +
      s"prefixes=${index.allPrefixes.count()} " +
      s"prefixDeletes=${index.layers.map(_.prefixDeletes.count()).sum} " +
      s"tileFeatures=${index.allTileFeatures.count()}")

    def time[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PROBE $tag ${(System.nanoTime() - t0) / 1e9}%.2fs")
      r
    }

    val groups = {
      // same group derivation as Forward.forward
      index.layers.map(_.config).groupBy(_.querySignature).map { case (sig, cfgs) =>
        val c = cfgs.head
        query.Forward.QueryGroup(sig, graft.index.IndexBuilder.replacersFor(c),
          c.geocoderAddress, c.intersectionToken)
      }.toVector
    }

    for ((tag, qs) <- Seq(
      ("fwd", graft.index.BigGazetteer.forwardQueries(spark, nq, 22000)),
      ("fuzzy", graft.index.BigGazetteer.fuzzyQueries(spark, nq / 2, 22000)))) {
      // warm the whole path once
      query.Forward.forward(spark, index, qs).count()
      val subs = time(s"$tag subqueries_ck") {
        val s = query.Forward.subqueries(spark, qs, groups,
          proximityDefined = false).localCheckpoint()
        s.count(); s
      }
      println(s"PROBE $tag subs=${subs.count()}")
      def tagSig(dfOf: graft.index.IndexBuilder.LayerIndex => org.apache.spark.sql.DataFrame) =
        index.layers.map { l =>
          dfOf(l).withColumn("qsig", lit(l.config.querySignature))
        }.reduce(_ unionByName _)
      // exact branch: subquery == phrase against postings
      time(s"$tag exact_probe") {
        val exact = subs.withColumn("phrase", col("subquery"))
        println("  rows=" + tagSig(_.postings).join(exact, Seq("qsig", "phrase")).count())
      }
      // prefix branch
      time(s"$tag prefix_join") {
        val maxPfx = graft.index.IndexBuilder.MaxPrefixLen
        val pfxSubs = subs.where(col("ender"))
          .withColumn("pfx", substring(col("subquery"), 1, maxPfx))
          .withColumn("pfx_len", least(length(col("subquery")), lit(maxPfx)))
        println("  rows=" + tagSig(_.prefixes).join(pfxSubs, Seq("pfx", "pfx_len", "qsig")).count())
      }
      // fuzzy variant generation alone
      val qv = time(s"$tag fuzzy_variants_ck") {
        val v = subs.as[query.Forward.SubQ]
          .filter(s => !s.partial && s.editDist == 0 && s.fuzzyOk)
          .flatMap { s =>
            graft.core.Fuzzy.phraseVariants(s.subquery).map(v =>
              query.Forward.FuzzVar(s.queryId, s.subquery, s.mask, s.ender,
                s.weight, s.qlen, s.qsig, v, s.addrPos, s.addrNum, s.numberOrder))
          }.toDF().localCheckpoint()
        v.count(); v
      }
      println(s"PROBE $tag fuzzy_variants=${qv.count()}")
      time(s"$tag fuzzy_join") {
        println("  rows=" + tagSig(_.deletes).join(qv, Seq("variant", "qsig")).count())
      }
      time(s"$tag fuzzy_join_bcast") {
        println("  rows=" + tagSig(_.deletes).join(broadcast(qv), Seq("variant", "qsig")).count())
      }
      // fuzzy prefix branch
      val qpv = time(s"$tag fuzzyPfx_variants_ck") {
        val maxPfx = graft.index.IndexBuilder.MaxPrefixLen
        val v = subs.as[query.Forward.SubQ]
          .filter(s => s.ender && !s.partial && s.editDist == 0 && s.fuzzyOk &&
            s.subquery.length >= graft.core.Fuzzy.MinCorrectionLength)
          .flatMap { s =>
            val k = s.subquery.substring(0, math.min(maxPfx, s.subquery.length))
            graft.core.Fuzzy.deleteVariants(k).map(v =>
              query.Forward.FuzzPfxVar(s.queryId, s.subquery, s.mask, s.weight,
                s.qlen, s.qsig, v, s.addrPos, s.addrNum, s.numberOrder,
                s.wordBoundary))
          }.toDF().localCheckpoint()
        v.count(); v
      }
      println(s"PROBE $tag fuzzyPfx_variants=${qpv.count()}")
      time(s"$tag fuzzyPfx_join") {
        println("  rows=" + tagSig(_.prefixDeletes).join(qpv, Seq("variant", "qsig")).count())
      }
      time(s"$tag fuzzyPfx_join_bcast") {
        println("  rows=" + tagSig(_.prefixDeletes).join(broadcast(qpv), Seq("variant", "qsig")).count())
      }
    }
    spark.stop()
  }
}
