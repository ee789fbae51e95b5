package graft

import org.apache.spark.sql.SparkSession

/** Stage attribution for the geocode_forward / geocode_fuzzy bench entries:
  * the BigGazetteer workloads, warm pass timed, then a stats pass for the
  * per-stage split (pm_join / spatialmatch / verifymatch / context_rank).
  */
object ProbeFwd {
  def main(args: Array[String]): Unit = {
    val cpus = if (args.nonEmpty) args(0) else "32"
    val nq = if (args.length > 1) args(1).toInt else 2000
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val t0 = System.nanoTime()
    val index = graft.index.BigGazetteer.buildIndex(spark, 22000)
    index.layers.foreach { l =>
      l.postings.count(); l.tileFeatures.count(); l.features.count()
    }
    index.candByQsig.values.foreach { case (d, p, pd) =>
      d.count(); p.count(); pd.count()
    }
    index.allPostingsQsig.count()
    index.allFeaturesWide.count()
    index.allTileFeatures.count()
    println(f"PROBE build_index ${(System.nanoTime() - t0) / 1e9}%.1fs")

    def run(tag: String, qs: org.apache.spark.sql.DataFrame,
            stats: Option[query.Forward.GeocodeStats]): Unit = {
      val t = System.nanoTime()
      val n = query.Forward.forward(spark, index, qs, stats = stats).count()
      println(f"PROBE $tag ${(System.nanoTime() - t) / 1e9}%.1fs rows=$n")
      stats.foreach(s => println(s"PROBE $tag stages: $s"))
    }
    val fq = graft.index.BigGazetteer.forwardQueries(spark, nq, 22000)
      .localCheckpoint()
    val zq = graft.index.BigGazetteer.fuzzyQueries(spark, nq / 2, 22000)
      .localCheckpoint()
    run("fwd_warmup", fq, None)
    run("fwd_warm", fq, None)
    run("fwd_stats", fq, Some(new query.Forward.GeocodeStats()))
    run("fuzzy_warm", zq, None)
    run("fuzzy_stats", zq, Some(new query.Forward.GeocodeStats()))
    spark.stop()
  }
}
