package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Context-fill and candidate-branch plan/time attribution on the
  * BigGazetteer: executed plans (join strategies, exchange counts) for the
  * fuzzy/prefix candidate joins and the reverse/context tile join, plus
  * wall times. Writes plans to /tmp/ctxplans/.
  */
object ProbeCtx {
  def main(args: Array[String]): Unit = {
    val cpus = if (args.nonEmpty) args(0) else "32"
    val nq = if (args.length > 1) args(1).toInt else 2000
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val outDir = java.nio.file.Paths.get("/tmp/ctxplans")
    java.nio.file.Files.createDirectories(outDir)

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
    println(s"PROBE grouped sizes deletesG=${index.candByQsig.values.map(_._1.count()).sum} " +
      s"prefixesG=${index.candByQsig.values.map(_._2.count()).sum} " +
      s"prefixDeletesG=${index.candByQsig.values.map(_._3.count()).sum}")

    def time[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PROBE $tag ${(System.nanoTime() - t0) / 1e9}%.2fs")
      r
    }
    def dump(tag: String, df: org.apache.spark.sql.DataFrame): Unit =
      java.nio.file.Files.writeString(outDir.resolve(s"$tag.txt"),
        df.queryExecution.executedPlan.toString)

    val qs = graft.index.BigGazetteer.forwardQueries(spark, nq, 22000)
    query.Forward.forward(spark, index, qs).count() // warm

    val subs = query.Forward.subqueriesForProbe(spark, index, qs)
    subs.count()
    val branches = query.Forward.phrasematchBranchesForProbe(index, subs)
    branches.foreach { case (name, df) =>
      time(s"branch_$name") { println(s"  rows=${df.count()}") }
      dump(s"branch_$name", df)
    }
    val matched = query.Forward.phrasematchJoinsForProbe(index, subs)
    time("postings_probe") { println(s"  rows=${matched.count()}") }
    dump("postings_probe", matched)

    // context-fill tile join: replicate the forward context candidates call
    val leadPts = graft.index.BigGazetteer.reversePoints(spark, nq, 22000)
      .select(col("query_id"), lit(1).as("sub"), col("lon"), col("lat"))
    val cands = query.Reverse.candidates(leadPts, index,
      distanceMode = false, radiusMiles = 0.0, None, None)
    time("ctx_candidates") { println(s"  rows=${cands.count()}") }
    dump("ctx_candidates", cands.toDF())
    spark.stop()
  }
}
