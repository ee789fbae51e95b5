package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** pm_join attribution for the GROUPED candidate shapes: times each branch
  * of Forward.phrasematchJoins separately plus the postings probe and the
  * spatialmatch-input projection, on the geocode_forward workload.
  */
object ProbePm2 {
  def main(args: Array[String]): Unit = {
    val cpus = if (args.nonEmpty) args(0) else "32"
    val nq = if (args.length > 1) args(1).toInt else 2000
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

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

    def time[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PROBE $tag ${(System.nanoTime() - t0) / 1e9}%.2fs")
      r
    }

    val qs = graft.index.BigGazetteer.forwardQueries(spark, nq, 22000)
    // warm everything
    query.Forward.forward(spark, index, qs).count()

    for (round <- 1 to 2) {
      println(s"--- round $round ---")
      val subs = time("subqueries_ck") {
        val s = query.Forward.subqueriesForProbe(spark, index, qs)
        s.count(); s
      }
      val branches = query.Forward.phrasematchBranchesForProbe(index, subs)
      branches.foreach { case (name, df) =>
        time(s"branch_$name") { println(s"  rows=${df.count()}") }
      }
      val matched = time("postings_probe") {
        val m = query.Forward.phrasematchJoinsForProbe(index, subs)
        println(s"  rows=${m.count()}"); m
      }
      time("pm_rows_ck") {
        println("  rows=" + query.Forward.pmRowsForProbe(index, matched)
          .localCheckpoint().count())
      }
    }
    spark.stop()
  }
}
