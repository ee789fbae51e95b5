package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc per-stage profile of the forward geocode against the
  * BigGazetteer bench index (warm second pass printed).
  */
object ProbeV14 {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 2000
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.driver.memory", "16g")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val nPlaces = 22000
    val index = graft.index.BigGazetteer.buildIndex(spark, nPlaces)
    index.layers.foreach { l =>
      l.postings.count(); l.tileFeatures.count(); l.features.count()
    }
    index.candByQsig.values.foreach { case (d, p, pd) =>
      d.count(); p.count(); pd.count()
    }
    index.allPostingsQsig.count()
    index.allFeaturesWide.count()
    index.allTileFeatures.count()
    val qs = graft.index.BigGazetteer.forwardQueries(spark, n, nPlaces).cache()
    qs.count()
    for (pass <- 1 to 2) {
      val stats = new query.Forward.GeocodeStats(forceOutput = true)
      val t0 = System.nanoTime()
      val out = query.Forward.forward(spark, index, qs,
        stats = Some(stats))
      val rows = out.count()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"PROBEV14 pass=$pass rows=$rows total=$dt%.2fs  $stats")
    }
    spark.stop()
  }
}
