package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc geocode-pipeline stage profiler. */
object ProbeGeo {
  def main(args: Array[String]): Unit = {
    val cpus = if (args.nonEmpty) args(0) else "32"
    val n = if (args.length > 1) args(1).toInt else 20000
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.index.PageSynth

    def time[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PROBE $tag ${(System.nanoTime() - t0) / 1e9}%.2fs")
      r
    }

    val index = time("build_index") {
      val idx = PageSynth.buildIndex(spark, 1000)
      idx.layers.foreach { l => l.postings.count(); l.tileFeatures.count() }
      idx.allDeletes.count(); idx.allTileFeatures.count()
      idx
    }
    val names = PageSynth.gazetteer.map(_.name.split(",")(0))
    val qs = spark.range(n).select(col("id").as("query_id"),
      element_at(array(names.map(lit): _*),
        (pmod(col("id"), lit(names.length)) + 1).cast("int")).as("query"))

    val subs = time("subqueries") {
      val s = query.Forward.subqueries(spark, qs, Vector(query.Forward.QueryGroup("", graft.index.IndexBuilder.replacersFor(PageSynth.layerConfigs.head), geocoderAddress = false, "")), proximityDefined = false).cache(); s.count(); s
    }
    val postings = index.allPostings
    val exact = time("exact_join") {
      val e = postings.join(subs, postings("phrase") === subs("subquery")); println(e.count()); e
    }
    time("prefix_join") {
      println(postings.join(subs.where(col("ender")),
        postings("phrase").startsWith(subs("subquery")) &&
          postings("phrase") =!= subs("subquery")).count())
    }
    time("fuzzy_join") {
      import spark.implicits._
      val qv = subs.as[query.Forward.SubQ].flatMap { s =>
        graft.core.Fuzzy.phraseVariants(s.subquery).map(v =>
          query.Forward.FuzzVar(s.queryId, s.subquery, s.mask, s.ender, s.weight, s.qlen, s.qsig, v, s.addrPos, s.addrNum, s.numberOrder))
      }.toDF()
      println(index.allDeletes.join(qv, Seq("variant"))
        .where(col("phrase") =!= col("subquery")).count())
    }
    time("warmup_forward_5k") {
      val q5 = spark.range(5000).select(col("id").as("query_id"),
        element_at(array(names.map(lit): _*),
          (pmod(col("id"), lit(names.length)) + 1).cast("int")).as("query"))
      println(query.Forward.forward(spark, index, q5).count())
    }
    time("full_forward") {
      println(query.Forward.forward(spark, index, qs).count())
    }
    time("full_forward_again") {
      println(query.Forward.forward(spark, index, qs).count())
    }
    spark.stop()
  }
}
