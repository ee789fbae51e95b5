package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.index.{IndexBuilder, IndexStore}
import graft.query.{Forward, Reverse}
import graft.sources.CarmenSource

/** Thin CLI wrappers over the implemented internals, matching the
  * reference bin/ surface (reference bin/carmen.js, bin/carmen-index.js,
  * bin/carmen-analyze.js): geocode a query against a directory of carmen
  * GeoJSON sources, build+persist an index from one, and print gridstore
  * analyze stats.
  */
private[graft] object CliArgs {
  /** minimist-lite: positionals + --k=v / --flag. */
  def parse(args: Array[String]): (Vector[String], Map[String, String]) = {
    val pos = Vector.newBuilder[String]
    val kv = Map.newBuilder[String, String]
    args.foreach { a =>
      if (a.startsWith("--")) {
        val body = a.drop(2)
        val i = body.indexOf('=')
        if (i < 0) kv += body -> "true"
        else kv += body.substring(0, i) -> body.substring(i + 1)
      } else pos += a
    }
    (pos.result(), kv.result())
  }

  def session(cpus: String = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}

/** carmen.js: `runMain graft.CarmenCli <sourceDir> --query="..." [options]`
  * Options: --limit --proximity=lng,lat --types=a,b --stacks=a,b
  * --language --languageMode=strict --bbox=minX,minY,maxX,maxY
  * --autocomplete=bool --fuzzyMatch=bool --routing=bool --worldview
  * A "lon,lat" query reverse-geocodes.
  */
object CarmenCli {
  def main(args: Array[String]): Unit = {
    val (pos, kv) = CliArgs.parse(args)
    if (pos.isEmpty || !kv.contains("query")) {
      println("Usage: CarmenCli [dir] --query=\"<query>\"")
      sys.exit(1)
    }
    val query = kv("query")
    val spark = CliArgs.session()
    import spark.implicits._
    val sources = CarmenSource.autodir(spark, pos.head)
    val index = IndexBuilder.build(spark, sources)
    val revCoord = query.split(",") match {
      case Array(a, b) =>
        try Some((a.trim.toDouble, b.trim.toDouble))
        catch { case _: NumberFormatException => None }
      case _ => None
    }
    val opts = Forward.Options(
      limit = kv.get("limit").map(_.toInt).getOrElse(5),
      autocomplete = kv.get("autocomplete").forall(_ == "true"),
      fuzzy = kv.get("fuzzyMatch").forall(_ == "true"),
      proximity = kv.get("proximity").map { p =>
        val Array(x, y) = p.split(","); (x.toDouble, y.toDouble)
      },
      types = kv.get("types").map(_.split(",").toSeq).getOrElse(Nil),
      stacks = kv.get("stacks").map(_.split(",").toSeq).getOrElse(Nil),
      language = kv.get("language"),
      languageMode = kv.getOrElse("languageMode", ""),
      bbox = kv.get("bbox").map { b =>
        val Array(w, s0, e, n) = b.split(",").map(_.toDouble); (w, s0, e, n)
      },
      routing = kv.get("routing").contains("true"),
      worldview = kv.getOrElse("worldview", ""))
    // (relev, place_name, extid) rows; reverse results carry relevance 1
    val rows = revCoord match {
      case Some((lon, lat)) =>
        Reverse.reverseWithOptions(spark, index,
          Seq((1L, lon, lat)).toDF("query_id", "lon", "lat"),
          Reverse.ReverseOptions(
            limit = kv.get("limit").map(_.toInt).getOrElse(5),
            types = opts.types,
            reverseMode = kv.getOrElse("reverseMode", "distance"),
            language = opts.language,
            worldview = opts.worldview))
          .select(lit(1.0).as("relev"), col("place_name"), col("typ"),
            col("feature_id"))
          .collect()
      case None =>
        Forward.forward(spark, index,
          Seq((1L, query)).toDF("query_id", "query"), opts)
          .select(col("relev"), col("place_name"), col("place_type"),
            col("feature_id"))
          .collect()
    }
    println("Tokens")
    println("------")
    println(graft.core.TextNormalize.normalizeText(query).split(" ")
      .mkString(", "))
    println()
    println("Features")
    println("--------")
    rows.foreach { r =>
      println(f"- ${r.getDouble(0)}%.2f ${r.getString(1)} " +
        s"(${r.getString(2)}.${r.getLong(3)})")
    }
    println()
    println("Indexes")
    println("--------")
    index.layers.foreach(l => println(s"- ${l.config.name}"))
    println()
    spark.stop()
  }
}

/** carmen-index.js: `runMain graft.CarmenIndexCli --config=<sourceDir>
  * --index=<storeRoot>` — builds every source in the directory and
  * persists the layers (bucketed postings + lineage) to the store root,
  * resumable (completed layers skip).
  */
object CarmenIndexCli {
  def main(args: Array[String]): Unit = {
    val (_, kv) = CliArgs.parse(args)
    val config = kv.getOrElse("config", {
      println("CarmenIndexCli --config=<sourceDir> --index=<storeRoot>")
      sys.exit(1); ""
    })
    val out = kv.getOrElse("index",
      throw new IllegalArgumentException("--index argument required"))
    val spark = CliArgs.session()
    val sources = CarmenSource.autodir(spark, config)
    var last = System.currentTimeMillis()
    val index = IndexStore.buildOrResume(spark, sources, out)
    index.layers.foreach { l =>
      val n = l.features.count()
      val now = System.currentTimeMillis()
      val rate = if (now > last) n * 1000 / (now - last) else n
      System.err.println(s"Indexed $n docs @ $rate/s (${l.config.name})")
      last = now
    }
    spark.stop()
  }
}

/** carmen-analyze.js: `runMain graft.CarmenAnalyzeCli <sourceDir> [layer]`
  * — prints the S10 analyze stats (grid counts by 3-bit score and relev
  * bucket + duplicate-grid check) for one or all layers.
  */
object CarmenAnalyzeCli {
  def main(args: Array[String]): Unit = {
    val (pos, _) = CliArgs.parse(args)
    if (pos.isEmpty) {
      println("Usage: CarmenAnalyzeCli <sourceDir> [layer]")
      sys.exit(1)
    }
    val spark = CliArgs.session()
    println(s"Analyzing ${pos.head} ...")
    val sources = CarmenSource.autodir(spark, pos.head)
    val index = IndexBuilder.build(spark, sources)
    val layers = pos.lift(1) match {
      case Some(name) => index.layers.filter(_.config.name == name)
      case None => index.layers
    }
    layers.foreach { l =>
      println(s"[${l.config.name}]")
      IndexBuilder.analyze(IndexBuilder.flattenPostings(l.postings))
        .orderBy(col("stat")).collect()
        .foreach(r => println(s"  ${r.getString(0)}: ${r.getLong(1)}"))
    }
    spark.stop()
  }
}
