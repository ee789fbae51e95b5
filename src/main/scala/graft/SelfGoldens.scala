package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Self-goldens for the bench/verify entries the DuckDB oracle cannot
  * express (the `no_oracle` set): a checked-in (row count, order-insensitive
  * content hash) per query, asserted by [[Verify]] on every driver run, so
  * a wrong-answer regression in e.g. geocode_forward fails the correctness
  * gate rather than sliding through the rows-only check.
  *
  * Hash: columns sorted by name, each row serialized with to_json over the
  * sorted struct, xxhash64 per row, summed as decimal(38,0) (order-
  * insensitive; ANSI mode would throw on a plain long sum) and reduced mod
  * 2^63 driver-side. All inputs are deterministic (BigGazetteer is
  * seed-fixed, per-row float math is parallelism-independent), so the hash
  * is stable across thread counts — verified at local[4] and local[32]
  * before freezing.
  */
object SelfGoldens {
  final case class Golden(rows: Long, hash: Long)

  val resourceName = "/self_goldens.json"

  def contentHash(df: DataFrame): Golden = {
    val cols = df.columns.sorted.map(c => col("`" + c + "`"))
    val agg = df.select(xxhash64(to_json(struct(cols: _*))).as("h"))
      .agg(count(lit(1)).as("n"),
        sum(col("h").cast("decimal(38,0)")).as("s")).head()
    val s =
      if (agg.isNullAt(1)) 0L
      else agg.getDecimal(1).toBigInteger
        .mod(java.math.BigInteger.TWO.pow(63)).longValueExact()
    Golden(agg.getLong(0), s)
  }

  private val entry = """"([^"]+)"\s*:\s*\{\s*"rows"\s*:\s*(-?\d+)\s*,\s*"hash"\s*:\s*(-?\d+)\s*\}""".r

  /** Load goldens from the bundled resource: (sf label, name -> golden). */
  def load(): Option[(String, Map[String, Golden])] = {
    val in = getClass.getResourceAsStream(resourceName)
    if (in == null) return None
    val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
    val sf = """"sf"\s*:\s*"([^"]+)"""".r.findFirstMatchIn(text)
      .map(_.group(1)).getOrElse("")
    val qs = entry.findAllMatchIn(text).collect {
      case m if m.group(1) != "sf" =>
        m.group(1) -> Golden(m.group(2).toLong, m.group(3).toLong)
    }.toMap
    Some((sf, qs))
  }

  def render(sf: String, goldens: Seq[(String, Golden)]): String = {
    val body = goldens.sortBy(_._1).map { case (k, g) =>
      s"""    "$k": {"rows": ${g.rows}, "hash": ${g.hash}}"""
    }.mkString(",\n")
    s"""{\n  "sf": "$sf",\n  "queries": {\n$body\n  }\n}\n"""
  }
}

/** Regenerate src/main/resources/self_goldens.json: runs every no-oracle
  * query at the driver's Verify scale and freezes (rows, hash).
  * Usage: runMain graft.FreezeSelfGoldens <sfDir> <outFile> [cpus]
  */
object FreezeSelfGoldens {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outFile = args(1)
    val cpus = if (args.length > 2) args(2) else "4"
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val noOracle = SparkEntry.queries.keys.toVector.sorted
      .filterNot(SparkEntry.oracleSql.contains)
    val out = noOracle.map { name =>
      val g = SelfGoldens.contentHash(SparkEntry.queries(name)(spark, sfDir))
      println(s"[freeze] $name rows=${g.rows} hash=${g.hash}")
      name -> g
    }
    val sfLabel = new java.io.File(sfDir).getName
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outFile),
      SelfGoldens.render(sfLabel, out))
    spark.stop()
  }
}
