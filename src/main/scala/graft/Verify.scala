package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // self-goldens (frozen rows+hash) gate the no_oracle queries the
    // DuckDB compare can't check; applies when run at the frozen sf
    val goldens = SelfGoldens.load()
      .filter { case (sf, _) => sfDir.stripSuffix("/").endsWith(sf) }
      .map(_._2).getOrElse(Map.empty)
    var goldenFailures = 0
    SparkEntry.queries.foreach { case (name, fn) =>
      try {
        val df = fn(spark, sfDir)
        df.coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
        if (!SparkEntry.oracleSql.contains(name)) goldens.get(name).foreach { g =>
          val got = SelfGoldens.contentHash(spark.read.parquet(s"$outDir/$name"))
          if (got != g) {
            goldenFailures += 1
            System.err.println(s"[verify][self-golden] $name FAIL: expected " +
              s"rows=${g.rows} hash=${g.hash}, got rows=${got.rows} hash=${got.hash}")
          } else println(s"[verify][self-golden] $name ok (rows=${g.rows})")
        }
      } catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
    if (goldenFailures > 0) {
      System.err.println(s"[verify] $goldenFailures self-golden failure(s)")
      sys.exit(1)
    }
  }
}
