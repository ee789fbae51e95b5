package graft

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Dump `.explain("formatted")` for named SparkEntry queries to files:
  * runMain graft.ProbeDumpPlans <outDir> <suffix> <query...>
  * The query runs once first (count) so AQE finalizes; both the initial
  * formatted plan and the final executed plan are written.
  */
object ProbeDumpPlans {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val suffix = args(1)
    val names = args.drop(2)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Files.createDirectories(Paths.get(outDir))
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      val formatted = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      df.count() // finalize AQE
      val executed = df.queryExecution.executedPlan.toString
      Files.writeString(Paths.get(s"$outDir/${name}_$suffix.txt"),
        s"== explain(formatted), initial plan ==\n$formatted\n" +
          s"== executed plan (AQE final) ==\n$executed\n")
      println(s"PLAN dumped $name -> $outDir/${name}_$suffix.txt")
    }
    spark.stop()
  }
}
