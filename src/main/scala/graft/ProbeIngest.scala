package graft
import org.apache.spark.sql.SparkSession
object ProbeIngest {
  def main(args: Array[String]): Unit = {
    val cpus = args(0)
    val n = args(1).toInt
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[A](tag: String)(f: => A): Unit = {
      val t0 = System.nanoTime(); f
      println(f"PROBE $tag ${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    import graft.index.PageSynth
    time("warm_pages")(PageSynth.pages(spark, 100000).count())
    time("pages_only")(PageSynth.pages(spark, n).count())
    time("pages_extract")(PageSynth.extract(spark, PageSynth.pages(spark, n)).count())
    time("pages_extract2")(PageSynth.extract(spark, PageSynth.pages(spark, n)).count())
    spark.stop()
  }
}
