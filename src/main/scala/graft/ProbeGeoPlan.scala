package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Plan audit for the geocode pipeline's scale properties: the forward plan
  * must contain no BroadcastNestedLoopJoin (prefix matching is an equi-join
  * on bounded prefix keys) and the index build no single-partition global
  * Window (phrase ids are range-partitioned + offset).
  */
object ProbeGeoPlan {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val index = graft.index.PageSynth.buildIndex(spark, 300)
    // postings plan: assert no global (empty-partition-spec) Window
    val pplan = index.layers.head.postings.queryExecution.executedPlan.toString
    println("PLAN postings: globalWindow=" +
      (if (pplan.contains("Window [") && !pplan.contains("windowspecdefinition(pid"))
        "CHECK" else "no"))

    val qs = Seq((1L, "West Lake View Rd Englewood"), (2L, "Engle"))
      .toDF("query_id", "query")
    val fwd = graft.query.Forward.forward(spark, index, qs)
    fwd.count()
    val fplan = fwd.queryExecution.executedPlan.toString
    println("PLAN forward: nestedLoop=" +
      (if (fplan.contains("BroadcastNestedLoopJoin")) "YES(BAD)" else "none") +
      " cartesian=" +
      (if (fplan.contains("CartesianProduct")) "YES(BAD)" else "none"))
    spark.stop()
  }
}
