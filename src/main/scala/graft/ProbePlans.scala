package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Plan audit: prints the physical-plan properties the scale design relies
  * on (scan pushdown/pruning, broadcast selection, codegen spans). */
object ProbePlans {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.01"
    def audit(name: String)(df: org.apache.spark.sql.DataFrame): Unit = {
      df.count() // finalize the AQE plan before inspecting it
      val plan = df.queryExecution.executedPlan.toString
      def has(s: String) = if (plan.contains(s)) "yes" else "NO"
      println(s"PLAN $name: pushedFilters=${has("PushedFilters: [")} " +
        s"broadcastHash=${has("BroadcastHashJoin")} " +
        s"wholestage=${has("*(1)")} " +
        s"readSchemaPruned=${!plan.contains("ReadSchema: struct<l_orderkey") || plan.contains("ReadSchema")}")
    }
    audit("q1_filter_pushdown") {
      SparkEntry.queries("q1_pricing")(spark, d)
    }
    audit("q5_broadcast_dims") {
      SparkEntry.queries("q5_region_revenue")(spark, d)
    }
    audit("brand_broadcast") {
      SparkEntry.queries("q_brand_agg")(spark, d)
    }
    // column pruning check: projection of 2 cols must not read all 11
    val li = spark.read.parquet(s"$d/lineitem.parquet")
      .select(col("l_orderkey"), col("l_quantity"))
      .where(col("l_quantity") > 40)
    val s = li.queryExecution.executedPlan.toString
    println("PLAN pruned_scan: readsOnlyTwoCols=" +
      (s.contains("ReadSchema: struct<l_orderkey:bigint,l_quantity:double>")) +
      " pushed=" + s.contains("GreaterThan(l_quantity,40.0)"))
    spark.stop()
  }
}
