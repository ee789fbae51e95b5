package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.core.TokenSpec
import graft.index.IndexBuilder
import graft.model.{GeoDoc, LayerConfig}

/** Ad-hoc: print postings + subqueries for a geocoder_tokens layer. */
object ProbeTokens {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val docs = spark.createDataset(Seq(
      GeoDoc(1, "fake street", 0, """{"type":"Point","coordinates":[0,0]}""", 0, 0)))
    val index = IndexBuilder.build(spark, Seq(
      (LayerConfig("address", idx = 0, zoom = 6, typ = "address",
        geocoderTokens = Seq("Street" -> TokenSpec("St"))), docs)))
    println("POSTINGS:")
    index.allPostingsFlat.select("phrase", "relev").distinct().collect().foreach(println)
    val groups = Seq((1L, "fake st")).toDF("query_id", "query")
    val subs = graft.query.Forward.subqueries(spark, groups,
      Vector(graft.query.Forward.QueryGroup(
        index.layers.head.config.querySignature,
        IndexBuilder.replacersFor(index.layers.head.config),
        geocoderAddress = false, "")), proximityDefined = false)
    println("SUBS:")
    subs.collect().foreach(println)
    println("FORWARD:")
    graft.query.Forward.forward(spark, index, groups,
      graft.query.Forward.Options(fuzzy = false, autocomplete = false))
      .collect().foreach(println)
    spark.stop()
  }
}
