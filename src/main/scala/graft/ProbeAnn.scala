package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.{Similarity, Tables}

/** One-off ANN stage-cost probe (not part of the driver contract). */
object ProbeAnn {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = Tables.embeddings(spark, "/root/testdata/sf0.1")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROBE $name ${(System.nanoTime() - t0) / 1e9}%.2fs"); r
    }
    for (_ <- 1 to 3) {
      t("full") { Similarity.annLshMulti(df, k = 3, tables = 16).count() }
    }
    // decompose: candidates only
    import Similarity._
    val vecs = df.select(col("vec_id").cast("long").as("id"), col("embedding").as("v"))
      .localCheckpoint()
    val n = vecs.count()
    val bits = 5
    for (_ <- 1 to 2) {
      val sigs = t("sig+explode") {
        val s = vecs.select(col("id"),
          explode(Similarity.allSigsUdf(16, bits, 8)(col("v"))).as("s"))
          .select(col("id"), col("s._1").as("table"), col("s._2").as("b0"),
            col("s._3").as("bx"))
        s.count(); s
      }
      val counts = t("bucket-counts") {
        val c = sigs.groupBy(col("table"), col("b0")).agg(count(lit(1)).as("n_b"))
        c.count(); c
      }
      val bucketed = sigs.join(counts, Seq("table", "b0"))
        .withColumn("bucket", when(col("n_b") > 512,
          concat_ws(":", col("b0"), col("bx"))).otherwise(col("b0").cast("string")))
        .select(col("table"), col("bucket"), col("id"))
      val cand = t("cand-join+distinct") {
        val a = bucketed.select(col("table"), col("bucket"), col("id").as("query_id"))
        val b = bucketed.select(col("table"), col("bucket"), col("id").as("corpus_id"))
        val c = a.join(b, Seq("table", "bucket"))
          .where(col("query_id") =!= col("corpus_id"))
          .select(col("query_id"), col("corpus_id")).distinct()
        println("PROBE cand rows " + c.count()); c
      }
      t("score+topk") {
        val scored = cand
          .join(vecs.select(col("id").as("query_id"), col("v").as("qv")), "query_id")
          .join(vecs.select(col("id").as("corpus_id"), col("v").as("cv")), "corpus_id")
          .withColumn("cos", Similarity.cosineUdf(col("qv"), col("cv")))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("query_id")).orderBy(col("cos").desc, col("corpus_id"))
        scored.withColumn("rank", row_number().over(w))
          .where(col("rank") <= 3).count()
      }
    }
    spark.stop()
  }
}
