package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.Similarity

/** Multi-table hyperplane-LSH ANN: recall vs brute force and a 10x corpus
  * run through the bounded-bucket path.
  */
class AnnSpec extends AnyFunSuite with BeforeAndAfterAll {
  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def emb(dir: String) = spark.read.parquet(s"$dir/embeddings.parquet")

  test("annLshMulti recall vs brute force >= 0.9 on the fixture corpus") {
    val sp = spark; import sp.implicits._
    val df = emb("/root/testdata/sf0.001")
    val k = 5
    val brute = Similarity.cosineTopK(df, df, k)
      .select(col("query_id"), col("corpus_id"))
      .as[(Long, Long)].collect().toSet
    // adaptiveBrute off: this test exercises the LSH path itself
    val ann = Similarity.annLshMulti(df, k, tables = 16, adaptiveBrute = false)
      .select(col("query_id"), col("corpus_id"))
      .as[(Long, Long)].collect().toSet
    val recall = brute.intersect(ann).size.toDouble / brute.size
    assert(recall >= 0.9, f"recall=$recall%.3f (${brute.size} truth pairs)")
  }

  test("annLshMulti handles a 10x corpus with hot-bucket splitting") {
    val sp = spark; import sp.implicits._
    // 10x the base corpus; clones keep their neighborhoods -> plenty of
    // hot buckets to split
    val base = emb("/root/testdata/sf0.001")
    val big = (0 until 10).map(i =>
      base.select((col("vec_id") + lit(i * 1000000)).as("vec_id"),
        col("embedding"))).reduce(_ unionByName _)
    val res = Similarity.annLshMulti(big, k = 3, tables = 4, maxBucket = 256)
    val n = res.count()
    assert(n > 0)
    // every returned rank is within k
    assert(res.agg(max(col("rank"))).collect().head.getInt(0) <= 3)
  }
}
