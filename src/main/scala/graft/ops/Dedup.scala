package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Deduplication operators for web-scale corpora.
  *
  * Design notes for the 100 TB point:
  *  - exact dedup is a hash-aggregate on a digest column — one shuffle on
  *    the digest, map-side partial aggregation, no data movement of `text`
  *    beyond the digest when only ids are needed;
  *  - MinHash/LSH materializes (band, bandHash) keys and self-joins within
  *    buckets only — the join key is the band hash, so the shuffle is
  *    bounded by bucket size, with AQE skew splitting as backstop;
  *  - SimHash is a per-row signature (no shuffle) + banded equality join.
  */
object Dedup {

  /** Exact duplicate groups by md5 digest; keeps the lowest id per group.
    * Returns (keep_id, dup_id) pairs for every removed duplicate.
    */
  def exactDupPairs(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val withHash = df.select(col(idCol).as("id"), md5(col(textCol)).as("h"))
    val w = Window.partitionBy(col("h")).orderBy(col("id"))
    withHash
      .withColumn("keep_id", first(col("id")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .where(col("id") =!= col("keep_id"))
      .select(col("keep_id"), col("id").as("dup_id"))
  }

  /** Survivors after exact dedup (lowest id per digest). */
  def exactDedupKeep(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("id"), md5(col(textCol)).as("h"))
      .groupBy(col("h")).agg(min(col("id")).as("keep_id"), count(lit(1)).as("group_size"))

  /** MinHash-LSH candidate duplicate pairs: bands of `rowsPerBand` signature
    * slots are hashed to buckets; ids sharing any band bucket are candidates;
    * candidates are verified by estimated Jaccard (matching signature
    * fraction) >= threshold.
    */
  def minhashLshPairs(df: DataFrame, idCol: String, textCol: String,
                      numHashes: Int = 64, rowsPerBand: Int = 4,
                      threshold: Double = 0.7): DataFrame = {
    val numBands = numHashes / rowsPerBand
    val sigs = df.select(col(idCol).as("id"),
      Signatures.minhashUdf(numHashes)(col(textCol)).as("sig"))

    // candidate generation joins narrow (id, band, bandHash) rows only —
    // signatures do not travel through the shuffle
    val bands = sigs.select(col("id"),
      posexplode(transform(sequence(lit(0), lit(numBands - 1)),
        b => xxhash64(concat_ws("_", slice(col("sig"), b * rowsPerBand + 1, lit(rowsPerBand)))))
      ).as(Seq("band", "bandHash")))

    val a = bands.select(col("band"), col("bandHash"), col("id").as("id_a"))
    val b = bands.select(col("band"), col("bandHash"), col("id").as("id_b"))
    val cand = a.join(b, Seq("band", "bandHash"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
      .distinct()

    // threshold <= 0 asks for the raw candidate set (the exact-verify
    // pipeline's generation step): est_jaccard is always in [0, 1], so the
    // signature joins + zip_with below filter nothing — skip them (two
    // joins and two extra evaluations of the signature UDF removed)
    if (threshold <= 0.0)
      return cand.withColumn("est_jaccard", lit(1.0))

    // verify candidates against full signatures — plain equi-joins on id:
    // at scale the signature table exceeds broadcast, so let AQE pick the
    // join strategy per size
    cand
      .join(sigs.select(col("id").as("id_a"), col("sig").as("sig_a")), "id_a")
      .join(sigs.select(col("id").as("id_b"), col("sig").as("sig_b")), "id_b")
      .withColumn("est_jaccard",
        size(filter(zip_with(col("sig_a"), col("sig_b"), (x, y) => x === y), b => b))
          .cast("double") / lit(numHashes))
      .where(col("est_jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("est_jaccard"))
  }

  /** MinHash-LSH candidates verified with EXACT Jaccard over the distinct
    * word 3-gram shingle sets (candidate generation approximate, verification
    * exact — the standard production near-dup pipeline). Output is
    * oracle-checkable wherever banding recall is ~1.0 for pairs above the
    * threshold: the banding must be chosen so the s-curve knee sits BELOW
    * the query threshold. For threshold 0.5 use rowsPerBand=2 (b=32):
    * miss probability at j=0.5 is (1-0.5^2)^32 ~ 1e-4, vs ~36% for the
    * r=4/b=16 banding whose midpoint coincides with 0.5.
    */
  def minhashLshExactPairs(df: DataFrame, idCol: String, textCol: String,
                           numHashes: Int = 64, rowsPerBand: Int = 4,
                           threshold: Double = 0.7): DataFrame = {
    // single-file sources arrive as ONE scan split: spread (id, text) over
    // the cores first so the signature/shingle kernels parallelize; the two
    // consumers below share the one exchange (ReusedExchange)
    val src = df.select(col(idCol), col(textCol))
      .repartition(df.sparkSession.sparkContext.defaultParallelism, col(idCol))
    val cand = minhashLshPairs(src, idCol, textCol, numHashes, rowsPerBand,
      threshold = 0.0).select(col("id_a"), col("id_b"))
    // materialize the inverted shingle index once: it feeds three plan
    // branches (sizes, the id_a join, the id_b join) and without the cut
    // each branch re-scans the input and re-evaluates the shingle
    // expressions (the unoptimized plan holds 24 copies of the source scan)
    val inv = src.select(col(idCol).as("id"),
      explode(array_distinct(TextOps.shingles(TextOps.tokens(col(textCol)), 3))).as("s"))
      .localCheckpoint()
    val sizes = inv.groupBy(col("id")).agg(count(lit(1)).as("n_sh"))
    val common = cand
      .join(inv.select(col("id").as("id_a"), col("s")), "id_a")
      .join(inv.select(col("id").as("id_b"), col("s")), Seq("id_b", "s"))
      .groupBy(col("id_a"), col("id_b")).agg(count(lit(1)).as("common"))
    common
      .join(sizes.select(col("id").as("id_a"), col("n_sh").as("na")), "id_a")
      .join(sizes.select(col("id").as("id_b"), col("n_sh").as("nb")), "id_b")
      .withColumn("jaccard", col("common").cast("double") /
        (col("na") + col("nb") - col("common")))
      .where(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"))
  }

  /** SimHash near-dup candidates: equality join on 16-bit bands (4 bands);
    * near-dups (hamming distance <= 3) must share at least one band.
    * Verified with an exact popcount on the xor.
    */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
                   maxHamming: Int = 3): DataFrame = {
    val sigs = df.select(col(idCol), col(textCol))
      // spread the single-split source scan before the signature kernel
      .repartition(df.sparkSession.sparkContext.defaultParallelism, col(idCol))
      .select(col(idCol).as("id"), Signatures.simhashUdf(col(textCol)).as("sim"))
    val banded = sigs.select(col("id"), col("sim"),
      posexplode(array((0 until 4).map(b =>
        shiftright(col("sim"), b * 16).bitwiseAND(0xFFFFL)): _*)).as(Seq("band", "bandVal")))
    val a = banded.select(col("band"), col("bandVal"), col("id").as("id_a"), col("sim").as("sim_a"))
    val b = banded.select(col("band"), col("bandVal"), col("id").as("id_b"), col("sim").as("sim_b"))
    a.join(b, Seq("band", "bandVal"))
      .where(col("id_a") < col("id_b"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("hamming", bit_count(col("sim_a").bitwiseXOR(col("sim_b"))))
      .where(col("hamming") <= maxHamming)
      .select(col("id_a"), col("id_b"), col("hamming"))
  }

  /** n-gram Jaccard similarity join over the *discriminative* shingle
    * universe: shingles with document frequency > maxDf are removed before
    * similarity (standard stop-shingle filtering), then exact Jaccard over
    * the remaining sets via one inverted-index self-join grouped to pair
    * counts. The df cap bounds the self-join fan-out per shingle — the same
    * role hot-cell salting plays in the spatial join — making the shuffle
    * O(sum df^2) with df <= maxDf instead of exploding on hot shingles.
    */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
                        n: Int = 3, threshold: Double = 0.5,
                        maxDf: Int = 100): DataFrame = {
    val inv = df.select(col(idCol), col(textCol))
      // spread the single-split source scan before the shingle kernel
      .repartition(df.sparkSession.sparkContext.defaultParallelism, col(idCol))
      .select(col(idCol).as("id"),
        explode(Signatures.shinglesUdf(n)(col(textCol))).as("s"))
    val rare = inv.groupBy(col("s")).agg(count(lit(1)).as("df"))
      .where(col("df") <= maxDf).select(col("s"))
    // materialize the df-capped inverted index once: sizes and both
    // self-join sides otherwise each re-run the shingle UDF scan AND the
    // df-cap join (4 copies of the whole subtree in the unoptimized plan)
    val invRare = inv.join(rare, "s").localCheckpoint()
    val sizes = invRare.groupBy(col("id")).agg(count(lit(1)).as("n_sh"))
    val common = invRare.as("x").join(invRare.as("y"), col("x.s") === col("y.s"))
      .where(col("x.id") < col("y.id"))
      .groupBy(col("x.id").as("id_a"), col("y.id").as("id_b"))
      .agg(count(lit(1)).as("common"))
    common
      .join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("n_sh", "na"), "id_a")
      .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("n_sh", "nb"), "id_b")
      .withColumn("jaccard", col("common").cast("double") /
        (col("na") + col("nb") - col("common")))
      .where(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }
}
