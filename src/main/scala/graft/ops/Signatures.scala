package graft.ops

import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions.udf
import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.unsafe.Platform

/** Single-pass JVM signature kernels (MinHash, SimHash).
  *
  * These are deliberately Scala UDFs rather than stacked Column expressions:
  * a 64-permutation signature as 64 separate `aggregate(transform(...))`
  * subtrees produces a Catalyst tree large enough to fall out of whole-stage
  * codegen and re-evaluates the shingle array per permutation (measured 40-70s
  * for 500 docs). One fused per-row pass is O(tokens x K) with zero
  * re-evaluation and keeps the plan a single Project. A custom codegen'd
  * Expression is the further upgrade if profiling demands it.
  */
object Signatures {
  private val Prime = 2147483647L

  private def xx64(s: String, seed: Long = 42L): Long = {
    val b = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    XXH64.hashUnsafeBytes(b, Platform.BYTE_ARRAY_OFFSET, b.length, seed)
  }

  def tokensOf(text: String): Array[String] = {
    val t = if (text == null) "" else text.trim
    if (t.isEmpty) Array.empty else t.split("\\s+")
  }

  /** Hashes of word n-gram shingles (one pass, reused across permutations). */
  def shingleHashes(toks: Array[String], n: Int): Array[Long] = {
    if (toks.length < n) return Array.empty
    val out = new Array[Long](toks.length - n + 1)
    var i = 0
    while (i < out.length) {
      val sb = new java.lang.StringBuilder
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      out(i) = math.floorMod(xx64(sb.toString), Prime)
      i += 1
    }
    out
  }

  /** K-permutation MinHash over 3-gram shingles:
    * perm k = min over shingles of (h * (2k+1) + 104729 * (k+1)) mod p.
    */
  def minhash(text: String, numHashes: Int): Array[Long] = {
    val hs = shingleHashes(tokensOf(text), 3)
    val sig = Array.fill(numHashes)(Prime)
    if (hs.isEmpty) return sig
    var k = 0
    while (k < numHashes) {
      val a = 2L * k + 1
      val b = 104729L * (k + 1)
      var m = Long.MaxValue
      var i = 0
      while (i < hs.length) {
        val v = math.floorMod(hs(i) * a + b, Prime)
        if (v < m) m = v
        i += 1
      }
      sig(k) = m
      k += 1
    }
    sig
  }

  /** 64-bit SimHash of the token multiset (per-bit vote of token hashes). */
  def simhash64(text: String): Long = {
    val toks = tokensOf(text)
    val votes = new Array[Int](64)
    var i = 0
    while (i < toks.length) {
      val h = xx64(toks(i))
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  /** Distinct word n-gram shingles as strings (single pass). */
  def shingleSet(text: String, n: Int): Array[String] = {
    val toks = tokensOf(text)
    if (toks.length < n) return Array.empty
    val seen = new java.util.LinkedHashSet[String]()
    var i = 0
    while (i <= toks.length - n) {
      val sb = new java.lang.StringBuilder
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      seen.add(sb.toString)
      i += 1
    }
    seen.toArray(new Array[String](seen.size))
  }

  def shinglesUdf(n: Int): UserDefinedFunction =
    udf((text: String) => shingleSet(text, n))

  def minhashUdf(numHashes: Int): UserDefinedFunction =
    udf((text: String) => minhash(text, numHashes))

  val simhashUdf: UserDefinedFunction = udf((text: String) => simhash64(text))
}
