package graft.core

import java.nio.charset.StandardCharsets

/** MurmurHash3 x86 32-bit (public domain algorithm, Austin Appleby).
  *
  * The reference hashes phrases with `murmurhash-native` at seed 0 and takes
  * byte 0 of the big-endian buffer, i.e. the top byte of the u32 hash
  * (reference lib/text-processing/termops.js:372-374; golden:
  * phraseHash("main st") == 112, test/unit/indexer/indexdocs.test.js:48).
  */
object Murmur3 {
  def hash32(data: Array[Byte], seed: Int): Int = {
    val c1 = 0xcc9e2d51
    val c2 = 0x1b873593
    val len = data.length
    var h1 = seed
    val nblocks = len / 4
    var i = 0
    while (i < nblocks) {
      val base = i * 4
      var k1 = (data(base) & 0xff) | ((data(base + 1) & 0xff) << 8) |
        ((data(base + 2) & 0xff) << 16) | ((data(base + 3) & 0xff) << 24)
      k1 *= c1
      k1 = Integer.rotateLeft(k1, 15)
      k1 *= c2
      h1 ^= k1
      h1 = Integer.rotateLeft(h1, 13)
      h1 = h1 * 5 + 0xe6546b64
      i += 1
    }
    var k1 = 0
    val tail = nblocks * 4
    val rem = len & 3
    if (rem >= 3) k1 ^= (data(tail + 2) & 0xff) << 16
    if (rem >= 2) k1 ^= (data(tail + 1) & 0xff) << 8
    if (rem >= 1) {
      k1 ^= data(tail) & 0xff
      k1 *= c1
      k1 = Integer.rotateLeft(k1, 15)
      k1 *= c2
      h1 ^= k1
    }
    h1 ^= len
    h1 ^= h1 >>> 16
    h1 *= 0x85ebca6b
    h1 ^= h1 >>> 13
    h1 *= 0xc2b2ae35
    h1 ^= h1 >>> 16
    h1
  }

  def hash32(s: String): Int = hash32(s.getBytes(StandardCharsets.UTF_8), 0)

  /** carmen phraseHash: top byte of the u32 hash (0..255). */
  def phraseHash(phrase: String): Int = hash32(phrase) >>> 24
}
