package graft.ops

import java.io.{ByteArrayOutputStream, DataOutputStream}
import java.nio.{ByteBuffer, ByteOrder}
import java.util.zip.{CRC32, Deflater, Inflater}

/** Pure-JVM media codecs for the multimodal pipeline: a real PNG
  * encoder/decoder (zlib IDAT via `java.util.zip`, all five PNG filter
  * types on decode) and a real RIFF/WAVE PCM16 encoder/decoder. No native
  * or external codec dependencies — everything is bit-level JVM code, so
  * the Spark-side kernels compute genuine pixel/sample statistics.
  */
object MediaCodec {

  // ---------------------------------------------------------------- PNG --

  private val PngSignature =
    Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)

  final case class Png(width: Int, height: Int, bitDepth: Int, colorType: Int,
                       channels: Int, pixels: Array[Byte])

  def isPng(bytes: Array[Byte]): Boolean =
    bytes != null && bytes.length > 8 &&
      (0 until 8).forall(i => bytes(i) == PngSignature(i))

  private def chunk(out: DataOutputStream, typ: String, data: Array[Byte]): Unit = {
    out.writeInt(data.length)
    val t = typ.getBytes("US-ASCII")
    out.write(t)
    out.write(data)
    val crc = new CRC32()
    crc.update(t)
    crc.update(data)
    out.writeInt(crc.getValue.toInt)
  }

  /** Encode 8-bit RGB pixels (row-major, 3 bytes/px) as a valid PNG
    * (filter 0 scanlines, one deflated IDAT).
    */
  def encodePng(width: Int, height: Int, rgb: Array[Byte]): Array[Byte] = {
    require(rgb.length == width * height * 3, "rgb length mismatch")
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.write(PngSignature)
    val ihdr = ByteBuffer.allocate(13)
    ihdr.putInt(width).putInt(height)
      .put(8.toByte)  // bit depth
      .put(2.toByte)  // color type: truecolor RGB
      .put(0.toByte).put(0.toByte).put(0.toByte) // compression/filter/interlace
    chunk(out, "IHDR", ihdr.array())
    // raw scanlines: filter byte 0 + row bytes
    val stride = width * 3
    val raw = new Array[Byte](height * (stride + 1))
    var y = 0
    while (y < height) {
      raw(y * (stride + 1)) = 0
      System.arraycopy(rgb, y * stride, raw, y * (stride + 1) + 1, stride)
      y += 1
    }
    val deflater = new Deflater(Deflater.BEST_SPEED)
    deflater.setInput(raw)
    deflater.finish()
    val cbuf = new ByteArrayOutputStream()
    val tmp = new Array[Byte](8192)
    while (!deflater.finished()) {
      val n = deflater.deflate(tmp)
      cbuf.write(tmp, 0, n)
    }
    deflater.end()
    chunk(out, "IDAT", cbuf.toByteArray)
    chunk(out, "IEND", Array.emptyByteArray)
    out.flush()
    bos.toByteArray
  }

  /** Header-only probe: parse IHDR without inflating pixel data — the
    * container scan a media-lake "probe" stage runs per file.
    * Returns (width, height, bitDepth, colorType, channels).
    */
  def probePng(bytes: Array[Byte]): Option[(Int, Int, Int, Int, Int)] = {
    if (!isPng(bytes) || bytes.length < 33) return None
    val buf = ByteBuffer.wrap(bytes)
    buf.position(8)
    val len = buf.getInt
    val typ = new String(Array(buf.get, buf.get, buf.get, buf.get).map(_.toChar))
    if (typ != "IHDR" || len != 13) return None
    val width = buf.getInt
    val height = buf.getInt
    val bitDepth = buf.get & 0xff
    val colorType = buf.get & 0xff
    val channels = colorType match {
      case 0 => 1; case 2 => 3; case 6 => 4; case _ => return None
    }
    if (width <= 0 || height <= 0) None
    else Some((width, height, bitDepth, colorType, channels))
  }

  /** Header-only WAV probe: (sampleRate, nSamples, channels). */
  def probeWav(bytes: Array[Byte]): Option[(Int, Int, Int)] = {
    if (!isWav(bytes)) return None
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    bb.position(12)
    var sampleRate = 0
    var channels = 0
    var bits = 0
    var nSamples = -1
    while (bb.remaining() >= 8 && (nSamples < 0 || sampleRate == 0)) {
      val typ = new String(Array(bb.get, bb.get, bb.get, bb.get).map(_.toChar))
      val len = bb.getInt
      if (len < 0 || len > bb.remaining()) return None
      typ match {
        case "fmt " =>
          val fmtStart = bb.position()
          val audioFormat = bb.getShort
          channels = bb.getShort
          sampleRate = bb.getInt
          bb.getInt; bb.getShort
          bits = bb.getShort
          if (audioFormat != 1 || bits != 16) return None
          bb.position(fmtStart + len)
        case "data" =>
          nSamples = len / 2
          bb.position(bb.position() + len)
        case _ => bb.position(bb.position() + len)
      }
    }
    if (nSamples < 0 || sampleRate == 0) None
    else Some((sampleRate, nSamples, channels))
  }

  /** Decode a PNG (8-bit gray/RGB/RGBA, non-interlaced): parses IHDR,
    * inflates the concatenated IDAT stream, reverses scanline filters
    * 0-4 (None/Sub/Up/Average/Paeth). Returns None for non-PNG or
    * unsupported layouts.
    */
  def decodePng(bytes: Array[Byte]): Option[Png] = {
    if (!isPng(bytes)) return None
    val buf = ByteBuffer.wrap(bytes)
    buf.position(8)
    var width = 0
    var height = 0
    var bitDepth = 0
    var colorType = 0
    val idat = new ByteArrayOutputStream()
    var done = false
    while (!done && buf.remaining() >= 12) {
      val len = buf.getInt
      val typ = new String(Array(buf.get, buf.get, buf.get, buf.get).map(_.toChar))
      if (len < 0 || len > buf.remaining() - 4) return None
      typ match {
        case "IHDR" =>
          if (len != 13) return None
          width = buf.getInt; height = buf.getInt
          bitDepth = buf.get & 0xff; colorType = buf.get & 0xff
          buf.position(buf.position() + 3)
        case "IDAT" =>
          val d = new Array[Byte](len)
          buf.get(d)
          idat.write(d)
        case "IEND" => done = true
        case _ => buf.position(buf.position() + len)
      }
      if (!done) buf.position(buf.position() + 4) // CRC (not verified)
    }
    if (width <= 0 || height <= 0 || bitDepth != 8) return None
    val channels = colorType match {
      case 0 => 1; case 2 => 3; case 6 => 4; case _ => return None
    }
    val stride = width * channels
    val raw = new Array[Byte](height * (stride + 1))
    val inflater = new Inflater()
    inflater.setInput(idat.toByteArray)
    var off = 0
    while (!inflater.finished() && off < raw.length) {
      val n = inflater.inflate(raw, off, raw.length - off)
      if (n == 0 && inflater.needsInput()) return None
      off += n
    }
    inflater.end()
    if (off != raw.length) return None
    // reverse filters into the pixel buffer
    val px = new Array[Byte](height * stride)
    val bpp = channels
    var y = 0
    while (y < height) {
      val f = raw(y * (stride + 1)) & 0xff
      val rowIn = y * (stride + 1) + 1
      val rowOut = y * stride
      var x = 0
      while (x < stride) {
        val cur = raw(rowIn + x) & 0xff
        val left = if (x >= bpp) px(rowOut + x - bpp) & 0xff else 0
        val up = if (y > 0) px(rowOut - stride + x) & 0xff else 0
        val upLeft = if (y > 0 && x >= bpp) px(rowOut - stride + x - bpp) & 0xff else 0
        val v = f match {
          case 0 => cur
          case 1 => cur + left
          case 2 => cur + up
          case 3 => cur + (left + up) / 2
          case 4 =>
            // Paeth predictor
            val p = left + up - upLeft
            val pa = math.abs(p - left)
            val pb = math.abs(p - up)
            val pc = math.abs(p - upLeft)
            cur + (if (pa <= pb && pa <= pc) left else if (pb <= pc) up else upLeft)
          case _ => return None
        }
        px(rowOut + x) = (v & 0xff).toByte
        x += 1
      }
      y += 1
    }
    Some(Png(width, height, bitDepth, colorType, channels, px))
  }

  /** Nearest-neighbor resize of decoded pixels; re-encodes RGB PNGs. */
  def resizePng(png: Png, newW: Int, newH: Int): Array[Byte] = {
    require(png.channels == 3, "resize supports RGB")
    val out = new Array[Byte](newW * newH * 3)
    var y = 0
    while (y < newH) {
      val sy = y * png.height / newH
      var x = 0
      while (x < newW) {
        val sx = x * png.width / newW
        var c = 0
        while (c < 3) {
          out((y * newW + x) * 3 + c) = png.pixels((sy * png.width + sx) * 3 + c)
          c += 1
        }
        x += 1
      }
      y += 1
    }
    encodePng(newW, newH, out)
  }

  // ---------------------------------------------------------------- WAV --

  final case class Wav(sampleRate: Int, channels: Int, bitsPerSample: Int,
                       samples: Array[Short])

  def isWav(bytes: Array[Byte]): Boolean =
    bytes != null && bytes.length > 44 &&
      bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' && bytes(3) == 'F' &&
      bytes(8) == 'W' && bytes(9) == 'A' && bytes(10) == 'V' && bytes(11) == 'E'

  /** Encode mono PCM16 samples as a canonical 44-byte-header WAV. */
  def encodeWav(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    val dataLen = samples.length * 2
    val bb = ByteBuffer.allocate(44 + dataLen).order(ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1)                  // PCM
      .putShort(1)                  // mono
      .putInt(sampleRate)
      .putInt(sampleRate * 2)       // byte rate
      .putShort(2)                  // block align
      .putShort(16)                 // bits per sample
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(bb.putShort)
    bb.array()
  }

  /** Decode a PCM16 WAV (walks RIFF chunks to fmt/data). */
  def decodeWav(bytes: Array[Byte]): Option[Wav] = {
    if (!isWav(bytes)) return None
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    bb.position(12)
    var sampleRate = 0
    var channels = 0
    var bits = 0
    var samples: Array[Short] = null
    while (bb.remaining() >= 8) {
      val typ = new String(Array(bb.get, bb.get, bb.get, bb.get).map(_.toChar))
      val len = bb.getInt
      if (len < 0 || len > bb.remaining()) return None
      typ match {
        case "fmt " =>
          val fmtStart = bb.position()
          val audioFormat = bb.getShort
          channels = bb.getShort
          sampleRate = bb.getInt
          bb.getInt; bb.getShort
          bits = bb.getShort
          if (audioFormat != 1) return None
          bb.position(fmtStart + len)
        case "data" =>
          if (bits != 16) return None
          val n = len / 2
          val s = new Array[Short](n)
          var i = 0
          while (i < n) { s(i) = bb.getShort; i += 1 }
          samples = s
          bb.position(bb.position() + (len - n * 2))
        case _ => bb.position(bb.position() + len)
      }
    }
    if (samples == null || sampleRate == 0) None
    else Some(Wav(sampleRate, channels, bits, samples))
  }
}
