package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Pure-JVM decode kernels for uncompressed media formats — the real
  * replacement for the long-documented stub-decode boundary (reference
  * treats media as opaque blobs; a training-data pipeline needs pixels).
  * No codec jars exist in this container, so only formats decodable with
  * plain byte arithmetic are supported; that is exactly the honest subset:
  *
  *   - PGM (`P5`): binary grayscale, maxval <= 255 — 1 byte/pixel
  *   - PPM (`P6`): binary RGB, maxval <= 255 — 3 bytes/pixel
  *   - BMP (`BM`): uncompressed 24-bpp BITMAPINFOHEADER, bottom-up or
  *     top-down rows, 4-byte row padding — the classic DIB layout
  *   - WAV (`RIFF…WAVE`): PCM 16-bit little-endian, any channel count
  *   - PNG (r17): via the JDK's own `javax.imageio` reader — no codec
  *     jar, and PNG is LOSSLESS so decoded pixels are exact and
  *     platform-independent (see [[decodePng]])
  *
  * Lossy formats (JPEG/MP3/H.264) stay out of scope: their decode is
  * implementation-defined (IDCT/dithering rounding differs across
  * runtimes), which would silently break replayability — `decode`
  * returns `None` for them (null column value, routed to dead-letter
  * by the caller), never a fake answer.
  *
  * Decoded luminance is kept EXACT-INTEGER: for RGB sources the per-pixel
  * value is the plain channel sum `r+g+b` (0..765) — aHash compares block
  * means by cross-multiplication, so any positive scaling of all pixels is
  * threshold-invariant and the math stays replayable bit-for-bit in any
  * engine (no float luma weights, no rounding).
  *
  * The perceptual hash over decoded pixels is the true 2-D aHash: an 8×8
  * grid of pixel blocks (block (r,c) = rows `[r*h/8,(r+1)*h/8)` × cols
  * `[c*w/8,(c+1)*w/8)`, integer division), bit `k = r*8+c` set iff the
  * block's mean exceeds the global mean — compared exactly as
  * `blockSum * (w*h) > total * blockArea`. This is robust to the 2-D
  * local edits real image near-dup detection cares about, unlike the
  * byte-range [[AHash64]] (which remains the right tool for OPAQUE
  * payloads where no decoder applies). Audio hashes the same way over the
  * 1-D sample stream: 64 equal sample ranges, one bit each.
  *
  * Reference surface: pipelinewise treats media columns as pass-through
  * binaries (`pipelinewise/fastsync/commons/transform_utils.py` has no
  * media path); this family is north-star scope beyond it.
  */
object MediaCodec {

  /** A decoded payload: `values` are per-pixel channel sums for images
    * (row-major, `width*height` entries) or per-sample `sample + 32768`
    * (0..65535) for audio (`frames*channels` entries, interleaved).
    */
  final case class Decoded(format: String, width: Int, height: Int,
                           channels: Int, sampleRate: Int,
                           values: Array[Long])

  /** Max decoded units (pixels / samples): keeps the cross-multiplied
    * block-mean comparison inside signed-64 range with values <= 765*?
    * — worst case value 65535 (WAV): 65535 * n^2 <= 2^63 => n <= 3.7e8.
    * 64M units is also a sane single-payload bound at 100 TB scale
    * (a 8k×8k image is 67M pixels); larger media should be tiled or
    * frame-chunked upstream.
    */
  val MaxUnits: Int = 64 << 20

  // ---- format dispatch ---------------------------------------------------

  def decode(bytes: Array[Byte]): Option[Decoded] = {
    if (bytes == null || bytes.length < 2) return None
    (bytes(0), bytes(1)) match {
      case ('P', '5') => decodePnm(bytes, rgb = false)
      case ('P', '6') => decodePnm(bytes, rgb = true)
      case ('B', 'M') => decodeBmp(bytes)
      case ('R', 'I') => decodeWav(bytes)
      case _ if (bytes(0) & 0xff) == 0x89 && bytes(1) == 'P' =>
        decodePng(bytes) // 0x89 'P' 'N' 'G'
      case _          => None
    }
  }

  // ---- PNG (JDK ImageIO) --------------------------------------------

  // ImageIO's default ImageInputStream spills to a disk cache file per
  // read; executors decode thousands of payloads per task, so the
  // in-memory stream path is forced once per JVM
  private lazy val imageIoNoCache: Unit =
    javax.imageio.ImageIO.setUseCache(false)

  /** PNG via the JDK's own reader (`javax.imageio` ships in the JRE —
    * no codec jar). PNG is LOSSLESS, so unlike JPEG the decoded pixel
    * values are exact and platform-independent: the same determinism
    * contract as the byte-arithmetic formats, just with the JDK doing
    * the inflate. The contract is kept per image type, never assumed:
    * every GRAY image (any depth, +/- alpha) reads raw raster samples
    * (16-bit downscales by fixed integer rounding); sRGB-typed color
    * (truecolor, palette) reads the ARGB view as the channel sum
    * `r+g+b`, which involves no color conversion; anything that WOULD
    * need a CMM color conversion (ICC-profiled / non-sRGB spaces,
    * whose rounding is JDK-version dependent) returns None instead of
    * a near-miss decode. For 8-bit gray the value is `3*v`, a positive
    * scaling of the PGM convention, which the cross-multiplied aHash
    * comparison is invariant to (a gray PNG and a PGM of the same
    * pixels phash identically — asserted in MediaCodecSpec). The alpha
    * channel is ignored (hashing composites nothing). JPEG stays out
    * of scope: its decode is implementation-defined (IDCT rounding
    * differs across JREs), which would silently break replayability.
    */
  private def decodePng(b: Array[Byte]): Option[Decoded] = {
    if (b.length < 8 || (b(0) & 0xff) != 0x89 || b(1) != 'P' ||
        b(2) != 'N' || b(3) != 'G') return None
    imageIoNoCache
    // NonFatal, not just IOException: adversarial PNG bodies can drive
    // ImageIO into runtime exceptions (negative array sizes, bad
    // palette indexes) — the malformed-media contract is None/dead
    // letter, never a task crash
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(b))
      catch { case scala.util.control.NonFatal(_) => null }
    if (img == null) return None
    val (w, h) = (img.getWidth, img.getHeight)
    if (w <= 0 || h <= 0 || w.toLong * h > MaxUnits) return None
    val out = new Array[Long](w * h)
    val cm = img.getColorModel
    val cs = cm.getColorSpace
    if (cs.getType == java.awt.color.ColorSpace.TYPE_GRAY) {
      // EVERY gray PNG — 1/2/4/8/16-bit, with or without alpha — reads
      // the RAW raster sample of band 0: getRGB would push the value
      // through the JDK's ICC gray -> sRGB color conversion, which is
      // CMM/JDK-version dependent — exactly the implementation-defined
      // decode this path exists to avoid (and for 8-bit it is also
      // monotone-but-NONLINEAR, breaking the PGM aHash parity asserted
      // in MediaCodecSpec). The raw sample is the PNG's stored value,
      // exact. 16-bit samples downscale by the PNG-standard integer
      // rounding (v*255+32767)/65535 — fixed integer arithmetic, same
      // result on every JVM — keeping values in the 8-bit range the
      // cross-multiplied block-mean bound is sized for; x3 keeps the
      // channel-sum convention (= r+g+b of the equivalent RGB). Alpha
      // (band 1 when present) is ignored: hashing composites nothing.
      val raster = img.getRaster
      val deep = cm.getComponentSize(0) > 8
      var r = 0
      while (r < h) {
        var c = 0
        while (c < w) {
          val s = raster.getSample(c, r, 0)
          out(r * w + c) =
            if (deep) 3L * ((s * 255L + 32767L) / 65535L) else 3L * s
          c += 1
        }
        r += 1
      }
    } else if (cs.isCS_sRGB) {
      // one bulk ARGB fetch per row: sRGB-typed images (truecolor and
      // palette PNGs) repack without color conversion; alpha is
      // ignored (hashing composites nothing)
      val row = new Array[Int](w)
      var r = 0
      while (r < h) {
        img.getRGB(0, r, w, 1, row, 0, w)
        var c = 0
        while (c < w) {
          val p = row(c)
          out(r * w + c) = ((p >> 16) & 0xff).toLong +
            ((p >> 8) & 0xff) + (p & 0xff)
          c += 1
        }
        r += 1
      }
    } else {
      // ICC-profiled / non-sRGB color images would require a CMM color
      // conversion whose rounding is JDK-version dependent — the
      // replayability contract routes them to the dead letter (None),
      // never to a "close enough" decode
      return None
    }
    Some(Decoded("png", w, h, 3, 0, out))
  }

  // ---- PNM (PGM P5 / PPM P6) --------------------------------------------

  /** Netpbm binary header: magic, then whitespace-separated width,
    * height, maxval (with `#` comments allowed between tokens), then ONE
    * whitespace byte, then raw samples.
    */
  private def decodePnm(b: Array[Byte], rgb: Boolean): Option[Decoded] = {
    var p = 2
    def skipWs(): Boolean = {
      var progressed = false
      var go = true
      while (go && p < b.length) {
        val c = b(p)
        if (c == ' ' || c == '\n' || c == '\r' || c == '\t') {
          p += 1; progressed = true
        } else if (c == '#') {
          while (p < b.length && b(p) != '\n') p += 1
          progressed = true
        } else go = false
      }
      progressed
    }
    def readInt(): Int = {
      if (!skipWs() && p > 2) return -1 // tokens must be separated
      var v = 0L
      var any = false
      while (p < b.length && b(p) >= '0' && b(p) <= '9') {
        v = v * 10 + (b(p) - '0'); any = true; p += 1
        if (v > Int.MaxValue) return -1
      }
      if (any) v.toInt else -1
    }
    val w = readInt(); val h = readInt(); val maxval = readInt()
    if (w <= 0 || h <= 0 || maxval <= 0 || maxval > 255) return None
    // exactly one whitespace byte separates header from raster
    if (p >= b.length) return None
    val sep = b(p)
    if (sep != ' ' && sep != '\n' && sep != '\r' && sep != '\t') return None
    p += 1
    val n = w.toLong * h
    if (n > MaxUnits) return None
    val bpp = if (rgb) 3 else 1
    if (b.length - p < n * bpp) return None // truncated raster
    val out = new Array[Long](n.toInt)
    var i = 0
    if (rgb) {
      while (i < n) {
        val o = p + i * 3
        out(i) = (b(o) & 0xff).toLong + (b(o + 1) & 0xff) + (b(o + 2) & 0xff)
        i += 1
      }
    } else {
      while (i < n) { out(i) = (b(p + i) & 0xff).toLong; i += 1 }
    }
    Some(Decoded(if (rgb) "ppm" else "pgm", w, h, bpp, 0, out))
  }

  // ---- BMP (uncompressed 24-bpp) ----------------------------------------

  private def leU16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
  private def leU32(b: Array[Byte], o: Int): Long =
    (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
      ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)
  private def leI32(b: Array[Byte], o: Int): Int = leU32(b, o).toInt

  /** BITMAPFILEHEADER (14 B) + BITMAPINFOHEADER (>= 40 B), bpp 24,
    * compression BI_RGB. Negative biHeight = top-down rows. Rows padded
    * to 4-byte multiples, pixel order BGR.
    */
  private def decodeBmp(b: Array[Byte]): Option[Decoded] = {
    if (b.length < 54) return None
    val dataOff = leU32(b, 10)
    val hdrSize = leU32(b, 14)
    if (hdrSize < 40) return None
    val w = leI32(b, 18)
    val hRaw = leI32(b, 22)
    val bpp = leU16(b, 28)
    val compression = leU32(b, 30)
    if (w <= 0 || hRaw == 0 || bpp != 24 || compression != 0) return None
    val h = math.abs(hRaw)
    val topDown = hRaw < 0
    if (w.toLong * h > MaxUnits) return None
    val rowBytes = ((w * 3 + 3) / 4) * 4
    if (dataOff < 54 || dataOff + rowBytes.toLong * h > b.length) return None
    val out = new Array[Long](w * h)
    var r = 0
    while (r < h) {
      val srcRow = if (topDown) r else h - 1 - r
      val ro = dataOff.toInt + srcRow * rowBytes
      var c = 0
      while (c < w) {
        val o = ro + c * 3
        out(r * w + c) =
          (b(o) & 0xff).toLong + (b(o + 1) & 0xff) + (b(o + 2) & 0xff)
        c += 1
      }
      r += 1
    }
    Some(Decoded("bmp", w, h, 3, 0, out))
  }

  // ---- WAV (PCM 16-bit LE) ----------------------------------------------

  /** RIFF chunk walk: `fmt ` (format 1 = PCM, bits 16) then `data`.
    * Unknown chunks are skipped (word-aligned), matching the container
    * spec — real WAVs carry LIST/INFO chunks.
    */
  private def decodeWav(b: Array[Byte]): Option[Decoded] = {
    if (b.length < 44) return None
    if (b(0) != 'R' || b(1) != 'I' || b(2) != 'F' || b(3) != 'F' ||
        b(8) != 'W' || b(9) != 'A' || b(10) != 'V' || b(11) != 'E')
      return None
    var p = 12
    var channels = 0
    var rate = 0
    var bits = 0
    var fmtOk = false
    var dataOff = -1
    var dataLen = 0L
    while (p + 8 <= b.length && (dataOff < 0 || !fmtOk)) {
      val id = new String(b, p, 4, "US-ASCII")
      val len = leU32(b, p + 4)
      val body = p + 8
      if (len > Int.MaxValue) return None
      id match {
        case "fmt " if len >= 16 && body + 16 <= b.length =>
          val audioFormat = leU16(b, body)
          channels = leU16(b, body + 2)
          rate = leI32(b, body + 4)
          bits = leU16(b, body + 14)
          fmtOk = audioFormat == 1 && bits == 16 && channels > 0 && rate > 0
        case "data" =>
          dataOff = body; dataLen = len
        case _ => ()
      }
      p = body + len.toInt + (len.toInt & 1) // chunks are word-aligned
      if (p < 0) return None
    }
    if (!fmtOk || dataOff < 0) return None
    val avail = math.min(dataLen, (b.length - dataOff).toLong)
    val n = (avail / 2).toInt // 16-bit samples actually present
    if (n <= 0 || n > MaxUnits || n % channels != 0) return None
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      val raw = (leU16(b, dataOff + i * 2) << 16) >> 16 // sign-extend
      out(i) = raw + 32768L // 0..65535, exact-integer friendly
      i += 1
    }
    Some(Decoded("wav", n / channels, 1, channels, rate, out))
  }

  // ---- perceptual hash over decoded values ------------------------------

  /** 2-D 8×8 block aHash over row-major pixel values: bit `r*8+c` set iff
    * block (r,c)'s mean exceeds the global mean, compared exactly by
    * cross-multiplication (`blockSum * n > total * blockArea`). Images
    * narrower/shorter than 8 leave the empty blocks' bits unset (integer
    * division yields empty ranges), mirroring [[AHash64]]'s convention.
    */
  def phash2D(v: Array[Long], w: Int, h: Int): Long = {
    val n = w.toLong * h
    if (n == 0) return 0L
    var total = 0L
    var i = 0
    while (i < v.length) { total += v(i); i += 1 }
    var hash = 0L
    var r = 0
    while (r < 8) {
      val r0 = (r * h) / 8; val r1 = ((r + 1) * h) / 8
      var c = 0
      while (c < 8) {
        val c0 = (c * w) / 8; val c1 = ((c + 1) * w) / 8
        var sum = 0L
        var rr = r0
        while (rr < r1) {
          var cc = c0
          val base = rr * w
          while (cc < c1) { sum += v(base + cc); cc += 1 }
          rr += 1
        }
        val area = (r1 - r0).toLong * (c1 - c0)
        if (sum * n > total * area) hash |= 1L << (r * 8 + c)
        c += 1
      }
      r += 1
    }
    hash
  }

  /** 1-D 64-block aHash for sample streams (audio): [[AHash64]]'s block
    * recipe over already-decoded values.
    */
  def phash1D(v: Array[Long]): Long = {
    val n = v.length
    if (n == 0) return 0L
    var total = 0L
    var i = 0
    while (i < n) { total += v(i); i += 1 }
    var hash = 0L
    var k = 0
    while (k < 64) {
      val lo = ((k.toLong * n) / 64).toInt
      val hi = (((k + 1).toLong * n) / 64).toInt
      var sum = 0L
      var j = lo
      while (j < hi) { sum += v(j); j += 1 }
      if (sum * n > total * (hi - lo)) hash |= 1L << k
      k += 1
    }
    hash
  }

  // ---- static per-row kernels (shared by interpreted eval + codegen) ----

  /** Decoded perceptual hash, or null when no decoder applies. */
  def phashBoxed(bytes: Array[Byte]): java.lang.Long =
    decode(bytes) match {
      case Some(d) if d.format == "wav" => java.lang.Long.valueOf(phash1D(d.values))
      case Some(d) => java.lang.Long.valueOf(phash2D(d.values, d.width, d.height))
      case None => null
    }

  /** Info struct `(format, width, height, channels, sample_rate,
    * n_units)` as an InternalRow, or null when undecodable. For audio,
    * width = frame count and n_units = total interleaved samples.
    */
  def infoRow(bytes: Array[Byte]): InternalRow =
    decode(bytes) match {
      case Some(d) => InternalRow(UTF8String.fromString(d.format),
        d.width, d.height, d.channels, d.sampleRate, d.values.length.toLong)
      case None => null
    }

  /** 64 block means (2-D for images, 1-D for audio) as floats — the
    * feature vector the old stub faked. Means, not sums, so features are
    * comparable across differently-sized media; float division happens
    * only HERE (the feature path), never in the hash path.
    */
  def blockMeans(bytes: Array[Byte]): Array[Float] =
    decode(bytes) match {
      case None => null
      case Some(d) =>
        val out = new Array[Float](64)
        if (d.format == "wav") {
          val n = d.values.length
          var k = 0
          while (k < 64) {
            val lo = ((k.toLong * n) / 64).toInt
            val hi = (((k + 1).toLong * n) / 64).toInt
            var sum = 0L
            var j = lo
            while (j < hi) { sum += d.values(j); j += 1 }
            out(k) = if (hi > lo) sum.toFloat / (hi - lo) else 0f
            k += 1
          }
        } else {
          val w = d.width; val h = d.height
          var r = 0
          while (r < 8) {
            val r0 = (r * h) / 8; val r1 = ((r + 1) * h) / 8
            var c = 0
            while (c < 8) {
              val c0 = (c * w) / 8; val c1 = ((c + 1) * w) / 8
              var sum = 0L
              var rr = r0
              while (rr < r1) {
                var cc = c0
                while (cc < c1) { sum += d.values(rr * w + cc); cc += 1 }
                rr += 1
              }
              val area = (r1 - r0) * (c1 - c0)
              out(r * 8 + c) = if (area > 0) sum.toFloat / area else 0f
              c += 1
            }
            r += 1
          }
        }
        out
    }

  def blockMeansArray(bytes: Array[Byte]): GenericArrayData = {
    val m = blockMeans(bytes)
    if (m == null) null else new GenericArrayData(m)
  }

  // ---- column API --------------------------------------------------------

  def mediaPhash(payload: Column): Column =
    ColumnBridge.column(MediaPhash(ColumnBridge.expression(payload)))

  def mediaInfo(payload: Column): Column =
    ColumnBridge.column(MediaInfo(ColumnBridge.expression(payload)))

  def mediaBlockMeans(payload: Column): Column =
    ColumnBridge.column(MediaBlockMeans(ColumnBridge.expression(payload)))

  val infoSchema: StructType = StructType(Seq(
    StructField("format", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("channels", IntegerType),
    StructField("sample_rate", IntegerType),
    StructField("n_units", LongType)))
}

/** Perceptual hash of a DECODED payload (2-D block aHash for images, 1-D
  * for audio); null when no pure-JVM decoder applies — malformed or
  * compressed media must surface as null (dead-letter routable), never
  * crash a 100 TB scan. Whole-stage-codegen: one static monomorphic call
  * per row, no fallback boundary.
  */
case class MediaPhash(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[ColumnBridge.AbstractType] = Seq(BinaryType)
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    MediaCodec.phashBoxed(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      java.lang.Long r = graft.functions.MediaCodec.phashBoxed($c);
      if (r == null) { ${ev.isNull} = true; }
      else { ${ev.value} = r.longValue(); }""")

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
}

/** Decoded media header info struct; null when undecodable. */
case class MediaInfo(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[ColumnBridge.AbstractType] = Seq(BinaryType)
  override def dataType: DataType = MediaCodec.infoSchema
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    MediaCodec.infoRow(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      org.apache.spark.sql.catalyst.InternalRow r =
        graft.functions.MediaCodec.infoRow($c);
      if (r == null) { ${ev.isNull} = true; }
      else { ${ev.value} = r; }""")

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
}

/** 64 decoded block means as `array<float>` — the real feature vector
  * replacing the stub kernel; null when undecodable.
  */
case class MediaBlockMeans(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[ColumnBridge.AbstractType] = Seq(BinaryType)
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    MediaCodec.blockMeansArray(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      org.apache.spark.sql.catalyst.util.ArrayData r =
        graft.functions.MediaCodec.blockMeansArray($c);
      if (r == null) { ${ev.isNull} = true; }
      else { ${ev.value} = r; }""")

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
}
