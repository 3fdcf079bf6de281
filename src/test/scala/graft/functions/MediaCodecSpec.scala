package graft.functions

import graft.SparkSpecBase
import graft.operators.Multimodal
import org.apache.spark.sql.functions._

/** The pure-JVM media decode kernel, against hand-built byte fixtures —
  * these assert the PARSERS (header walk, padding, sign extension,
  * chunk skip), independent of the rpad-rule fixtures the DuckDB
  * oracles replay.
  */
class MediaCodecSpec extends SparkSpecBase {
  import spark.implicits._

  // ---- fixture builders (independent re-implementations of the specs) --

  private def pgm(w: Int, h: Int, px: Array[Int]): Array[Byte] = {
    require(px.length == w * h)
    (s"P5\n$w $h\n255\n".getBytes("US-ASCII").toSeq ++
      px.map(_.toByte)).toArray
  }

  private def ppm(w: Int, h: Int, rgb: Array[Int]): Array[Byte] = {
    require(rgb.length == 3 * w * h)
    (s"P6\n# comment line\n$w $h\n255\n".getBytes("US-ASCII").toSeq ++
      rgb.map(_.toByte)).toArray
  }

  /** Minimal 24-bpp BMP writer: BITMAPFILEHEADER + BITMAPINFOHEADER,
    * bottom-up rows (positive height), BGR order, 4-byte row padding.
    */
  private def bmp(w: Int, h: Int, rgbTopDown: Array[Int],
                  negHeight: Boolean = false): Array[Byte] = {
    require(rgbTopDown.length == 3 * w * h)
    val rowBytes = ((w * 3 + 3) / 4) * 4
    val dataSize = rowBytes * h
    val out = new java.io.ByteArrayOutputStream()
    def u16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    def u32(v: Int): Unit = { u16(v & 0xffff); u16((v >> 16) & 0xffff) }
    out.write('B'); out.write('M')
    u32(54 + dataSize); u32(0); u32(54)      // file size, reserved, offset
    u32(40); u32(w); u32(if (negHeight) -h else h)
    u16(1); u16(24); u32(0); u32(dataSize)   // planes, bpp, BI_RGB, size
    u32(2835); u32(2835); u32(0); u32(0)     // ppm res, palette
    val rows = if (negHeight) 0 until h else (h - 1) to 0 by -1
    for (srcRow <- rows) {
      for (c <- 0 until w) {
        val o = 3 * (srcRow * w + c)
        out.write(rgbTopDown(o + 2)) // B
        out.write(rgbTopDown(o + 1)) // G
        out.write(rgbTopDown(o))     // R
      }
      for (_ <- w * 3 until rowBytes) out.write(0)
    }
    out.toByteArray
  }

  /** PCM-16 WAV writer with an extra LIST chunk before data (chunk-skip
    * coverage) and little-endian samples.
    */
  private def wav(rate: Int, channels: Int, samples: Array[Int])
      : Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def u16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    def u32(v: Int): Unit = { u16(v & 0xffff); u16((v >> 16) & 0xffff) }
    def tag(s: String): Unit = s.foreach(c => out.write(c))
    val dataLen = samples.length * 2
    tag("RIFF"); u32(4 + 24 + 11 + 1 + 8 + dataLen); tag("WAVE")
    tag("fmt "); u32(16); u16(1); u16(channels); u32(rate)
    u32(rate * channels * 2); u16(channels * 2); u16(16)
    tag("LIST"); u32(11); out.write(Array.fill[Byte](11)('x'), 0, 11)
    out.write(0) // word-align pad for odd-length chunk
    tag("data"); u32(dataLen)
    samples.foreach(s => u16(s & 0xffff))
    out.toByteArray
  }

  /** RGB PNG via the JDK encoder (lossless: ImageIO.write is the
    * inverse of the reader decodePng wraps).
    */
  private def png(w: Int, h: Int, rgbTopDown: Array[Int]): Array[Byte] = {
    require(rgbTopDown.length == 3 * w * h)
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (r <- 0 until h; c <- 0 until w) {
      val o = 3 * (r * w + c)
      img.setRGB(c, r, (rgbTopDown(o) << 16) | (rgbTopDown(o + 1) << 8)
        | rgbTopDown(o + 2))
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** 8-bit grayscale PNG, written through the RAW raster (setRGB on a
    * gray image would push values through the sRGB->linear-gray
    * transform — the exact nonlinearity decodePng's raster branch
    * exists to avoid).
    */
  private def grayPng(w: Int, h: Int, px: Array[Int]): Array[Byte] = {
    require(px.length == w * h)
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (r <- 0 until h; c <- 0 until w)
      img.getRaster.setSample(c, r, 0, px(r * w + c))
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  // ---- decoders ---------------------------------------------------------

  test("PGM roundtrip: dims, channels, raw pixel values") {
    val px = Array.tabulate(6 * 4)(i => (i * 7) % 256)
    val d = MediaCodec.decode(pgm(6, 4, px)).get
    assert((d.format, d.width, d.height, d.channels) == (("pgm", 6, 4, 1)))
    assert(d.values.toSeq == px.map(_.toLong).toSeq)
  }

  test("PPM roundtrip with header comment: channel-sum luminance") {
    val rgb = Array.tabulate(3 * 2 * 2)(i => (i * 31) % 256)
    val d = MediaCodec.decode(ppm(2, 2, rgb)).get
    assert((d.format, d.width, d.height, d.channels) == (("ppm", 2, 2, 3)))
    val expect = (0 until 4).map(i =>
      rgb(3 * i).toLong + rgb(3 * i + 1) + rgb(3 * i + 2))
    assert(d.values.toSeq == expect)
  }

  test("BMP bottom-up rows with 4-byte padding decode in raster order") {
    // w=3 -> rowBytes 12 (3 pad bytes); values distinct per pixel
    val rgb = Array.tabulate(3 * 3 * 2)(i => (i * 11) % 256)
    val d = MediaCodec.decode(bmp(3, 2, rgb)).get
    assert((d.format, d.width, d.height, d.channels) == (("bmp", 3, 2, 3)))
    val expect = (0 until 6).map(i =>
      rgb(3 * i).toLong + rgb(3 * i + 1) + rgb(3 * i + 2))
    assert(d.values.toSeq == expect)
  }

  test("BMP top-down (negative height) matches the same raster") {
    val rgb = Array.tabulate(3 * 3 * 2)(i => (i * 11) % 256)
    val up = MediaCodec.decode(bmp(3, 2, rgb)).get
    val dn = MediaCodec.decode(bmp(3, 2, rgb, negHeight = true)).get
    assert(up.values.toSeq == dn.values.toSeq)
  }

  test("WAV: chunk skip, sign extension, stereo frame count") {
    val samples = Array(0, 1, -1, -32768, 32767, 100, -100, 5000)
    val d = MediaCodec.decode(wav(16000, 2, samples)).get
    assert((d.format, d.channels, d.sampleRate) == (("wav", 2, 16000)))
    assert(d.width == 4) // frames = samples / channels
    assert(d.values.toSeq == samples.map(_ + 32768L).toSeq)
  }

  test("malformed media decode to None, never throw") {
    val cases = Seq[Array[Byte]](
      Array.emptyByteArray,
      "JFIF-not-really".getBytes,                     // unknown magic
      "P5\n4 4\n255\n12".getBytes,                    // truncated raster
      "P5\n4 4\n70000\n".getBytes ++ new Array[Byte](16), // maxval > 255
      "P5\n-3 4\n255\n".getBytes,                     // bad dims
      pgm(2, 2, Array(1, 2, 3, 4)).take(7),           // truncated header
      "BM".getBytes,                                  // truncated bmp
      bmp(3, 2, new Array[Int](18)).take(40),         // truncated dib
      "RIFFxxxxWAVE".getBytes,                        // no chunks
      wav(16000, 2, Array(1, 2, 3, 4)).take(30),      // truncated fmt
      png(4, 4, new Array[Int](48)).take(20),         // truncated png
      ((0x89.toByte +: "PNG not really".getBytes.toSeq)
        .toArray))                                    // bad png body
    cases.foreach(c => assert(MediaCodec.decode(c).isEmpty,
      s"expected None for ${new String(c.take(8))}"))
  }

  test("PNG (r17): RGB roundtrip is exact channel sums; gray reads " +
      "the raw raster; palette/alpha decode; phash parity with PGM") {
    // RGB: decoded value = r+g+b, row-major, exact
    val rgb = Array.tabulate(3 * 6 * 4)(i => (i * 7 + 3) % 256)
    val d = MediaCodec.decode(png(6, 4, rgb)).get
    assert((d.format, d.width, d.height, d.channels) ==
      (("png", 6, 4, 3)))
    assert(d.values.toSeq == rgb.grouped(3)
      .map(g => g.map(_.toLong).sum).toSeq)

    // gray PNG: raw raster samples x3 — NOT the gray->sRGB transform
    val gpx = Array.tabulate(8 * 8)(i => (i * 5 + 1) % 256)
    val dg = MediaCodec.decode(grayPng(8, 8, gpx)).get
    assert(dg.values.toSeq == gpx.map(_ * 3L).toSeq,
      "gray PNG must decode raw samples (x3 channel-sum convention)")

    // the channel-sum convention makes a gray PNG a positive scaling
    // of the same pixels' PGM, and the cross-multiplied aHash is
    // scaling-invariant: identical fingerprints
    val px = Array.tabulate(16 * 16)(i =>
      if ((i / 16 + i % 16) % 3 == 0) 220 else (i * 11) % 128)
    val viaPgm = MediaCodec.phashBoxed(pgm(16, 16, px))
    val viaPng = MediaCodec.phashBoxed(grayPng(16, 16, px))
    assert(viaPgm != null && viaPgm == viaPng,
      s"phash(PGM)=$viaPgm must equal phash(gray PNG)=$viaPng")

    // a one-pixel edit on the PNG stays phash-local (the decoded-hash
    // property that makes compressed formats dedupable at all: the
    // DEFLATE bytes change wholesale, the pixels barely move)
    val edited = px.clone(); edited(40) = (edited(40) + 90) % 256
    val ham = java.lang.Long.bitCount(
      viaPng ^ MediaCodec.phashBoxed(grayPng(16, 16, edited)))
    assert(ham <= 4, s"one-pixel PNG edit moved $ham phash bits")

    // MediaPhash / MediaInfo columns see PNG like any other format
    val rows = Seq((1L, grayPng(16, 16, px)), (2L, png(6, 4, rgb)),
      (3L, "not an image".getBytes))
      .toDF("media_id", "payload")
      .select(col("media_id"),
        MediaCodec.mediaPhash(col("payload")).as("ph"),
        MediaCodec.mediaInfo(col("payload")).getField("format")
          .as("fmt"))
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) null else r.getLong(1),
        r.getString(2))).toSeq
    assert(rows(0)._2 == viaPng.longValue && rows(0)._3 == "png")
    assert(rows(1)._3 == "png")
    assert(rows(2)._2 == null && rows(2)._3 == null,
      "undecodable stays null (dead-letter), never a fake answer")
  }

  test("PNG (r18): 16-bit gray and gray+alpha take the raw-raster " +
      "path, never the CMM gray->sRGB conversion") {
    // 16-bit gray: raw USHORT samples, downscaled by the fixed
    // integer rule (v*255+32767)/65535. Samples v8*257 reproduce v8
    // exactly (257*255 = 65535), so this 16-bit image must decode
    // bit-identically to its 8-bit twin — any CMM involvement breaks
    // the equality on some JDK
    val v8 = Array.tabulate(8 * 8)(i => (i * 5 + 1) % 256)
    val img16 = new java.awt.image.BufferedImage(8, 8,
      java.awt.image.BufferedImage.TYPE_USHORT_GRAY)
    for (r <- 0 until 8; c <- 0 until 8)
      img16.getRaster.setSample(c, r, 0, v8(r * 8 + c) * 257)
    val out16 = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img16, "png", out16)
    val d16 = MediaCodec.decode(out16.toByteArray).get
    assert(d16.values.toSeq == v8.map(_ * 3L).toSeq,
      "16-bit gray must decode via raw raster + integer downscale")
    assert(MediaCodec.phashBoxed(out16.toByteArray) ==
      MediaCodec.phashBoxed(grayPng(8, 8, v8)),
      "a 16-bit upsample of the same pixels must phash identically")

    // gray+alpha: band 0 raw, alpha ignored — same values as the
    // no-alpha twin even with a varying alpha channel
    val imgGa = new java.awt.image.BufferedImage(8, 8,
      java.awt.image.BufferedImage.TYPE_INT_ARGB)
    // build via an explicit gray+alpha raster so ImageIO writes a
    // grayscale-with-alpha PNG, not RGBA
    val gaCs = java.awt.color.ColorSpace.getInstance(
      java.awt.color.ColorSpace.CS_GRAY)
    val gaCm = new java.awt.image.ComponentColorModel(gaCs, true, false,
      java.awt.Transparency.TRANSLUCENT,
      java.awt.image.DataBuffer.TYPE_BYTE)
    val gaRaster = gaCm.createCompatibleWritableRaster(8, 8)
    for (r <- 0 until 8; c <- 0 until 8) {
      gaRaster.setSample(c, r, 0, v8(r * 8 + c))     // gray
      gaRaster.setSample(c, r, 1, (r * 8 + c) % 256) // varying alpha
    }
    val gaImg = new java.awt.image.BufferedImage(gaCm, gaRaster,
      false, null)
    val outGa = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(gaImg, "png", outGa)
    val dGa = MediaCodec.decode(outGa.toByteArray).get
    assert(dGa.values.toSeq == v8.map(_ * 3L).toSeq,
      "gray+alpha must decode band 0 raw; alpha is ignored")
  }

  // ---- perceptual hash --------------------------------------------------

  test("phash2D: flat image hashes to 0, half-bright sets exactly the bright blocks") {
    assert(MediaCodec.phash2D(Array.fill(64)(7L), 8, 8) == 0L)
    // left half dark (0), right half bright (200): bits with c >= 4 set
    val v = Array.tabulate(16 * 16)(i => if (i % 16 >= 8) 200L else 0L)
    val hash = MediaCodec.phash2D(v, 16, 16)
    for (r <- 0 until 8; c <- 0 until 8) {
      val bit = (hash >> (r * 8 + c)) & 1
      assert(bit == (if (c >= 4) 1 else 0), s"bit ($r,$c)")
    }
  }

  test("phash2D is edit-local: one changed pixel flips at most a few bits") {
    val base = Array.tabulate(24 * 16)(i => ((i * 37) % 251).toLong)
    val edited = base.clone(); edited(100) = 250L
    val d = java.lang.Long.bitCount(
      MediaCodec.phash2D(base, 24, 16) ^ MediaCodec.phash2D(edited, 24, 16))
    assert(d <= 4, s"hamming $d")
  }

  // ---- expressions: values, nulls, codegen ------------------------------

  test("MediaPhash/MediaInfo columns: decoded values, null for undecodable") {
    val rows = Seq(
      (1L, pgm(8, 8, Array.tabulate(64)(i => i * 3 % 256))),
      (2L, wav(8000, 1, Array.tabulate(64)(i => i * 500 - 16000))),
      (3L, "not media at all".getBytes))
    val df = rows.toDF("id", "payload")
    val out = df.select($"id", MediaCodec.mediaPhash($"payload").as("ph"),
      MediaCodec.mediaInfo($"payload").as("info")).orderBy("id").collect()
    val img = MediaCodec.decode(rows(0)._2).get
    assert(out(0).getLong(1) ==
      MediaCodec.phash2D(img.values, img.width, img.height))
    assert(out(0).getStruct(2).getString(0) == "pgm")
    val aud = MediaCodec.decode(rows(1)._2).get
    assert(out(1).getLong(1) == MediaCodec.phash1D(aud.values))
    assert(out(1).getStruct(2).getInt(4) == 8000)
    assert(out(2).isNullAt(1) && out(2).isNullAt(2))
  }

  test("decodedStats is a zero-exchange whole-stage-codegen projection") {
    // a real file scan (local relations constant-fold to LocalTableScan,
    // which would vacuously pass the no-Exchange assert and dodge codegen)
    val dir = java.nio.file.Files.createTempDirectory("media-plan").toString
    Seq((1L, pgm(8, 8, Array.tabulate(64)(identity))))
      .toDF("media_id", "payload").write.mode("overwrite").parquet(dir)
    val df = spark.read.parquet(dir)
    val out = Multimodal.decodedStats(df, "media_id", "payload")
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
    assert("""\*\(\d+\) Project""".r.findFirstIn(plan).nonEmpty,
      s"media decode fell out of whole-stage codegen:\n$plan")
  }

  test("extractFeatures block means match the MediaBlockMeans expression") {
    val rows = Seq(
      (1L, "image", pgm(16, 12, Array.tabulate(192)(i => i % 256))),
      (2L, "audio", wav(8000, 1, Array.tabulate(100)(i => i * 100))),
      (3L, "junk", "zzz".getBytes))
    val df = rows.toDF("media_id", "modality", "payload")
    val viaBatch = Multimodal.extractFeatures(df)
      .select($"media_id", $"features").collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) null else r.getSeq[Float](1))).toMap
    val viaExpr = df.select($"media_id",
        MediaCodec.mediaBlockMeans($"payload").as("f")).collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) null else r.getSeq[Float](1))).toMap
    assert(viaBatch == viaExpr)
    assert(viaBatch(1L) != null && viaBatch(1L).length == 64)
    assert(viaBatch(3L) == null) // undecodable -> null features
  }
}
