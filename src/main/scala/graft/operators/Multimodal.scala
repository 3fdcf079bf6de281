package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column plumbing.
  *
  * Media are opaque `binary` columns with a typed metadata struct —
  * `(media_id, modality, payload binary, meta struct<mime,width,height,
  * duration_ms>)`. The decode kernel is now REAL for every format
  * decodable with pure byte arithmetic — PGM/PPM images, uncompressed
  * 24-bpp BMP, and PCM-16 WAV audio ([[graft.functions.MediaCodec]]);
  * compressed codecs (JPEG/MP3/H.264) need entropy-coder jars absent in
  * this container and decode to null (dead-letter routable), never a fake
  * answer. Feature extraction, stats, and the perceptual hash all run
  * over DECODED pixels/samples; the byte-level [[aHash]] remains for
  * genuinely opaque payloads.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("modality", StringType, nullable = false),
    StructField("payload", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("mime", StringType, nullable = true),
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("duration_ms", LongType, nullable = true))),
      nullable = true)))

  val featureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("modality", StringType, nullable = false),
    StructField("n_bytes", LongType, nullable = false),
    StructField("checksum", StringType, nullable = false),
    StructField("features", ArrayType(FloatType), nullable = true)))

  /** Batched feature extraction over binary payloads. mapPartitions keeps
    * kernel initialization per-partition, exactly the batching contract of
    * a pandas-UDF `mapInPandas` pipeline: expensive setup amortizes over
    * the whole partition, and partition size is controlled upstream by
    * `repartition`/maxPartitionBytes. The kernel is the REAL pure-JVM
    * decoder ([[graft.functions.MediaCodec.blockMeans]]): 64 decoded
    * block means (2-D pixel blocks for images, 1-D sample ranges for
    * audio). Undecodable payloads get null features (route to dead
    * letter), with length+checksum still populated for provenance.
    */
  def extractFeatures(media: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(featureSchema)
    media.select(col("media_id"), col("modality"), col("payload"))
      .mapPartitions { rows =>
        // per-partition kernel init would happen here
        rows.map { r =>
          val payload =
            if (r.isNullAt(2)) Array.emptyByteArray
            else r.getAs[Array[Byte]](2)
          val md = java.security.MessageDigest.getInstance("MD5")
          val checksum = md.digest(payload)
            .map(b => f"${b & 0xff}%02x").mkString
          Row(r.getLong(0), r.getString(1), payload.length.toLong,
            checksum, graft.functions.MediaCodec.blockMeans(payload))
        }
      }(enc)
  }

  /** Decoded media descriptor — one row per payload with real parsed
    * dimensions/channels plus the decoded perceptual hash: `(media_id,
    * format, width, height, channels, n_units, phash)`. Pure projection
    * on the media scan (zero exchanges, whole-stage codegen); payload
    * bytes never leave the scan stage. Undecodable rows surface with
    * null format/phash for dead-letter routing.
    */
  def decodedStats(media: DataFrame, idCol: String, payloadCol: String)
      : DataFrame = {
    val info = graft.functions.MediaCodec.mediaInfo(col(payloadCol))
    media.select(col(idCol).as("media_id"), info.as("info"),
        graft.functions.MediaCodec.mediaPhash(col(payloadCol)).as("phash"))
      .select(col("media_id"),
        col("info.format").as("format"),
        col("info.width").as("width"),
        col("info.height").as("height"),
        col("info.channels").as("channels"),
        col("info.n_units").as("n_units"),
        col("phash"))
  }

  /** Expression-only media stats (no kernel needed): length + checksum —
    * used by the oracle-checked query since md5/octet_length exist in both
    * engines.
    */
  def mediaStats(media: DataFrame): DataFrame =
    media.select(col("media_id"), col("modality"),
      length(col("payload")).cast("long").as("n_bytes"),
      md5(col("payload")).as("checksum"))

  /** 64-bit perceptual average-hash of a binary payload — see
    * [[graft.functions.AHash64]] for the block-mean recipe and exactness
    * argument. A zero-exchange projection (no decode kernel needed:
    * pure integer arithmetic over the bytes).
    */
  def aHash(payload: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column =
    graft.functions.AHash64.aHash(payload)

  /** Perceptual near-duplicate media pairs: aHash each payload, then
    * banded Hamming LSH ([[graft.operators.Dedup.bandedHammingPairs]]
    * — the same bucketed machinery simhash text dedup uses). Emits
    * `(id_a, id_b, hamming)` for pairs sharing any `bandBits`-bit band
    * with Hamming distance <= `maxHamming`. Recall contract: with the
    * 16-bit default (4 bands over 64 bits) pigeonhole guarantees pairs
    * only to hamming <= 3; the default maxHamming = 12 keeps the
    * luck-range hits the narrow-band geometry found, and the operator
    * warns once per geometry that distances above bands-1 are
    * luck-range (see the bandBits note on [[phashNearDupsDecoded]]).
    *
    * Scale shape: hashing is a projection on the media scan (payload
    * bytes never ride a shuffle — only the 8-byte fingerprint does), and
    * candidates are generated per band bucket, never all-pairs. This
    * makes image dedup first-class: the stats/features stubs describe
    * media; this one deduplicates it.
    */
  def phashNearDups(media: DataFrame, idCol: String,
                    payloadCol: String, maxHamming: Int,
                    bandBits: Int = 16): DataFrame =
    graft.operators.Dedup.bandedHammingPairs(
      media.select(col(idCol), aHash(col(payloadCol)).as("phash")),
      idCol, "phash", bits = 64, maxHamming = maxHamming,
      bandBits = bandBits)

  /** Perceptual near-duplicate pairs over DECODED media: the true 2-D
    * block aHash ([[graft.functions.MediaCodec.phash2D]]) instead of the
    * byte-range fallback — robust to 2-D local edits the way real image
    * dedup must be. Undecodable payloads (null hash) are excluded from
    * the pair graph (they go to dead letter, not to dedup). Same scale
    * shape: only the 8-byte fingerprint rides the band join.
    *
    * `bandBits` is the corpus-size knob (see
    * [[graft.operators.Dedup.bandedHammingPairs]]): 8-bit bands give
    * 256 buckets per band, so candidate volume grows ~n²/256 per band —
    * measured quadratic on the factor-100 fixture (BASELINE.md r18).
    * 16-bit bands keep pigeonhole certainty for Hamming <= 3 with 65,536
    * buckets per band (256× fewer collisions); because a shared 16-bit
    * band means BOTH its 8-bit halves are shared, the wide-band
    * candidate set is an exact subset of the 8-bit one — the knob trades
    * recall in the (bands-1, maxHamming] luck range for scale, never
    * minting new pairs. Default 16 (r19): the short spelling IS the
    * 100 TB plan — the 8-bit geometry measured ×303 at factor 100
    * (BASELINE.md r18) and remains available as `bandBits = 8` for
    * small corpora where the extra luck-range recall is worth n²/256
    * candidates.
    */
  def phashNearDupsDecoded(media: DataFrame, idCol: String,
                           payloadCol: String, maxHamming: Int,
                           bandBits: Int = 16): DataFrame =
    graft.operators.Dedup.bandedHammingPairs(
      media.select(col(idCol),
          graft.functions.MediaCodec.mediaPhash(col(payloadCol))
            .as("phash"))
        .filter(col("phash").isNotNull),
      idCol, "phash", bits = 64, maxHamming = maxHamming,
      bandBits = bandBits)

  /** Frame-sampling plumbing for video-like payloads: split a payload into
    * fixed-size "frames" (deterministic byte windows standing in for real
    * frame decode) and explode to one row per sampled frame.
    */
  def sampleFrames(media: DataFrame, frameBytes: Int, everyNth: Int)
      : DataFrame = {
    val nFrames = (length(col("payload")) / frameBytes).cast("int")
    // stepped sequence emits only the kept frame indices — no generate-all
    // then post-filter, so the generator's output is 1/everyNth the rows
    media.select(col("media_id"),
      explode(sequence(lit(0), greatest(nFrames - 1, lit(0)),
        lit(everyNth))).as("frame_no"))
  }
}
