package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column plumbing.
  *
  * Media are opaque `binary` columns with a typed metadata struct —
  * `(media_id, modality, payload binary, meta struct<mime,width,height,
  * duration_ms>)`. The decode / feature-extract kernels would be native
  * libraries in production (not present in this container), so the decode
  * step is a clearly-marked deterministic STUB; everything Spark-side —
  * schema, batch iteration via mapPartitions (the Scala analogue of
  * mapInPandas' batched UDF shape), partition sizing, feature schema — is
  * real and tested.
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
    StructField("features", ArrayType(FloatType), nullable = false)))

  /** STUB decode kernel: a real implementation would call an image/audio
    * codec here (libjpeg / ffmpeg et al., unavailable in this container).
    * The deterministic fake derives an 8-dim "feature vector" from payload
    * bytes so the plumbing (batching, schema, shuffle boundaries) is
    * testable end-to-end.
    */
  private def stubDecode(payload: Array[Byte]): Array[Float] = {
    val out = new Array[Float](8)
    var i = 0
    while (i < payload.length) {
      out(i % 8) += (payload(i) & 0xff) / 255.0f
      i += 1
    }
    out
  }

  /** Batched feature extraction over binary payloads. mapPartitions keeps
    * the (native-library) kernel initialization per-partition, exactly the
    * batching contract of a pandas-UDF `mapInPandas` pipeline: the
    * expensive setup amortizes over the whole partition, and partition
    * size is controlled upstream by `repartition`/maxPartitionBytes.
    */
  def extractFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
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
            checksum, stubDecode(payload))
        }
      }(enc)
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
    * byte-band Hamming LSH ([[graft.operators.Dedup.bandedHammingPairs]]
    * — the same bucketed machinery simhash text dedup uses). Emits
    * `(id_a, id_b, hamming)` for pairs sharing any 8-bit band with
    * Hamming distance <= `maxHamming`.
    *
    * Scale shape: hashing is a projection on the media scan (payload
    * bytes never ride a shuffle — only the 8-byte fingerprint does), and
    * candidates are generated per band bucket, never all-pairs. This
    * makes image dedup first-class: the stats/features stubs describe
    * media; this one deduplicates it.
    */
  def phashNearDups(media: DataFrame, idCol: String,
                    payloadCol: String, maxHamming: Int): DataFrame =
    graft.operators.Dedup.bandedHammingPairs(
      media.select(col(idCol), aHash(col(payloadCol)).as("phash")),
      idCol, "phash", bits = 64, maxHamming = maxHamming)

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
