package graft.sources

/** Kafka start-offset resolution with the reference tap's precedence:
  * stored `offset` > stored `timestamp` > configured `start_time`
  * (tap-kafka/tap_kafka/sync.py:250-320), where `initial_start_time` may
  * be "beginning"/"earliest", "latest", or an ISO timestamp.
  *
  * Produces the `startingOffsets`/`startingTimestamp` options for
  * `spark.readStream.format("kafka")` — the Spark-native equivalent of
  * the tap's consumer.seek calls.
  */
object KafkaOffsets {

  final case class PartitionBookmark(partition: Int, offset: Option[Long],
                                     timestamp: Option[Long])

  sealed trait StartSpec
  final case class StartingOffsets(json: String) extends StartSpec
  final case class StartingTimestamp(millis: Long) extends StartSpec
  final case class Named(value: String) extends StartSpec // earliest/latest

  def resolve(topic: String, bookmarks: Seq[PartitionBookmark],
              initialStartTime: String = "latest"): StartSpec = {
    val withOffsets = bookmarks.filter(_.offset.isDefined)
    if (withOffsets.nonEmpty) {
      // next unread message = stored offset + 1 (tap commits consumed)
      val parts = withOffsets.map { b =>
        s""""${b.partition}": ${b.offset.get + 1}"""
      }.mkString(", ")
      StartingOffsets(s"""{"$topic": {$parts}}""")
    } else bookmarks.flatMap(_.timestamp).sorted.headOption match {
      case Some(ts) => StartingTimestamp(ts)
      case None => initialStartTime.toLowerCase match {
        case "beginning" | "earliest" => Named("earliest")
        case "latest" => Named("latest")
        case iso =>
          StartingTimestamp(java.time.Instant.parse(iso).toEpochMilli)
      }
    }
  }
}
