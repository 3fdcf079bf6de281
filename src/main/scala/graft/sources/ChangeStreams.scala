package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** MongoDB ChangeStream event decoder — the Mongo LOG_BASED tap's event
  * layer (tap-mongodb sync_strategies/change_streams.py:73-230).
  *
  * Input is the landed JSON rendering of change-stream documents:
  *
  * {{{
  * {"_id":{"_data":"8264..."},"operationType":"insert",
  *  "clusterTime":"2024-01-01T00:00:00Z","ns":{"db":"d","coll":"c"},
  *  "documentKey":{"_id":1},"fullDocument":{"_id":1,"v":"a"}}
  * }}}
  *
  * Reference semantics reproduced:
  *  - insert → record from `fullDocument` (op c);
  *  - update → ONLY the documentKey id (op u, other columns null): change
  *    streams return just the id + updated fields, so the reference
  *    buffers ids and refetches full documents at flush
  *    (change_streams.py:160-163, flush at :199) — Spark shape:
  *    [[graft.streaming.StreamingMerge.refetchUpdates]] joins the ids
  *    back to the source collection inside the micro-batch;
  *  - delete → id + `_sdc_deleted_at` = clusterTime
  *    (change_streams.py:165-176); a delete AFTER a buffered update wins
  *    via last-write-wins on `_cs_token` (the reference discards the
  *    buffered id);
  *  - the resume token `_data` is hex-encoded and monotonic, so max() is
  *    the bookmark — it advances on every event, matching the cursor's
  *    `resume_token` (change_streams.py:121-130).
  */
object ChangeStreams {

  private val docMap = MapType(StringType, StringType)

  /** from_json schema of one landed change-stream document. */
  val eventSchema: StructType = StructType(Seq(
    StructField("_id", StructType(Seq(StructField("_data", StringType)))),
    StructField("operationType", StringType),
    StructField("clusterTime", StringType),
    StructField("ns", StructType(Seq(
      StructField("db", StringType), StructField("coll", StringType)))),
    StructField("documentKey", docMap),
    StructField("fullDocument", docMap)))

  private val ops = Seq("insert", "update", "delete")

  /** Header-only parse for the selection predicate (skips fullDocument
    * materialization for filtered-out events).
    */
  private val headerSchema: StructType = StructType(Seq(
    StructField("operationType", StringType),
    StructField("ns", StructType(Seq(
      StructField("db", StringType), StructField("coll", StringType))))))

  /** Decode landed change-stream documents for one (db, coll) into the
    * engine's envelope: rowSchema columns + `op` (c/u/d) +
    * `_sdc_deleted_at` + `_cs_token` (resume-token order column).
    * Update rows carry only the id — pass the result through
    * `refetchUpdates` before merging.
    */
  def decode(lines: DataFrame, payloadCol: String, dbName: String,
             collName: String, rowSchema: StructType,
             idField: String = "_id"): DataFrame = {
    val h = from_json(col(payloadCol), headerSchema)
    val parsed = lines
      .filter(h.getField("operationType").isin(ops: _*) &&
        h.getField("ns").getField("db") === dbName &&
        h.getField("ns").getField("coll") === collName)
      .select(from_json(col(payloadCol), eventSchema).as("e"))
    val out: Seq[Column] =
      rowSchema.fields.toSeq.map { f =>
        val v =
          if (f.name == idField)
            coalesce(element_at(col("e.fullDocument"), f.name),
              element_at(col("e.documentKey"), f.name))
          else
            when(col("e.operationType") === "insert",
              element_at(col("e.fullDocument"), f.name))
        v.cast(f.dataType).as(f.name)
      } ++ Seq(
        when(col("e.operationType") === "insert", "c")
          .when(col("e.operationType") === "update", "u")
          .otherwise("d").as("op"),
        when(col("e.operationType") === "delete",
          col("e.clusterTime").cast("timestamp"))
          .otherwise(lit(null).cast("timestamp")).as("_sdc_deleted_at"),
        col("e._id._data").as("_cs_token"))
    parsed.select(out: _*)
  }

  /** Max resume token across ALL events of the frame (any collection) —
    * the LOG_BASED bookmark; advances even for streams with no selected
    * changes, like the cursor's token.
    */
  def nextResumeToken(lines: DataFrame, payloadCol: String)
      : Option[String] = {
    // resume tokens are hex strings of VARYING length (the KeyString
    // encoding grows with the clusterTime/documentKey payload), and
    // lexicographic order only equals token order for equal-length
    // strings — so order by (length, value), the numeric-string max
    val tok = col("e._id._data")
    val row = lines
      .select(from_json(col(payloadCol), eventSchema).as("e"))
      .filter(tok.isNotNull)
      .agg(max(struct(length(tok).as("len"), tok.as("t")))).head()
    if (row.isNullAt(0)) None else Some(row.getStruct(0).getString(1))
  }
}
