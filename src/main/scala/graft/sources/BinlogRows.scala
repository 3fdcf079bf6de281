package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** MySQL binlog row-event decoder — the LOG_BASED tap's event layer
  * (tap-mysql sync_strategies/binlog.py:496-560 handle_*_rows_event,
  * :578-615 schema diff, :286-446 file+pos/GTID bookmarks).
  *
  * Input is the landed JSON rendering of row events (what a
  * python-mysql-replication / Debezium-style reader emits once off the
  * wire — the binary wire protocol itself needs a MySQL client socket and
  * is driver-side territory, like the reference's BinLogStreamReader):
  *
  * {{{
  * {"event_type":"write_rows","schema":"db","table":"t",
  *  "timestamp":"2024-01-01T00:00:00Z","log_file":"mysql-bin.000001",
  *  "log_pos":4,"rows":[{"values":{"id":1,"v":"a"}}]}
  * }}}
  *
  * Reference semantics reproduced:
  *  - write_rows → record from `values` (op c);
  *  - update_rows → record from `after_values` (op u) — last-write-wins
  *    by PK downstream, same as the reference's singer record stream;
  *  - delete_rows → record from `values` plus `_sdc_deleted_at` = the
  *    event timestamp (binlog.py:540-542);
  *  - one event carries MANY rows: ordering within an event is the row
  *    index, so the total CDC order is (log_file, log_pos, row index) —
  *    emitted as one comparable `_binlog_seq` struct;
  *  - schema-change detection diffs event columns against the known
  *    schema, ignoring `__dropped_col_N__` markers (binlog.py:578-615).
  */
object BinlogRows {

  private val valueMap = MapType(StringType, StringType)

  /** from_json schema of one landed row event. */
  val eventSchema: StructType = StructType(Seq(
    StructField("event_type", StringType),
    StructField("schema", StringType),
    StructField("table", StringType),
    StructField("timestamp", StringType),
    StructField("log_file", StringType),
    StructField("log_pos", LongType),
    StructField("rows", ArrayType(StructType(Seq(
      StructField("values", valueMap),
      StructField("before_values", valueMap),
      StructField("after_values", valueMap)))))))

  private val rowActions = Seq("write_rows", "update_rows", "delete_rows")

  /** Header-only parse for selection predicates — skips materializing
    * `rows` so filtered-out events never pay the full parse.
    */
  private val headerSchema: StructType = StructType(Seq(
    StructField("event_type", StringType),
    StructField("schema", StringType),
    StructField("table", StringType)))

  private def selected(payloadCol: String, schemaName: String,
                       tableName: String): Column = {
    val h = from_json(col(payloadCol), headerSchema)
    h.getField("event_type").isin(rowActions: _*) &&
      h.getField("schema") === schemaName &&
      h.getField("table") === tableName
  }

  /** Decode landed binlog row events into the engine's change envelope:
    * rowSchema columns + `op` (c/u/d) + `_sdc_deleted_at` (delete events
    * only) + `_binlog_seq` (comparable (log_file, log_pos, row_idx)
    * struct — the dedup/merge order column).
    */
  def decode(lines: DataFrame, payloadCol: String, schemaName: String,
             tableName: String, rowSchema: StructType): DataFrame = {
    val parsed = lines
      .filter(selected(payloadCol, schemaName, tableName))
      .select(from_json(col(payloadCol), eventSchema).as("e"))
      .select(col("e.event_type").as("et"), col("e.timestamp").as("ts"),
        col("e.log_file"), col("e.log_pos"),
        posexplode(col("e.rows")).as(Seq("row_idx", "r")))
    val vals = when(col("et") === "update_rows", col("r.after_values"))
      .otherwise(col("r.values"))
    val out: Seq[Column] =
      rowSchema.fields.toSeq.map(f =>
        element_at(vals, f.name).cast(f.dataType).as(f.name)) ++ Seq(
        when(col("et") === "write_rows", "c")
          .when(col("et") === "update_rows", "u")
          .otherwise("d").as("op"),
        when(col("et") === "delete_rows", col("ts").cast("timestamp"))
          .otherwise(lit(null).cast("timestamp")).as("_sdc_deleted_at"),
        struct(col("log_file"), col("log_pos"), col("row_idx"))
          .as("_binlog_seq"))
    parsed.select(out: _*)
  }

  /** Event columns not in the declared schema — the schema-change diff
    * that pauses the stream for re-discovery (binlog.py:578-615).
    * `__dropped_col_N__` markers are ignored like the reference.
    */
  def detectNewColumns(lines: DataFrame, payloadCol: String,
                       schemaName: String, tableName: String,
                       rowSchema: StructType): DataFrame = {
    val known = rowSchema.fieldNames.toSeq
    lines.filter(selected(payloadCol, schemaName, tableName))
      .select(from_json(col(payloadCol), eventSchema).as("e"))
      .select(explode(col("e.rows")).as("r"))
      .select(explode(map_keys(coalesce(col("r.after_values"),
        col("r.values")))).as("column_name"))
      .filter(!col("column_name").rlike("^__dropped_col_\\d+__$") &&
        !col("column_name").isin(known: _*))
      .distinct()
  }

  /** Max (log_file, log_pos) across ALL events (row or not) — the
    * file+pos bookmark (binlog.py:286-446). Binlog file names are
    * zero-padded so lexicographic struct ordering is the binlog order.
    */
  def nextPosition(lines: DataFrame, payloadCol: String)
      : Option[(String, Long)] = {
    val row = lines
      .select(from_json(col(payloadCol), eventSchema).as("e"))
      .agg(max(struct(col("e.log_file"), col("e.log_pos"))).as("m"))
      .head()
    if (row.isNullAt(0)) None
    else {
      val s = row.getStruct(0)
      if (s.isNullAt(0)) None else Some((s.getString(0), s.getLong(1)))
    }
  }
}
