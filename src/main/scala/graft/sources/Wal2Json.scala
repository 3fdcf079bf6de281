package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** wal2json v2 change-event decoder — the PG logical-replication tap's
  * protocol layer (tap-postgres sync_strategies/logical_replication.py:
  * 380-497 `consume_message`).
  *
  * Reference semantics reproduced:
  *  - row actions I/U/D are decoded; B/C/M/T (begin/commit/message/
  *    truncate) only advance the LSN and emit nothing;
  *  - events for non-selected (schema, table) pairs are skipped;
  *  - I/U carry `columns`, D carries `identity` (the replica-identity key
  *    values) — both are name/type/value triples;
  *  - payload columns absent from the declared row schema are ignored
  *    (the caller may use [[detectNewColumns]] to trigger schema
  *    refresh, mirroring `refresh_streams_schema`), declared columns
  *    absent from the payload decode to NULL;
  *  - the op column is the engine's Debezium-ish envelope letter
  *    (I->c, U->u, D->d) consumed by
  *    [[graft.streaming.StreamingMerge.applyEnvelope]].
  *
  * Spark-first shape: ONE `from_json` per line, `map_from_entries` +
  * `element_at` to pivot the name/value triple list into typed columns —
  * all codegen'd expressions, no UDFs, so the decode rides inside the
  * scan's WholeStageCodegen at 100 TB.
  */
object Wal2Json {

  private val nameTypeValue = ArrayType(StructType(Seq(
    StructField("name", StringType),
    StructField("type", StringType),
    // value is heterogeneous JSON (number/string/bool/null): declared as
    // STRING, Spark's JSON parser yields the token text, and the typed
    // cast happens against the declared row schema below
    StructField("value", StringType))))

  /** from_json schema of one wal2json v2 action line. */
  val actionLineSchema: StructType = StructType(Seq(
    StructField("action", StringType),
    StructField("schema", StringType),
    StructField("table", StringType),
    StructField("columns", nameTypeValue),
    StructField("identity", nameTypeValue)))

  /** Cheap scan-level prefilter: raw string tests that skip protocol
    * noise (B/C/M/T wrappers, other tables) WITHOUT paying a JSON parse.
    * Deliberately a superset — the authoritative selection runs on the
    * parsed fields afterwards — so whitespace-tolerant regex is enough.
    * Replaces the previous header-only `from_json` pass: one JSON parse
    * per selected line instead of two, and noise lines cost a codegen'd
    * regex scan instead of a tokenizer run.
    */
  private def rawPrefilter(payload: Column, tableName: String): Column = {
    // short-circuit structure: compact JSON (what wal2json emits) hits
    // the literal `contains` and never pays the regex; the
    // whitespace-tolerant rlike is only the fallback, so the prefilter
    // stays a correct superset at near-`contains` cost even on streams
    // where every line is selected
    val actionFast = payload.contains("\"action\":\"I\"") ||
      payload.contains("\"action\":\"U\"") ||
      payload.contains("\"action\":\"D\"")
    val actionSafe = payload.rlike("\"action\"\\s*:\\s*\"[IUD]\"")
    val tableFast = payload.contains("\"table\":\"" + tableName + "\"")
    val tableSafe = payload.rlike("\"table\"\\s*:\\s*\"" +
      java.util.regex.Pattern.quote(tableName) + "\"")
    (actionFast || actionSafe) && (tableFast || tableSafe)
  }

  /** Decode raw wal2json v2 lines into the engine's change envelope.
    *
    * @param lines      frame with a JSON-string payload column and a
    *                   monotonic LSN column (the replication protocol's
    *                   `data_start`, carried alongside each message)
    * @param rowSchema  declared columns of the selected stream; each
    *                   decodes via `element_at(kv, name).cast(type)`
    * @return one row per I/U/D event of the selected table:
    *         rowSchema columns + `op` (c/u/d) + `lsnOut`
    */
  def decode(lines: DataFrame, payloadCol: String, lsnCol: String,
             schemaName: String, tableName: String, rowSchema: StructType,
             lsnOut: String = "_sdc_lsn"): DataFrame = {
    val headerSchema = StructType(Seq(
      StructField("action", StringType),
      StructField("schema", StringType),
      StructField("table", StringType)))
    val h = from_json(col(payloadCol), headerSchema)
    // ONE header selection expression comparing the parsed struct
    // WHOLE, not per field: Catalyst prunes a from_json schema per
    // getField reference (OptimizeJsonExprs), so both the pre-r20
    // three-conjunct spelling AND a struct-of-getFields tokenized every
    // candidate line THREE times (one single-field parse each, counted
    // in the executed plan). Comparing h itself keeps exactly one
    // header parse per line; a line whose header parses to anything but
    // a selected (I|U|D, schema, table) triple — including nulls from
    // noise/malformed lines — fails the IN exactly as it failed the
    // conjuncts. The full-schema parse below stays the only other
    // tokenizer run, and only selected lines pay it.
    val hdrKeep = h.isin(Seq("I", "U", "D").map(a =>
      struct(lit(a).as("action"), lit(schemaName).as("schema"),
        lit(tableName).as("table"))): _*)
    val rows = lines
      .filter(rawPrefilter(col(payloadCol), tableName))
      .filter(hdrKeep)
      .select(col(lsnCol).as(lsnOut),
        from_json(col(payloadCol), actionLineSchema).as("m"))
    // D rows carry identity (replica-identity key values), I/U carry
    // columns (logical_replication.py:424-432 payload examples)
    val entries = when(col("m.action") === "D", col("m.identity"))
      .otherwise(col("m.columns"))
    // staged projection: the kv map is built ONCE per row; per-field
    // element_at references the alias (CollapseProject keeps non-cheap
    // aliases staged instead of re-inlining the map build per field)
    val staged = rows.select(
      map_from_entries(transform(entries,
        e => struct(e.getField("name"), e.getField("value")))).as("__kv"),
      when(col("m.action") === "I", "c")
        .when(col("m.action") === "U", "u")
        .otherwise("d").as("op"),
      col(lsnOut))
    val out: Seq[Column] =
      rowSchema.fields.toSeq.map(f =>
        element_at(col("__kv"), f.name).cast(f.dataType).as(f.name)) ++
        Seq(col("op"), col(lsnOut))
    staged.select(out: _*)
  }

  /** Payload column names not in the declared schema — the reference's
    * new-column diff that triggers `refresh_streams_schema`
    * (logical_replication.py:437-453). Empty result = no evolution needed.
    */
  def detectNewColumns(lines: DataFrame, payloadCol: String,
                       schemaName: String, tableName: String,
                       rowSchema: StructType): DataFrame = {
    val known = rowSchema.fieldNames.toSeq
    lines.select(from_json(col(payloadCol), actionLineSchema).as("m"))
      .filter(col("m.action").isin("I", "U") &&
        col("m.schema") === schemaName && col("m.table") === tableName)
      .select(explode(col("m.columns.name")).as("column_name"))
      .filter(!col("column_name").isin(known: _*))
      .distinct()
  }

  /** Max LSN of a raw message frame — the slot-advance bookmark. Counts
    * EVERY action (including B/C/M/T and non-selected tables): the
    * reference advances the slot on skipped messages too, so a busy
    * non-selected table can't grow the slot
    * (logical_replication.py:397-403).
    */
  def nextLsn(lines: DataFrame, lsnCol: String): Option[Long] = {
    val row = lines.agg(max(col(lsnCol))).head()
    if (row.isNullAt(0)) None else Some(row.getLong(0))
  }
}
