package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Dev-only stage profiler for the wal2json decode path: isolates payload
  * generation, the raw prefilter, the header-schema parse, and the full
  * parse+pivot so decoder changes are measured, not guessed.
  *
  * Measured conclusion (sf0.1, local[32], medians of 3): decode ~2.7s =
  * payload gen 0.4 + prefilter 0.15 + header parse 0.6 + full parse 0.9 +
  * kv pivot ~0.7. Variant B (drop the header parse, filter on the parsed
  * struct) is SLOWER (~3.3s): predicate pushdown duplicates the full
  * parse into the filter. Variant C (nondeterministic barrier column to
  * block pushdown, parse+keep in one projection for codegen CSE) saves
  * only ~5%. The decode is JSON-tokenizer-bound — the current
  * header+full shape stays.
  */
object ProfileWal {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def noop(df: org.apache.spark.sql.DataFrame): Long = {
      df.write.format("noop").mode("overwrite").save(); 0L
    }
    def time(name: String)(f: => Long): Unit = {
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        f
        println(f"[profile] $name%-34s pass$i ${(System.nanoTime() - t0) / 1e9}%7.2fs")
      }
    }

    val iu = """{"action":"%s","schema":"public","table":"events",""" +
      """"columns":[{"name":"user_id","type":"bigint","value":%s},""" +
      """{"name":"event_id","type":"bigint","value":%s},""" +
      """{"name":"value","type":"double precision","value":%s}]}"""
    val payload = format_string(iu, lit("I"), col("user_id"),
      col("event_id"), col("value"))
    val events = graft.queries.Q.events(spark, sfDir)
    val lines = events.select(col("event_id").as("lsn"),
      payload.as("payload"))

    val headerSchema = StructType(Seq(
      StructField("action", StringType),
      StructField("schema", StringType),
      StructField("table", StringType)))
    val rowSchema = StructType(Seq(
      StructField("user_id", LongType),
      StructField("event_id", LongType),
      StructField("value", DoubleType)))

    time("payload generation only")(noop(lines))
    time("+ raw prefilter")(noop(lines.filter(
      col("payload").rlike("\"action\"\\s*:\\s*\"[IUD]\"") &&
        col("payload").rlike("\"table\"\\s*:\\s*\"events\""))))
    time("+ header from_json filter")(noop(lines.filter(
      col("payload").rlike("\"action\"\\s*:\\s*\"[IUD]\"") &&
        col("payload").rlike("\"table\"\\s*:\\s*\"events\""))
      .filter(from_json(col("payload"), headerSchema).getField("action")
        .isin("I", "U", "D"))))
    time("full parse only (no header)")(noop(lines.select(
      from_json(col("payload"), graft.sources.Wal2Json.actionLineSchema)
        .as("m"))))
    time("decode() end-to-end")(noop(graft.sources.Wal2Json.decode(
      lines, "payload", "lsn", "public", "events", rowSchema)))

    // round-4 shape: header from_json filter only, NO raw prefilter
    {
      val h = from_json(col("payload"), headerSchema)
      val rows = lines
        .filter(h.getField("action").isin("I", "U", "D") &&
          h.getField("schema") === "public" &&
          h.getField("table") === "events")
        .select(col("lsn"),
          from_json(col("payload"),
            graft.sources.Wal2Json.actionLineSchema).as("m"))
      val entries = when(col("m.action") === "D", col("m.identity"))
        .otherwise(col("m.columns"))
      val staged = rows.select(
        map_from_entries(transform(entries,
          e => struct(e.getField("name"), e.getField("value")))).as("__kv"),
        when(col("m.action") === "I", "c")
          .when(col("m.action") === "U", "u")
          .otherwise("d").as("op"),
        col("lsn"))
      val r4 = staged.select(rowSchema.fields.toSeq.map(f =>
        element_at(col("__kv"), f.name).cast(f.dataType).as(f.name)) ++
        Seq(col("op"), col("lsn")): _*)
      time("r4 shape (header only)")(noop(r4))
    }

    // variant B: single full parse, authoritative filter on parsed fields
    // (predicate pushdown may duplicate the parse into the filter)
    val pre = lines.filter(
      col("payload").rlike("\"action\"\\s*:\\s*\"[IUD]\"") &&
        col("payload").rlike("\"table\"\\s*:\\s*\"events\""))
    def pivot(rows: org.apache.spark.sql.DataFrame)
        : org.apache.spark.sql.DataFrame = {
      val entries = when(col("m.action") === "D", col("m.identity"))
        .otherwise(col("m.columns"))
      val staged = rows.select(
        map_from_entries(transform(entries,
          e => struct(e.getField("name"), e.getField("value")))).as("__kv"),
        when(col("m.action") === "I", "c")
          .when(col("m.action") === "U", "u")
          .otherwise("d").as("op"),
        col("lsn"))
      staged.select(rowSchema.fields.toSeq.map(f =>
        element_at(col("__kv"), f.name).cast(f.dataType).as(f.name)) ++
        Seq(col("op"), col("lsn")): _*)
    }
    val vb = pivot(pre.select(col("lsn"),
        from_json(col("payload"),
          graft.sources.Wal2Json.actionLineSchema).as("m"))
      .filter(col("m.action").isin("I", "U", "D") &&
        col("m.schema") === "public" && col("m.table") === "events"))
    time("variant B single-parse")(noop(vb))
    val nParses = vb.queryExecution.executedPlan.toString
      .sliding("from_json".length).count(_ == "from_json")
    println(s"[profile] variant B from_json occurrences in plan: $nParses")

    // variant C: nondeterministic barrier column blocks pushdown; parse
    // and keep-flag live in ONE projection (codegen CSE -> one parse)
    val vc = {
      val m = from_json(col("payload"),
        graft.sources.Wal2Json.actionLineSchema)
      val parsed = pre.select(col("lsn"), m.as("m"),
          (m.getField("action").isin("I", "U", "D") &&
            m.getField("schema") === "public" &&
            m.getField("table") === "events").as("__keep"),
          monotonically_increasing_id().as("__b"))
        .filter(col("__keep"))
      pivot(parsed)
    }
    time("variant C barrier single-parse")(noop(vc))
    val nParsesC = vc.queryExecution.executedPlan.toString
      .sliding("from_json".length).count(_ == "from_json")
    println(s"[profile] variant C from_json occurrences in plan: $nParsesC")
    spark.stop()
  }
}
