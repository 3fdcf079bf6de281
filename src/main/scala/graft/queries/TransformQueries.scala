package graft.queries

import org.apache.spark.sql.functions._
import graft.queries.Q._
import graft.spec.{TransformCondition, Transformation}
import graft.transform.{Flattening, Masking, Metadata}

/** Verified queries covering the reference's transformation surface
  * (SURVEY.md §2.4): the masking/hashing compiler, conditional guards,
  * record flattening, timestamp sanitation, and the type-mapping matrix.
  * Every one uses the engine's Masking/Flattening/Metadata transforms —
  * pure Catalyst Column chains — with exact DuckDB oracles.
  */
object TransformQueries {

  val defs: Map[String, QueryDef] = Map(

    "transform_set_null" -> QueryDef(
      (s, d) => Masking.apply(
        table(s, d, "customer").select(col("c_custkey"), col("c_name"),
          col("c_mktsegment")),
        Transformation("c_name", "SET-NULL")),
      Some("SELECT c_custkey, CAST(NULL AS VARCHAR) AS c_name, " +
        "c_mktsegment FROM customer")),

    "transform_hash" -> QueryDef(
      (s, d) => Masking.apply(
        table(s, d, "customer").select(col("c_custkey"), col("c_name")),
        Transformation("c_name", "HASH")),
      Some("SELECT c_custkey, sha256(c_name) AS c_name FROM customer")),

    "transform_hash_skip_first_2" -> QueryDef(
      (s, d) => Masking.apply(
        table(s, d, "customer").select(col("c_custkey"), col("c_name")),
        Transformation("c_name", "HASH-SKIP-FIRST-2")),
      Some("""SELECT c_custkey,
             |  substr(c_name, 1, 2) || sha256(substr(c_name, 3)) AS c_name
             |FROM customer""".stripMargin)),

    "transform_mask_date" -> QueryDef(
      (s, d) => Masking.apply(
        table(s, d, "orders").select(col("o_orderkey"),
          col("o_orderdate").cast("timestamp").as("o_orderdate")),
        Transformation("o_orderdate", "MASK-DATE"))
        .select(col("o_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd HH:mm:ss")
            .as("masked_date")),
      Some("""SELECT o_orderkey,
             |  strftime(make_timestamp(CAST(year(o_orderdate) AS BIGINT),
             |    1, 1, CAST(hour(o_orderdate) AS BIGINT),
             |    CAST(minute(o_orderdate) AS BIGINT),
             |    CAST(second(o_orderdate) AS DOUBLE)),
             |    '%Y-%m-%d %H:%M:%S') AS masked_date
             |FROM orders""".stripMargin)),

    "transform_mask_number" -> QueryDef(
      (s, d) => Masking.apply(
        table(s, d, "customer").select(col("c_custkey"), col("c_acctbal")),
        Transformation("c_acctbal", "MASK-NUMBER")),
      Some("SELECT c_custkey, CAST(0 AS BIGINT) AS c_acctbal FROM customer")),

    "transform_mask_hidden" -> QueryDef(
      (s, d) => Masking.apply(
        table(s, d, "customer").select(col("c_custkey"), col("c_name")),
        Transformation("c_name", "MASK-HIDDEN")),
      Some("SELECT c_custkey, 'hidden' AS c_name FROM customer")),

    "transform_mask_string_skip_ends_3" -> QueryDef(
      (s, d) => Masking.apply(
        table(s, d, "customer").select(col("c_custkey"), col("c_name")),
        Transformation("c_name", "MASK-STRING-SKIP-ENDS-3")),
      Some("""SELECT c_custkey,
             |  CASE WHEN length(c_name) > 6
             |    THEN substr(c_name, 1, 3) ||
             |         repeat('*', length(c_name) - 6) ||
             |         substr(c_name, length(c_name) - 2)
             |    ELSE repeat('*', length(c_name)) END AS c_name
             |FROM customer""".stripMargin)),

    "transform_conditional" -> QueryDef(
      (s, d) => Masking.apply(
        table(s, d, "customer").select(col("c_custkey"), col("c_name"),
          col("c_mktsegment")),
        Transformation("c_name", "HASH", Seq(
          TransformCondition("c_mktsegment", equals = Some("BUILDING")),
          TransformCondition("c_name", regexMatch = Some("^Customer#0*1.*"))))),
      Some("""SELECT c_custkey,
             |  CASE WHEN c_mktsegment = 'BUILDING'
             |         AND regexp_matches(c_name, '^Customer#0*1.*')
             |    THEN sha256(c_name) ELSE c_name END AS c_name,
             |  c_mktsegment
             |FROM customer""".stripMargin)),

    "record_flattening" -> QueryDef(
      (s, d) => Flattening.apply(
        table(s, d, "customer").select(col("c_custkey"),
          struct(col("c_name").as("name"),
            struct(col("c_mktsegment").as("segment"),
              col("c_acctbal").as("balance")).as("account"))
            .as("profile")),
        maxLevel = 10),
      Some("""SELECT c_custkey, c_name AS profile__name,
             |  c_mktsegment AS profile__account__segment,
             |  c_acctbal AS profile__account__balance
             |FROM customer""".stripMargin)),

    "flatten_max_level_json" -> QueryDef(
      (s, d) => Flattening.apply(
        table(s, d, "customer").select(col("c_custkey"),
          struct(col("c_name").as("name"),
            struct(col("c_mktsegment").as("segment")).as("deep"))
            .as("profile")),
        maxLevel = 1)
        .select(col("c_custkey"), col("profile__name"),
          col("profile__deep")),
      Some("""SELECT c_custkey, c_name AS profile__name,
             |  '{"segment":"' || c_mktsegment || '"}' AS profile__deep
             |FROM customer""".stripMargin)),

    "transform_nested_field_path" -> QueryDef(
      (s, d) => {
        val df = table(s, d, "customer").select(col("c_custkey"),
          struct(col("c_name").as("name"),
            struct(col("c_mktsegment").as("segment"),
              col("c_acctbal").as("balance")).as("account"))
            .as("profile"))
        val masked = Masking.applyNested(df,
          graft.spec.Transformation("profile", "HASH",
            fieldPaths = Seq("account/segment")))
        masked.select(col("c_custkey"),
          col("profile.name").as("name"),
          col("profile.account.segment").as("segment_masked"),
          col("profile.account.balance").as("balance"))
      },
      Some("""SELECT c_custkey, c_name AS name,
             |  sha256(c_mktsegment) AS segment_masked,
             |  c_acctbal AS balance
             |FROM customer""".stripMargin)),

    "validation_dead_letter" -> QueryDef(
      (s, d) => {
        import graft.transform.Validation
        import graft.transform.Validation._
        val v = Validation.validate(
          events(s, d).select(col("event_id"), col("event_type"),
            col("value")),
          Seq(NotNull("event_type"), InRange("value", 0.0, 250.0),
            Matches("event_type", "^(click|view|signup|purchase|error)$")))
        v.rejects.select(col("event_id"),
          concat_ws(",", col("_violations")).as("violations"))
      },
      Some("""SELECT event_id, 'in_range(value,0.0,250.0)' AS violations
             |FROM events
             |WHERE NOT (value BETWEEN 0.0 AND 250.0)""".stripMargin)),

    "timestamp_clamp" -> QueryDef(
      (s, d) => {
        val raw = table(s, d, "orders").select(col("o_orderkey"),
          when(col("o_orderkey") % 7 === 0, lit("20107-05-28 00:00:00"))
            .when(col("o_orderkey") % 11 === 0, lit("not a timestamp"))
            .otherwise(date_format(col("o_orderdate"),
              "yyyy-MM-dd HH:mm:ss")).as("raw_ts"))
        raw.select(col("o_orderkey"),
          date_format(Metadata.clampTimestampString(col("raw_ts")),
            "yyyy-MM-dd HH:mm:ss.SSSSSS").as("clamped"))
      },
      // both the unparseable and the beyond-range year clamp to the
      // 9999-12-31 sentinel (stream_utils.py:16-90)
      Some("""WITH raw AS (SELECT o_orderkey,
             |  CASE WHEN o_orderkey % 7 = 0 THEN '20107-05-28 00:00:00'
             |       WHEN o_orderkey % 11 = 0 THEN 'not a timestamp'
             |       ELSE strftime(o_orderdate, '%Y-%m-%d %H:%M:%S')
             |  END AS raw_ts FROM orders)
             |SELECT o_orderkey,
             |  strftime(CASE
             |    WHEN try_cast(raw_ts AS TIMESTAMP) IS NULL
             |      THEN TIMESTAMP '9999-12-31 23:59:59.999999'
             |    WHEN epoch_us(try_cast(raw_ts AS TIMESTAMP))
             |         > epoch_us(TIMESTAMP '9999-12-31 23:59:59.999999')
             |      THEN TIMESTAMP '9999-12-31 23:59:59.999999'
             |    ELSE try_cast(raw_ts AS TIMESTAMP) END,
             |    '%Y-%m-%d %H:%M:%S.%f') AS clamped
             |FROM raw""".stripMargin)),

    "type_mapping_casts" -> QueryDef(
      (s, d) => table(s, d, "customer").select(
        col("c_custkey"),
        col("c_nationkey").cast("bigint").as("nat_bigint"),
        col("c_nationkey").cast("smallint").as("nat_smallint"),
        dec(col("c_acctbal")).cast("string").as("bal_decimal_str"),
        col("c_acctbal").cast("string").as("bal_double_str"),
        (col("c_acctbal") > 0).as("bal_positive"),
        // hex-encoded so the differential harness compares a string, not
        // raw bytes (binary columns are unsortable in the pandas compare)
        hex(col("c_name").cast("binary")).as("name_bytes")),
      Some("""SELECT c_custkey,
             |  CAST(c_nationkey AS BIGINT) AS nat_bigint,
             |  CAST(c_nationkey AS SMALLINT) AS nat_smallint,
             |  CAST(CAST(c_acctbal AS DECIMAL(18,2)) AS VARCHAR)
             |    AS bal_decimal_str,
             |  CAST(c_acctbal AS VARCHAR) AS bal_double_str,
             |  c_acctbal > 0 AS bal_positive,
             |  upper(hex(encode(c_name))) AS name_bytes
             |FROM customer""".stripMargin))
  )
}
