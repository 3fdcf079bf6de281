package graft.catalog

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._

/** Contract over the driver-owned test fixtures (`/root/testdata/sf*`).
  *
  * The driver regenerates these parquet files between rounds and has
  * changed column encodings mid-round once (events.ts drifted from
  * parquet TIMESTAMP(NANOS) to timestamp[us] between rounds 10 and 11,
  * silently breaking 15 queries for two rounds). This contract makes any
  * future drift a 2-second spec failure with a message naming the file
  * and column, instead of a lost round.
  *
  * Each column lists EVERY Spark logical type the engine actually
  * handles for it (e.g. events.ts is accepted as BIGINT — nanos read
  * under `nanosAsLong=true` — or TIMESTAMP/TIMESTAMP_NTZ, because
  * [[graft.queries.Q.events]] branches on the read dtype). A type
  * outside the set means engine code would fail or corrupt, so the
  * check fails.
  */
object FixtureContract {

  private val ints: Set[DataType] = Set(IntegerType, LongType)
  private val str: Set[DataType] = Set(StringType)
  private val dbl: Set[DataType] = Set(DoubleType)
  /** Temporal columns used directly as timestamps by queries. */
  private val ts: Set[DataType] =
    Set(TimestampType, TimestampNTZType, DateType)
  /** events.ts: either fixture encoding Q.events knows how to read. */
  private val tsOrNanosLong: Set[DataType] = ts + LongType
  private val vec: Set[DataType] =
    Set(ArrayType(FloatType, true), ArrayType(FloatType, false),
      ArrayType(DoubleType, true), ArrayType(DoubleType, false))

  /** table -> (column -> acceptable Spark read types). */
  val contract: Map[String, Map[String, Set[DataType]]] = Map(
    "region" -> Map("r_regionkey" -> ints, "r_name" -> str),
    "nation" -> Map(
      "n_nationkey" -> ints, "n_name" -> str, "n_regionkey" -> ints),
    "customer" -> Map(
      "c_custkey" -> ints, "c_name" -> str, "c_nationkey" -> ints,
      "c_acctbal" -> dbl, "c_mktsegment" -> str),
    "supplier" -> Map(
      "s_suppkey" -> ints, "s_name" -> str, "s_nationkey" -> ints,
      "s_acctbal" -> dbl),
    "part" -> Map(
      "p_partkey" -> ints, "p_name" -> str, "p_brand" -> str,
      "p_type" -> str, "p_size" -> ints, "p_retailprice" -> dbl),
    "orders" -> Map(
      "o_orderkey" -> ints, "o_custkey" -> ints, "o_orderstatus" -> str,
      "o_totalprice" -> dbl, "o_orderdate" -> ts, "o_orderpriority" -> str),
    "lineitem" -> Map(
      "l_orderkey" -> ints, "l_partkey" -> ints, "l_suppkey" -> ints,
      "l_linenumber" -> ints, "l_quantity" -> dbl,
      "l_extendedprice" -> dbl, "l_discount" -> dbl, "l_tax" -> dbl,
      "l_returnflag" -> str, "l_linestatus" -> str, "l_shipdate" -> ts),
    "events" -> Map(
      "event_id" -> ints, "ts" -> tsOrNanosLong, "user_id" -> ints,
      "event_type" -> str, "value" -> dbl, "props" -> str),
    "documents" -> Map(
      "doc_id" -> ints, "text" -> str, "lang" -> str, "source" -> str,
      "n_chars" -> ints),
    "embeddings" -> Map(
      "vec_id" -> ints, "embedding" -> vec, "label" -> ints))

  /** Checks every contracted table under `sfDir`. Returns one violation
    * message per problem, each naming the drifted file — empty means the
    * fixtures match what the engine can read. Also proves each file is
    * actually scannable (reads one row), not just schema-well-formed. */
  def check(spark: SparkSession, sfDir: String): Seq[String] =
    contract.toSeq.sortBy(_._1).flatMap { case (tableName, cols) =>
      val path = s"$sfDir/$tableName.parquet"
      val loaded =
        try Right(spark.read.parquet(path))
        catch { case e: Throwable =>
          Left(s"$path: unreadable (${e.getClass.getSimpleName}: ${e.getMessage})")
        }
      loaded match {
        case Left(err) => Seq(err)
        case Right(df) =>
          val byName = df.schema.fields.map(f => f.name -> f.dataType).toMap
          val colViolations = cols.toSeq.sortBy(_._1).flatMap {
            case (colName, accepted) =>
              byName.get(colName) match {
                case None =>
                  Some(s"$path: column `$colName` missing " +
                    s"(present: ${df.schema.fieldNames.mkString(", ")})")
                case Some(dt) if !accepted.contains(dt) =>
                  Some(s"$path: column `$colName` drifted to " +
                    s"${dt.sql} — engine accepts only " +
                    s"{${accepted.toSeq.map(_.sql).sorted.mkString(", ")}}")
                case _ => None
              }
          }
          val scanViolation =
            if (colViolations.nonEmpty) None
            else
              try { df.limit(1).collect(); None }
              catch { case e: Throwable =>
                Some(s"$path: schema OK but scan failed " +
                  s"(${e.getClass.getSimpleName}: ${e.getMessage})")
              }
          colViolations ++ scanViolation
      }
    }
}
