package graft.sources

import java.sql.SQLException

import org.apache.spark.sql.jdbc.{JdbcDialect, JdbcDialects}

/** Per-warehouse JDBC adapters — the Spark analogue of the reference's
  * per-target SQL generation (target_postgres/db_sync.py,
  * target_snowflake/db_sync.py: each warehouse gets its own DDL/DML
  * flavor). Spark ships dialects for PG/MySQL/Oracle/...; this adds the
  * embedded engine used by the test harness.
  */
object GraftDialects {
  /** Idempotent one-time registration; referenced by the JDBC source and
    * sink entry points.
    */
  lazy val registered: Unit = JdbcDialects.registerDialect(DuckDbDialect)
}

/** DuckDB reports catalog errors without SQLState codes, so the default
  * dialect's SQLState-based `isObjectNotFoundException` rethrows the
  * probe failure instead of treating "table missing" as create-me
  * (JdbcUtils.tableExists).
  */
object DuckDbDialect extends JdbcDialect {
  override def canHandle(url: String): Boolean =
    url.startsWith("jdbc:duckdb:")

  override def isObjectNotFoundException(e: SQLException): Boolean =
    e.getMessage != null && e.getMessage.contains("does not exist")
}
