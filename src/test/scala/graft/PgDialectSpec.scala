package graft

import org.apache.spark.sql.jdbc.JdbcDialects
import org.apache.spark.sql.types._

/** Postgres-dialect smoke (closes r07 "Missing #2" beyond a comment): the
  * reference reads/writes Postgres (dags/etl_crash_traffic.py:266-290,
  * 693-787 — dim_ubicacion stores lat/long as DECIMAL(10,6), text dims as
  * VARCHAR, hechos_accidentes as INTEGER keys/measures). q_jdbc_roundtrip
  * exercises Spark's real `write.jdbc`/`read.jdbc` code path against
  * embedded Derby; the ONLY deployment delta is the URL, and the type
  * mapping that URL activates is pinned HERE against Spark's own
  * PostgresDialect — no wire needed, the dialect resolves from the URL
  * string and its mapping is pure.
  *
  * Idempotent append (the reference's ON CONFLICT DO NOTHING,
  * etl_crash_traffic.py:700-720) has no Spark-JDBC equivalent; the engine
  * expresses it as the J3 left-anti insert (q_s4_idempotent_write), which
  * is dialect-independent — nothing further to swap.
  */
class PgDialectSpec extends SparkSpec {

  private val pg = JdbcDialects.get("jdbc:postgresql://host:5432/graft")

  test("postgres URL resolves to PostgresDialect") {
    assert(pg.getClass.getName == "org.apache.spark.sql.jdbc.PostgresDialect")
  }

  test("star-schema write types: the DDL Spark generates matches the reference's") {
    // dim_ubicacion lat/long: DECIMAL(10,6) in the reference DDL →
    // Postgres NUMERIC(10,6) — scale survives, coordinates stay exact
    assert(pg.getJDBCType(DecimalType(10, 6)).map(_.databaseTypeDefinition)
      .contains("NUMERIC(10,6)"))
    // text dims (bbox labels, weather/light categories): VARCHAR columns
    // write as TEXT (unbounded — a label overflow can't truncate silently)
    assert(pg.getJDBCType(StringType).map(_.databaseTypeDefinition)
      .contains("TEXT"))
    // event timestamps: session pins UTC, so TimestampType is an instant →
    // TIMESTAMPTZ, the PG type with the same semantics
    assert(pg.getJDBCType(TimestampType).map(_.databaseTypeDefinition)
      .contains("TIMESTAMP WITH TIME ZONE"))
    // measure doubles → FLOAT8 (PG's DOUBLE PRECISION)
    assert(pg.getJDBCType(DoubleType).map(_.databaseTypeDefinition)
      .contains("FLOAT8"))
    assert(pg.getJDBCType(BinaryType).map(_.databaseTypeDefinition)
      .contains("BYTEA"))
    // surrogate keys / counts: dialect defers to Spark's common defaults
    // (INTEGER / BIGINT / DATE) — pin the deferral so a Spark upgrade
    // that changes it is caught here
    assert(pg.getJDBCType(IntegerType).isEmpty)
    assert(pg.getJDBCType(LongType).isEmpty)
    assert(pg.getJDBCType(DateType).isEmpty)
  }

  test("read-back types round-trip the StructTypes the engine builds on") {
    import java.sql.Types
    def rev(sqlType: Int, typeName: String, size: Int = 0) =
      pg.getCatalystType(sqlType, typeName, size, new MetadataBuilder)
    assert(rev(Types.VARCHAR, "text").contains(StringType))
    assert(rev(Types.TIMESTAMP, "timestamptz").contains(TimestampType))
    // NUMERIC defers to the common path, which reconstructs
    // DecimalType(precision, scale) from column metadata — deferral pinned
    assert(rev(Types.NUMERIC, "numeric", 10).isEmpty)
  }
}
