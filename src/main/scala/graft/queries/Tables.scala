package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.expr
import org.apache.spark.sql.types.{DataType, LongType, TimestampNTZType, TimestampType}

/** Readers over the driver-provided parquet tables (TESTDATA.md). */
object Tables {
  /** One driver-side footer read supplies the schema explicitly:
    * `spark.read.parquet(path)` without a schema launches a (tiny)
    * schema-inference Spark job PER CALL — measured as one
    * `parquet at Tables.scala` job inside every gate, a fixed cost the
    * whole 378-query registry paid. Same declared types bit-for-bit
    * (FooterSchemaSpec pins every driver table, including the
    * nanos-timestamp events encoding). */
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val f = s"$sfDir/$name.parquet"
    spark.read.schema(org.apache.spark.sql.graftbridge.Bridge
      .parquetFooterSchema(spark, f)).parquet(f)
  }

  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame = table(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = table(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame = table(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame = table(s, d, "region")
  /** Normalize an event-time column to [[TimestampType]] regardless of
    * how the driver's parquet happens to encode it — the physical type has
    * drifted across rounds (TIMESTAMP(NANOS) surfacing as a nanos long
    * under `spark.sql.legacy.parquet.nanosAsLong=true`, then
    * TIMESTAMP_NTZ(µs)), and a hardcoded assumption cost round 7 its
    * events-derived query family. Branching on the OBSERVED type makes
    * every variant read identically:
    *  - `LongType`: nanos since epoch → integer `div 1000` (not double
    *    division — 1.7e18 ns exceeds double's 2^53 exact range) →
    *    `timestamp_micros`.
    *  - `TimestampNTZType`: the naive µs value is reinterpreted in the
    *    session zone; every session in this repo pins
    *    `spark.sql.session.timeZone=UTC`, so the cast is value-preserving
    *    and matches DuckDB's naive TIMESTAMP read of the same file.
    *  - `TimestampType`: already what downstream expects. */
  def normalizeTsExpr(dt: DataType, colName: String): Column = dt match {
    case LongType         => expr(s"timestamp_micros($colName div 1000)")
    case TimestampNTZType => expr(s"cast($colName as timestamp)")
    case TimestampType    => expr(colName)
    case other => throw new IllegalStateException(
      s"testdata schema changed: events.$colName has unsupported type $other " +
        "(expected LongType nanos, TIMESTAMP_NTZ, or TIMESTAMP)")
  }

  def events(s: SparkSession, d: String): DataFrame = {
    val raw = table(s, d, "events")
    raw.withColumn("ts", normalizeTsExpr(raw.schema("ts").dataType, "ts"))
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}

/** One verifiable query: a DataFrame builder plus (when SQL-expressible)
  * an equivalent DuckDB oracle over the same parquet tables. */
final case class QueryDef(
    name: String,
    build: (SparkSession, String) => DataFrame,
    oracle: Option[String])
