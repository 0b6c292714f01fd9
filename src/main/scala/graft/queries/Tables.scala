package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.expr

/** Readers over the driver-provided parquet tables (TESTDATA.md). */
object Tables {
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame = table(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = table(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame = table(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame = table(s, d, "region")
  /** The events table carries a TIMESTAMP(NANOS) column, which Spark's
    * parquet reader only surfaces as a nanos-since-epoch long
    * (`spark.sql.legacy.parquet.nanosAsLong=true`, set by every session
    * in this repo). Convert to a microsecond timestamp here — integer
    * `div`, not double division: 1.7e18 ns exceeds double's 2^53 exact
    * range. DuckDB reads the same column as TIMESTAMP_NS natively; values
    * are µs-aligned so both engines see identical instants. */
  def events(s: SparkSession, d: String): DataFrame =
    table(s, d, "events").withColumn("ts", expr("timestamp_micros(ts div 1000)"))
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}

/** One verifiable query: a DataFrame builder plus (when SQL-expressible)
  * an equivalent DuckDB oracle over the same parquet tables. */
final case class QueryDef(
    name: String,
    build: (SparkSession, String) => DataFrame,
    oracle: Option[String])
