package graft

import org.apache.spark.sql.types._

/** Guard against silent driver-testdata drift.
  *
  * Round 7 lost 17 queries (analysis crash) and got 2 silently-WRONG
  * streaming answers because `events.ts` moved from TIMESTAMP(NANOS) to
  * TIMESTAMP_NTZ(µs) between rounds with no announcement. This spec makes
  * the next such drift fail LOUDLY and point at the exact column:
  * "testdata schema changed: events.ts TimestampNTZType → <new>".
  *
  * The contract is deliberately type-CLASS based where the repo is
  * schema-adaptive: `events.ts` may arrive as a nanos long, TIMESTAMP_NTZ,
  * or TIMESTAMP ([[graft.queries.Tables.normalizeTsExpr]] handles all
  * three), so any of those passes; a fourth encoding fails here before it
  * can fail 17 driver gates. Columns the engine reads structurally
  * (name-driven wide tables) are pinned by name + type exactly.
  */
class TestdataContractSpec extends SparkSpec {
  private val sfDir = "/root/testdata/sf0.001"

  private def fieldsOf(table: String): Map[String, DataType] =
    spark.read.parquet(s"$sfDir/$table.parquet")
      .schema.fields.map(f => f.name -> f.dataType).toMap

  private def assertCols(table: String,
      expected: Map[String, Set[DataType]]): Unit = {
    val actual = fieldsOf(table)
    val missing = expected.keySet -- actual.keySet
    assert(missing.isEmpty,
      s"testdata schema changed: $table lost column(s) ${missing.mkString(", ")}")
    for ((name, allowed) <- expected) {
      val got = actual(name)
      assert(allowed.contains(got),
        s"testdata schema changed: $table.$name " +
          s"${allowed.mkString("|")} → $got — update Tables/normalizeTsExpr " +
          "and the affected oracles together")
    }
  }

  private def exact(pairs: (String, DataType)*): Map[String, Set[DataType]] =
    pairs.map { case (n, t) => n -> Set(t) }.toMap

  /** Any timestamp encoding the schema-adaptive reader normalizes. */
  private val anyEventTime: Set[DataType] =
    Set(LongType, TimestampType, TimestampNTZType)

  test("events schema contract (the round-7 drift class)") {
    assertCols("events", exact(
      "event_id" -> LongType, "user_id" -> LongType,
      "event_type" -> StringType, "value" -> DoubleType,
      "props" -> StringType) + ("ts" -> anyEventTime))
  }

  test("events ts normalizes to TimestampType under the current encoding") {
    val e = queries.Tables.events(spark, sfDir)
    assert(e.schema("ts").dataType == TimestampType,
      s"normalizeTsExpr produced ${e.schema("ts").dataType}, expected TimestampType")
    // A nanos-vs-micros misread shifts instants by 1000× — pin the range.
    val years = e.selectExpr("min(year(ts)) AS lo", "max(year(ts)) AS hi").head()
    val (lo, hi) = (years.getInt(0), years.getInt(1))
    assert(lo >= 1990 && hi <= 2100,
      s"events.ts decodes outside a plausible range ([$lo, $hi]) — " +
        "timestamp unit misread (the silent-wrong class round 7 hit)")
  }

  test("streaming source schema tracks the batch footer exactly") {
    val streamSchema = streaming.EventStreams.rawSchema(spark, sfDir)
    val batchSchema = spark.read.parquet(s"$sfDir/events.parquet").schema
    assert(streamSchema == batchSchema,
      "stream rawSchema diverged from the batch parquet footer — " +
        "forced stream schemas are how µs-as-ns silent corruption happens")
  }

  test("documents and embeddings schema contract") {
    assertCols("documents", exact(
      "doc_id" -> LongType, "text" -> StringType, "lang" -> StringType,
      "source" -> StringType, "n_chars" -> LongType))
    assertCols("embeddings", exact(
      "vec_id" -> LongType, "embedding" -> ArrayType(FloatType),
      "label" -> IntegerType))
  }

  test("TPC-H-ish tables schema contract") {
    val dateLike: Set[DataType] = Set(DateType, TimestampType, TimestampNTZType)
    assertCols("region", exact(
      "r_regionkey" -> IntegerType, "r_name" -> StringType))
    assertCols("nation", exact(
      "n_nationkey" -> IntegerType, "n_name" -> StringType,
      "n_regionkey" -> IntegerType))
    assertCols("customer", exact(
      "c_custkey" -> LongType, "c_name" -> StringType,
      "c_nationkey" -> IntegerType, "c_acctbal" -> DoubleType,
      "c_mktsegment" -> StringType))
    assertCols("supplier", exact(
      "s_suppkey" -> LongType, "s_name" -> StringType,
      "s_nationkey" -> IntegerType, "s_acctbal" -> DoubleType))
    assertCols("part", exact(
      "p_partkey" -> LongType, "p_name" -> StringType,
      "p_brand" -> StringType, "p_type" -> StringType,
      "p_size" -> IntegerType, "p_retailprice" -> DoubleType))
    assertCols("orders", exact(
      "o_orderkey" -> LongType, "o_custkey" -> LongType,
      "o_orderstatus" -> StringType, "o_totalprice" -> DoubleType,
      "o_orderpriority" -> StringType) + ("o_orderdate" -> dateLike))
    assertCols("lineitem", exact(
      "l_orderkey" -> LongType, "l_partkey" -> LongType,
      "l_suppkey" -> LongType, "l_linenumber" -> IntegerType,
      "l_quantity" -> DoubleType, "l_extendedprice" -> DoubleType,
      "l_discount" -> DoubleType, "l_tax" -> DoubleType,
      "l_returnflag" -> StringType, "l_linestatus" -> StringType)
      + ("l_shipdate" -> dateLike))
  }
}
