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

  test("all driver tables satisfy the schema contract (the round-7 drift class)") {
    // the contract itself lives in main (sources/TestdataContract) so
    // Verify and Bench report drift in their own stderr; the spec is the
    // loud red version of the same check
    val drift = graft.sources.TestdataContract.check(spark, sfDir)
    assert(drift.isEmpty, drift.mkString("\n") +
      "\n— update Tables/normalizeTsExpr and the affected oracles together")
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

  test("contract check names the drifted column precisely") {
    // simulate the round-7 drift in-memory: a contract run against a dir
    // where events.ts has an unsupported type must report exactly that
    // column (this validates the MESSAGE, the thing a 3am red round
    // depends on)
    val dir = java.nio.file.Files.createTempDirectory("graft-contract-drift")
    for (t <- graft.sources.TestdataContract.expected.keys)
      java.nio.file.Files.createSymbolicLink(
        dir.resolve(s"$t.parquet"),
        java.nio.file.Paths.get(s"$sfDir/$t.parquet"))
    // replace events with a drifted schema (ts as string)
    java.nio.file.Files.delete(dir.resolve("events.parquet"))
    spark.read.parquet(s"$sfDir/events.parquet")
      .withColumn("ts", org.apache.spark.sql.functions.col("ts").cast("string"))
      .write.parquet(dir.resolve("events.parquet").toString)
    val drift = graft.sources.TestdataContract.check(spark, dir.toString)
    assert(drift.size == 1 && drift.head.contains("events.ts") &&
      drift.head.contains("StringType"), drift.mkString("; "))
  }
}
