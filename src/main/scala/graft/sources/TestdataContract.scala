package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._

/** The driver-testdata schema contract, checkable from BOTH the test
  * suite (TestdataContractSpec) and the driver-facing mains (Verify,
  * Bench) — round 7 lost 17 queries and 2 silently-wrong streaming gates
  * to an unannounced `events.ts` type change, and the artifacts carried
  * no evidence of WHY; a drift message in the harness stderr makes the
  * cause self-evident from the round's own output.
  *
  * Type-CLASS based where the repo is schema-adaptive: `events.ts` may
  * arrive as a nanos long, TIMESTAMP_NTZ or TIMESTAMP
  * ([[graft.queries.Tables.normalizeTsExpr]] handles all three); a
  * fourth encoding is reported here AND fails loudly in the reader.
  */
object TestdataContract {

  /** Any timestamp encoding the schema-adaptive events reader handles. */
  val anyEventTime: Set[DataType] = Set(LongType, TimestampType, TimestampNTZType)
  private val dateLike: Set[DataType] = Set(DateType, TimestampType, TimestampNTZType)

  private def exact(pairs: (String, DataType)*): Map[String, Set[DataType]] =
    pairs.map { case (n, t) => n -> Set(t) }.toMap

  /** table → column → allowed Spark types. */
  val expected: Map[String, Map[String, Set[DataType]]] = Map(
    "region" -> exact("r_regionkey" -> IntegerType, "r_name" -> StringType),
    "nation" -> exact("n_nationkey" -> IntegerType, "n_name" -> StringType,
      "n_regionkey" -> IntegerType),
    "customer" -> exact("c_custkey" -> LongType, "c_name" -> StringType,
      "c_nationkey" -> IntegerType, "c_acctbal" -> DoubleType,
      "c_mktsegment" -> StringType),
    "supplier" -> exact("s_suppkey" -> LongType, "s_name" -> StringType,
      "s_nationkey" -> IntegerType, "s_acctbal" -> DoubleType),
    "part" -> exact("p_partkey" -> LongType, "p_name" -> StringType,
      "p_brand" -> StringType, "p_type" -> StringType,
      "p_size" -> IntegerType, "p_retailprice" -> DoubleType),
    "orders" -> (exact("o_orderkey" -> LongType, "o_custkey" -> LongType,
      "o_orderstatus" -> StringType, "o_totalprice" -> DoubleType,
      "o_orderpriority" -> StringType) + ("o_orderdate" -> dateLike)),
    "lineitem" -> (exact("l_orderkey" -> LongType, "l_partkey" -> LongType,
      "l_suppkey" -> LongType, "l_linenumber" -> IntegerType,
      "l_quantity" -> DoubleType, "l_extendedprice" -> DoubleType,
      "l_discount" -> DoubleType, "l_tax" -> DoubleType,
      "l_returnflag" -> StringType, "l_linestatus" -> StringType)
      + ("l_shipdate" -> dateLike)),
    "events" -> (exact("event_id" -> LongType, "user_id" -> LongType,
      "event_type" -> StringType, "value" -> DoubleType,
      "props" -> StringType) + ("ts" -> anyEventTime)),
    "documents" -> exact("doc_id" -> LongType, "text" -> StringType,
      "lang" -> StringType, "source" -> StringType, "n_chars" -> LongType),
    "embeddings" -> exact("vec_id" -> LongType,
      "embedding" -> ArrayType(FloatType), "label" -> IntegerType))

  /** Drift messages for every table under `sfDir` (footer reads only, no
    * data scan); empty = the contract holds. A table that cannot be read
    * at all is itself reported. */
  def check(spark: SparkSession, sfDir: String): Seq[String] =
    expected.toSeq.sortBy(_._1).flatMap { case (table, cols) =>
      try {
        val actual = spark.read.parquet(s"$sfDir/$table.parquet")
          .schema.fields.map(f => f.name -> f.dataType).toMap
        val missing = (cols.keySet -- actual.keySet).toSeq.sorted
          .map(c => s"testdata schema changed: $table lost column $c")
        val drifted = cols.toSeq.sortBy(_._1).flatMap { case (name, allowed) =>
          actual.get(name).filterNot(allowed.contains).map(got =>
            s"testdata schema changed: $table.$name ${allowed.mkString("|")} → $got")
        }
        missing ++ drifted
      } catch {
        // NonFatal only: an OOM/interrupt must propagate, not be
        // converted into a "testdata unreadable" drift line on a
        // poisoned JVM that then keeps running
        case scala.util.control.NonFatal(e) =>
          Seq(s"testdata unreadable: $table ($sfDir): ${e.getMessage}")
      }
    }

  /** Harness-startup hook: print each drift to stderr (visible in the
    * driver's captured output) without aborting — the schema-adaptive
    * readers may still handle the drift, and a partial artifact with a
    * named cause beats no artifact. */
  def warn(spark: SparkSession, sfDir: String): Unit =
    check(spark, sfDir).foreach(m => System.err.println(s"[contract] $m"))
}
