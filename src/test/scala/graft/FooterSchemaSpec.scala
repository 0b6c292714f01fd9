package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge

/** Bridge.parquetFooterSchema replaces `spark.read.parquet(f).schema`
  * (which launches a Spark job per call) in the stream/lake readers —
  * the two must agree EXACTLY, including the legacy nanosAsLong mapping
  * the events table depends on (round-7 lesson: a schema drift here
  * silently compresses timestamps 1000x). */
class FooterSchemaSpec extends SparkSpec {

  test("footer schema == spark.read schema on every driver table (incl. nanos ts)") {
    val tables = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
    tables.foreach { t =>
      val f = s"/root/testdata/sf0.001/$t.parquet"
      assert(Bridge.parquetFooterSchema(spark, f) == spark.read.parquet(f).schema,
        s"schema drift on $t")
    }
  }

  test("footer schema == spark.read schema on an engine-written file") {
    val dir = java.nio.file.Files.createTempDirectory("graft-footer").toString
    spark.range(10).select(col("id"), (col("id") * 2.5).as("v"),
        col("id").cast("string").as("s"),
        (col("id") % 2 === 0).as("b"),
        current_timestamp().as("ts"))
      .coalesce(1).write.mode("overwrite").parquet(dir)
    val f = new java.io.File(dir).listFiles()
      .find(_.getName.endsWith(".parquet")).get.getAbsolutePath
    assert(Bridge.parquetFooterSchema(spark, f) == spark.read.parquet(f).schema)
  }
}
