package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Test-table access for the driver's TPC-H-ish parquet dirs (TESTDATA.md).
 *
 * `events.ts` is parquet TIMESTAMP(NANOS), which Spark's vectorized reader
 * rejects; sessions set `spark.sql.legacy.parquet.nanosAsLong=true` and
 * this accessor converts nanos → µs timestamps with integer `div`
 * (truncation — exactly DuckDB's NANOS→TIMESTAMP conversion, so oracle
 * values agree).
 */
object Tables {
  val all: Seq[String] = Seq("region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    if (name == "events" && df.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else df
  }
}
