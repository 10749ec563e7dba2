package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver's parquet corpus (TESTDATA.md).
  *
  * Scale posture: each table is a parquet directory/file scan; Spark
  * parallelizes by row-group/file split (`spark.sql.files.maxPartitionBytes`).
  * At 100 TB the same call works unchanged — parquet scans with pushed
  * filters and pruned columns (verified via `.explain` in specs).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    // events.ts is TIMESTAMP(NANOS) parquet, which Spark only reads as a
    // nanos bigint (spark.sql.legacy.parquet.nanosAsLong, set in Session).
    // Normalize to TimestampType via integer division (a double division
    // would lose precision at 1.7e18 ns).
    if (name == "events" && df.schema("ts").dataType.typeName == "long")
      df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else df
  }
}
