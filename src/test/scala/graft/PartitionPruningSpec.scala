package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** 100 TB posture: with year-partitioned fact storage, (a) static
  * partition pruning keeps a year filter from scanning other years, and
  * (b) dynamic partition pruning (DPP) injects a runtime filter into the
  * fact scan when the predicate sits on a joined dim (VERDICT r1 q11
  * polish item). The corpus ships unpartitioned single files, so this
  * spec materializes a partitioned copy once. */
class PartitionPruningSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft_part").toString
    spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .withColumn("order_year", year(col("o_orderdate")))
      .write.partitionBy("order_year").mode("overwrite")
      .parquet(s"$d/orders_by_year")
    d
  }

  test("static pruning: a year predicate scans only matching partitions") {
    val df = spark.read.parquet(s"$dir/orders_by_year")
      .filter(col("order_year") === 1995)
    val formatted = df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    // partition filter present, and no data filter needed on order_year
    assert(formatted.contains("PartitionFilters:") &&
      formatted.contains("order_year"))
    assert(df.count() ==
      spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
        .filter(year(col("o_orderdate")) === 1995).count())
  }

  test("dynamic partition pruning fires for a dim-side predicate") {
    import spark.implicits._
    // DPP requires a SELECTIVE predicate on the dim side (a bare relation
    // doesn't qualify) — write the dim as parquet and filter it.
    Seq((1995, "keep"), (1996, "keep"), (1997, "drop"), (1998, "drop"))
      .toDF("year_id", "flag")
      .write.mode("overwrite").parquet(s"$dir/year_dim")
    val dimYear = spark.read.parquet(s"$dir/year_dim")
      .filter(col("flag") === "keep")
    val fact = spark.read.parquet(s"$dir/orders_by_year")
    val joined = fact.join(dimYear,
      fact("order_year") === dimYear("year_id"))
    val formatted = joined.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    assert(formatted.contains("dynamicpruning"),
      s"expected a dynamicpruning subquery in:\n${formatted.take(1500)}")
    assert(joined.count() == fact
      .filter(col("order_year").isin(1995, 1996)).count())
  }
}
