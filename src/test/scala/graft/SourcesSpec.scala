package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Sources

/** Format-surface specs for the ingest layer beyond the reference's own
  * CSV/JSON: NDJSON (splittable line-JSON), ORC round-trip with the same
  * pushdown contract as parquet, and schema-evolution parquet merges. */
class SourcesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def tmpDir(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  test("ndjson: splittable line-JSON with explicit schema; corrupt " +
    "lines land in _corrupt_record instead of failing the scan") {
    val dir = tmpDir("ndjson")
    val f = new java.io.PrintWriter(s"$dir/part.jsonl")
    f.println("""{"id": 1, "name": "a"}""")
    f.println("""{"id": 2, "name": "b"}""")
    f.println("""{"id": broken!!!""")
    f.println("""{"id": 4, "name": "d"}""")
    f.close()
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType),
      StructField("_corrupt_record", StringType)))
    val df = Sources.ndjson(spark, s"$dir/part.jsonl", schema).cache()
    assert(df.count() == 4)
    assert(df.filter(col("_corrupt_record").isNotNull).count() == 1)
    assert(df.filter(col("_corrupt_record").isNull)
      .agg(sum(col("id"))).head.getLong(0) == 7L)
    df.unpersist()
  }

  test("ndjsonAudited: single-pass text + from_json audit scan — " +
    "corrupt lines captured, good rows parsed, NO cache workaround") {
    val dir = tmpDir("ndjson_audit")
    val f = new java.io.PrintWriter(s"$dir/part.jsonl")
    f.println("""{"id": 1, "name": "a"}""")
    f.println("""{"id": 2, "name": "b"}""")
    f.println("""{"id": broken!!!""")
    f.println("""{"id": 4, "name": "d"}""")
    f.close()
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType)))
    val df = Sources.ndjsonAudited(spark, s"$dir/part.jsonl", schema)
    // the file-source restriction this form exists to avoid: a
    // corrupt-only aggregate runs UNCACHED straight off the text scan
    assert(df.filter(col("_corrupt_record").isNotNull).count() == 1)
    assert(df.filter(col("_corrupt_record").isNull)
      .agg(sum(col("id"))).head.getLong(0) == 7L)
    val corrupt = df.filter(col("_corrupt_record").isNotNull)
      .select(col("_corrupt_record")).head.getString(0)
    assert(corrupt.startsWith("""{"id": broken"""),
      s"corrupt capture must carry the raw line, got $corrupt")
  }

  test("ORC round-trip preserves rows and keeps the parquet pushdown " +
    "contract (PushedFilters reach the ORC scan)") {
    val dir = tmpDir("orc") + "/t"
    val src = (1 to 100).map(i => (i.toLong, s"n$i", i * 2.5)).toDF("id", "name", "v")
    Sources.writeOrc(src, dir)
    val back = Sources.orc(spark, dir)
    assert(back.count() == 100)
    assert(back.agg(sum(col("id"))).head.getLong(0) == 5050L)
    val filtered = back.filter(col("id") > 90).select(col("id"))
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(id), GreaterThan(id,90"),
      s"ORC scan must push the filter:\n$plan")
    assert(filtered.count() == 10)
  }

  test("parquetMerged: heterogeneous files union their schemas; columns " +
    "absent in older files read as null") {
    val dir = tmpDir("evolve") + "/t"
    Seq((1L, "x1")).toDF("id", "x").write.mode("append").parquet(dir)
    Seq((2L, 7.5)).toDF("id", "y").write.mode("append").parquet(dir)
    val df = Sources.parquetMerged(spark, dir)
    assert(df.columns.toSet == Set("id", "x", "y"))
    // Access by name: mergeSchema's field order follows file listing
    // order, which is not stable across filesystems.
    val rows = df.collect().map(r =>
      r.getAs[Long]("id") ->
        (Option(r.getAs[String]("x")), Option(r.getAs[Any]("y")))).toMap
    assert(rows(1L)._1.contains("x1") && rows(1L)._2.isEmpty)
    assert(rows(2L)._1.isEmpty && rows(2L)._2.contains(7.5))
    // Without mergeSchema the scan pins ONE file's schema — the evolved
    // column is invisible (the trap this reader exists to avoid).
    val plain = spark.read.parquet(dir)
    assert(plain.columns.toSet != df.columns.toSet)
  }
}
