package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}
import org.scalatest.funsuite.AnyFunSuite

/** Pins the events.ts normalization seam in Tables.apply.
  *
  * The driver has regenerated the corpus with three different parquet
  * encodings for events.ts across rounds: TIMESTAMP(NANOS) (surfaced as a
  * nanos bigint under spark.sql.legacy.parquet.nanosAsLong), timestamp[us]
  * with isAdjustedToUTC=false (surfaced as TIMESTAMP_NTZ), and plain UTC
  * timestamp[us]. Each regeneration that switched encoding has broken the
  * whole event-time query family at analysis time; this spec writes a tiny
  * events.parquet in each encoding and asserts Tables normalizes all of
  * them to TimestampType with the same wall-clock micros.
  */
class TablesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val micros = 1700000000000000L // 2023-11-14T22:13:20Z

  private def loadAs(writer: String => Unit): (String, Long) = {
    val dir = Files.createTempDirectory("tables_spec_").toString
    writer(s"$dir/events.parquet")
    val df = Tables(spark, dir, "events")
    val dt = df.schema("ts").dataType.typeName
    val us = df.select(unix_micros(col("ts"))).head.getLong(0)
    (dt, us)
  }

  test("nanos-bigint ts normalizes to TimestampType, micros preserved") {
    val (dt, us) = loadAs { path =>
      Seq((1L, micros * 1000L)).toDF("event_id", "ts")
        .write.mode("overwrite").parquet(path)
    }
    assert(dt == TimestampType.typeName)
    assert(us == micros)
  }

  test("timestamp_ntz ts normalizes to TimestampType, wall-clock preserved") {
    val (dt, us) = loadAs { path =>
      Seq((1L, micros)).toDF("event_id", "us")
        .select(col("event_id"),
          timestamp_micros(col("us")).cast(TimestampNTZType).as("ts"))
        .write.mode("overwrite").parquet(path)
    }
    assert(dt == TimestampType.typeName)
    assert(us == micros) // session TZ is UTC, so NTZ->LTZ keeps the instant
  }

  test("plain timestamp ts passes through unchanged") {
    val (dt, us) = loadAs { path =>
      Seq((1L, micros)).toDF("event_id", "us")
        .select(col("event_id"), timestamp_micros(col("us")).as("ts"))
        .write.mode("overwrite").parquet(path)
    }
    assert(dt == TimestampType.typeName)
    assert(us == micros)
  }

  test("driver corpus loads with TimestampType ts and unix_micros analyzes") {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val df = Tables(spark, dir, "events")
    assert(df.schema("ts").dataType == TimestampType)
    assert(df.select(unix_micros(col("ts"))).head.getLong(0) > 0L)
  }

  test("embeddings re-encoded as list<double> normalize to array<float> " +
    "losslessly and feed the native kernels") {
    import org.apache.spark.sql.types.{ArrayType, FloatType}
    val dir = Files.createTempDirectory("tables_spec_").toString
    // exact float32 values re-encoded as doubles (float->double is exact)
    val vals = Seq(1.5f, -0.25f, 3.75f)
    Seq((1L, vals.map(_.toDouble)))
      .toDF("vec_id", "embedding")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val df = Tables(spark, dir, "embeddings")
    assert(df.schema("embedding").dataType
      .asInstanceOf[ArrayType].elementType == FloatType)
    assert(df.select(col("embedding")).head.getSeq[Float](0) == vals)
    // the float32 kernel contract holds after normalization
    val d = df.select(call_function("dot_f32",
      col("embedding"), col("embedding"))).head.getDouble(0)
    assert(d == vals.map(v => v.toDouble * v.toDouble).sum)
  }

  test("driver corpus embeddings load as array<float>") {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val df = Tables(spark, dir, "embeddings")
    import org.apache.spark.sql.types.{ArrayType, FloatType}
    assert(df.schema("embedding").dataType
      .asInstanceOf[ArrayType].elementType == FloatType)
  }

  test("orders.o_orderdate and lineitem.l_shipdate go through the same " +
    "ts seam: a nanos-bigint regeneration must not break year()") {
    // o_orderdate as nanos bigint (the encoding that would break
    // year()/to_date() at analysis time the way r8's events.ts did).
    val dir = Files.createTempDirectory("tables_spec_").toString
    Seq((1L, micros * 1000L)).toDF("o_orderkey", "o_orderdate")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val o = Tables(spark, dir, "orders")
    assert(o.schema("o_orderdate").dataType == TimestampType)
    assert(o.select(year(col("o_orderdate"))).head.getInt(0) == 2023)
    // l_shipdate as NTZ micros
    Seq((1L, micros)).toDF("l_orderkey", "us")
      .select(col("l_orderkey"),
        timestamp_micros(col("us")).cast(TimestampNTZType).as("l_shipdate"))
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val l = Tables(spark, dir, "lineitem")
    assert(l.schema("l_shipdate").dataType == TimestampType)
    assert(l.select(year(col("l_shipdate"))).head.getInt(0) == 2023)
  }
}
