package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{VectorOps => Vec}

/** Pins the native codegen'd dot_f32 expression: registry visibility from
  * SQL, bit-equality with the interpreted higher-order reference form, and
  * null handling. */
class DotProductSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("dot_f32 is callable from SQL via GraftExtensions") {
    val r = spark.sql(
      "SELECT dot_f32(array(CAST(1.5 AS FLOAT), CAST(2 AS FLOAT)), " +
        "array(CAST(4 AS FLOAT), CAST(0.5 AS FLOAT)))").head.getDouble(0)
    assert(r == 7.0)
  }

  test("codegen dot is bit-identical to the higher-order reference form") {
    val vecs = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
    val a = vecs.select(col("vec_id").as("ida"), col("embedding").as("va"))
    val b = vecs.select(col("vec_id").as("idb"), col("embedding").as("vb"))
    val pairs = a.join(b, col("ida") < col("idb") - 479) // small pair set
    val diff = pairs.select(
        Vec.dot(col("va"), col("vb")).as("native"),
        Vec.dotHof(col("va"), col("vb")).as("hof"))
      .filter(col("native") =!= col("hof")).count()
    assert(diff == 0)
  }

  test("null array yields null, not a crash") {
    val df = Seq((Some(Seq(1f, 2f)), Option.empty[Seq[Float]]))
      .toDF("a", "b")
    val r = df.select(Vec.dot(col("a"), col("b"))).head
    assert(r.isNullAt(0))
  }

  // ADVICE r2: mismatch/null-element must be NULL in BOTH forms — the
  // native kernel may not silently truncate or zero-fill what the
  // documented higher-order twin nulls out.
  test("length mismatch is null in both the native and higher-order form") {
    val df = Seq((Seq(1f, 2f, 3f), Seq(4f, 5f))).toDF("a", "b")
    val r = df.select(Vec.dot(col("a"), col("b")).as("native"),
      Vec.dotHof(col("a"), col("b")).as("hof")).head
    assert(r.isNullAt(0) && r.isNullAt(1))
  }

  test("null element is null in both the native and higher-order form") {
    val df = Seq((Seq(Some(1f), None, Some(3f)), Seq(Some(4f), Some(5f),
      Some(6f)))).toDF("a", "b")
    val r = df.select(Vec.dot(col("a"), col("b")).as("native"),
      Vec.dotHof(col("a"), col("b")).as("hof")).head
    assert(r.isNullAt(0) && r.isNullAt(1))
  }

  test("dot_f64 is bit-identical to its higher-order form, including " +
    "mismatch/null-element nulls") {
    val df = Seq((Seq(1.5, -2.25, 3.0), Seq(4.0, 0.5, -1.125)))
      .toDF("a", "b")
    val r = df.select(Vec.dotD(col("a"), col("b")).as("native"),
      Vec.dotDHof(col("a"), col("b")).as("hof")).head
    assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
      java.lang.Double.doubleToLongBits(r.getDouble(1)))
    assert(r.getDouble(0) == 1.5 * 4.0 + -2.25 * 0.5 + 3.0 * -1.125)
    val mm = Seq((Seq(1.0, 2.0), Seq(1.0))).toDF("a", "b")
      .select(Vec.dotD(col("a"), col("b")).as("n"),
        Vec.dotDHof(col("a"), col("b")).as("h")).head
    assert(mm.isNullAt(0) && mm.isNullAt(1))
    val ne = Seq((Seq(Some(1.0), None), Seq(Some(2.0), Some(3.0))))
      .toDF("a", "b")
      .select(Vec.dotD(col("a"), col("b")).as("n"),
        Vec.dotDHof(col("a"), col("b")).as("h")).head
    assert(ne.isNullAt(0) && ne.isNullAt(1))
  }

  test("minhash_sig skips null elements instead of NPE (ADVICE r2)") {
    val withNull = spark.sql(
      "SELECT minhash_sig(array('ab', CAST(NULL AS STRING), 'cd')) AS s")
      .head.getSeq[Long](0)
    val without = spark.sql(
      "SELECT minhash_sig(array('ab', 'cd')) AS s").head.getSeq[Long](0)
    assert(withNull == without)
    val allNull = spark.sql(
      "SELECT minhash_sig(array(CAST(NULL AS STRING))) AS s").head
    assert(allNull.isNullAt(0))
  }
}
