package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.LayoutOps

/** Z-order layout: bit-interleave correctness against a reference,
  * wrap-masking, the min/max-stats pruning win the layout exists for,
  * and the linear normalizer's edge mapping. */
class LayoutSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** Reference Morton interleave, independently written. */
  private def morton(vals: Seq[Long], bits: Int): Long = {
    var out = 0L
    val d = vals.size
    for (i <- 0 until bits; j <- 0 until d)
      out |= ((vals(j) >> i) & 1L) << (i * d + j)
    out
  }

  test("zOrderKey matches the reference interleave in 2 and 3 dims; " +
    "out-of-range values wrap to their low bits") {
    val rnd = new scala.util.Random(7)
    val rows = (1 to 500).map(_ =>
      (rnd.nextInt(1 << 8).toLong, rnd.nextInt(1 << 8).toLong,
        rnd.nextInt(1 << 8).toLong))
    val df = rows.toDF("x", "y", "z")
    val got2 = df.select(LayoutOps.zOrderKey(Seq(col("x"), col("y")), 8))
      .as[Long].collect()
    rows.zip(got2).foreach { case ((x, y, _), k) =>
      assert(k == morton(Seq(x, y), 8), s"($x,$y)") }
    val got3 = df.select(
        LayoutOps.zOrderKey(Seq(col("x"), col("y"), col("z")), 8))
      .as[Long].collect()
    rows.zip(got3).foreach { case ((x, y, z), k) =>
      assert(k == morton(Seq(x, y, z), 8), s"($x,$y,$z)") }
    // wrap: 0x1FF with 8 bits keys like 0xFF
    val wrapped = Seq((0x1FFL, 0L)).toDF("x", "y")
      .select(LayoutOps.zOrderKey(Seq(col("x"), col("y")), 8))
      .as[Long].head()
    assert(wrapped == morton(Seq(0xFFL, 0L), 8))
    assertThrows[IllegalArgumentException](
      LayoutOps.zOrderKey(Seq(col("x"), col("y")), 32))
  }

  test("z-order blocks bound EVERY dimension's spread: a thin x-slice " +
    "touches 4/16 blocks where a y-major sort touches all 16") {
    // the exact 64x64 grid: 16 equal contiguous z-ranges are 16x16 tiles
    val grid = for (x <- 0L until 64L; y <- 0L until 64L) yield (x, y)
    val df = grid.toDF("x", "y")
      .withColumn("zkey", LayoutOps.zOrderKey(Seq(col("x"), col("y")), 6))
    def overlapping(blockOf: org.apache.spark.sql.Column): Long =
      df.groupBy(blockOf.as("blk"))
        .agg(min(col("x")).as("lo"), max(col("x")).as("hi"))
        .filter(col("lo") <= 15 && col("hi") >= 8) // slice x in [8, 15]
        .count()
    val zBlocks = overlapping(floor(col("zkey") / 256))
    // y-major linear order: same block granularity, sorted by (y, x)
    val yBlocks = overlapping(floor((col("y") * 64 + col("x")) / 256))
    assert(zBlocks == 4, s"z-order should localize x: $zBlocks")
    assert(yBlocks == 16, s"y-major spreads x everywhere: $yBlocks")
  }

  test("normalizeLinear: lo -> 0, hi clamps into the last cell, " +
    "mid maps proportionally, overshoot clamps") {
    val df = Seq(0.0, 50.0, 100.0, 120.0, -5.0).toDF("v")
    val out = df.select(col("v"),
        LayoutOps.normalizeLinear(col("v"), lit(0.0), lit(100.0), 4))
      .collect().map(r => r.getDouble(0) -> r.getLong(1)).toMap
    assert(out(0.0) == 0L)
    assert(out(50.0) == 8L)    // 0.5 * 16
    assert(out(100.0) == 15L)  // top edge joins the last cell
    assert(out(120.0) == 15L && out(-5.0) == 0L, "overshoot clamps")
  }

  test("zoneMapPruneCensus: a sorted layout prunes the slice-disjoint " +
    "files; a shuffled layout prunes none; null probes excluded") {
    // 1..400 sorted into 8 files of 50 → predicate [101,150] touches
    // exactly file 3; hash-scramble order spreads the range everywhere.
    val df = (1 to 400).map(i => (i.toLong, i.toDouble))
      .toDF("id", "v")
      .union(Seq((999L, Double.NaN)).toDF("id", "v")
        .select(col("id"), lit(null).cast("double").as("v")))
    val out = LayoutOps.zoneMapPruneCensus(df, Seq(
        "sorted" -> Seq(col("v"), col("id")),
        "scrambled" -> Seq(graft.operators.TextOps.hash32(
          col("id").cast("string")), col("id"))),
        col("v"), predLo = 101.0, predHi = 150.0, nFiles = 8)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(out("sorted") == ((8L, 7L)))
    assert(out("scrambled")._2 == 0L,
      "a scrambled layout should have no prunable file for a mid-range " +
        s"predicate, got ${out("scrambled")._2}")
  }
}
