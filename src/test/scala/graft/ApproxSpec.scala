package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Accuracy pins for the sketch-based operators SCALE.md names as the
  * 100 TB substitutes for exact formulations (HLL++ distinct counting,
  * GK-sketch percentiles). These cannot be DuckDB-oracle-twinned (sketch
  * internals are engine-specific), so the correctness check is relative
  * error against the exact computation on the same data. */
class ApproxSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val sf = "/root/testdata/sf0.01"

  test("approx_count_distinct stays within its rsd bound of exact") {
    val ev = Tables(spark, sf, "events")
    val r = ev.agg(
      countDistinct(col("user_id")).as("exact"),
      approx_count_distinct(col("user_id"), 0.02).as("approx")).head
    val (exact, approx) = (r.getLong(0), r.getLong(1))
    val err = math.abs(approx - exact).toDouble / exact
    assert(err <= 0.06, s"exact=$exact approx=$approx err=$err")
  }

  test("percentile_approx converges to the exact grouped median (q43)") {
    val ev = Tables(spark, sf, "events")
    val approx = ev.groupBy(col("event_type"))
      .agg(percentile_approx(col("value"), lit(0.5), lit(10000))
        .as("m_approx"))
    val exact = SparkEntry.queries("q43_median")(spark, sf)
      .select(col("event_type"), col("median_value"))
    val joined = approx.join(exact, "event_type")
      .select(col("event_type"), col("m_approx"), col("median_value"))
      .collect()
    assert(joined.length == 5)
    joined.foreach { r =>
      val (a, e) = (r.getDouble(1), r.getDouble(2))
      // GK sketch with accuracy 10000 on 2k values/group: near-exact; the
      // sketch returns an actual data value, the exact median may average
      // two middles — allow one value-step of slack.
      assert(math.abs(a - e) <= math.max(0.05 * math.abs(e), 0.05),
        s"${r.getString(0)}: approx=$a exact=$e")
    }
  }
}
