package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.CatalogOps

/** S7 spec: catalog DDL, year-dim seed, and the constraint-check queries
  * standing in for the reference DDL's UNIQUE/FK constraints. */
class CatalogSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val db = "graft_test_star"

  test("S7: star schema DDL + year seed + constraint checks") {
    CatalogOps.createStarSchema(spark, db)
    CatalogOps.seedYearDim(spark, db)
    assert(spark.table(s"$db.year").as[Int].collect().sorted.toSeq ==
      Seq(2018, 2019, 2020, 2021, 2022))

    // load country + a fact with one FK violation and one dup key
    Seq(("DEU", "Germany"), ("FRA", "France"))
      .toDF("country_iso3_id", "country_name")
      .write.mode("append").insertInto(s"$db.country")
    Seq((BigDecimal("10.00"), "DEU", 2018),
      (BigDecimal("11.00"), "DEU", 2018),   // duplicate (DEU, 2018)
      (BigDecimal("12.00"), "XXX", 2019),   // FK violation: no country XXX
      (BigDecimal("13.00"), "FRA", 2030))   // FK violation: no year 2030
      .toDF("convicts_per_100000", "country_iso3_id", "year_id")
      .write.mode("append").insertInto(s"$db.crime")

    val dups = CatalogOps.uniqueKeyViolations(spark, db, "crime").collect()
    assert(dups.length == 1 &&
      dups.head.getString(0) == "DEU" && dups.head.getInt(1) == 2018)

    val fks = CatalogOps.fkViolations(spark, db, "crime")
      .select("country_iso3_id", "year_id")
      .as[(String, Int)].collect().sorted
    assert(fks.toSeq == Seq(("FRA", 2030), ("XXX", 2019)))

    // idempotent recreate (DROP IF EXISTS ... CREATE)
    CatalogOps.createStarSchema(spark, db)
    assert(spark.table(s"$db.crime").count() == 0)
  }
}
