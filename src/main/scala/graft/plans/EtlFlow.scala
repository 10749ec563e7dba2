package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.{CleanseOps => C, RelationalOps => R}

/** The reference's flagship ETL flow (crime_immigration_etl.py:153-311) as
  * three composable `DataFrame => DataFrame` stages over the operator
  * library — the end-to-end composition SURVEY.md §5 promised. Each stage
  * keeps the reference's operator ORDER (marker-replace before coercion,
  * coercion before dropna, population filter before the rate join — the
  * :277-281 subtleties live in this ordering).
  *
  * Scale posture: lookup sides broadcast; the only fact-fact shuffle is
  * the composite-key population join (J1); everything else is map-side
  * Column work that rides the scan.
  */
object EtlFlow {

  /** World Bank population row (FIXTURES.md A2). */
  val populationRowSchema: StructType = StructType(Seq(
    StructField("countryiso3code", StringType),
    StructField("country", StructType(Seq(
      StructField("id", StringType),
      StructField("value", StringType)))),
    StructField("value", DoubleType),
    StructField("date", StringType)))

  /** World Bank country-metadata row (aggregate-region detection, S1). */
  val countryMetaSchema: StructType = StructType(Seq(
    StructField("id", StringType),
    StructField("iso2Code", StringType),
    StructField("name", StringType),
    StructField("region", StructType(Seq(
      StructField("id", StringType),
      StructField("value", StringType))))))

  /** S1 aggregate-code extraction: pseudo-country ids whose region is the
    * "Aggregates" marker (ref :98-102). */
  def aggregateCodes(meta: DataFrame): DataFrame =
    meta.filter(col("region.value") === "Aggregates").select(col("id"))

  /** transform_country_and_population (ref :154-210): per-year frames with
    * injected year (C11 + §2.7 union) → aggregate anti-filter (F1/J2) →
    * rename (P2) → ISO3/nested-value validity (F2/F3/F4) → name
    * normalization via lookup-with-original-fallback (C1/J3) → coercion +
    * dropna + positive filter (C2/F7/F5) → half-even round to long (C4) →
    * year window (C6/F5) → country dim dedup (A1) + population projection
    * (P1). Returns (countryDim, populationFacts). */
  def countryAndPopulation(popByYear: Seq[(Int, DataFrame)],
                           aggCodes: DataFrame,
                           nameLookup: DataFrame): (DataFrame, DataFrame) = {
    val unioned = R.unionAll(popByYear.map { case (y, df) =>
      df.withColumn("year_id", lit(y)) })
    val valid = R.antiJoinExclude(unioned, "countryiso3code", aggCodes, "id")
      .withColumnRenamed("countryiso3code", "country_iso3_id")
      .filter(C.validCode(col("country_iso3_id"), 3))
      .filter(col("country.value").isNotNull)
    val named = R.lookupWithFallback(valid,
      C.normalizeName(col("country.value")), col("country.value"),
      nameLookup, "alias", "canonical_name", "country_name")
    val coerced = named
      .withColumn("population", C.coerceDouble(col("value")))
      .transform(C.dropNullRows(_, Seq("population")))
      .filter(C.positive(col("population")))
      .withColumn("population",
        C.roundHalfEven(col("population"), 0).cast("long"))
      .withColumn("year_id", C.coerceInt(col("year_id")))
      .filter(col("year_id").between(2018, 2022))
    val country = R.dedupFirst(
      coerced.select(col("country_iso3_id"), col("country_name")),
      Seq("country_iso3_id"), Seq(col("country_name")))
    val population = coerced
      .select(col("population"), col("country_iso3_id"), col("year_id"))
    (country, population)
  }

  /** transform_crime (ref :212-266): coercion (C2) → dropna (F7) →
    * non-negative + ISO3 validity (F5/F2) → 7-way conjunctive slice (F6)
    * → half-even 2dp (C5) → rename + project (P1/P2). */
  def crime(raw: DataFrame): DataFrame =
    raw.withColumn("value_num", C.coerceDouble(col("VALUE")))
      .transform(C.dropNullRows(_, Seq("value_num")))
      .filter(col("value_num") >= 0)
      .filter(C.validCode(col("Iso3_code"), 3))
      .withColumn("year_id", C.coerceInt(col("Year")))
      .filter(col("Category") === "Total" && col("Sex") === "Total" &&
        col("Age") === "Total" &&
        col("Indicator") === "Persons convicted" &&
        col("Unit of measurement") === "Rate per 100,000 population" &&
        col("year_id") >= 2018 && col("Region") === "Europe")
      .withColumn("convicts_per_100000", C.roundHalfEven(col("value_num"), 2))
      .select(col("convicts_per_100000"),
        col("Iso3_code").as("country_iso3_id"), col("year_id"))

  /** transform_immig (ref :268-303): project (P1) → ISO2 validity (F2) →
    * ISO2→ISO3 lookup (J4) → year cast (C6) → ":" marker replace then
    * coercion (C3→C2, the :279 ordering) → dropna (F7) → composite-key
    * inner join with population (J1, the cross-stage dependency) →
    * per-100k rate (C7) → half-even 2dp (C5) → project. */
  def immigration(raw: DataFrame, iso2to3: DataFrame,
                  population: DataFrame): DataFrame =
    R.lookupWithFallback(
        raw.select(col("geo"), col("TIME_PERIOD"), col("OBS_VALUE"))
          .filter(C.validCode(col("geo"), 2)),
        col("geo"), iso2to3, "iso2", "iso3", "country_iso3_id")
      .withColumn("year_id", C.coerceInt(col("TIME_PERIOD")))
      .withColumn("immigration_total",
        C.coerceDouble(C.replaceMissingMarker(col("OBS_VALUE"), ":", "0")))
      .transform(C.dropNullRows(_, Seq("immigration_total", "year_id")))
      .join(population, Seq("country_iso3_id", "year_id"))
      .withColumn("immigration_per_100000",
        C.roundHalfEven(
          C.per100k(col("immigration_total"), col("population")), 2))
      .select(col("immigration_per_100000"), col("country_iso3_id"),
        col("year_id"))
}
