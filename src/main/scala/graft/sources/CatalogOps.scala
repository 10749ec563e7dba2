package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.RelationalOps

/** S7: DDL/catalog lifecycle — the schema.sql equivalent
  * (database/initdb/schema.sql:12-117) on the Spark catalog: create the
  * star-schema tables, seed the `year` dimension, and run the
  * constraint-check queries that stand in for the DDL's UNIQUE/FK
  * constraints (Spark does not enforce constraints; the engine validates).
  *
  * Scale posture: `saveAsTable` parquet tables; dimension seeds are
  * `spark.range` (no driver-side collections); constraint checks are the
  * same single-shuffle groupBy/anti-join validations used elsewhere.
  */
object CatalogOps {

  /** Star-schema DDL (schema.sql:23-105): dims + facts as managed parquet
    * tables in `db`. Existing tables are replaced (the reference's DROP
    * TABLE IF EXISTS ... CREATE, :12-16). */
  def createStarSchema(spark: SparkSession, db: String): Unit = {
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $db")
    Seq("country", "year", "population", "crime", "immigration")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $db.$t"))
    spark.sql(
      s"""CREATE TABLE $db.country
         | (country_iso3_id STRING, country_name STRING) USING parquet"""
        .stripMargin)
    spark.sql(s"CREATE TABLE $db.year (year_id INT) USING parquet")
    spark.sql(
      s"""CREATE TABLE $db.population
         | (population BIGINT, country_iso3_id STRING, year_id INT)
         | USING parquet""".stripMargin)
    spark.sql(
      s"""CREATE TABLE $db.crime
         | (convicts_per_100000 DECIMAL(10,2), country_iso3_id STRING,
         |  year_id INT) USING parquet""".stripMargin)
    spark.sql(
      s"""CREATE TABLE $db.immigration
         | (immigration_per_100000 DECIMAL(10,2), country_iso3_id STRING,
         |  year_id INT) USING parquet""".stripMargin)
  }

  /** Seed the `year` dim 2018-2022 (schema.sql:111-117). */
  def seedYearDim(spark: SparkSession, db: String): Unit =
    spark.range(2018, 2023).select(col("id").cast("int").as("year_id"))
      .write.mode("overwrite").insertInto(s"$db.year")

  /** UNIQUE (country_iso3_id, year_id) check (schema.sql:57,:81,:104):
    * duplicate key groups in a fact table (empty ⇒ constraint holds). */
  def uniqueKeyViolations(spark: SparkSession, db: String,
                          fact: String): DataFrame =
    RelationalOps.manyToOneViolations(spark.table(s"$db.$fact"),
      Seq("country_iso3_id", "year_id"))

  /** FK check (schema.sql:43-54 etc.): fact rows whose (country, year)
    * has no parent in the dims (empty ⇒ FKs hold). */
  def fkViolations(spark: SparkSession, db: String, fact: String): DataFrame = {
    val f = spark.table(s"$db.$fact")
    val badCountry = f.join(spark.table(s"$db.country"),
      Seq("country_iso3_id"), "left_anti")
    val badYear = f.join(spark.table(s"$db.year"), Seq("year_id"),
      "left_anti")
    badCountry.unionByName(badYear)
  }

  /** Bucketed managed table: pays the shuffle ONCE at write time so every
    * later equi-join or aggregation on `keys` against a co-bucketed table
    * runs exchange-free (Spark reads bucket files as pre-partitioned
    * splits). This is the 100 TB co-location strategy for fact-fact joins
    * that repeat across queries — e.g. orders ⋈ lineitem on orderkey —
    * where re-shuffling terabytes per query is the dominant cost.
    * `sortCols` additionally sorts within buckets, letting SortMergeJoin
    * skip its sort phase. Both sides must use the SAME bucket count. */
  def writeBucketed(df: DataFrame, db: String, table: String,
                    keys: Seq[String], buckets: Int,
                    sortCols: Seq[String] = Nil): Unit = {
    require(keys.nonEmpty && buckets > 0, "need keys and a bucket count")
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS $db.$table")
    // An orphaned data directory (crashed prior write, or a reset
    // metastore over a persistent warehouse) makes CREATE TABLE AS fail
    // with LOCATION_ALREADY_EXISTS even after the DROP above — clear the
    // managed location too. Resolve it through the catalog (ADVICE r3:
    // hand-deriving <warehouse.dir>/<db>.db/<table> is wrong for a
    // database created with a custom LOCATION or a non-default catalog).
    val loc = new org.apache.hadoop.fs.Path(
      new org.apache.hadoop.fs.Path(spark.catalog.getDatabase(db).locationUri),
      table)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    val w = df.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, keys.head, keys.tail: _*)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w)
      .saveAsTable(s"$db.$table")
  }

  /** Materialized aggregate rollup — the warehouse answer to "don't scan
    * 100 TB of facts to draw a dashboard": persist `base` pre-aggregated
    * by `dims` with decimal-exact SUM/COUNT measures, and serve
    * re-aggregations (any GROUP BY over a SUBSET of the dims) from the
    * rollup by summing the partial sums — exact because SUM and COUNT
    * are decomposable (AVG is served as rolled-up SUM/COUNT, never
    * averaged-of-averages). The rollup is dims-cardinality-sized, so
    * downstream queries scan orders of magnitude fewer rows; refresh is
    * one fact-table aggregation, amortized across every dashboard query
    * (CatalogSpec pins rollup-served == base-served).
    *
    * `measures` maps output name → column; each is summed with exact
    * decimal(18,4) math plus a row count `n_rows` for count/avg
    * reconstruction. */
  def createRollup(spark: SparkSession, base: DataFrame, db: String,
                   table: String, dims: Seq[String],
                   measures: Map[String, org.apache.spark.sql.Column])
  : Unit = {
    require(dims.nonEmpty && measures.nonEmpty, "need dims and measures")
    // Stage-and-swap (ADVICE r6): the fact-table aggregation runs while
    // the LIVE rollup still serves — a failed refresh (OOM, bad measure
    // expr) dies during the staging write and leaves the live table
    // untouched, matching the SinkOps.swapWrite discipline of never
    // leaving the target empty. Only after staging is fully written does
    // the live table drop + staging rename in (metadata-only window; a
    // crash inside it is healed by the recovery below on the next call).
    stageAndSwap(spark, db, table, rollupPartial(base, dims, measures))
  }

  /** The rollup's aggregate shape over any slice of the base data:
    * decimal-exact sum per measure + row count, grouped by `dims`. Used
    * by [[createRollup]] (whole base) and the streaming maintenance path
    * (per micro-batch — [[upsertRollup]] via StreamOps.maintainRollup);
    * both produce ADDABLE partials, which is what keeps merge-maintained
    * == rebuilt-from-base exact. */
  def rollupPartial(base: DataFrame, dims: Seq[String],
                    measures: Map[String, org.apache.spark.sql.Column])
  : DataFrame = {
    val aggs = measures.toSeq.sortBy(_._1).map { case (name, c) =>
      sum(c.cast("decimal(18,4)")).as(s"sum_$name")
    } :+ count(lit(1)).as("n_rows")
    base.groupBy(dims.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** The crash-safe table-replace primitive shared by [[createRollup]]
    * and [[upsertRollup]]: write the replacement to a staging table
    * FIRST, then drop + rename in a metadata-only window; a crash inside
    * that window is healed on the next call (staging complete + live
    * missing → finish the rename). */
  private def stageAndSwap(spark: SparkSession, db: String, table: String,
                           replacement: DataFrame): Unit = {
    val staging = s"${table}__staging"
    def managedLoc(t: String) = new org.apache.hadoop.fs.Path(
      new org.apache.hadoop.fs.Path(spark.catalog.getDatabase(db).locationUri),
      t)
    val fs = managedLoc(table)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def dropWithDir(t: String): Unit = {
      spark.sql(s"DROP TABLE IF EXISTS $db.$t")
      // Orphaned managed dirs break CREATE TABLE AS (see writeBucketed)
      if (fs.exists(managedLoc(t))) fs.delete(managedLoc(t), true)
    }
    if (spark.catalog.tableExists(s"$db.$staging") &&
        !spark.catalog.tableExists(s"$db.$table")) {
      // Crashed prior swap: staging holds the complete replacement and
      // the live table is already gone — finish the rename.
      spark.sql(s"ALTER TABLE $db.$staging RENAME TO $db.$table")
    }
    dropWithDir(staging)
    replacement.write.format("parquet").saveAsTable(s"$db.$staging")
    dropWithDir(table)
    spark.sql(s"ALTER TABLE $db.$staging RENAME TO $db.$table")
  }

  /** Merge one micro-batch's PARTIAL aggregates into a live rollup table
    * — the streaming maintenance half of [[createRollup]] (which rebuilds
    * from the base table; this folds a delta in without touching the
    * base). Exactness rides the same decomposability: the stored
    * sum/count partials and the batch's partials add.
    *
    * Idempotence (the foreachBatch replay contract): `batchId` is stored
    * ON the rollup rows (constant column — atomic with the data under
    * [[stageAndSwap]], no sidecar to desync from). A replayed batch
    * (Structured Streaming re-runs the last epoch after a crash) sees
    * max(applied) >= batchId and SKIPS — apply-at-most-once per epoch,
    * which with the stream's at-least-once redelivery is exactly-once
    * table state.
    *
    * The rewrite cost is rollup-cardinality (dims-sized, corpus-
    * independent) per batch — the parquet-table trade; at warehouse
    * scale the same partials MERGE into a transactional format instead.
    * Single-writer, like every SinkOps path. */
  def upsertRollup(spark: SparkSession, partial: DataFrame, db: String,
                   table: String, dims: Seq[String],
                   measureNames: Seq[String], batchId: Long): Unit = {
    val cols = dims ++ measureNames.sorted.map(m => s"sum_$m") :+ "n_rows"
    val tagged = partial.selectExpr(cols: _*)
      .withColumn("applied_batch", lit(batchId))
    if (!spark.catalog.tableExists(s"$db.$table")) {
      stageAndSwap(spark, db, table, tagged)
      return
    }
    val live = spark.table(s"$db.$table")
    val applied = live.agg(max(col("applied_batch"))).head
    if (!applied.isNullAt(0) && applied.getLong(0) >= batchId) return
    val aggs = measureNames.sorted.map(m =>
      sum(col(s"sum_$m")).as(s"sum_$m")) :+ sum(col("n_rows")).as("n_rows")
    val merged = live.unionByName(tagged)
      .groupBy(dims.map(col): _*).agg(aggs.head, aggs.tail: _*)
      .withColumn("applied_batch", lit(batchId))
    stageAndSwap(spark, db, table, merged)
  }

  /** Serve a coarser aggregation from a [[createRollup]] table: GROUP BY
    * `dims` (a subset of the rollup's dims), re-summing the partial
    * sums and counts. Returns sum_<m>, n_rows per group — exact. */
  def fromRollup(spark: SparkSession, db: String, table: String,
                 dims: Seq[String], measureNames: Seq[String]): DataFrame = {
    val r = spark.table(s"$db.$table")
    val aggs = measureNames.sorted.map(m =>
      sum(col(s"sum_$m")).as(s"sum_$m")) :+ sum(col("n_rows")).as("n_rows")
    r.groupBy(dims.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Corpus-dir hash suffix for per-corpus warehouse artifact names
    * (`copurchase_sym_<dirHash>`, `docterms1_<dirHash>`...): first 12 hex
    * chars of md5(dir) — 48 collision-resistant bits, all [0-9a-f] so the
    * suffix is always a legal table-name fragment. The previous 32-bit
    * `String.hashCode` could collide two corpus dirs onto the SAME
    * artifact table, silently serving one corpus's rows to the other
    * (ADVICE r11). One definition so the builders and
    * [[dropStaleArtifacts]] can never disagree. */
  def dirHash(dir: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(dir.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .take(6).map(b => f"$b%02x").mkString

  /** Warehouse hygiene for per-corpus session artifacts (VERDICT r10
    * #7): the bucketed serving tables are keyed by [[dirHash]], so a
    * warehouse shared across corpora (or across renamed test dirs)
    * accumulates tables whose corpus no longer exists, with no eviction
    * path. Drops every table in `db` that matches one of the artifact
    * `prefixes` but whose dir-hash suffix is not in `liveDirs`' hashes;
    * returns how many were dropped. Non-artifact tables (rollups, the
    * DDL dims) never match a prefix and are untouched. */
  def dropStaleArtifacts(spark: SparkSession, db: String,
                         liveDirs: Seq[String],
                         prefixes: Seq[String]): Int = {
    if (!spark.catalog.databaseExists(db)) return 0
    val live = liveDirs.map(dirHash).toSet
    val stale = spark.catalog.listTables(db).collect().map(_.name)
      .filter(n => prefixes.exists(p => n.startsWith(p)) &&
        !live.contains(n.substring(n.lastIndexOf('_') + 1)))
    stale.foreach(n => spark.sql(s"DROP TABLE IF EXISTS $db.`$n`"))
    stale.length
  }
}
