package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable sketches with EXACT cross-engine parity. Spark's built-in
  * sketches (HLL++ `approx_count_distinct`, KLL `percentile_approx`) are
  * covered by accuracy specs (ApproxSpec) because their binary states
  * differ across engines; the Count-Min Sketch here is pure deterministic
  * integer arithmetic on md5-prefix hashes, so a DuckDB oracle reproduces
  * every counter bit-for-bit — a sketch whose CONSTRUCTION is itself
  * oracle-checkable, not just its error bound.
  *
  * Scale posture: the sketch build is one explode (×`depth`) feeding a
  * partial-aggregable groupBy — the shuffle carries at most depth×width
  * counter rows regardless of corpus size, and two corpus halves' sketches
  * merge by adding counters (the reason CMS exists). Point queries touch
  * `depth` rows of a depth×width table. Standard estimate guarantees:
  * overestimates only, error ≤ 2N/width with prob 1-(1/2)^depth. */
object SketchOps {

  /** The `depth` bucket ids of one item: salted md5-prefix hashes mod
    * `width` — row i uses salt "cms{i}:". Deterministic and engine-
    * independent (the oracle computes identical buckets). */
  def cmsBuckets(item: Column, depth: Int, width: Int): Column =
    array((0 until depth).map(i =>
      pmod(TextOps.hash32(concat(lit(s"cms$i:"), item)), lit(width))): _*)

  /** Build the depth×width counter table over an item column: one row per
    * (row_id, bucket) with its count. ONE corpus scan (the depth hashes
    * explode from an array, not from repeated scans), one combinable
    * shuffle bounded by depth×width rows. */
  def cmsBuild(df: DataFrame, item: Column, depth: Int, width: Int)
  : DataFrame =
    df.select(posexplode(cmsBuckets(item, depth, width))
        .as(Seq("row_id", "bucket")))
      .groupBy(col("row_id"), col("bucket"))
      .agg(count(lit(1)).as("c"))

  /** Point-query estimates for `probes` (a DataFrame with an item column
    * named `probeCol`): min over the depth counters — missing counters
    * read as 0 (an item never inserted can still collide, so the
    * coalesce keeps the estimate an overestimate, never null). */
  def cmsQuery(sketch: DataFrame, probes: DataFrame, probeCol: String,
               depth: Int, width: Int): DataFrame = {
    val keyed = probes
      .select(col(probeCol),
        posexplode(cmsBuckets(col(probeCol), depth, width))
          .as(Seq("row_id", "bucket")))
    keyed.join(sketch, Seq("row_id", "bucket"), "left")
      .groupBy(col(probeCol))
      .agg(min(coalesce(col("c"), lit(0L))).as("cms_estimate"))
  }

  // ----------------------------------------------- HLL distinct rollup

  /** Distinct-count ROLLUP: one Datasketches HLL sketch per key, stored
    * as a binary column — the materialized-view answer to "distinct users
    * by any dimension subset". A plain COUNT(DISTINCT) rollup is NOT
    * re-aggregable (distinct counts don't add across groups), so without
    * sketches every coarser grouping re-scans the 100 TB fact table;
    * sketch columns make distinct counts DECOMPOSABLE the way
    * CatalogOps.createRollup's sum/count partials are: [[hllServe]]
    * merges fine-grained sketches into any coarser grouping without
    * touching the corpus, and disjoint shards/incremental loads merge by
    * the same union (spec-pinned identical to the from-scratch sketch).
    *
    * `lgK` sizes the sketch register array (2^lgK buckets ≈ 1.04/√2^lgK
    * rsd — 12 gives ~1.6%); sketches are KB-sized regardless of
    * cardinality. One combinable shuffle (hll_sketch_agg partial-merges
    * map-side). */
  def hllRollup(df: DataFrame, keys: Seq[String], item: Column,
                lgK: Int = 12): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(hll_sketch_agg(item, lgK).as("hll"),
        count(lit(1)).as("n_rows"))

  /** Serve a coarser distinct-count grouping from a [[hllRollup]] table:
    * union the covered sketches, estimate at the end. Cost is
    * rollup-cardinality, independent of fact-table size. */
  def hllServe(rollup: DataFrame, keys: Seq[String]): DataFrame =
    rollup.groupBy(keys.map(col): _*)
      .agg(hll_sketch_estimate(hll_union_agg(col("hll")))
        .as("n_distinct_est"),
        sum(col("n_rows")).as("n_rows"))
}
