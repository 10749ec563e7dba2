package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Physical data-layout operators. Layout is the scale lever that works
  * while you sleep: a table Z-ORDERED on its hot filter dimensions lets
  * every downstream scan skip most row groups via parquet min/max stats,
  * the way Delta's OPTIMIZE ZORDER BY and ClickHouse's ORDER BY keys do —
  * no runtime operator can recover IO that a bad layout already forced
  * you to read.
  *
  * A single-column sort clusters ONE dimension perfectly and scatters
  * every other; the Z-curve (Morton order) interleaves the bits of
  * several dimensions so that rows close in ANY of them stay close in
  * the linear order — each dimension's min/max spread within a row-group
  * shrinks to ~2^-(bits_in_block/d) of its domain instead of the full
  * range (spec-pinned on an exact grid: a thin slice in x touches 4/16
  * z-blocks vs 16/16 under a y-major sort).
  */
object LayoutOps {

  /** The Morton (Z-order) key: interleave the low `bits` bits of each
    * (already integer-normalized) column — col j contributes its bit i
    * at output position i·d + j. Callers normalize real values first
    * ([[normalizeLinear]], or rank/ntile for skewed domains); values
    * outside [0, 2^bits) are masked to their low bits (wrap, not error —
    * the key orders data, it never asserts data quality).
    *
    * Pure map-side expression (shifts and ORs, codegen-friendly); use it
    * as a sort/range-partition key at WRITE time:
    * `df.repartitionByRange(n, zkey).sortWithinPartitions(zkey).write…`
    * — one layout shuffle amortized over every future pruned scan. */
  def zOrderKey(cols: Seq[Column], bits: Int): Column = {
    require(cols.nonEmpty, "need at least one dimension")
    require(bits >= 1 && bits * cols.size <= 63,
      s"bits*dims must fit a signed long, got $bits*${cols.size}")
    val d = cols.size
    (0 until bits).flatMap { i =>
      cols.zipWithIndex.map { case (c, j) =>
        shiftleft(shiftright(c.cast("long"), i).bitwiseAND(lit(1L)),
          i * d + j)
      }
    }.reduce(_.bitwiseOR(_))
  }

  /** Min/max linear normalization of a value onto [0, 2^bits): the cheap
    * z-order input map (two 1-row aggregates broadcast by the caller —
    * pass the observed lo/hi in as literals). Linear scaling keeps range
    * semantics (pruning predicates stay range predicates) but inherits
    * skew: for heavy-tailed dimensions, rank-normalize instead (ntile
    * windows or approx_percentile cutpoints) — same interleave after.
    * The top edge clamps into the last cell (hi maps to 2^bits − 1). */
  def normalizeLinear(value: Column, lo: Column, hi: Column,
                      bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    val cells = 1L << bits
    least(
      greatest(
        floor((value.cast("double") - lo.cast("double"))
          / (hi.cast("double") - lo.cast("double")) * lit(cells.toDouble))
          .cast("long"),
        lit(0L)),
      lit(cells - 1))
  }

  /** Zone-map pruning effectiveness census — the MEASUREMENT behind the
    * layout claims above: simulate writing the table under several
    * candidate orderings (each a total order — include a unique
    * tie-break), cut the ordered stream into `nFiles` equal "files"
    * (parquet row-group stand-ins), record each file's min/max zone map
    * for the probe column, and count how many files a range predicate
    * [predLo, predHi] could SKIP. Run before committing a layout: the
    * answer is the fraction of the corpus every future scan with that
    * predicate shape never reads.
    *
    * The census sorts the corpus per layout (ntile over a global order)
    * because that IS the simulated write — the production write path is
    * `repartitionByRange(n, key).sortWithinPartitions(key)` (parallel
    * range sort, one layout shuffle amortized over every pruned scan);
    * ntile is the oracle-stable stand-in for its file boundaries. Null
    * probe values are excluded (they carry no zone-map information).
    * Counts exact; prune_frac one final division. */
  def zoneMapPruneCensus(df: org.apache.spark.sql.DataFrame,
                         layouts: Seq[(String, Seq[Column])],
                         value: Column, predLo: Double, predHi: Double,
                         nFiles: Int): org.apache.spark.sql.DataFrame = {
    require(layouts.nonEmpty, "need at least one layout")
    require(nFiles >= 2, s"need >= 2 files, got $nFiles")
    import org.apache.spark.sql.expressions.Window
    layouts.map { case (name, ord) =>
      val files = df.filter(value.isNotNull)
        .select(value.cast("double").as("__v"),
          ntile(nFiles).over(Window.orderBy(ord: _*)).as("__f"))
      files.groupBy(col("__f"))
        .agg(min(col("__v")).as("__lo"), max(col("__v")).as("__hi"))
        .agg(count(lit(1)).as("n_files"),
          sum(when(col("__hi") < predLo || col("__lo") > predHi, 1L)
            .otherwise(0L)).as("n_prunable"))
        .select(lit(name).as("layout"), col("n_files"), col("n_prunable"),
          (col("n_prunable").cast("double") / col("n_files").cast("double"))
            .as("prune_frac"))
    }.reduce(_ unionByName _)
  }
}
