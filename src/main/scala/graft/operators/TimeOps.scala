package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series operators Spark lacks as built-ins: backward as-of join and
  * inactivity-gap sessionization. Both are formulated as ONE shuffle on the
  * entity key + a merge-scan window — the shape kdb/Flink/QuestDB use for
  * the same operators — never a per-row range probe or an
  * O(left × right) interval join.
  */
object TimeOps {

  /** Backward (most-recent-at-or-before) as-of join.
    *
    * For each left row, finds the right row with the greatest `rightTs` ≤
    * `leftTs` within the same `keys` group, and attaches that row's
    * `payload` columns (null when no right row precedes — left-outer
    * semantics). Among right rows sharing the exact match timestamp, the
    * LAST under ascending `rightOrder` wins — pass a unique column to make
    * the join deterministic under timestamp ties.
    *
    * Implementation: tag and union both sides, then one
    * `last(_, ignoreNulls)` running window ordered by (ts, side-tag,
    * tie-break) — right rows sort before left rows at equal ts, so the
    * carried value at each left row is exactly the latest right row at-or-
    * before it. ONE shuffle on `keys`, one sort, zero joins: the classic
    * merge-scan as-of, linear at any scale (contrast the naive
    * `left.join(right, keys && rTs <= lTs)` + max-filter, which explodes
    * to O(|left| × |right per key|) pairs before pruning).
    *
    * `payload` names must not collide with left columns; `keys` columns
    * must exist on both sides with identical names. Null timestamps take
    * no part in matching: right rows with null `rightTs` are ignored, left
    * rows with null `leftTs` get null payload (DuckDB ASOF semantics).
    */
  def asofBackward(left: DataFrame, leftTs: String,
                   right: DataFrame, rightTs: String,
                   keys: Seq[String], payload: Seq[String],
                   rightOrder: Seq[Column] = Nil): DataFrame =
    asofImpl(left, leftTs, right, rightTs, keys, payload, rightOrder,
      backward = true)

  /** Forward (earliest-at-or-after) as-of join — the mirror of
    * [[asofBackward]]: for each left row, the right row with the SMALLEST
    * `rightTs` ≥ `leftTs` in the same `keys` group. Same merge-scan shape
    * (the scan direction flips); same tie rule (last under ascending
    * `rightOrder` among right rows sharing the match timestamp). */
  def asofForward(left: DataFrame, leftTs: String,
                  right: DataFrame, rightTs: String,
                  keys: Seq[String], payload: Seq[String],
                  rightOrder: Seq[Column] = Nil): DataFrame =
    asofImpl(left, leftTs, right, rightTs, keys, payload, rightOrder,
      backward = false)

  private def asofImpl(left: DataFrame, leftTs: String,
                       right: DataFrame, rightTs: String,
                       keys: Seq[String], payload: Seq[String],
                       rightOrder: Seq[Column],
                       backward: Boolean): DataFrame = {
    require(payload.nonEmpty, "asof join needs at least one payload column")
    val clash = payload.filter(left.columns.contains)
    require(clash.isEmpty, s"payload collides with left columns: $clash")
    // Collision-free internal names against BOTH schemas.
    val all = (left.columns ++ right.columns).toSet
    def fresh(base: String): String =
      Iterator.iterate(base)(_ + "_").find(!all.contains(_)).get
    val ts = fresh("__asof_ts")
    val tag = fresh("__asof_tag")
    val carry = fresh("__asof_carry")
    val tb = fresh("__asof_tb")

    val leftRest = left.columns.toSeq.filterNot(keys.contains)
    val carryType = right.select(struct(payload.map(col): _*)).schema.head.dataType
    val tbExpr: Column =
      if (rightOrder.isEmpty) lit(0L) else struct(rightOrder: _*)
    val tbType = right.select(tbExpr).schema.head.dataType

    // Null timestamps (ADVICE r3): a null ts is "no time" — it can neither
    // match nor be matched (DuckDB ASOF and the naive formulation agree).
    // Right rows with null ts are dropped here; left rows with null ts are
    // nulled at the output projection below (they'd otherwise pick up a
    // spurious carry: asc sorts nulls FIRST — head of the backward scan —
    // and desc sorts them LAST — tail of the forward scan).
    val rightNn = right.filter(col(rightTs).isNotNull)

    val rSide = rightNn.select(
      keys.map(col) ++ Seq(
        col(rightTs).as(ts),
        lit(0).as(tag),
        struct(payload.map(col): _*).as(carry),
        tbExpr.as(tb)) ++
        leftRest.map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    val lSide = left.select(
      keys.map(col) ++ Seq(
        col(leftTs).as(ts),
        lit(1).as(tag),
        lit(null).cast(carryType).as(carry),
        lit(null).cast(tbType).as(tb)) ++
        leftRest.map(col): _*)

    // Backward scans time ascending (carry = latest right ≤ left); forward
    // scans descending (carry = earliest right ≥ left). Right rows sort
    // before left rows at the match timestamp either way — inclusive.
    val tsOrd = if (backward) col(ts).asc else col(ts).desc
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(tsOrd, col(tag).asc, col(tb).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    rSide.unionByName(lSide)
      .withColumn(carry, last(col(carry), ignoreNulls = true).over(w))
      .filter(col(tag) === 1)
      .select((keys ++ leftRest).map(col) ++
        payload.map(p => when(col(ts).isNotNull, col(carry).getField(p))
          .as(p)): _*)
  }

  /** Inactivity-gap sessionization: assigns each row a per-key
    * `session_idx` (1-based, chronological) that increments whenever the
    * gap since the key's previous row exceeds `gapMicros`.
    *
    * One shuffle on `keys`; the lag and the running sum share the same
    * partitioning and sort, so the second window reuses the first's
    * exchange. `order` must be a per-key total order starting with the
    * timestamp (include a unique tie-break column).
    *
    * This is the batch twin of the streaming session window
    * (`session_window` / flatMapGroupsWithState): same assignment, but
    * replayable over stored history.
    */
  def sessionize(df: DataFrame, keys: Seq[String], tsCol: String,
                 gapMicros: Long, order: Seq[Column],
                 out: String = "session_idx"): DataFrame = {
    require(gapMicros > 0, "gapMicros must be positive")
    def fresh(base: String): String =
      Iterator.iterate(base)(_ + "_").find(!df.columns.contains(_)).get
    val us = fresh("__sess_us")
    val prev = fresh("__sess_prev")
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn(us, unix_micros(col(tsCol)))
      .withColumn(prev, lag(col(us), 1).over(w))
      .withColumn(out,
        sum(when(col(prev).isNull || col(us) - col(prev) > gapMicros, 1L)
          .otherwise(0L)).over(run))
      .drop(us, prev)
  }

  /** L50 point-in-interval join (batch range join) via time binning.
    *
    * Attaches every probe row to every interval row sharing `keys` with
    * `start <= probeTs < end` (half-open, the standard window
    * convention). Spark plans the naive inequality join
    * (`probes.join(intervals, keys && start <= ts && ts < end)`) as a
    * nested loop — O(|probes| × |intervals per key|) comparisons and,
    * without an equi-condition, often a BROADCAST nested loop that dies
    * at scale. Quantizing time into fixed `binWidthUs` buckets makes it
    * a plain equi shuffle join: each interval explodes to the bins it
    * overlaps (len/binWidth + 1 rows), each probe maps to ONE bin, and
    * the exact range predicate filters the per-bin candidates. A
    * matching (interval, probe) pair meets EXACTLY once — the probe has
    * one bin and the interval lists each covered bin once — so there is
    * no post-join dedup, and both aggregations downstream stay
    * combinable.
    *
    * Bin arithmetic is exact: `(us - us % w) / w` divides an exact
    * multiple of `w` (all values < 2^53, so the double division returns
    * the integer quotient exactly) — no float-boundary drift between a
    * probe's bin and its interval's bin list.
    *
    * Size `binWidthUs` to the TYPICAL interval length: explode
    * amplification is len/binWidth + 1 per interval (2 rows when
    * len <= binWidth), while an over-wide bin packs unrelated rows into
    * one bucket and pays more filtered candidates. Degenerate inputs are
    * dropped, matching the inequality-join semantics: empty/inverted
    * intervals (end <= start) match nothing, and null timestamps or null
    * keys never satisfy the range predicate. Hot keys shuffle on
    * (keys, bin) — time itself spreads a hot entity over reducers, the
    * same effect the salted join buys for key-only joins.
    *
    * Column names must be disjoint between the two sides apart from
    * `keys` (same contract as the as-of join). */
  def intervalJoin(probes: DataFrame, probeTs: String,
                   intervals: DataFrame, startCol: String, endCol: String,
                   keys: Seq[String], binWidthUs: Long): DataFrame = {
    require(binWidthUs > 0, s"binWidthUs must be positive, got $binWidthUs")
    def binOf(us: Column): Column =
      ((us - pmod(us, lit(binWidthUs))) / lit(binWidthUs)).cast("long")
    val pb = probes.withColumn("__bin", binOf(unix_micros(col(probeTs))))
    val iv = intervals
      .filter(col(endCol) > col(startCol))
      .withColumn("__bin", explode(sequence(
        binOf(unix_micros(col(startCol))),
        binOf(unix_micros(col(endCol)) - lit(1L)))))
    pb.join(iv, keys :+ "__bin")
      .filter(col(probeTs) >= col(startCol) && col(probeTs) < col(endCol))
      .drop("__bin")
  }

  /** SCD Type-2 history build: collapse an event stream into versioned
    * validity ranges. Per key (ordered by `order` — include a unique
    * tie-break), consecutive rows with the SAME state merge into one
    * version; each version carries `valid_from_us` (its first
    * observation), `valid_to_us` (the next version's start, null while
    * current — the half-open [from, to) convention every
    * point-in-time query expects), and an `is_current` flag. The
    * change-comparison is null-safe: null is a real state, and
    * null→value / value→null transitions open new versions.
    *
    * Shape: two window functions (change-detect lag, then lead over the
    * COLLAPSED rows) on one `partitionBy(keys)` spec — a single
    * exchange, reused across both sorts since the filter between them
    * preserves partitioning and order. No self-joins, no driver state;
    * compose with [[graft.sources.SinkOps.applyCdc]] to maintain the
    * current-rows table this history is the audit log of. */
  def scd2(df: DataFrame, keys: Seq[String], state: Column, tsCol: String,
           order: Seq[Column]): DataFrame = {
    def fresh(base: String): String =
      Iterator.iterate(base)(_ + "_").find(!df.columns.contains(_)).get
    val prev = fresh("__scd_prev")
    val seen = fresh("__scd_seen")
    // Materialize the order expressions ONCE and build every window over
    // the materialized columns: handing the raw expressions to each
    // window gives each a distinct projected sort key (_w0#n), so Spark
    // plans three Sort+Window passes instead of fusing the two lags into
    // one Window and eliding the post-filter re-sort (plan-asserted).
    val ordNames = order.indices.map(i => fresh(s"__scd_o$i"))
    val ordered = order.zip(ordNames).foldLeft(df) {
      case (d, (o, n)) => d.withColumn(n, o)
    }
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(ordNames.map(col): _*)
    ordered.withColumn("state", state)
      .withColumn("valid_from_us", unix_micros(col(tsCol)))
      .withColumn(prev, lag(col("state"), 1).over(w))
      // lag of a literal marks "a previous row EXISTS" — `prev` alone
      // can't: a first row whose state is null would look like a
      // no-change continuation of itself and vanish.
      .withColumn(seen, lag(lit(1), 1).over(w))
      .filter(col(seen).isNull || !(col(prev) <=> col("state")))
      .withColumn("valid_to_us", lead(col("valid_from_us"), 1).over(w))
      .withColumn("is_current",
        when(col("valid_to_us").isNull, 1).otherwise(0))
      .drop(prev +: seen +: ordNames: _*)
  }

  /** Date-spine gap fill: regularize an irregular per-(group, day) series
    * onto the complete daily calendar between each group's first and last
    * observation, so downstream window math (EWMA, lag deltas, rolling
    * means) sees one row per day instead of silently skipping gaps.
    * Missing days get `n = 0` (no events happened — a FACT, not a
    * missing measurement) and `carried` = the last OBSERVED value
    * (forward fill — the standard last-observation-carried-forward
    * convention for state-like measures).
    *
    * Scale: the spine is `sequence()` over each group's [min, max] day
    * exploded map-side from a K-row aggregate — never a driver-side
    * calendar loop — and the fill join is keyed (group, day) against the
    * observed aggregate, both sides pre-shrunk to days × groups rows
    * (corpus-independent). The forward fill is one `last(ignoreNulls)`
    * running window — the [[asofBackward]] merge-scan shape, one sort.
    * Output cardinality: total calendar days across groups. */
  def gapFill(observed: DataFrame, group: Column, day: Column,
              value: Column): DataFrame = {
    val obs = observed.select(group.as("__g"), day.as("__day"),
        value.as("__v"))
      .groupBy(col("__g"), col("__day")).agg(sum(col("__v")).as("n"))
    val spine = obs.groupBy(col("__g"))
      .agg(min(col("__day")).as("__lo"), max(col("__day")).as("__hi"))
      .select(col("__g"), explode(sequence(col("__lo"), col("__hi"),
        expr("interval 1 day"))).as("__day"))
    val w = Window.partitionBy(col("__g")).orderBy(col("__day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine.join(obs, Seq("__g", "__day"), "left")
      .withColumn("is_observed", col("n").isNotNull)
      .withColumn("carried", last(col("n"), ignoreNulls = true).over(w))
      .withColumn("n", coalesce(col("n"), lit(0L)))
  }

  /** Windowed exponentially-weighted moving average with α = 1/2: the
    * zero-initialized recursion e ← (x + e) / 2, folded oldest-to-newest
    * over the last `lookback` observations of each group. Both design
    * choices are about EXACTNESS, which is what makes the operator
    * oracle-checkable and run-to-run stable at cluster scale:
    *  - α = 1/2 makes every step one double addition and one EXACT
    *    halving (no libm pow, no per-term weight rounding);
    *  - the truncation bounds the state, and the fold runs LEFT-TO-RIGHT
    *    over the frame's collected array (`aggregate` HOF) — a fixed
    *    sequential order no engine's partial-aggregation or segment-tree
    *    window strategy can perturb. At lookback 40 the dropped tail
    *    weighs < 2^-40 ≈ 1e-12 of any observation — at or below one ulp
    *    of typical magnitudes — while keeping state bounded, exactly the
    *    streaming-EWMA compromise.
    * Input must be one row per (group, tick) — run [[gapFill]] first so
    * gaps decay the average instead of silently stretching a step. */
  def ewmaSmooth(series: DataFrame, group: Column, ord: Column,
                 value: Column, lookback: Int = 40): DataFrame = {
    require(lookback >= 1 && lookback <= 60,
      s"lookback must be in [1, 60] (2^-61 underflows any signal), " +
        s"got $lookback")
    val w = Window.partitionBy(group).orderBy(ord)
      .rowsBetween(-(lookback - 1), Window.currentRow)
    // collect_list over a running frame preserves frame order
    // (oldest..newest) — the fold then halves every prior term once per
    // newer observation: e = Σ_j x_{t-j} · 2^{-(j+1)}.
    series.withColumn("ewma",
      aggregate(collect_list(value.cast("double")).over(w),
        lit(0.0), (acc, x) => (acc + x) / lit(2.0)))
  }

  /** Fixed-grid resampling with LINEAR interpolation — the
    * feature-engineering twin of [[gapFill]]: where gapFill regularizes a
    * COUNT series (absence is the fact n = 0, state forward-fills), this
    * regularizes a MEASUREMENT series (absence is a missing observation,
    * and the standard estimate between two readings is the line through
    * them). Sensor readings, account balances, model-metric checkpoints
    * resample this way before any window math.
    *
    * Grid: every multiple of `stepUs` microseconds inside each group's
    * [first, last] observation span — derived per group from a K-row
    * min/max aggregate and exploded map-side (`sequence`), never a
    * driver-side loop; grid ticks are exact integer micros. Same-tick
    * duplicate observations collapse by MAX first (a deterministic tie
    * rule both engines share).
    *
    * Interpolation: ONE merge-scan per group — grid ticks and
    * observations union into a single (ts, kind)-ordered window sort
    * (the [[asofBackward]] shape); `last(ignoreNulls)` over the running
    * frame carries (prev_ts, prev_v) onto each tick, `first(ignoreNulls)`
    * over the following frame brings (next_ts, next_v) — both frames
    * share one partition+sort, so the plan pays ONE exchange and ONE
    * sort, no self-join of observations to ticks. A tick that lands
    * exactly on an observation reports it verbatim (`is_exact`);
    * interior ticks evaluate
    * `(v_prev·(t_next−t) + v_next·(t−t_prev)) / (t_next−t_prev)` in a
    * FIXED double op sequence (weights are exact long→double micro
    * deltas < 2^53), so results hash-verify cross-engine. Every grid
    * tick lies inside its group's observation span by construction, so
    * both neighbors always exist.
    *
    * Output: one row per (group, tick) — tick_us (integer micros, the
    * engine-neutral export), value_interp, is_exact. */
  def interpResample(events: DataFrame, group: Column, ts: Column,
                     value: Column, stepUs: Long): DataFrame = {
    require(stepUs >= 1, s"stepUs must be positive, got $stepUs")
    // A null measurement is a MISSING observation (it contributes no
    // anchor point), not a zero — drop it before anchoring.
    // Materialized once (r17): both the grid spine (min/max per group)
    // and the merge-scan union read this aggregate — without the
    // checkpoint each consumer re-derived the corpus scan + (group,
    // tick) aggregate as its own subtree.
    val obs = events
      .select(group.as("__g"), unix_micros(ts).as("__tus"),
        value.cast("double").as("__v"))
      .filter(col("__v").isNotNull)
      .groupBy(col("__g"), col("__tus"))
      .agg(max(col("__v")).as("__v"))
      .localCheckpoint()
    // First/last tick per group: ceil/floor to the step grid in exact
    // integer math (timestamps are non-negative micros).
    val spine = obs.groupBy(col("__g"))
      .agg(min(col("__tus")).as("__lo"), max(col("__tus")).as("__hi"))
      .withColumn("__t0", col("__lo") + pmod(-col("__lo"), lit(stepUs)))
      .withColumn("__t1", col("__hi") - pmod(col("__hi"), lit(stepUs)))
      // a group spanning less than one step holds no grid tick; sequence()
      // would throw on start > stop rather than return empty
      .filter(col("__t0") <= col("__t1"))
      .select(col("__g"),
        explode(sequence(col("__t0"), col("__t1"), lit(stepUs)))
          .as("__tus"))
      .select(col("__g"), col("__tus"), lit(1).as("__is_grid"),
        lit(null).cast("double").as("__v"))
    val unioned = obs
      .select(col("__g"), col("__tus"), lit(0).as("__is_grid"), col("__v"))
      .unionByName(spine)
    // Observations sort BEFORE the grid tick at the same instant, so the
    // running frame sees an exact-hit observation and the following frame
    // (strictly later rows) does not double-serve it.
    val ord = Seq(col("__tus").asc, col("__is_grid").asc)
    val wPrev = Window.partitionBy(col("__g")).orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wNext = Window.partitionBy(col("__g")).orderBy(ord: _*)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val obsTs = when(col("__is_grid") === 0, col("__tus"))
    val obsV = when(col("__is_grid") === 0, col("__v"))
    // One select, not a withColumn chain (r17): CollapseWindow then
    // fuses the two running-frame expressions into ONE Window node and
    // the two following-frame ones into another — two passes over the
    // shared sort instead of four.
    val withNbrs = unioned.select(col("__g"), col("__tus"),
      col("__is_grid"), col("__v"),
      last(obsTs, ignoreNulls = true).over(wPrev).as("__pt"),
      last(obsV, ignoreNulls = true).over(wPrev).as("__pv"),
      first(obsTs, ignoreNulls = true).over(wNext).as("__nt"),
      first(obsV, ignoreNulls = true).over(wNext).as("__nv"))
    withNbrs.filter(col("__is_grid") === 1)
      .select(col("__g"), col("__tus").as("tick_us"),
        when(col("__pt") === col("__tus"), col("__pv"))
          .otherwise(
            (col("__pv") * (col("__nt") - col("__tus")).cast("double") +
              col("__nv") * (col("__tus") - col("__pt")).cast("double")) /
              (col("__nt") - col("__pt")).cast("double"))
          .as("value_interp"),
        (col("__pt") === col("__tus")).cast("int").as("is_exact"))
  }
}
