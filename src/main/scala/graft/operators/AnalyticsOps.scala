package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product/behavioral analytics over event streams: cohort retention,
  * conversion funnels, robust outlier screens, distribution drift, and
  * per-group trend fits. The reference's dashboard queries stop at grouped
  * rates (crime_immigration_etl.py:233-268); these are the standard next
  * questions an analyst asks of the same event data, built Spark-first.
  *
  * Oracle-parity discipline (SURVEY.md §7): every metric that crosses the
  * engine boundary is either pure integer arithmetic (counts, epoch
  * microseconds, common-denominator numerators) or a SINGLE final double
  * expression evaluated in the same operation order on both engines —
  * never a float SUM whose partial-aggregation order could differ.
  */
object AnalyticsOps {

  /** Cohort retention: assign each actor to the cohort of its FIRST event
    * day, then count distinct actors active at each day offset since
    * their cohort day, with the retention fraction against the cohort's
    * day-0 size.
    *
    * Scale: one combinable groupBy(actor) for cohort assignment, one
    * shuffle join of the event scan against it ON THE SAME KEY (the
    * exchange is reused, not repeated), one combinable groupBy(cohort,
    * offset) — distinct-actor counting shuffles (actor, day) pairs, not
    * raw events. The cohort size is read off the AGGREGATED output
    * (every member is active at offset 0 by definition, so size =
    * the day-0 n_active) via a window over cohort-days — a separate
    * size aggregate would re-run the user-level pass over the corpus
    * (plan-asserted: exactly one actor-keyed exchange). Output
    * cardinality is days × offsets, independent of corpus size. */
  def cohortRetention(events: DataFrame, actor: Column,
                      ts: Column): DataFrame = {
    val ev = events.select(actor.as("__actor"), to_date(ts).as("__day"))
    val cohort = ev.groupBy(col("__actor"))
      .agg(min(col("__day")).as("cohort_day"))
    val w = Window.partitionBy(col("cohort_day"))
    ev.join(cohort, "__actor")
      .groupBy(col("cohort_day"),
        datediff(col("__day"), col("cohort_day")).as("days_since"))
      .agg(countDistinct(col("__actor")).as("n_active"))
      .withColumn("cohort_size",
        max(when(col("days_since") === 0, col("n_active"))).over(w))
      .select(
        date_format(col("cohort_day"), "yyyy-MM-dd").as("cohort_day"),
        col("days_since"), col("n_active"), col("cohort_size"),
        (col("n_active").cast("double") / col("cohort_size").cast("double"))
          .as("retention"))
  }

  /** Strict-sequence conversion funnel: step k counts the actors whose
    * earliest step-k event is STRICTLY AFTER their earliest qualifying
    * step-(k-1) event — the standard ordered-funnel semantics (an actor
    * who purchased before signing up does not convert).
    *
    * Steps are (label, predicate) pairs; timestamps compare at
    * microsecond precision (`unix_micros`) so the oracle twin can
    * replicate the comparison exactly regardless of source precision.
    *
    * Scale: one groupBy(actor) per step plus an equi-join per step, ALL
    * keyed on the actor — a single logical repartition whose exchange
    * Spark reuses across the chain. Per-step frontiers are one row per
    * converted actor (monotonically shrinking). The final counts are
    * 1-row aggregates; output is `steps.length` rows.
    *
    * Plan-level note: each frontier's lineage contains its
    * predecessors, so the k count actions rescan the event source
    * O(k²)/2 times in total. At the 3-4 steps real funnels have, the
    * rescans are cheaper than materialization; for a DEEP funnel, pass
    * `checkpointFrontiers = true` (VERDICT r6 #5): each frontier is
    * eagerly localCheckpoint'ed (the GraphOps per-round pattern), so
    * step k's build reads frontier k-1's MATERIALIZED rows — k source
    * scans total, and the step-count actions replay no joins at all.
    * The checkpoint blocks live until the session drops them (they are
    * one row per converted actor — the monotonically shrinking end of
    * the pipeline, not the corpus). */
  def funnel(events: DataFrame, actor: Column, ts: Column,
             steps: Seq[(String, Column)],
             checkpointFrontiers: Boolean = false): DataFrame =
    funnelImpl(events, actor, ts, steps, None, checkpointFrontiers)

  /** [[funnel]] with a per-transition DEADLINE: step k counts only when
    * it happens within `maxGapUs` of the actor's step-(k−1) frontier —
    * the attribution/conversion-window semantics product analytics runs
    * ("purchased within 24 h of clicking"). Same GREEDY earliest-first
    * contract as [[funnel]], now explicit because it bites: the walk
    * extends the EARLIEST qualifying frontier, so an actor whose earliest
    * step-1 has no step-2 inside the window counts as not converting even
    * if a later step-1 occurrence would have (the standard first-touch
    * funnel definition — an optimal-alignment variant is a different,
    * quadratic operator). Oracle replays the identical greedy recursion. */
  def funnelWithin(events: DataFrame, actor: Column, ts: Column,
                   steps: Seq[(String, Column)], maxGapUs: Long,
                   checkpointFrontiers: Boolean = false): DataFrame = {
    require(maxGapUs > 0, s"maxGapUs must be positive, got $maxGapUs")
    funnelImpl(events, actor, ts, steps, Some(maxGapUs),
      checkpointFrontiers)
  }

  private def funnelImpl(events: DataFrame, actor: Column, ts: Column,
                         steps: Seq[(String, Column)],
                         maxGapUs: Option[Long],
                         checkpointFrontiers: Boolean): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    // Frontier k: (actor, earliest step-k time among events after the
    // actor's frontier-(k-1) time — and within the deadline, if any).
    val frontiers = steps.foldLeft(List.empty[DataFrame]) {
      case (acc, (_, pred)) =>
        val stepEv = events.filter(pred)
          .select(actor.as("__actor"), unix_micros(ts).as("__us"))
        val f = acc match {
          case Nil => stepEv.groupBy(col("__actor"))
            .agg(min(col("__us")).as("__t"))
          case prev :: _ => stepEv
            .join(prev.select(col("__actor"), col("__t").as("__prev")),
              "__actor")
            .filter(maxGapUs.foldLeft(col("__us") > col("__prev"))(
              (c, w) => c && col("__us") <= col("__prev") + w))
            .groupBy(col("__actor")).agg(min(col("__us")).as("__t"))
        }
        (if (checkpointFrontiers) f.localCheckpoint(true) else f) :: acc
    }.reverse
    val entry = frontiers.head.agg(count(lit(1)).as("n0"))
    frontiers.zip(steps).zipWithIndex.map { case ((f, (label, _)), i) =>
      f.agg(count(lit(1)).as("n_actors"))
        .select(lit(i + 1).as("step"), lit(label).as("step_label"),
          col("n_actors"))
    }.reduce(_ union _)
      .crossJoin(broadcast(entry))
      .select(col("step"), col("step_label"), col("n_actors"),
        (col("n_actors").cast("double") / col("n0").cast("double"))
          .as("frac_of_entry"))
  }

  /** Per-group (grp, value-histogram) with cumulative and total counts —
    * the shared prefix of every bounded-state exact order statistic in
    * this file ([[groupedQuantilesCont]], [[groupedMedian2]]). The
    * groupBy is combinable (map-side partial), so reducer state is the
    * group's DISTINCT VALUE count — bounded by the metric's value
    * domain, never the corpus. (Spark's exact `percentile` instead
    * buffers the whole value→count multiset of a group inside ONE
    * aggregation buffer — unbounded on a raw-domain metric, the r9
    * `weak` list.) */
  private def groupedHist(df: DataFrame, group: Column,
                          value: Column): DataFrame = {
    val ord = Window.partitionBy(col("grp")).orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val all = Window.partitionBy(col("grp"))
    df.select(group.as("grp"), value.cast("long").as("__v"))
      .filter(col("__v").isNotNull)
      .groupBy(col("grp"), col("__v")).agg(count(lit(1)).as("__c"))
      .withColumn("__cum", sum(col("__c")).over(ord))
      .withColumn("__n", sum(col("__c")).over(all))
  }

  /** Exact per-group INTERPOLATED quantiles (quantile_cont semantics:
    * position h = (n−1)·q, result x_⌊h⌋ + (h−⌊h⌋)·(x_⌈h⌉−x_⌊h⌋)) of an
    * INTEGER metric, computed from its value histogram — the
    * bounded-state replacement for Spark's exact `percentile`, whose
    * per-group value→count buffer grows with the distinct-value count
    * on ONE reducer. Here the histogram shuffle is combinable and the
    * per-group sorted window runs over DISTINCT VALUES only (the
    * [[discreteQuantiles]] shape, per group).
    *
    * Each rank is an exact fraction num/den: k = ((n−1)·num) div den and
    * the remainder are exact integers, the bracketing order statistics
    * x_k / x_{k+1} fall out of two cumulative-count comparisons, and the
    * one interpolation `lo + (rem/den)·(hi−lo)` is a single pinned-order
    * double expression over exact-integer inputs — hash-identical to a
    * SQL twin that spells the same arithmetic. Returns one row per
    * group: (grp, n, <one double column per requested name>). */
  def groupedQuantilesCont(df: DataFrame, group: Column, value: Column,
                           qs: Seq[(String, Int, Int)]): DataFrame = {
    require(qs.nonEmpty && qs.forall { case (_, n, d) =>
      n >= 0 && d > 0 && n <= d }, s"ranks must be fractions in [0,1]: $qs")
    val cum = groupedHist(df, group, value)
    val aggCols = qs.flatMap { case (name, num, den) =>
      val k = expr(s"((__n - 1) * $num) div $den")
      Seq(
        min(when(col("__cum") > k, col("__v"))).as(s"__lo_$name"),
        min(when(col("__cum") > k + lit(1L), col("__v"))).as(s"__hi_$name"))
    }
    val agg = cum.groupBy(col("grp"))
      .agg(max(col("__n")).as("n"), aggCols: _*)
    val outCols = qs.map { case (name, num, den) =>
      val rem = ((col("n") - 1) * lit(num.toLong)) % lit(den.toLong)
      val lo = col(s"__lo_$name").cast("double")
      val hi = col(s"__hi_$name").cast("double")
      when(rem === 0, lo)
        .otherwise(lo + (rem.cast("double") / lit(den.toDouble)) * (hi - lo))
        .as(name)
    }
    agg.select(col("grp") +: col("n") +: outCols: _*)
  }

  /** Exact per-group DOUBLED median (2×median — always an integer for
    * an integer metric: x_k + x_{k+1} at the two middle ranks, or 2·x_k
    * when n is odd) from the value histogram. Keeping the statistic in
    * the integers lets [[robustOutliers]] chain median-of-deviations
    * without a single intermediate double, so the oracle twin is exact
    * by construction. Returns (grp, __n, __med2). */
  private def groupedMedian2(df: DataFrame, group: Column,
                             value: Column): DataFrame = {
    val cum = groupedHist(df, group, value)
    val k = expr("(__n - 1) div 2")
    cum.groupBy(col("grp"))
      .agg(max(col("__n")).as("__n"),
        min(when(col("__cum") > k, col("__v"))).as("__lo"),
        min(when(col("__cum") > k + lit(1L), col("__v"))).as("__hi"))
      .select(col("grp"), col("__n"),
        when((col("__n") - 1) % 2 === 0, col("__lo") * 2)
          .otherwise(col("__lo") + col("__hi")).as("__med2"))
  }

  /** Robust per-group outlier screen: median/MAD with the 1.4826
    * consistency constant (MAD of a normal ≈ σ/1.4826), flagging values
    * whose absolute deviation exceeds `k` robust sigmas. Median-based on
    * purpose — a mean/stddev z-score lets the outliers it is hunting
    * drag the threshold toward themselves.
    *
    * Takes an INTEGER metric (callers quantize — cents, microseconds,
    * counts) and runs BOTH medians through the [[groupedMedian2]] value
    * histogram, in doubled units so every intermediate is an exact
    * integer: med2 = 2·median, dev2 = |2·v − med2|, mad4 = 2·median(dev2)
    * = 4·MAD. Reducer state is each group's distinct-value count — the
    * r9 VERDICT's unbounded exact-`percentile` buffer is gone. The flag
    * test dev2 > (k·1.4826)·(mad4/2) and the reported med = med2/2,
    * mad = mad4/4 are single pinned-order double expressions over exact
    * integers (÷2/÷4 are exact in binary), so the oracle twin is
    * hash-exact.
    *
    * The per-group median/MAD tables carry NO broadcast hint: AQE picks
    * broadcast from their ACTUAL runtime size (tiny in the monitoring
    * regime) but degrades to a shuffle join if a caller feeds millions
    * of groups — a forced hint would OOM the driver instead (SCALE.md
    * "Group-cardinality joins"). */
  def robustOutliers(df: DataFrame, group: Column, value: Column,
                     k: Double = 3.0): DataFrame = {
    val v = df.select(group.as("grp"), value.cast("long").as("__v"))
      .filter(col("__v").isNotNull)
    val med = groupedMedian2(v, col("grp"), col("__v"))
      .select(col("grp"), col("__med2"))
    val dev = v.join(med, "grp")
      .select(col("grp"), col("__med2"),
        abs(col("__v") * 2 - col("__med2")).as("__dev2"))
    val mad = groupedMedian2(dev, col("grp"), col("__dev2"))
      .select(col("grp"), col("__med2").as("__mad4"))
    dev.join(mad, "grp")
      .groupBy(col("grp"))
      .agg(max(col("__med2")).as("__m2"), max(col("__mad4")).as("__m4"),
        count(lit(1)).as("n_total"),
        sum(when(col("__dev2").cast("double") >
          (lit(k) * lit(1.4826)) * (col("__mad4").cast("double") / lit(2.0)),
          1L).otherwise(0L)).as("n_outliers"))
      .select(col("grp"),
        (col("__m2").cast("double") / lit(2.0)).as("med"),
        (col("__m4").cast("double") / lit(4.0)).as("mad"),
        col("n_total"), col("n_outliers"),
        (col("n_outliers").cast("double") / col("n_total").cast("double"))
          .as("outlier_frac"))
  }

  /** Tukey-fence (boxplot-rule) outlier census by IQR — the OTHER robust
    * screen next to [[robustOutliers]]' median/MAD: quartiles instead of
    * MAD, so the fences are the ones every boxplot, dbt test, and EDA
    * notebook draws (inner fence 1.5×IQR, outer 3×IQR). Takes an INTEGER
    * metric (callers quantize — cents, counts) and computes the exact
    * interpolated quartiles from the [[groupedHist]] value histogram in
    * QUADRUPLED units: 4·q_f = 4·x_k + rem·(x_{k+1}−x_k) is an exact
    * long for every quartile (rem = ((n−1)·f) mod 4), so the fence tests
    * collapse to pure INTEGER comparisons — 8v ≶ 2·q4₁ − 3·iqr4 (inner)
    * and 4v ≶ q4₁ − 3·iqr4 (outer) — no double ever crosses the engine
    * boundary inside a flag. Reducer state is each group's
    * distinct-value count (the r9 VERDICT's unbounded exact-`percentile`
    * window buffer is gone). Reports per group: n, q1/med/q3/iqr (exact
    * quarter-integers, ÷4 is exact in binary), and the row counts
    * outside each fence; degenerate groups (IQR 0) report null fence
    * counts rather than flagging everything.
    *
    * Shape: one combinable histogram shuffle, one group-cardinality join
    * back (AQE-broadcast in the monitoring regime), one combinable
    * census aggregate. */
  def tukeyFences(df: DataFrame, group: Column, value: Column)
  : DataFrame = {
    val v = df.select(group.as("grp"), value.cast("long").as("__v"))
      .filter(col("__v").isNotNull)
    val cum = groupedHist(v, col("grp"), col("__v"))
    def kOf(f: Int) = expr(s"((__n - 1) * $f) div 4")
    val aggCols = Seq(1, 2, 3).flatMap { f =>
      Seq(min(when(col("__cum") > kOf(f), col("__v"))).as(s"__lo$f"),
        min(when(col("__cum") > kOf(f) + lit(1L), col("__v"))).as(s"__hi$f"))
    }
    val raw = cum.groupBy(col("grp"))
      .agg(max(col("__n")).as("__n"), aggCols: _*)
    def q4(f: Int) = {
      val rem = ((col("__n") - 1) * lit(f.toLong)) % lit(4L)
      when(rem === 0, col(s"__lo$f") * 4)
        .otherwise(col(s"__lo$f") * 4 +
          rem * (col(s"__hi$f") - col(s"__lo$f")))
    }
    val quart = raw.select(col("grp"),
      q4(1).as("__q41"), q4(2).as("__q42"), q4(3).as("__q43"))
    val iqr4 = col("__q43") - col("__q41")
    val inner = (col("__v") * 8 < col("__q41") * 2 - iqr4 * 3) ||
      (col("__v") * 8 > col("__q43") * 2 + iqr4 * 3)
    val outer = (col("__v") * 4 < col("__q41") - iqr4 * 3) ||
      (col("__v") * 4 > col("__q43") + iqr4 * 3)
    v.join(quart, "grp")
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("n"),
        max(col("__q41")).as("__a"), max(col("__q42")).as("__b"),
        max(col("__q43")).as("__c"),
        sum(when(inner, 1L).otherwise(0L)).as("__inner"),
        sum(when(outer, 1L).otherwise(0L)).as("__outer"))
      .select(col("grp"), col("n"),
        (col("__a").cast("double") / lit(4.0)).as("q1"),
        (col("__b").cast("double") / lit(4.0)).as("med"),
        (col("__c").cast("double") / lit(4.0)).as("q3"),
        ((col("__c") - col("__a")).cast("double") / lit(4.0)).as("iqr"),
        when(col("__c") > col("__a"), col("__inner")).as("n_outside_inner"),
        when(col("__c") > col("__a"), col("__outer")).as("n_outside_outer"))
  }

  /** Exact per-group least-squares trend over INTEGER (x, y) points —
    * the drift detector for per-day volumes, rates, and corpus-mix
    * monitoring. The five sufficient statistics (n, Σx, Σy, Σxy, Σx²)
    * accumulate as exact int64 sums — associative, so partial
    * aggregation order can never perturb the result the way a float
    * covariance accumulation (regr_slope's implementation) does — and
    * slope/intercept are single final double expressions.
    *
    * One combinable shuffle; output is one row per group. Groups with a
    * degenerate x spread (denominator 0) are dropped rather than
    * emitting an engine-dependent inf/NaN. */
  def trend(points: DataFrame, group: Column, x: Column,
            y: Column): DataFrame = {
    val s = points.select(group.as("grp"), x.cast("long").as("__x"),
        y.cast("long").as("__y"))
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("n"),
        sum(col("__x")).as("sx"), sum(col("__y")).as("sy"),
        sum(col("__x") * col("__y")).as("sxy"),
        sum(col("__x") * col("__x")).as("sxx"))
    val nD = col("n").cast("double")
    val sxD = col("sx").cast("double")
    val denom = nD * col("sxx").cast("double") - sxD * sxD
    val slope = (nD * col("sxy").cast("double") -
      sxD * col("sy").cast("double")) / denom
    s.filter(denom =!= 0.0)
      .select(col("grp"), col("n"), slope.as("slope"),
        ((col("sy").cast("double") - slope * sxD) / nD).as("intercept"))
  }

  /** Distribution drift between two slices of a corpus (snapshot A vs
    * snapshot B, last week vs this week): per group, the total-variation
    * distance TVD = ½·Σ_bins |p_A − p_B| and the worst single bin
    * L∞ = max_bins |p_A − p_B| over a fixed equi-width histogram.
    * TVD ∈ [0,1]: 0 = identical histograms, 1 = disjoint support — the
    * drift alarm for corpus-mix monitoring between crawl snapshots.
    *
    * Exactness discipline: p_A − p_B is put over the common denominator
    * n_A·n_B, so every per-bin term is the INTEGER |c_A·n_B − c_B·n_A| —
    * products taken at decimal(18,0)×decimal(18,0) (exact to 10^18 rows,
    * and the 37-digit result is in-range for both engines' decimal
    * rules), summed exactly, divided by 2·n_A·n_B in ONE final double
    * expression. A float Σ|p−q| would hash-differ by summation order;
    * this never can.
    *
    * Shape: one combinable groupBy(group, bin) with conditional counts
    * (the period split is a map-side when(), not a join), a per-group
    * total agg joined back (no forced broadcast — AQE sizes it at
    * runtime, so unbounded group counts degrade to a shuffle join
    * instead of a driver OOM; SCALE.md "Group-cardinality joins"), one
    * combinable per-group reduce. Histogram width is fixed, so shuffle
    * volume is groups × bins regardless of corpus size. */
  /** Clamped equi-width histogram bin, shared by [[driftTvd]] and the
    * streaming drift monitor. NULL-PRESERVING by explicit guard: Spark's
    * `least`/`greatest` SKIP null arguments, so the raw clamp chain
    * would route a null value into the top bin instead of propagating
    * null — a null-heavy feed would read as "mass moved to the top bin".
    * NaN gets the same treatment (floor(NaN)=NaN and the non-ANSI
    * NaN→int cast is 0, which would silently route NaN into bin 0 —
    * and the DuckDB twin ERRORS on that cast, so a NaN-bearing feed
    * would break cross-engine parity). Callers drop the null bins (a
    * null or NaN value is a missing measurement, not a drifted one). */
  def histBin(value: Column, lo: Double, binWidth: Double,
              nBins: Int): Column = {
    require(binWidth > 0 && nBins > 0, "need binWidth > 0 and nBins > 0")
    when(value.isNotNull && !isnan(value.cast("double")),
      greatest(least(floor((value - lit(lo)) / lit(binWidth))
        .cast("int"), lit(nBins - 1)), lit(0)))
  }

  def driftTvd(df: DataFrame, group: Column, inB: Column, value: Column,
               lo: Double, binWidth: Double, nBins: Int): DataFrame = {
    val bin = histBin(value, lo, binWidth, nBins)
    val b = df.select(group.as("grp"), inB.as("__b"), bin.as("__bin"))
      .filter(col("__bin").isNotNull)
      .groupBy(col("grp"), col("__bin"))
      .agg(sum(when(!col("__b"), 1L).otherwise(0L)).as("ca"),
        sum(when(col("__b"), 1L).otherwise(0L)).as("cb"))
    val tot = b.groupBy(col("grp"))
      .agg(sum(col("ca")).as("na"), sum(col("cb")).as("nb"))
    val dec = (c: String) => col(c).cast("decimal(18,0)")
    val term = abs(dec("ca") * dec("nb") - dec("cb") * dec("na"))
    val naD = col("na").cast("double")
    val nbD = col("nb").cast("double")
    // Groups seen in only one slice are dropped (0/0): TVD needs a
    // sample from BOTH sides; "new group appeared" is q62's census job.
    b.join(tot, "grp")
      .filter(col("na") > 0 && col("nb") > 0)
      .groupBy(col("grp"))
      .agg(max(col("na")).as("na"), max(col("nb")).as("nb"),
        count(lit(1)).as("n_bins"),
        sum(term).as("__num"), max(term).as("__max"))
      .select(col("grp"), col("na"), col("nb"), col("n_bins"),
        (col("__num").cast("double") / ((lit(2.0) * naD) * nbD)).as("tvd"),
        (col("__max").cast("double") / (naD * nbD)).as("linf"))
  }

  /** One-pass column profile — the ingest-time data-quality census
    * (row/null/distinct counts, numeric min/max) for every listed
    * column. The table unpivots map-side (`stack` — a projection, not a
    * shuffle or N scans) into (column, value) rows, then ONE combinable
    * aggregate per column computes all stats; profiling N columns costs
    * one scan + one bounded shuffle regardless of N.
    *
    * Values travel as strings (the only type all columns share);
    * distinct counting is injective per engine so counts agree, and
    * numeric min/max re-parse via try_cast — non-numeric columns
    * profile as null min/max instead of erroring.
    *
    * The distinct count is a manual two-level aggregate — (column,
    * value) counts, then per-column rollup — rather than
    * `countDistinct` beside the plain aggregates, which would make
    * Catalyst Expand-duplicate every unpivoted row once per aggregate
    * family (~2× the shuffle volume, 1.9s→0.75s measured at sf0.1). */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val args = cols.flatMap(c => Seq(lit(c), col(c).cast("string")))
    df.select(stack(lit(cols.length) +: args: _*)
        .as(Seq("column_name", "__val")))
      .groupBy(col("column_name"), col("__val"))
      .agg(count(lit(1)).as("__c"))
      .groupBy(col("column_name"))
      .agg(sum(col("__c")).as("n_rows"),
        sum(when(col("__val").isNull, col("__c")).otherwise(0L))
          .as("n_nulls"),
        count(col("__val")).as("n_distinct"),
        min(expr("try_cast(__val AS double)")).as("min_num"),
        max(expr("try_cast(__val AS double)")).as("max_num"))
  }

  /** Rolling distinct actives — DAU / trailing-W-day WAU / stickiness
    * per day, the engagement staple. Sliding DISTINCT counting can't use
    * a window frame at scale (`size(collect_set() over range)` holds
    * every active user in window state per row; count(DISTINCT) over
    * windows isn't supported at all): instead each (actor, day) activity
    * CONTRIBUTES to the W days it keeps the actor active in — a
    * map-side ×W explode of the deduped activity table (not raw
    * events), then one combinable distinct-count per day. Trailing days
    * past the corpus edge are dropped (their windows are still open).
    *
    * stickiness = DAU/WAU ∈ [1/W, 1]: how much of the weekly audience
    * shows up on a given day. Counts exact; one final division. */
  def rollingActives(events: DataFrame, actor: Column, ts: Column,
                     windowDays: Int): DataFrame = {
    require(windowDays > 0, "windowDays must be positive")
    val act = events.select(actor.as("__actor"), to_date(ts).as("__day"))
      .distinct()
    val dau = act.groupBy(col("__day").as("day"))
      .agg(countDistinct(col("__actor")).as("dau"))
    val maxDay = act.agg(max(col("__day")).as("__md"))
    act.select(col("__actor"), explode(sequence(col("__day"),
        date_add(col("__day"), windowDays - 1))).as("day"))
      .crossJoin(broadcast(maxDay))
      .filter(col("day") <= col("__md"))
      .groupBy(col("day"))
      .agg(countDistinct(col("__actor")).as("wau"))
      .join(dau, Seq("day"), "left")
      .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
        coalesce(col("dau"), lit(0L)).as("dau"), col("wau"),
        (coalesce(col("dau"), lit(0L)).cast("double") /
          col("wau").cast("double")).as("stickiness"))
  }

  /** Key-skew diagnostic — the measure-before-you-salt report for a
    * prospective join/aggregation key: the top-k heaviest keys with
    * their share of the table, plus the global skew ratio
    * (max key count) / (mean key count). A ratio near 1 means uniform
    * (plain hash partitioning is fine); 10×+ on a hot key is the
    * signature that a shuffle on this key stragglers — reach for
    * saltedJoin / AQE skew split. All counts exact int64; share and
    * ratio are single final divisions.
    *
    * One combinable key-count shuffle; the global stats are a 1-row
    * aggregate OF THE COUNT TABLE (not a second corpus pass) and the
    * top-k is TakeOrderedAndProject — no global sort. */
  def skewReport(df: DataFrame, key: Column, topK: Int): DataFrame = {
    require(topK > 0, "topK must be positive")
    val counts = df.select(key.as("key_val"))
      .groupBy(col("key_val")).agg(count(lit(1)).as("cnt"))
    val stats = counts.agg(count(lit(1)).as("n_keys"),
      sum(col("cnt")).as("n_rows"), max(col("cnt")).as("max_cnt"))
    counts.orderBy(col("cnt").desc, col("key_val")).limit(topK)
      .crossJoin(broadcast(stats))
      .select(col("key_val"), col("cnt"),
        (col("cnt").cast("double") / col("n_rows").cast("double"))
          .as("share"),
        col("n_keys"), col("n_rows"),
        ((col("max_cnt").cast("double") * col("n_keys").cast("double")) /
          col("n_rows").cast("double")).as("skew_ratio"))
  }

  /** Contingency table with expected counts and standardized residuals —
    * the categorical-association screen (which (row, col) cells are
    * over/under-represented vs independence). Per cell: observed count,
    * expected = rowTotal·colTotal/N, residual = (o − e)/√e; |residual|
    * beyond ~3 flags a dependent cell (the per-cell view of a χ²
    * test — the TOTAL χ² is deliberately not emitted: summing float
    * terms across cells would be partial-agg-order dependent, while
    * every per-cell value here is a single deterministic expression
    * over exact integer counts).
    *
    * One combinable (row, col) count shuffle; marginals are two
    * rollups of the cell table joined back (AQE-sized — category
    * domains are small in practice, but an unbounded domain must not
    * force a driver-side broadcast; SCALE.md "Group-cardinality
    * joins") — the corpus is scanned and shuffled once. The grand
    * total stays a 1-row broadcast: bounded by construction. */
  def contingency(df: DataFrame, rowC: Column, colC: Column): DataFrame = {
    val cells = df.select(rowC.as("r"), colC.as("c"))
      .groupBy(col("r"), col("c")).agg(count(lit(1)).as("observed"))
    val rt = cells.groupBy(col("r")).agg(sum(col("observed")).as("__nr"))
    val ct = cells.groupBy(col("c")).agg(sum(col("observed")).as("__nc"))
    val tt = cells.agg(sum(col("observed")).as("__nn"))
    val e = (col("__nr").cast("double") * col("__nc").cast("double")) /
      col("__nn").cast("double")
    cells.join(rt, "r").join(ct, "c")
      .crossJoin(broadcast(tt))
      .select(col("r"), col("c"), col("observed"), e.as("expected"),
        ((col("observed").cast("double") - e) / sqrt(e)).as("residual"))
  }

  /** First-order Markov transition matrix over per-actor event
    * sequences — the "where do users go next" flow analysis behind
    * Sankey dashboards and session-flow mining. Per actor, events order
    * by (ts, tiebreak); each consecutive (state → next) pair counts
    * once; P(next | state) is the pair count over the from-state's
    * out-degree.
    *
    * `tiebreak` must make the per-actor order TOTAL (an event-id);
    * same-timestamp events would otherwise transition in
    * partition-dependent order and the counts would not be
    * deterministic, let alone oracle-stable.
    *
    * Scale: one actor-keyed exchange for the lead() window, one
    * combinable (state, next) count shuffle; the from-state totals are
    * a rollup OF THE PAIR-COUNT table (state-cardinality², tiny)
    * rejoined AQE-sized — the event corpus is scanned and shuffled
    * once per stage, never held in window state beyond one row. */
  def transitionMatrix(events: DataFrame, actor: Column, ts: Column,
                       state: Column, tiebreak: Column): DataFrame = {
    val w = Window.partitionBy(col("__a"))
      .orderBy(col("__us"), col("__tb"))
    val pairs = events.select(actor.as("__a"), unix_micros(ts).as("__us"),
        tiebreak.as("__tb"), state.as("from_state"))
      .withColumn("to_state", lead(col("from_state"), 1).over(w))
      .filter(col("to_state").isNotNull)
      .groupBy(col("from_state"), col("to_state"))
      .agg(count(lit(1)).as("n"))
    val outDeg = pairs.groupBy(col("from_state"))
      .agg(sum(col("n")).as("n_from"))
    pairs.join(outDeg, "from_state")
      .select(col("from_state"), col("to_state"), col("n"), col("n_from"),
        (col("n").cast("double") / col("n_from").cast("double")).as("p"))
  }

  /** k-step absorption probability over the behavioral Markov chain —
    * "what is the chance a user in state s converts within `steps`
    * transitions?", the forward-looking question [[transitionMatrix]]'s
    * one-step probabilities feed. The absorbing state's probability is
    * pinned at 1; everything else iterates
    * pₖ(s) = (Σₜ c(s,t)·pₖ₋₁(t)) div out(s) in SCALED INTEGERS
    * (probabilities in 1/scale units, floor division — the pageRank
    * discipline, so k rounds are exact, order-independent, and the
    * oracle unrolls them CTE-for-CTE; each round loses < 1 scale unit to
    * the floor).
    *
    * Scale: one corpus window+count builds the transition table
    * (states² rows); the k rounds then join state-cardinality frames —
    * corpus-independent. */
  def absorptionProbability(events: DataFrame, actor: Column, ts: Column,
                            state: Column, tiebreak: Column,
                            absorbing: String, steps: Int,
                            scale: Long = 1000000000L,
                            driverFoldMaxStates: Int =
                              DriverFoldMaxStates): DataFrame = {
    require(steps >= 1 && steps <= 16, s"steps in [1,16], got $steps")
    val w = Window.partitionBy(col("__a"))
      .orderBy(col("__us"), col("__tb"))
    val pairs = events.select(actor.as("__a"), unix_micros(ts).as("__us"),
        tiebreak.as("__tb"), state.as("from_state"))
      .withColumn("to_state", lead(col("from_state"), 1).over(w))
      .filter(col("to_state").isNotNull)
      // transitions out of the absorbing state don't exist in the model
      .filter(col("from_state") =!= absorbing)
      .groupBy(col("from_state"), col("to_state"))
      .agg(count(lit(1)).as("n"))
      .localCheckpoint()
    val states = pairs.select(col("from_state").as("state"))
      .union(pairs.select(col("to_state"))).distinct()
      .localCheckpoint()
    // The k rounds run over STATE-cardinality frames (states² transition
    // rows — the behavioral state space is a domain constant, not a
    // corpus dimension). As distributed joins each round cost ~4 stages
    // of pure scheduling on a handful of rows (measured 1.6 s of which
    // the corpus window was ~0.4 s — r17, guide §5 driver/latency): so
    // when the state space is verifiably tiny the rounds fold
    // DRIVER-SIDE on BigInt in the exact same pₖ(s) = (Σₜ c(s,t) ·
    // pₖ₋₁(t)) div out(s) arithmetic (floor division on nonnegative
    // integers — BigInt / replicates `div`; Σ n·p fits trivially). The
    // bounded collect is the kmeansTrainLocal class: states² rows,
    // guarded, with the distributed loop kept as the fallback for a
    // state space past the guard.
    val outDeg = pairs.groupBy(col("from_state"))
      .agg(sum(col("n")).as("n_from"))
    val pairRows = pairs
      .limit(driverFoldMaxStates * driverFoldMaxStates + 1).collect()
    if (pairRows.length <= driverFoldMaxStates * driverFoldMaxStates) {
      val trans = pairRows.map(r =>
        (r.getString(0), r.getString(1), r.getLong(2))).toSeq
      val stateList = (trans.map(_._1) ++ trans.map(_._2)).distinct.sorted
      val out = trans.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
      var pk: Map[String, BigInt] = stateList.map(st =>
        st -> (if (st == absorbing) BigInt(scale) else BigInt(0))).toMap
      for (_ <- 1 to steps) {
        val mass = trans.groupBy(_._1).view.mapValues(ts =>
          ts.map { case (_, to, n) => BigInt(n) * pk(to) }.sum).toMap
        pk = stateList.map { st =>
          st -> (if (st == absorbing) BigInt(scale)
                 else mass.get(st).map(_ / BigInt(out(st))).getOrElse(BigInt(0)))
        }.toMap
      }
      val session = events.sparkSession
      import scala.jdk.CollectionConverters._
      val rows = stateList.map { st =>
        val p = pk(st).toLong
        org.apache.spark.sql.Row(st, p, p.toDouble / scale.toDouble)
      }
      session.createDataFrame(rows.asJava,
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("state",
            org.apache.spark.sql.types.StringType, nullable = true),
          org.apache.spark.sql.types.StructField("p_absorb_scaled",
            org.apache.spark.sql.types.LongType, nullable = false),
          org.apache.spark.sql.types.StructField("p_absorb",
            org.apache.spark.sql.types.DoubleType, nullable = false))))
    } else {
      def pinned(p: DataFrame): DataFrame =
        p.withColumn("p", when(col("state") === absorbing, scale)
          .otherwise(col("p")))
      var pk = pinned(states.withColumn("p", lit(0L)))
      for (_ <- 1 to steps) {
        val mass = pairs
          .join(pk.select(col("state").as("to_state"), col("p")), "to_state")
          .groupBy(col("from_state"))
          // decimal product: Σ n·p reaches transitions×scale, past int64
          // on a large corpus (the pageRank overflow-guard class)
          .agg(sum(col("n").cast("decimal(38,0)") *
            col("p").cast("decimal(38,0)")).as("__m"))
          .join(outDeg, "from_state")
          .select(col("from_state").as("state"),
            expr("CAST(__m div n_from AS BIGINT)").as("p"))
        pk = pinned(states
          .join(mass, Seq("state"), "left")
          .select(col("state"), coalesce(col("p"), lit(0L)).as("p")))
      }
      pk.select(col("state"), col("p").as("p_absorb_scaled"),
        (col("p").cast("double") / lit(scale).cast("double"))
          .as("p_absorb"))
    }
  }

  /** Driver-fold guard for [[absorptionProbability]]: the state space a
    * behavioral Markov chain runs over is a domain constant (event
    * types); past this many states the rounds stay distributed. */
  private val DriverFoldMaxStates = 64

  /** Pairwise audience overlap between segments — |A∩B|, |A|, |B| and
    * Jaccard for every segment pair, the "which cohorts are the same
    * people" screen (segments = event types, traffic sources, feature
    * flags). Works on the DEDUPED (segment, actor) membership table:
    * actors join to themselves across segments, so a pair's
    * intersection counts each shared actor once.
    *
    * Scale: membership dedup is one combinable shuffle; the self-join
    * is keyed on the ACTOR, and its fan-out per actor is
    * (segments-the-actor-is-in choose 2) — bounded by the segment
    * count squared, NOT by corpus size. Segment sizes are a tiny
    * rollup of the membership table rejoined twice (AQE-sized).
    * Jaccard's denominator derives as |A|+|B|−|A∩B| — no union pass
    * exists. The `a < b` ordering emits each unordered pair once. */
  def audienceOverlap(events: DataFrame, actor: Column,
                      segment: Column): DataFrame = {
    val m = events.select(segment.as("seg"), actor.as("__actor")).distinct()
    val sizes = m.groupBy(col("seg")).agg(count(lit(1)).as("size"))
    val inter = m.select(col("seg").as("seg_a"), col("__actor"))
      .join(m.select(col("seg").as("seg_b"), col("__actor")), "__actor")
      .filter(col("seg_a") < col("seg_b"))
      .groupBy(col("seg_a"), col("seg_b"))
      .agg(count(lit(1)).as("n_both"))
    inter
      .join(sizes.select(col("seg").as("seg_a"), col("size").as("n_a")),
        "seg_a")
      .join(sizes.select(col("seg").as("seg_b"), col("size").as("n_b")),
        "seg_b")
      .select(col("seg_a"), col("seg_b"), col("n_a"), col("n_b"),
        col("n_both"),
        (col("n_both").cast("double") /
          (col("n_a") + col("n_b") - col("n_both")).cast("double"))
          .as("jaccard"))
  }

  /** Per-group equal-frequency (quantile) binning — ntile over a TOTAL
    * per-group order, the feature-engineering discretizer (quartile /
    * decile features, score bands). Emits the per-(group, bin) census:
    * row count and value range. `tiebreak` totalizes the order the
    * same way [[transitionMatrix]] requires: equal values must bin
    * deterministically or two runs disagree on boundary rows.
    *
    * Scale: one exchange on the group + in-partition sort (ntile needs
    * the group's rows ranked — the q72/q76 bounded-group monitoring
    * regime, documented trade); the bin census is a combinable
    * follow-up aggregate on the SAME key, so the exchange is reused. */
  def quantileBins(df: DataFrame, group: Column, value: Column,
                   tiebreak: Column, nBins: Int): DataFrame = {
    require(nBins > 0, "nBins must be positive")
    val w = Window.partitionBy(col("grp")).orderBy(col("__v"), col("__tb"))
    df.select(group.as("grp"), value.as("__v"), tiebreak.as("__tb"))
      .filter(col("__v").isNotNull)
      .withColumn("bin", ntile(nBins).over(w))
      .groupBy(col("grp"), col("bin"))
      .agg(count(lit(1)).as("n"), min(col("__v")).as("lo"),
        max(col("__v")).as("hi"))
  }

  /** Day-of-week seasonal deviation — each (group, day)'s event count
    * against the group's same-weekday baseline, the "is this Monday
    * abnormal for a Monday" screen that a flat daily average gets
    * wrong on any weekly-cyclic stream. ratio = cnt·n_dowdays/dow_total
    * stays on the common denominator (exact int64 numerator, ONE final
    * double division — the q79/q83 exactness discipline).
    *
    * Scale: one combinable (group, day) count shuffle (already
    * days×groups-sized), a tiny (group, dow) rollup of THAT table
    * rejoined AQE-sized; the event corpus is scanned once. */
  def seasonalDeviation(events: DataFrame, ts: Column,
                        group: Column): DataFrame = {
    val daily = events.select(group.as("grp"), to_date(ts).as("__day"))
      .groupBy(col("grp"), col("__day"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("dow", dayofweek(col("__day")))
    val base = daily.groupBy(col("grp"), col("dow"))
      .agg(sum(col("cnt")).as("dow_total"), count(lit(1)).as("n_dowdays"))
    daily.join(base, Seq("grp", "dow"))
      .select(col("grp"),
        date_format(col("__day"), "yyyy-MM-dd").as("day"),
        col("dow"), col("cnt"), col("dow_total"), col("n_dowdays"),
        ((col("cnt") * col("n_dowdays")).cast("double") /
          col("dow_total").cast("double")).as("dow_ratio"))
  }

  /** Exact per-group WEIGHTED median over integer values and weights —
    * the corpus statistic a plain median gets wrong whenever rows carry
    * unequal mass (the canonical use: weight = token count, so the
    * median is the value experienced by the median TOKEN, matching the
    * token-uniform sampling story). Lower weighted median: the smallest
    * value whose cumulative weight reaches half the total
    * (2·cumw ≥ tot — integer comparison, no division, no float).
    *
    * `tiebreak` totalizes the order ([[transitionMatrix]] discipline):
    * equal values must accumulate deterministically or the boundary
    * pick is partition-dependent.
    *
    * Scale: ONE exchange on the group — the running sum, the partition
    * total, and the min-pick all share the same partition spec (the
    * q72 bounded-group trade for exact order statistics; sketches
    * cover unbounded groups). */
  def weightedMedian(df: DataFrame, group: Column, value: Column,
                     weight: Column, tiebreak: Column): DataFrame = {
    val ord = Window.partitionBy(col("grp"))
      .orderBy(col("__v"), col("__tb"))
    val all = Window.partitionBy(col("grp"))
    df.select(group.as("grp"), value.cast("long").as("__v"),
        weight.cast("long").as("__w"), tiebreak.as("__tb"))
      .filter(col("__v").isNotNull && col("__w").isNotNull &&
        col("__w") > 0)
      .withColumn("__cum", sum(col("__w"))
        .over(ord.rowsBetween(Window.unboundedPreceding,
          Window.currentRow)))
      .withColumn("__tot", sum(col("__w")).over(all))
      .filter(col("__cum") * 2 >= col("__tot"))
      .groupBy(col("grp"))
      .agg(min(struct(col("__v"), col("__tb"))).getField("__v")
          .as("weighted_median"),
        max(col("__tot")).as("total_weight"))
  }

  /** Last-activity churn census — bucket every actor by how many days
    * before the corpus's last day they were last seen (the lifecycle
    * funnel: active / cooling / churned). The horizon is the DATA's max
    * day, not wall clock, so the census is reproducible and
    * backfill-safe. Bucket edges are inclusive lower bounds in
    * `edges` (sorted ascending, implicit 0 start): edges = [7, 14] →
    * "0" [0,7), "7" [7,14), "14" [14,∞).
    *
    * Scale: one combinable groupBy(actor) max-day pass; the global max
    * day travels by 1-row broadcast; the census is bucket-cardinality
    * rows. */
  def churnCensus(events: DataFrame, actor: Column, ts: Column,
                  edges: Seq[Int]): DataFrame = {
    require(edges.nonEmpty && edges == edges.sorted && edges.head > 0,
      "edges must be ascending positive day offsets")
    val last = events.select(actor.as("__actor"), to_date(ts).as("__day"))
      .groupBy(col("__actor")).agg(max(col("__day")).as("last_day"))
    val maxDay = last.agg(max(col("last_day")).as("__md"))
    val gap = datediff(col("__md"), col("last_day"))
    // Ascending fold so the LARGEST edge's branch sits outermost —
    // each when() shadows everything folded before it.
    val bucket = edges.foldLeft(lit(0)) { (acc, e) =>
      when(gap >= e, lit(e)).otherwise(acc)
    }
    last.crossJoin(broadcast(maxDay))
      .groupBy(bucket.as("gap_bucket"))
      .agg(count(lit(1)).as("n_actors"),
        min(gap).as("min_gap"), max(gap).as("max_gap"))
  }

  /** Exact CUSUM series per group: the classic changepoint signal
    * C_d = Σ_{k≤d} (y_k − μ) over INTEGER observations, where μ is the
    * group mean. A float running sum would be engine-dependent (DuckDB's
    * windowed SUM accumulates via a segment tree — different addition
    * order than a sequential scan), so the series stays on the common
    * denominator n: C_d = (n·Σ_{k≤d} y_k − rank_d·T) / n with an exact
    * int64 numerator and one final double division.
    *
    * One per-group total joined back (AQE-sized, no forced broadcast —
    * SCALE.md "Group-cardinality joins") + one window over the
    * PRE-AGGREGATED series (one row per (group, x) — the q72/q76
    * bounded-group monitoring regime, not raw events). */
  def cusum(points: DataFrame, group: Column, x: Column,
            y: Column): DataFrame = {
    val p = points.select(group.as("grp"), x.as("x"),
      y.cast("long").as("y"))
    val tot = p.groupBy(col("grp"))
      .agg(sum(col("y")).as("__t"), count(lit(1)).as("__n"))
    val w = Window.partitionBy(col("grp")).orderBy(col("x"))
    p.join(tot, "grp")
      .withColumn("__rs", sum(col("y"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("__rk", row_number().over(w).cast("long"))
      .select(col("grp"), col("x"), col("y"),
        ((col("__n") * col("__rs") - col("__rk") * col("__t"))
          .cast("double") / col("__n").cast("double")).as("cusum"))
  }

  /** Mann–Whitney rank-sum test (normal approximation, tie-corrected):
    * did treatment `b`'s values stochastically dominate `a`'s? The
    * nonparametric two-sample test — no normality assumption, robust to
    * the heavy tails that invalidate a t-test on revenue-like measures.
    *
    * Exactness discipline (hash-oracle-safe): average ranks are exact
    * rationals (min-rank + (t−1)/2 — halves are exact doubles), R1/U1
    * stay INTEGER-scaled (2·R1 is an int64) until the final z, and the
    * tie-corrected variance is assembled from exact int64 tie sums with a
    * FIXED division/sqrt sequence both engines replay bit-identically
    * (+, −, ×, /, sqrt are all correctly rounded IEEE ops — the formula
    * avoids libm entirely).
    *
    * Scale: ranking is ONE window sort over the filtered two-sample
    * series; tie sums and group counts are combinable aggregates off the
    * same pass. Output is one row. The window is a single global sort of
    * n1+n2 measurements — the test is for comparing bounded experiment
    * samples; for corpus-scale distribution monitoring use [[driftTvd]]
    * (binned, no global sort). */
  def rankSumTest(df: DataFrame, sample: Column, value: Column,
                  a: String, b: String): DataFrame = {
    val p = df.select(sample.as("__s"), value.as("__v"))
      .filter(col("__s").isin(a, b) && col("__v").isNotNull)
    // rank() = min rank of the tie group; + count-of-ties − 1 over 2
    // gives the average rank. Doubled to stay integral: 2·avgrank.
    val wv = Window.orderBy(col("__v"))
    val ranked = p
      .withColumn("__minrk", rank().over(wv).cast("long"))
      .withColumn("__ties", count(lit(1))
        .over(Window.partitionBy(col("__v"))).cast("long"))
      .withColumn("__r2", lit(2L) * col("__minrk") + col("__ties") - 1L)
    ranked.agg(
        sum(when(col("__s") === a, 1L).otherwise(0L)).as("__n1"),
        sum(when(col("__s") === b, 1L).otherwise(0L)).as("__n2"),
        sum(when(col("__s") === a, col("__r2"))).as("__2r1"),
        // Σ (t³ − t) over distinct tie groups: each tied row contributes
        // t² − 1 (its group's t³−t spread over t rows) — combinable, no
        // second pass over distinct values.
        sum(col("__ties") * col("__ties") - 1L).as("__tcorr"))
      .select(col("__n1").as("n1"), col("__n2").as("n2"),
        ((col("__2r1") - col("__n1") * (col("__n1") + 1L))
          .cast("double") / lit(2.0)).as("u1"),
        col("__tcorr").as("tie_term"))
      .withColumn("mu",
        col("n1").cast("double") * col("n2").cast("double") / lit(2.0))
      .withColumn("sigma", sqrt(
        col("n1").cast("double") * col("n2").cast("double") / lit(12.0)
          * ((col("n1") + col("n2") + 1L).cast("double")
            - col("tie_term").cast("double")
              / ((col("n1") + col("n2")).cast("double")
                * (col("n1") + col("n2") - 1L).cast("double")))))
      .withColumn("z", (col("u1") - col("mu")) / col("sigma"))
      .select(col("n1"), col("n2"), col("u1"), col("z"))
  }

  /** Exact per-group Pearson correlation from INTEGER sufficient
    * statistics — the [[trend]] discipline applied to r: both inputs
    * must already be integer-scaled (cast fixed-point measures to their
    * smallest integer unit at the call site), so the five sums are exact
    * int64s immune to partial-aggregation order, unlike the built-in
    * `corr` whose float accumulation is partition-nondeterministic — on
    * a 1000-executor shuffle the same query returns different low bits
    * run to run, which poisons hash-verification and regression-diffing
    * alike.
    *
    * The final assembly computes n·Σxy − Σx·Σy (and both variance
    * analogues) in DECIMAL(38,0) — exact at any row count whose products
    * fit 38 digits (10^9 rows of 10^6-unit measures: ~10^23 ≪ 10^38) —
    * then ONE double cast each and the fixed /, sqrt, × sequence, so the
    * result is bit-identical across engines and partitionings.
    *
    * ONE combinable shuffle; output one row per group. Degenerate groups
    * (zero variance in either variable) return null r via an explicit
    * guard — constancy is "correlation undefined", not "uncorrelated",
    * and the guard keeps the NaN/Inf of an IEEE 0-denominator division
    * (engine-representation-dependent in exported parquet) out of the
    * result entirely. */
  /** Two-sample Kolmogorov–Smirnov D statistic per group — the
    * distribution-level companion to [[rankSumTest]] (which tests
    * location shift; KS sees ANY distributional difference: shape,
    * spread, tails). D = max_x |F_a(x) − F_b(x)| evaluated at the
    * pooled sample's step points.
    *
    * Exactness: D is carried as the INTEGER numerator
    * max |cum_a·n_b − cum_b·n_a| (the CDFs' common-denominator form) —
    * the only double is one final division, so the statistic
    * hash-verifies. No p-value on purpose: it needs exp/ln, the one op
    * family the engines' math libraries may round apart (the q41/q87
    * monotone-surrogate discipline); the exact (d_num, n_a·n_b) pair IS
    * the sufficient statistic a caller thresholds.
    *
    * Scale: one combinable (group, value) count shuffle — the windows
    * then run over the DISTINCT-VALUE table, not raw rows; same
    * bounded-group windowed regime as [[rankSumTest]] (one sort per
    * group, value-cardinality rows). Corpus-scale drift monitoring at
    * unbounded cardinality belongs to [[driftTvd]]'s binned path. */
  def ksTest(df: DataFrame, group: Column, sample: Column, value: Column,
             a: String, b: String): DataFrame = {
    val p = df.select(group.as("__g"), sample.as("__s"), value.as("__v"))
      .filter(col("__g").isNotNull && col("__v").isNotNull &&
        col("__s").isin(a, b))
    val vc = p.groupBy(col("__g"), col("__v"))
      .agg(sum(when(col("__s") === a, 1L).otherwise(0L)).as("__ca"),
        sum(when(col("__s") === b, 1L).otherwise(0L)).as("__cb"))
    val wcum = Window.partitionBy(col("__g")).orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wtot = Window.partitionBy(col("__g"))
    vc
      .withColumn("__cuma", sum(col("__ca")).over(wcum))
      .withColumn("__cumb", sum(col("__cb")).over(wcum))
      .withColumn("__na", sum(col("__ca")).over(wtot))
      .withColumn("__nb", sum(col("__cb")).over(wtot))
      .groupBy(col("__g"))
      .agg(min(col("__na")).as("n_a"), min(col("__nb")).as("n_b"),
        max(abs(col("__cuma") * col("__nb") - col("__cumb") * col("__na")))
          .as("d_num"))
      .filter(col("n_a") > 0 && col("n_b") > 0)
      .select(col("__g").as("grp"), col("n_a"), col("n_b"), col("d_num"),
        (col("d_num").cast("double") /
          (col("n_a") * col("n_b")).cast("double")).as("d"))
  }

  /** Last-touch marketing attribution: each conversion is credited to
    * the SAME actor's most recent touch event within `lookbackMicros`,
    * or to the "unattributed" bucket when no touch precedes it closely
    * enough — the standard position-based credit assignment (first-touch
    * is the mirror with `first(...)` over the same frame).
    *
    * One merge-scan: touches and conversions ride a single actor-keyed
    * sort (`last(..., ignoreNulls)` over a running frame carries the
    * latest touch forward), so there is NO self-join of conversions
    * against touches. Ordering is totalized by (ts, tie) so a touch and
    * a conversion in the same microsecond resolve deterministically;
    * the frame includes the current row safely because the scan ENFORCES
    * touch/conversion disjointness — a row matching `isConversion` has
    * its touch channel nulled, so overlapping caller predicates cannot
    * make a conversion credit itself.
    *
    * Scale: one actor exchange + sort (the [[TimeOps.sessionize]]
    * regime, per-actor event counts bounded), one combinable channel
    * aggregate; attributed value sums exactly in DECIMAL and exports
    * one double. */
  def lastTouchAttribution(events: DataFrame, actor: Column, ts: Column,
                           tie: Column, touchChannel: Column,
                           isConversion: Column, convValue: Column,
                           lookbackMicros: Long): DataFrame = {
    val ev = events.select(actor.as("__a"), unix_micros(ts).as("__us"),
        tie.as("__tie"),
        when(isConversion, lit(null)).otherwise(touchChannel).as("__ch"),
        isConversion.as("__conv"), convValue.as("__val"))
      .filter(col("__a").isNotNull)
    val w = Window.partitionBy(col("__a"))
      .orderBy(col("__us"), col("__tie"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ev.withColumn("__lt",
        last(when(col("__ch").isNotNull,
          struct(col("__us").as("tus"), col("__ch").as("ch"))),
          ignoreNulls = true).over(w))
      .filter(col("__conv"))
      .select(
        when(col("__lt").isNotNull &&
          col("__us") - col("__lt.tus") <= lookbackMicros, col("__lt.ch"))
          .otherwise(lit("unattributed")).as("channel"),
        col("__val"))
      .groupBy(col("channel"))
      .agg(count(lit(1)).as("n_conversions"),
        sum(col("__val").cast("decimal(18,4)")).cast("double")
          .as("attributed_value"))
  }

  /** Kaplan–Meier survival curve over actor lifetimes — the standard
    * censoring-aware retention estimator: each actor's lifetime runs
    * from its first to its last active tick (`tick` is any integer time
    * coordinate — hours/days/weeks since epoch — chosen by the caller to
    * match the corpus's churn granularity); an actor last seen within
    * `censorTicks` of the corpus horizon is CENSORED at its observed
    * duration (it may still be alive — counting it as churned is the
    * classic downward bias naive retention curves have), everyone else
    * churned at its last-seen duration. For each observed duration t:
    * n_at_risk = actors surviving ≥ t, and
    * S(t) = Π_{s ≤ t} (1 − d_s/n_s) over churn events — censored exits
    * reduce the at-risk set without reducing survival.
    *
    * Determinism: each factor is one exact-int double division, and the
    * product folds LEFT-TO-RIGHT over the duration-ordered collected
    * list (the [[graft.operators.TimeOps]] EWMA discipline) — a
    * multiplicative window aggregate would be at the mercy of the
    * engine's frame evaluation order; exp(Σ ln) would be at libm's.
    *
    * Scale: one combinable groupBy(actor) over the corpus, a 1-row
    * horizon broadcast, then EVERYTHING downstream operates on the
    * duration-cardinality table (≤ observation-window ticks — corpus-
    * independent), where the two global windows (reverse running sum,
    * ordered collect) sort tens of rows on one task by design. */
  def kaplanMeier(events: DataFrame, actor: Column, tick: Column,
                  censorTicks: Int): DataFrame = {
    val base = events.select(actor.as("__a"), tick.cast("int").as("__tk"))
      .filter(col("__a").isNotNull && col("__tk").isNotNull)
    val sp = base.groupBy(col("__a"))
      .agg(min(col("__tk")).as("__f"), max(col("__tk")).as("__l"))
    // Horizon = max tick over the EVENT scan, not max(__l) over the actor
    // table: same value (max of per-actor maxes), but a map-side partial
    // max + 1-row exchange instead of re-running the actor aggregation —
    // the plan keeps exactly ONE actor-keyed exchange (plan-asserted).
    val h = base.agg(max(col("__tk")).as("__hmax"))
    val churned = col("__l") < col("__hmax") - censorTicks
    val du = sp.crossJoin(broadcast(h))
      .select(
        when(churned, col("__l") - col("__f") + 1)
          .otherwise(col("__hmax") - col("__f") + 1).as("t"),
        when(churned, 1L).otherwise(0L).as("__died"))
    val tb = du.groupBy(col("t"))
      .agg(sum(col("__died")).as("d"), sum(lit(1L) - col("__died")).as("c"))
    val wDesc = Window.orderBy(col("t").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAsc = Window.orderBy(col("t").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tb
      .withColumn("n", sum(col("d") + col("c")).over(wDesc))
      .withColumn("__hist", collect_list(
        struct(col("d").cast("double").as("d"),
          col("n").cast("double").as("n"))).over(wAsc))
      .select(col("t").as("duration"), col("n").as("n_at_risk"),
        col("d").as("n_churned"), col("c").as("n_censored"),
        aggregate(col("__hist"), lit(1.0), (acc, x) =>
          acc * (lit(1.0) - x.getField("d") / x.getField("n")))
          .as("survival"))
  }

  /** Association rules over unordered baskets (Agrawal & Srikant's
    * support/confidence/lift frame, pair rules only — the market-basket
    * "customers who bought X also bought Y"): for every co-occurring
    * item pair above `minCount` baskets, both directed rules a→b and
    * b→a with support = c_ab/N, confidence = c_ab/c_a, and
    * lift = c_ab·N/(c_a·c_b). [[graft.operators.TextOps]]'
    * collocationLift ranks ORDERED bigrams inside a sequence; this
    * ranks UNORDERED co-membership of a set — the two halves of
    * co-occurrence mining.
    *
    * Scale: membership is deduped to distinct (basket, item) first, so
    * pair fan-out is per-basket items², bounded by basket width — the
    * [[audienceOverlap]] posture, never corpus². Pair counts and item
    * counts are combinable; N travels as a 1-row broadcast; every ratio
    * is ONE exact-int double division, so rule metrics hash-verify.
    * Output: (antecedent, consequent, n_pair, n_ante, support,
    * confidence, lift), minCount-pruned BEFORE the rule expansion so
    * the long tail of singleton pairs never doubles. */
  def associationRules(df: DataFrame, basket: Column, item: Column,
                       minCount: Long): DataFrame = {
    // Persisted: four plan branches read the deduped membership (the
    // basket count, the item marginals, and BOTH self-join aliases —
    // whose canonicalized subtrees differ, so ReusedExchange cannot
    // share them); uncached, each branch replays the scan + distinct
    // shuffle. Session-cache lifecycle (plan-keyed; the harness clears
    // between rounds), the q109 pair-scan posture.
    val m = df.select(basket.as("__b"), item.as("__i"))
      .filter(col("__b").isNotNull && col("__i").isNotNull).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = m.select(col("__b")).distinct().agg(count(lit(1)).as("__n"))
    val ic = m.groupBy(col("__i")).agg(count(lit(1)).as("__ci"))
    val pairs = m.as("x").join(m.as("y"),
        col("x.__b") === col("y.__b") && col("x.__i") < col("y.__i"))
      .groupBy(col("x.__i").as("__a"), col("y.__i").as("__c"))
      .agg(count(lit(1)).as("__cab"))
      .filter(col("__cab") >= minCount)
    rulesFromCooccurrence(pairs, n, ic)
  }

  /** [[associationRules]]' scoring tail over an ALREADY-COUNTED
    * canonical pair table (`__a < __c`, `__cab` = co-basket count,
    * min-count already applied) — the entry point for callers whose
    * co-occurrence counts live in a maintained artifact (the bucketed
    * co-purchase table) instead of being re-derived by a per-query
    * self-join. `n` is the 1-row basket count; `ic` the per-item
    * basket-membership marginals. */
  def rulesFromCooccurrence(pairs: DataFrame, n: DataFrame,
                            ic: DataFrame): DataFrame = {
    val rules = pairs.select(col("__a"), col("__c"), col("__cab"))
      .union(pairs.select(col("__c").as("__a"), col("__a").as("__c"),
        col("__cab")))
    rules
      .join(ic.select(col("__i").as("__a"), col("__ci").as("__ca")), "__a")
      .join(ic.select(col("__i").as("__c"), col("__ci").as("__cc")), "__c")
      .crossJoin(broadcast(n))
      .select(col("__a").as("antecedent"), col("__c").as("consequent"),
        col("__cab").as("n_pair"), col("__ca").as("n_ante"),
        (col("__cab").cast("double") / col("__n").cast("double"))
          .as("support"),
        (col("__cab").cast("double") / col("__ca").cast("double"))
          .as("confidence"),
        ((col("__cab") * col("__n")).cast("double")
          / (col("__ca") * col("__cc")).cast("double")).as("lift"))
  }

  /** Per-group standard-score normalization census — the z-score feature
    * scaler with the [[correlation]] determinism discipline: `value`
    * arrives integer-scaled, so per-group (n, Σx, Σx²) are exact int64
    * partials; mean and the SAMPLE variance (n−1) assemble in
    * DECIMAL(38,0) with one double cast each and a fixed /, sqrt
    * sequence. Each row's z = (x − mean)/sd is then one deterministic
    * double expression, computed by REJOINING the K-row stats table to
    * the rows (AQE picks broadcast vs shuffle on the actual group count
    * — no driver-side hint to OOM on a high-cardinality caller).
    *
    * Emits the census, not the scaled corpus: per group n, mean, sd,
    * min/max z (extremes are order-insensitive double aggregates) and
    * the |z| > 2 and > 3 tail counts — the "is this feature scalable /
    * how heavy are its tails" report. Groups with sd = 0 (or n < 2)
    * report null z fields: constancy is "scale undefined", the
    * correlation guard again. The scaled rows themselves are one
    * `.withColumn` on the joined frame any caller can keep instead. */
  def standardize(df: DataFrame, group: Column, value: Column): DataFrame = {
    val D = "decimal(38,0)"
    val p = df.select(group.as("grp"), value.cast("long").as("__x"))
      .filter(col("__x").isNotNull)
    // Σx² accumulates in DECIMAL(38,0): a single |x| ≈ 3e9 already puts
    // x² past int64 (9e18 > 2⁶³−1), which under ANSI throws mid-aggregate
    // where the oracle's hugeint is exact. Decimal sums of exact ints are
    // exact, so results are bit-identical where int64 sufficed.
    val stats = p.groupBy(col("grp"))
      .agg(count(lit(1)).as("n"), sum(col("__x").cast(D)).as("__sx"),
        sum(col("__x").cast(D) * col("__x").cast(D)).as("__sxx"))
      .select(col("grp"), col("n"),
        (col("__sx").cast("double") / col("n").cast("double")).as("mean"),
        when(col("n") > 1L,
          sqrt((col("n").cast(D) * col("__sxx").cast(D)
            - col("__sx").cast(D) * col("__sx").cast(D)).cast("double")
            / (col("n").cast(D) * (col("n") - 1L).cast(D))
              .cast("double"))).as("sd"))
    p.join(stats, "grp")
      .withColumn("__z", when(col("sd") > 0.0,
        (col("__x").cast("double") - col("mean")) / col("sd")))
      .groupBy(col("grp"))
      .agg(first(col("n")).as("n"), first(col("mean")).as("mean"),
        first(col("sd")).as("sd"),
        min(col("__z")).as("min_z"), max(col("__z")).as("max_z"),
        sum(when(abs(col("__z")) > 2.0, 1L).otherwise(0L)).as("n_gt2"),
        sum(when(abs(col("__z")) > 3.0, 1L).otherwise(0L)).as("n_gt3"))
  }

  def correlation(df: DataFrame, group: Column, x: Column,
                  y: Column): DataFrame = {
    val D = "decimal(38,0)"
    val p = df.select(group.as("grp"), x.cast("long").as("__x"),
        y.cast("long").as("__y"))
      .filter(col("__x").isNotNull && col("__y").isNotNull)
    // Cross/square products in DECIMAL(38,0) before summing — same
    // overflow posture as [[standardize]]: |x| ≈ 3e9 breaks int64 on a
    // single product; decimal keeps the sufficient statistics exact.
    p.groupBy(col("grp"))
      .agg(count(lit(1)).as("n"),
        sum(col("__x").cast(D)).as("__sx"), sum(col("__y").cast(D)).as("__sy"),
        sum(col("__x").cast(D) * col("__x").cast(D)).as("__sxx"),
        sum(col("__y").cast(D) * col("__y").cast(D)).as("__syy"),
        sum(col("__x").cast(D) * col("__y").cast(D)).as("__sxy"))
      .select(col("grp"), col("n"),
        (col("n").cast(D) * col("__sxy").cast(D)
          - col("__sx").cast(D) * col("__sy").cast(D)).cast("double")
          .as("__num"),
        (col("n").cast(D) * col("__sxx").cast(D)
          - col("__sx").cast(D) * col("__sx").cast(D)).cast("double")
          .as("__dx"),
        (col("n").cast(D) * col("__syy").cast(D)
          - col("__sy").cast(D) * col("__sy").cast(D)).cast("double")
          .as("__dy"))
      .select(col("grp"), col("n"),
        when(col("__dx") > 0.0 && col("__dy") > 0.0,
          col("__num") / (sqrt(col("__dx")) * sqrt(col("__dy"))))
          .as("r"))
  }

  /** Cohen's kappa inter-labeler agreement: chance-corrected agreement
    * between two categorical label columns (two annotators, a heuristic
    * vs a declared label, model vs gold) — the label-quality gate run
    * before trusting either labeler for filtering or eval. κ = (p_o −
    * p_e)/(1 − p_e), carried as EXACT integer numerator/denominator
    * (n·agree − Σ_l row_l·col_l over n² − Σ_l row_l·col_l) with ONE
    * double division at the end — a float p_o/p_e intermediate would
    * round before the subtraction.
    *
    * Scale: ONE corpus shuffle (the (a, b) pair count — combinable);
    * marginals, the agreement diagonal, and the expected-agreement sum
    * all derive from that label-vocab²-bounded pair table, never a
    * second corpus pass — the pair table is eagerly localCheckpointed
    * (bounded: |labels_A|×|labels_B| rows) because three plan branches
    * read it, and without the checkpoint each branch would replay the
    * corpus count. Output is one row. Degenerate census (p_e = 1: both
    * labelers constant and equal) yields κ = null, never 0/0. */
  def cohenKappa(df: DataFrame, labelA: Column, labelB: Column)
  : DataFrame = {
    val pc = df.select(labelA.as("a"), labelB.as("b"))
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("c"))
      .localCheckpoint()
    val tot = pc.agg(sum(col("c")).as("n"),
      sum(when(col("a") === col("b"), col("c")).otherwise(0L))
        .as("n_agree"))
    val ra = pc.groupBy(col("a").as("l")).agg(sum(col("c")).as("__r"))
    val cb = pc.groupBy(col("b").as("l")).agg(sum(col("c")).as("__c"))
    val pe = ra.join(cb, "l")
      .agg(coalesce(sum(col("__r") * col("__c")), lit(0L)).as("pe_num"))
    tot.crossJoin(broadcast(pe))
      .select(col("n").as("n_items"), col("n_agree"),
        (col("n_agree").cast("double") / col("n").cast("double"))
          .as("po"),
        col("pe_num"),
        (col("pe_num").cast("double")
          / (col("n") * col("n")).cast("double")).as("pe"),
        when(col("n") * col("n") =!= col("pe_num"),
          (col("n") * col("n_agree") - col("pe_num")).cast("double")
            / (col("n") * col("n") - col("pe_num")).cast("double"))
          .as("kappa"))
  }

  /** Multi-touch LINEAR attribution — [[lastTouchAttribution]]'s
    * equal-credit sibling: every touch in the conversion's lookback
    * window (strictly before it) shares the conversion's credit equally.
    * Credit is FIXED-POINT: each touch earns `scale div n_touches`
    * (exact integer division via the pmod identity, identical in both
    * engines; the ≤ n−1 remainder units are dropped — documented, never
    * redistributed nondeterministically), so channel credits are exact
    * long sums and ONE final division renders the double. Conversions
    * with no window touch credit 'unattributed' in full.
    *
    * Shape: touches probe the conversions' lookback intervals through
    * [[graft.operators.TimeOps.intervalJoin]] (equi join on (actor,
    * time-bin) — never an unbounded range join); per-(conversion,
    * channel) counts and the per-conversion total share one
    * conversion-keyed exchange; the no-touch remainder is a broadcast
    * anti-join on the credited-conversion id set. */
  def linearAttribution(events: DataFrame, actor: Column, ts: Column,
                        tie: Column, touchChannel: Column,
                        isConversion: Column, lookbackMicros: Long,
                        binWidthUs: Long,
                        scale: Long = 1000000000000L): DataFrame = {
    val ev = events.select(actor.as("__a"), ts.as("__ts"), tie.as("__tie"),
        touchChannel.as("__ch"), isConversion.as("__conv"))
      .filter(col("__a").isNotNull && col("__ts").isNotNull)
    val touches = ev.filter(!col("__conv") && col("__ch").isNotNull)
      .select(col("__a"), col("__ts"), col("__ch"))
    val convs = ev.filter(col("__conv"))
      .select(col("__a"), col("__tie").as("__cid"),
        timestamp_micros(unix_micros(col("__ts")) - lookbackMicros)
          .as("__start"),
        col("__ts").as("__end"))
    val joined = TimeOps.intervalJoin(touches, "__ts", convs,
      "__start", "__end", Seq("__a"), binWidthUs)
    val cc = joined.groupBy(col("__cid"), col("__ch"))
      .agg(count(lit(1)).as("__n"))
    val wc = Window.partitionBy(col("__cid"))
    val credited = cc.withColumn("__nt", sum(col("__n")).over(wc))
      .select(col("__ch"), col("__cid"), col("__n"),
        (col("__n") * ((lit(scale) - pmod(lit(scale), col("__nt"))) /
          col("__nt")).cast("long")).as("__fp"))
    val unattr = convs.join(
        broadcast(credited.select(col("__cid")).distinct()),
        Seq("__cid"), "left_anti")
      .select(lit("unattributed").as("__ch"), col("__cid"),
        lit(0L).as("__n"), lit(scale).as("__fp"))
    credited.unionByName(unattr)
      .groupBy(col("__ch").as("channel"))
      .agg(countDistinct(col("__cid")).as("n_conversions"),
        sum(col("__n")).as("n_touchpoints"),
        (sum(col("__fp")).cast("double") / lit(scale.toDouble))
          .as("credit"))
  }

  /** Wilson score interval for a proportion (Wilson 1927; the interval
    * Agresti–Coull approximates) — the error bar a rate census ships:
    * unlike the naive Wald interval it never leaves [0, 1] and behaves
    * at small n or extreme p. Deterministic by construction: counts are
    * exact longs, p is one int/int division, and the only non-arithmetic
    * op is `sqrt` (IEEE correctly-rounded everywhere); the expression
    * sequence is FIXED and mirrored token-for-token in the oracle.
    * Returns (lo, hi) columns for `s` successes of `n` trials. */
  def wilsonBounds(s: Column, n: Column, z: Double): (Column, Column) = {
    val zc = lit(z).cast("double")
    val zz = zc * zc
    val nd = n.cast("double")
    val p = s.cast("double") / nd
    val denom = lit(1.0) + zz / nd
    val center = p + zz / (lit(2.0) * nd)
    val margin = zc * sqrt((p * (lit(1.0) - p)) / nd +
      zz / ((lit(4.0) * nd) * nd))
    // The mathematical interval never leaves [0,1]; the FLOATING-POINT
    // one can dip an ulp outside at p ∈ {0, 1} (center−margin rounds to
    // −3e−17 at p=0). Clamp — mirrored in the oracle.
    (greatest((center - margin) / denom, lit(0.0)),
      least((center + margin) / denom, lit(1.0)))
  }

  /** Deterministic hash-bootstrap confidence band for a grouped integer
    * metric: `b` resamples where row r's replicate multiplicity in
    * resample i is `((aᵢ·h + bᵢ) mod P) mod 3` ∈ {0,1,2} over ONE
    * md5-prefix row hash h and the MinHash affine family
    * (aᵢ = 2i+1, bᵢ = 1000003·i, P = 2³¹−1) — mean 1, variance 2/3, a
    * bounded integer surrogate for the Poisson(1) multiplicity of the
    * classic online bootstrap (Oza & Russell 2001; a pure hash
    * expression, so every resample metric is an EXACT integer — no RNG
    * state, no float weights, partition-invariant, replayable). One md5
    * per ROW, not per (row, resample): the first cut hashed
    * "bs<i>:"+id per resample and the 32 digests per row made this the
    * single most expensive query in the suite (27s at sf0.1 → ~2s);
    * the affine re-mix preserves every stated property. Understates
    * spread by ~√(2/3); a census-grade error bar, not an inference
    * substitute.
    *
    * Shape (r17, guide §2.3 "aggregate before you shuffle"): the b
    * resample sums run as b SUM COLUMNS of ONE combinable
    * groupBy(group) — no ×b posexplode (the former shape pushed
    * b×corpus rows through the partial hash aggregate; the column form
    * updates b accumulators per probed row instead, ~b× fewer aggregate
    * probes for identical arithmetic) — then one map-side `stack`
    * unpivots the b-column group row into the (group, resample) table
    * the percentile step reads. Shuffle volume is unchanged (b values
    * per group either way) and every resample sum is the same exact
    * integer, so results are bit-identical. */
  def hashBootstrap(df: DataFrame, group: Column, id: Column,
                    value: Column, b: Int): DataFrame = {
    require(b >= 2, s"need >= 2 resamples, got $b")
    val h = TextOps.hash32(id.cast("string"))
    val wide = df.select(group.as("grp"), h.as("__h"),
        value.cast("long").as("__v"))
      .groupBy(col("grp"))
      .agg((0 until b).map(i =>
        sum(pmod(pmod(lit(DedupOps.aCoef(i)) * col("__h") +
          lit(DedupOps.bCoef(i)), lit(TextOps.HashPrime)),
          lit(3L)) * col("__v")).as(s"__m$i")).head,
        (1 until b).map(i =>
          sum(pmod(pmod(lit(DedupOps.aCoef(i)) * col("__h") +
            lit(DedupOps.bCoef(i)), lit(TextOps.HashPrime)),
            lit(3L)) * col("__v")).as(s"__m$i")): _*)
    val res = wide.select(col("grp"),
      expr(s"stack($b, " + (0 until b).map(i => s"$i, __m$i")
        .mkString(", ") + ") AS (__b, __m)"))
    res.groupBy(col("grp"))
      .agg(count(lit(1)).as("n_resamples"),
        percentile(col("__m"), lit(0.05)).as("p05"),
        percentile(col("__m"), lit(0.5)).as("p50"),
        percentile(col("__m"), lit(0.95)).as("p95"))
  }

  /** Concentration census: how concentrated are `unit`s within each
    * `group` — the mixture-health check a training-data pipeline runs
    * before a source-weighted sample (one dominant source inside a
    * language slice skews everything downstream). Per group: distinct
    * unit count, Herfindahl–Hirschman index (Σ shareᵢ², exact as the
    * integer Σnᵢ² over N²), its inverse (the "effective number of
    * units"), and the top unit's share. All rationals over integer
    * counts — entropy is deliberately NOT used (data-dependent `ln` has
    * no cross-engine rounding guarantee; 1/HHI carries the same signal).
    *
    * Shape: one combinable groupBy(group, unit), one combinable
    * groupBy(group) rollup — shuffle volume is the (group, unit) domain,
    * never corpus rows. Σnᵢ² in decimal(38,0): nᵢ up to 2³¹ squares past
    * int64. */
  def concentrationCensus(df: DataFrame, group: Column,
                          unit: Column): DataFrame = {
    val cnt = df.groupBy(group.as("grp"), unit.as("__u"))
      .agg(count(lit(1)).as("__n"))
    val dec = col("__n").cast("decimal(38,0)")
    cnt.groupBy(col("grp"))
      .agg(count(lit(1)).as("n_units"), sum(col("__n")).as("n_rows"),
        sum(dec * dec).as("__s2"), max(col("__n")).as("__top"))
      .select(col("grp"), col("n_units"), col("n_rows"),
        (col("__s2").cast("double") /
          (col("n_rows").cast("double") * col("n_rows").cast("double")))
          .as("hhi"),
        ((col("n_rows").cast("double") * col("n_rows").cast("double")) /
          col("__s2").cast("double")).as("eff_units"),
        (col("__top").cast("double") / col("n_rows").cast("double"))
          .as("top_share"))
  }

  /** Fleiss' kappa (Fleiss 1971) for a fixed panel of raters — the
    * chance-corrected agreement of the weak-supervision labeler panel
    * (the q148 vote only reports the OUTCOME; kappa reports whether the
    * raters agree beyond chance, the first diagnostic when a label model
    * underperforms). `labels` are the per-item rater verdicts (null =
    * abstain, modeled as its own category so every item keeps a full
    * panel of n = labels.size ratings, which the statistic requires).
    *
    * Everything reduces to three integer sums over items — N, S = ΣᵢΣⱼ
    * nᵢⱼ², and per-category column totals Cⱼ — assembled into kappa =
    * (3N(S−nN)·… ) with ONE double division at the end:
    *   P̄  = (S − nN) / (nN(n−1)),   Pₑ = ΣCⱼ² / (nN)²,
    *   κ  = (nN(S − nN) − (n−1)ΣCⱼ²) / ((n−1)((nN)² − ΣCⱼ²)).
    * Decimal(38,0) carries the products exactly (N ≤ 1e12 rows is still
    * inside 38 digits for N²·n²). Shape: one map-side projection of the
    * per-item category counts, one combinable global aggregate — a
    * single scan, no shuffle beyond the 1-row reduce. */
  def fleissKappa(df: DataFrame, labels: Seq[Column],
                  categories: Seq[String]): DataFrame = {
    require(labels.size >= 2, "kappa needs >= 2 raters")
    val n = labels.size
    // Per-item count of raters voting category c (null labels land in
    // the abstain category added below).
    def catCount(c: Option[String]): Column =
      labels.map { l =>
        val hit = c match {
          case Some(v) => l === lit(v)
          case None    => l.isNull
        }
        when(hit, 1).otherwise(0)
      }.reduce(_ + _)
    val cats = categories.map(Some(_)) :+ None
    val counted = df.select(cats.zipWithIndex.map { case (c, i) =>
      catCount(c).cast("decimal(38,0)").as(s"__c$i")
    }: _*)
    val sqSum = cats.indices.map(i => col(s"__c$i") * col(s"__c$i"))
      .reduce(_ + _)
    val agg = counted.agg(
      count(lit(1)).cast("decimal(38,0)").as("__N"),
      sum(sqSum).as("__S") +:
        cats.indices.map(i => sum(col(s"__c$i")).as(s"__t$i")): _*)
    val bigN = col("__N")
    val s = col("__S")
    val sumC2 = cats.indices.map(i => col(s"__t$i") * col(s"__t$i"))
      .reduce(_ + _)
    val nn = lit(n).cast("decimal(38,0)")
    val nN = nn * bigN
    agg.select(
      bigN.cast("long").as("n_items"), lit(n).as("n_raters"),
      ((s - nN).cast("double") /
        (nN * (nn - lit(1).cast("decimal(38,0)"))).cast("double"))
        .as("p_bar"),
      (sumC2.cast("double") / (nN * nN).cast("double")).as("p_e"),
      ((nN * (s - nN) - (nn - lit(1).cast("decimal(38,0)")) * sumC2)
        .cast("double") /
        ((nn - lit(1).cast("decimal(38,0)")) * (nN * nN - sumC2))
          .cast("double")).as("kappa"))
  }

  /** Exact lower discrete quantiles of an INTEGER metric, by value
    * histogram + cumulative count — the scalable global order statistic
    * (no global row sort: the shuffle is the value histogram and the
    * single-partition window runs over DISTINCT VALUES only, bounded by
    * the metric's value domain, not the corpus). Each requested rank is
    * an exact integer fraction num/den; the returned value is the
    * smallest v whose cumulative count reaches ⌈N·num/den⌉
    * (cum·den ≥ N·num — integer comparison, no division, the
    * [[weightedMedian]] discipline). Returns ONE row with a column per
    * requested name — built to crossJoin(broadcast(...)) back onto the
    * metric table. */
  def discreteQuantiles(df: DataFrame, value: Column,
                        qs: Seq[(String, Int, Int)]): DataFrame = {
    require(qs.nonEmpty && qs.forall { case (_, n, d) =>
      n >= 0 && d > 0 && n <= d }, s"ranks must be fractions in [0,1]: $qs")
    val ord = Window.orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val all = Window.partitionBy()
    val hist = df.select(value.cast("long").as("__v"))
      .filter(col("__v").isNotNull)
      .groupBy(col("__v")).agg(count(lit(1)).as("__c"))
      .withColumn("__cum", sum(col("__c")).over(ord))
      .withColumn("__n", sum(col("__c")).over(all))
    hist.agg(
      min(when(col("__cum") * qs.head._3 >= col("__n") * qs.head._2,
        col("__v"))).as(qs.head._1),
      qs.tail.map { case (name, num, den) =>
        min(when(col("__cum") * den >= col("__n") * num, col("__v")))
          .as(name)
      }: _*)
  }

  /** RFM (recency / frequency / monetary) segmentation — the classic
    * actor-lifecycle census: per actor, days since last event (against
    * the CORPUS's max day — reproducible, backfill-safe, the
    * [[churnCensus]] horizon), event count, and exact integer-cents
    * monetary total; each coded 1-4 against its own exact discrete
    * quartiles ([[discreteQuantiles]] — never an interpolated float
    * threshold, whose last-ulp placement differs across engines and
    * flips boundary actors); censused by (r, f, m) code cell.
    *
    * Scale: one combinable groupBy(actor), eagerly checkpointed — the
    * three quantile passes, the horizon, and the census all branch from
    * the actor table, and without the checkpoint each branch would
    * replay the corpus scan+aggregate (the q119/q137 lesson; the
    * materialization is actor-cardinality, far below corpus scale).
    * Each quartile table broadcasts back as one row; the census is ≤64
    * cells. Code direction is raw (low r_code = recent, high f/m_code =
    * heavy) — consumers label segments, the census just counts cells. */
  def rfmSegments(events: DataFrame, actor: Column, ts: Column,
                  value: Column): DataFrame = {
    val peractor = events
      .select(actor.as("__a"), unix_micros(ts).as("__us"),
        coalesce(value, lit(0.0)).as("__val"))
      .groupBy(col("__a"))
      .agg(max(col("__us")).as("__last"), count(lit(1)).as("f"),
        sum(floor(col("__val") * 100.0).cast("long")).as("m_cents"))
      .localCheckpoint()
    val horizon = peractor.agg(max(col("__last")).as("__h"))
    val u = peractor.crossJoin(broadcast(horizon))
      .withColumn("r_days",
        expr("(__h - __last) div 86400000000").cast("long"))
      .localCheckpoint()
    val quart = Seq(("q1", 1, 4), ("q2", 1, 2), ("q3", 3, 4))
    def codes(metric: String, out: String)(d: DataFrame): DataFrame = {
      val t = discreteQuantiles(u, col(metric), quart)
        .select(col("q1").as(s"__${out}1"), col("q2").as(s"__${out}2"),
          col("q3").as(s"__${out}3"))
      d.crossJoin(broadcast(t))
        .withColumn(out, lit(1) +
          when(col(metric) > col(s"__${out}1"), 1).otherwise(0) +
          when(col(metric) > col(s"__${out}2"), 1).otherwise(0) +
          when(col(metric) > col(s"__${out}3"), 1).otherwise(0))
    }
    val coded = codes("m_cents", "m_code")(
      codes("f", "f_code")(codes("r_days", "r_code")(u)))
    coded.groupBy(col("r_code"), col("f_code"), col("m_code"))
      .agg(count(lit(1)).as("n_actors"), sum(col("m_cents")).as("cell_cents"))
  }

  /** Per-group skewness and excess kurtosis of an integer metric from
    * EXACT shifted power sums — the distribution-shape census quality
    * monitoring runs beside [[profile]]'s min/max. Pass 1 takes each
    * group's integer mean floor c (one combinable aggregate); pass 2
    * accumulates Σyᵏ, k ≤ 4, for y = x − c in decimal(38,0) — the
    * shift keeps Σy⁴ ≤ n·range⁴ and every |Σy| ≤ n·range, far inside
    * width 38 at any corpus size (raw Σx⁴ terms like S1⁴ overflow 38
    * digits near n ≈ 1e10; the shift is what makes the op
    * 100-TB-safe). Central moments are shift-invariant, so the final
    * assembly — a SINGLE pinned-order double expression, the file's
    * oracle-parity discipline — is exact in the integers it starts
    * from:
    *   m2 = (n·S2 − S1²)/n²,
    *   m3 = (n²·S3 − 3n·S1·S2 + 2·S1³)/n³,
    *   m4 = (n³·S4 − 4n²·S1·S3 + 6n·S1²·S2 − 3·S1⁴)/n⁴,
    *   skew = m3/(m2·√m2), kurtosis_excess = m4/(m2·m2) − 3. */
  def shapeMoments(df: DataFrame, group: Column, value: Column): DataFrame = {
    val rows = df.select(group.as("grp"), value.cast("long").as("__x"))
      .filter(col("__x").isNotNull)
    val shift = rows.groupBy(col("grp"))
      .agg(expr("sum(__x) div count(1)").as("__c"))
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val y = dec(col("__x") - col("__c"))
    val agg = rows.join(shift, "grp")
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("n"), max(col("__c")).as("__cc"),
        sum(y).as("__s1"), sum(y * y).as("__s2"),
        sum(y * y * y).as("__s3"), sum(y * y * y * y).as("__s4"))
    val nD = col("n").cast("double")
    val (s1, s2, s3, s4) = (col("__s1").cast("double"),
      col("__s2").cast("double"), col("__s3").cast("double"),
      col("__s4").cast("double"))
    val m2 = (nD * s2 - s1 * s1) / (nD * nD)
    val m3 = (nD * nD * s3 - lit(3.0) * nD * s1 * s2 +
      lit(2.0) * s1 * s1 * s1) / (nD * nD * nD)
    val m4 = (nD * nD * nD * s4 - lit(4.0) * nD * nD * s1 * s3 +
      lit(6.0) * nD * s1 * s1 * s2 - lit(3.0) * s1 * s1 * s1 * s1) /
      (nD * nD * nD * nD)
    // A constant group has m2 = 0 exactly (integer sufficient stats), and
    // 0/0 is engine-divergent (Spark NaN vs whatever the twin does) — the
    // degenerate shape reads null on both sides, the q174/q175 guard
    // discipline.
    agg.select(col("grp"), col("n"),
      (col("__cc").cast("double") + s1 / nD).as("mean"),
      m2.as("m2"),
      when(m2 =!= 0.0, m3 / (m2 * sqrt(m2))).as("skewness"),
      when(m2 =!= 0.0, m4 / (m2 * m2) - lit(3.0)).as("kurtosis_excess"))
  }

  /** Exact Gini coefficient of a nonnegative INTEGER metric, from its
    * value histogram — the inequality complement to [[concentrationCensus]]
    * (HHI asks "how few units hold the mass"; Gini asks "how unevenly is
    * it spread across ALL units"). For a tied-value histogram (v, c) with
    * p units strictly below v, the sorted-rank identity
    * Σᵢ(2i−N−1)xᵢ collapses to Σ_v v·c·(2p + c − N) — exact decimal
    * integers via one cumulative-count window over DISTINCT values (the
    * [[discreteQuantiles]] shape: the single-partition window is
    * value-domain-bounded, never corpus-sized), one double division.
    * Returns (n_units, total, gini). */
  def giniCoefficient(df: DataFrame, value: Column): DataFrame = {
    val ord = Window.orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val all = Window.partitionBy()
    val D38 = "decimal(38,0)"
    val hist = df.select(value.cast("long").as("__v"))
      .filter(col("__v").isNotNull && col("__v") >= 0)
      .groupBy(col("__v")).agg(count(lit(1)).as("__c"))
      .withColumn("__cum", sum(col("__c")).over(ord))
      .withColumn("__n", sum(col("__c")).over(all))
    val p = (col("__cum") - col("__c")).cast(D38)
    val (v, c, n) = (col("__v").cast(D38), col("__c").cast(D38),
      col("__n").cast(D38))
    hist.agg(max(col("__n")).as("n_units"),
        sum(col("__v").cast(D38) * col("__c").cast(D38)).as("__s"),
        sum(v * c * (p * lit(2).cast(D38) + c - n)).as("__g"))
      .select(col("n_units"), col("__s").cast("long").as("total"),
        (col("__g").cast("double") /
          (col("n_units").cast("double") * col("__s").cast("double")))
          .as("gini"))
  }

  /** Winsorized mean per group — the robust location estimate a quality
    * census ships when a heavy tail would dominate a plain mean. Bounds
    * are DISCRETE order statistics (the value at integer rank
    * ⌊(n−1)·p/100⌋+1 under a total (value, tiebreak) order) rather than
    * interpolated quantiles: an interpolated bound is a data-dependent
    * float blend whose last-ulp behavior differs across engines, while a
    * rank is an integer and the value at it a corpus element. Values are
    * clamped to [lo, hi] and averaged exactly (decimal(18,4) sum — the
    * corpus's 2-decimal doubles are exact there — one double division).
    *
    * Shape: one window (rank + count per group), one combinable group
    * aggregate reading the bound values off their rank rows via
    * conditional max, one AQE-sized join back (groups × 1 rows), one
    * combinable clamped-sum aggregate. The per-group rank sort puts
    * each group's value multiset on one reducer — the q72/q76
    * bounded-group monitoring regime (documented trade: exact order
    * statistics for BOUNDED group cardinality; unbounded groups or a
    * global winsorize belong to the sketch path, q69/L88). */
  def winsorizedMean(df: DataFrame, group: Column, value: Column,
                     tiebreak: Seq[Column], pLo: Int, pHi: Int): DataFrame = {
    require(0 <= pLo && pLo < pHi && pHi <= 100, s"bad bounds $pLo/$pHi")
    val base = df.select(Seq(group.as("grp"), value.as("__v")) ++
        tiebreak.zipWithIndex.map { case (c, i) => c.as(s"__t$i") }: _*)
      .filter(col("__v").isNotNull)
    val w = Window.partitionBy(col("grp"))
      .orderBy(col("__v").asc +:
        tiebreak.indices.map(i => col(s"__t$i").asc): _*)
    val ranked = base.select(col("grp"), col("__v"),
      row_number().over(w).as("__rn"),
      count(lit(1)).over(Window.partitionBy(col("grp"))).as("__n"))
    // Integer division (SQL `div`, not Column `/` which is a double
    // Divide) — the rank must be an exact integer on both engines.
    val loRank = expr(s"(__n - 1) * $pLo div 100 + 1")
    val hiRank = expr(s"(__n - 1) * $pHi div 100 + 1")
    val bounds = ranked.groupBy(col("grp"))
      .agg(max(col("__n")).as("n"),
        max(when(col("__rn") === loRank, col("__v"))).as("lo"),
        max(when(col("__rn") === hiRank, col("__v"))).as("hi"))
    ranked.join(bounds, "grp")
      .groupBy(col("grp"))
      .agg(max(col("n")).as("n"), max(col("lo")).as("lo"),
        max(col("hi")).as("hi"),
        sum(greatest(least(col("__v"), col("hi")), col("lo"))
          .cast("decimal(18,4)")).as("__s"))
      .select(col("grp"), col("n"), col("lo"), col("hi"),
        (col("__s").cast("double") / col("n").cast("double"))
          .as("winsorized_mean"))
  }
}
