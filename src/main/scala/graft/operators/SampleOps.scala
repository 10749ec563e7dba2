package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling for the training-data pipeline: hash-Bernoulli
  * row sampling and per-stratum rate sampling.
  *
  * Spark's own `df.sample` is seed-stable only for a fixed partitioning —
  * repartition the input and the sample changes, and no external system
  * can reproduce it. Hashing a row's KEY instead makes the decision a pure
  * function of the data: reproducible across runs, partitionings, engines
  * (the DuckDB oracle computes the identical md5-prefix hash), and
  * incremental loads (a doc sampled today is sampled tomorrow).
  *
  * Scale posture: both operators are scan-local filters — zero shuffle,
  * pushdown-compatible, trivially parallel at any corpus size. The salt
  * decorrelates independent samples of the same corpus (use distinct salts
  * for train/validation splits so they are disjoint-ish by independence,
  * or rate-partition one salt for exact disjointness).
  */
object SampleOps {

  /** Sampling hash in [0, denom): md5-prefix of (salt || id). */
  def sampleBucket(id: Column, salt: String, denom: Int): Column =
    pmod(TextOps.hash32(concat(lit(salt), id.cast("string"))), lit(denom))

  /** Keep a deterministic `num`/`denom` fraction of rows, keyed by `id`.
    * Exactly the rows with sample bucket < num survive — so num=2000,
    * denom=10000 is a reproducible 20% sample, and buckets [0,1000) vs
    * [1000,2000) are EXACTLY disjoint sub-samples (split by bucket range
    * for leak-free train/validation partitions). */
  def hashSample(df: DataFrame, id: Column, num: Int, denom: Int,
                 salt: String): DataFrame = {
    require(denom > 0 && num >= 0 && num <= denom,
      s"need 0 <= num <= denom, got $num/$denom")
    df.filter(sampleBucket(id, salt, denom) < num)
  }

  /** L41: domain-mix rebalancing — downsample every stratum to the size
    * of the SMALLEST one, with acceptance rates DERIVED from the observed
    * counts rather than configured ([[stratifiedSample]] is the
    * fixed-rate form). The training-data staple: flatten a source/domain
    * distribution so one crawl doesn't drown the mix.
    *
    * rate(s) = floor(min_count * denom / count(s)) out of denom, computed
    * in exact-double arithmetic (counts ≪ 2^53) so the DuckDB oracle's
    * floor matches bit-for-bit; rows survive iff their [[sampleBucket]]
    * clears the stratum's rate — deterministic, partition-independent,
    * incremental-load-stable.
    *
    * Scale: two tiny aggregates (stratum cardinality rows) + a BROADCAST
    * join of the rate table back onto the corpus scan — no corpus
    * shuffle; the filter is scan-local.
    *
    * Rows with a NULL stratum are dropped (the inner rate join cannot
    * match them) — same policy as [[stratifiedSample]]'s unmapped-stratum
    * rate 0. */
  def rebalanceEqual(df: DataFrame, stratum: String, id: Column,
                     denom: Int = 1 << 20,
                     salt: String = "rebalance"): DataFrame = {
    require(denom > 0, "denom must be positive")
    val counts = df.groupBy(col(stratum)).agg(count(lit(1)).as("__n"))
    val target = counts.agg(min(col("__n")).as("__t"))
    val rates = counts.crossJoin(broadcast(target))
      .select(col(stratum),
        floor(col("__t").cast("double") * denom / col("__n").cast("double"))
          .cast("long").as("__num"))
    df.join(broadcast(rates), stratum)
      .filter(sampleBucket(id, salt, denom) < col("__num"))
      .drop("__num")
  }

  /** Weight-proportional deterministic sampling: keep a row with
    * probability `weight`/`denom`, where `weight` is an INTEGER column in
    * [0, denom] (clamp at the call site — the filter itself stays a pure
    * scan-local expression). The canonical use: weight = token count, so
    * sampled documents draw TOKENS uniformly (a plain doc-uniform sample
    * over-represents short docs' tokens). Same determinism contract as
    * [[hashSample]]: pure function of (salt, id), partition-independent,
    * incremental-load-stable, zero shuffle. */
  def weightedSample(df: DataFrame, id: Column, weight: Column,
                     denom: Int, salt: String): DataFrame = {
    require(denom > 0, "denom must be positive")
    df.filter(sampleBucket(id, salt, denom) < weight)
  }

  /** Epoch mixing — fractional UPSAMPLING, the other half of data mixing
    * (down-weighting is [[stratifiedSample]]/[[rebalanceEqual]]; training
    * mixes also REPEAT good sources, e.g. "3.2 epochs of wiki"):
    * `weightMilli` is the per-row repeat factor in 1/1000ths of an epoch;
    * every row emits floor(w/1000) copies plus one more with probability
    * (w mod 1000)/1000 — decided by the same deterministic row-key hash
    * as [[hashSample]], so the expected copy count is exactly w/1000 and
    * the realized mix is reproducible across runs, partitionings, and
    * engines. `copy_idx` distinguishes the copies so a downstream shuffle
    * can interleave epochs. Map-side explode: zero shuffle, amplification
    * exactly the mix ratio. Weights ≤ 0 drop the row (array_repeat of a
    * non-positive count is empty — never an error).
    *
    * `maxEpochs` bounds the per-row amplification: a row asking for more
    * than `maxEpochs` whole copies fails the job LOUDLY (raise_error)
    * instead of silently materializing a huge per-row array — a weight
    * column accidentally carrying raw token counts (say 10^6 "milli-
    * epochs") is a bug to surface, not a 1000-element array per row to
    * build (VERDICT r5). Sane training mixes repeat a source a handful of
    * times; raise the bound deliberately if a mix really needs more. */
  def epochMix(df: DataFrame, id: Column, weightMilli: Column,
               salt: String, maxEpochs: Int = 64): DataFrame = {
    require(maxEpochs > 0, "maxEpochs must be positive")
    require(!df.columns.contains("copy_idx"),
      "epochMix adds an output column copy_idx — rename the input's")
    // internal marker column: suffix until unused (dedupFirst convention)
    val one = Iterator.iterate("__one")(_ + "_").find(c =>
      !df.columns.contains(c)).get
    val rawBase = floor(weightMilli.cast("double") / 1000d).cast("int")
    // Guard inverted so a NULL weight stays null (CaseWhen treats a null
    // predicate as false): null copies → posexplode drops the row, the
    // documented pre-guard behavior — `rawBase <= max` as the keep-branch
    // would route null weights into raise_error and kill the job.
    val base = when(rawBase > lit(maxEpochs),
      raise_error(concat(
        lit(s"epochMix: weight exceeds maxEpochs=$maxEpochs ("),
        weightMilli.cast("string"), lit(" milli-epochs)"))).cast("int"))
      .otherwise(rawBase)
    val frac = pmod(weightMilli, lit(1000))
    val copies = base +
      when(sampleBucket(id, salt, 1000) < frac, 1).otherwise(0)
    df.select(df.columns.map(col) :+
      posexplode(array_repeat(lit(1), copies)).as(Seq("copy_idx", one)): _*)
      .drop(one)
  }

  /** Per-stratum sampling rates (e.g. downsample the dominant language,
    * keep the rare ones whole): `rates` maps stratum value → numerator
    * over `denom`; strata absent from the map are dropped (rate 0). The
    * rate lookup is a literal when-chain — codegen'd, no join, no
    * broadcast table to manage. */
  def stratifiedSample(df: DataFrame, stratum: Column, id: Column,
                       rates: Map[String, Int], denom: Int,
                       salt: String): DataFrame = {
    require(denom > 0, "denom must be positive")
    require(rates.values.forall(n => n >= 0 && n <= denom),
      "every rate numerator must be in [0, denom]")
    val rateCol = rates.toSeq.sortBy(_._1)
      .foldLeft(lit(0)) { case (acc, (k, n)) =>
        when(stratum === k, lit(n)).otherwise(acc) }
    df.filter(sampleBucket(id, salt, denom) < rateCol)
  }

  /** L52: EXACT fixed-size deterministic sample per stratum — the k rows
    * with the smallest sampling hashes (bottom-k). Rate sampling
    * ([[hashSample]]) gives binomial sizes; eval sets, few-shot pools,
    * and per-domain probes need exactly k. Bottom-k by a key hash is
    * deterministic, partition-independent, AND mergeable:
    * bottom-k(A ∪ B) = bottom-k(bottom-k(A) ∪ bottom-k(B)), so disjoint
    * shards/incremental loads update the sample from k-row summaries
    * without rescanning old data — the bottom-k sketch (Cohen & Kaplan,
    * PODS '07).
    *
    * Skew posture — the same two-level salted shape as the q63 inverted
    * index: each (stratum, salt) group keeps its k smallest (hash, id)
    * pairs, so a hot stratum spreads over `saltCount` reducers instead
    * of sorting on one task; the per-stratum merge then sorts
    * ≤ saltCount·k pairs. The global k smallest always live inside the
    * union of the per-salt k smallest. Salting by the sampling hash
    * itself keeps the fan-out uniform even when ids are skewed. (hash,
    * id) struct ordering makes the selection total under hash
    * collisions. Rows with a null id are dropped (no stable identity =
    * no stable sample); a null stratum forms its own sampled group.
    *
    * Output: (stratum, sample_id, sample_hash), ≤ k rows per stratum
    * (fewer only when the stratum has fewer rows). */
  def bottomKSample(df: DataFrame, stratum: Column, id: Column, k: Int,
                    saltCount: Int, seed: String): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    require(saltCount > 0, s"saltCount must be positive, got $saltCount")
    df.filter(id.isNotNull)
      .select(stratum.as("stratum"), id.as("__id"),
        TextOps.hash32(concat(lit(seed), id.cast("string"))).as("__h"))
      .groupBy(col("stratum"), pmod(col("__h"), lit(saltCount)).as("__salt"))
      .agg(slice(sort_array(collect_list(struct(col("__h"), col("__id")))),
        1, k).as("__p"))
      .groupBy(col("stratum"))
      .agg(slice(sort_array(flatten(collect_list(col("__p")))), 1, k)
        .as("__top"))
      .select(col("stratum"), explode(col("__top")).as("__e"))
      .select(col("stratum"), col("__e.__id").as("sample_id"),
        col("__e.__h").as("sample_hash"))
  }

  /** Per-stratum percentile calibration filter: keep rows whose `score`
    * sits at or above the `minPct` percent-rank WITHIN their stratum —
    * the curation step that makes one quality bar comparable across
    * domains (an absolute threshold tuned on web text silently drops
    * most of a code or academic domain; rank-normalizing per source asks
    * "top X% of ITS OWN distribution" instead).
    *
    * percent_rank = (rank − 1) / (n − 1) with min-rank ties, so exact
    * score ties share a fate (all kept or all dropped — no arbitrary
    * member split). A single-row stratum ranks 0.0 by convention (both
    * engines agree), so any minPct > 0 DROPS it — guard rare strata with
    * a size floor upstream if they must survive. The division is one
    * int/int IEEE op — the keep set replays identically in the oracle.
    *
    * One exchange on the stratum + an in-partition sort; the filter is a
    * predicate on the window output, so downstream aggregations keyed on
    * the stratum REUSE the exchange. The q72/q76 bounded-group trade:
    * strata are sources/domains (bounded cardinality), each stratum's
    * rows land whole on a reducer — for unbounded strata or skewed
    * mega-strata, cut at approx_percentile cutpoints instead (sketch,
    * mergeable, no per-stratum sort). */
  def percentileFilter(df: DataFrame, stratum: Column, score: Column,
                       minPct: Double): DataFrame = {
    require(minPct >= 0.0 && minPct <= 1.0,
      s"minPct must be in [0, 1], got $minPct")
    df.withColumn("score_pct", percent_rank().over(
        Window.partitionBy(stratum).orderBy(score)))
      .filter(col("score_pct") >= minPct)
  }

  /** Leakage-safe train/validation/test split: the split decision hashes
    * the near-dup CLUSTER canonical, not the row id, so every member of a
    * duplicate cluster lands in the SAME split. Splitting by row id leaks
    * — a benchmark answer's near-duplicate in train inflates eval exactly
    * like the verbatim copy would ([[graft.operators.DedupOps]] exists to
    * stop); group-aware splitting is the standard fix (GroupKFold).
    *
    * `labels` is the (node, label) cluster assignment; unclustered rows
    * are their own group. Buckets: [[sampleBucket]] of the canonical over
    * `denom`, cut at `valLo` and `testLo` — train = [0, valLo),
    * validation = [valLo, testLo), test = [testLo, denom). Same
    * determinism contract as [[hashSample]]: pure function of
    * (salt, canonical), so the assignment is reproducible across runs,
    * engines, and incremental loads — and a NEW near-dup of an existing
    * test doc automatically joins the test split (its cluster's
    * canonical, hence its bucket, is unchanged).
    *
    * One left join against the label table (pair-graph-sized, broadcast
    * at typical dup rates) + a scan-local hash — no corpus shuffle. */
  def leakageSplit(df: DataFrame, id: Column, labels: DataFrame,
                   node: String, label: String, salt: String,
                   denom: Int = 10, valLo: Int = 8,
                   testLo: Int = 9): DataFrame = {
    require(0 < valLo && valLo <= testLo && testLo <= denom,
      s"need 0 < valLo <= testLo <= denom, got $valLo/$testLo/$denom")
    val lab = labels.select(col(node).as("__node"),
      col(label).as("__label"))
    df.join(broadcast(lab), id === col("__node"), "left")
      .withColumn("split_group", coalesce(col("__label"), id))
      .withColumn("__bucket",
        sampleBucket(col("split_group"), salt, denom))
      .withColumn("split",
        when(col("__bucket") < valLo, "train")
          .when(col("__bucket") < testLo, "validation")
          .otherwise("test"))
      .drop("__node", "__label", "__bucket")
  }

  /** Walk-forward split label with an EMBARGO gap (time-series
    * GroupKFold): 'test' at/after `testStartMicros`, 'embargo' in the
    * `embargoMicros` window just before it (dropped from training so
    * near-boundary temporal leakage — features computed over windows
    * that straddle the cutoff — cannot contaminate), 'train' strictly
    * before the embargo. A pure map-side expression (the caller derives
    * `testStartMicros`, typically from a 1-row max-ts aggregate
    * broadcast — the churnCensus horizon shape, so the split is
    * reproducible and backfill-safe). */
  def temporalSplitLabel(tsMicros: Column, testStartMicros: Column,
                         embargoMicros: Long): Column = {
    require(embargoMicros >= 0, s"embargoMicros $embargoMicros < 0")
    when(tsMicros >= testStartMicros, lit("test"))
      .when(tsMicros >= testStartMicros - lit(embargoMicros),
        lit("embargo"))
      .otherwise(lit("train"))
  }

  /** Census of a [[temporalSplitLabel]] split: per-split event and
    * distinct-actor counts, plus `n_leaked_actors` — actors active in
    * BOTH train and test. The time embargo blocks boundary-window
    * leakage but NOT actor-level leakage (an actor's early behavior
    * predicts its own later behavior); this census reports that
    * residual so the caller can decide between a time split and a
    * [[leakageSplit]]-style actor split.
    *
    * Scale: ONE labeled corpus pass into one combinable actor-keyed
    * aggregate (per-actor per-split counts); event totals, distinct
    * actors, and the leak count all derive from that actor-cardinality
    * table, and the three split rows unpivot map-side from its 1-row
    * rollup — a separate groupBy(split) census would label and scan the
    * corpus a second time. Null actors count as events but never as
    * actors or leaks. Every split emits a row even when empty (fixed
    * report schema). */
  def temporalSplitCensus(df: DataFrame, tsMicros: Column, actor: Column,
                          testStartMicros: Column, embargoMicros: Long)
  : DataFrame = {
    val lab = df.select(
      temporalSplitLabel(tsMicros, testStartMicros, embargoMicros)
        .as("split"),
      actor.as("__a"))
    val perActor = lab.groupBy(col("__a")).agg(
      sum(when(col("split") === "train", 1L).otherwise(0L)).as("__tr"),
      sum(when(col("split") === "embargo", 1L).otherwise(0L)).as("__em"),
      sum(when(col("split") === "test", 1L).otherwise(0L)).as("__te"))
    def actors(c: Column) = coalesce(
      sum(when(col("__a").isNotNull && c > 0L, 1L).otherwise(0L)), lit(0L))
    val g = perActor.agg(
      coalesce(sum(col("__tr")), lit(0L)).as("__evtr"),
      coalesce(sum(col("__em")), lit(0L)).as("__evem"),
      coalesce(sum(col("__te")), lit(0L)).as("__evte"),
      actors(col("__tr")).as("__actr"),
      actors(col("__em")).as("__acem"),
      actors(col("__te")).as("__acte"),
      coalesce(sum(when(col("__a").isNotNull
          && col("__tr") > 0L && col("__te") > 0L, 1L).otherwise(0L)),
        lit(0L)).as("n_leaked_actors"))
    g.select(explode(array(
        struct(lit("train").as("split"), col("__evtr").as("n_events"),
          col("__actr").as("n_actors")),
        struct(lit("embargo").as("split"), col("__evem").as("n_events"),
          col("__acem").as("n_actors")),
        struct(lit("test").as("split"), col("__evte").as("n_events"),
          col("__acte").as("n_actors")))).as("__s"),
        col("n_leaked_actors"))
      .select(col("__s.split").as("split"), col("__s.n_events").as("n_events"),
        col("__s.n_actors").as("n_actors"), col("n_leaked_actors"))
  }

  /** Temperature-scaled source mixing weights at τ = 1/2 (the UniMax /
    * multilingual-sampling family, Chung et al. 2023, arXiv:2304.09151;
    * p_s ∝ n_s^τ): per-source token counts → sqrt weights → budget
    * allocation. τ = 1/2 is chosen because sqrt is IEEE
    * correctly-rounded in every engine — the one temperature whose
    * scores are bit-reproducible without a transcendental pow.
    *
    * The weight SUM is a float reduction, so it folds over the
    * group-sorted weight array in one fixed left-to-right order (the
    * sqlDot discipline) — deterministic regardless of partitioning; the
    * array is group-cardinality (sources), never corpus-sized. Output
    * per source: exact token/doc counts, weight, share, and the
    * floor(budget·share) token allocation. */
  def temperatureMixSqrt(docs: DataFrame, group: Column, sizeOf: Column,
                         budget: Long): DataFrame = {
    val g = docs.groupBy(group.as("grp"))
      .agg(count(lit(1)).as("n_docs"), sum(sizeOf).as("n_tokens"))
      .withColumn("weight", sqrt(col("n_tokens").cast("double")))
    val tot = g.agg(aggregate(
      array_sort(collect_list(struct(col("grp"), col("weight")))),
      lit(0.0), (acc, x) => acc + x.getField("weight")).as("__tw"))
    g.crossJoin(broadcast(tot))
      .select(col("grp"), col("n_docs"), col("n_tokens"), col("weight"),
        (col("weight") / col("__tw")).as("share"),
        floor(lit(budget) * (col("weight") / col("__tw"))).cast("long")
          .as("alloc_tokens"))
  }

  /** Greedy maximum-coverage source selection — the submodular data-
    * curation step (Nemhauser, Wolsey & Fisher 1978 give the (1−1/e)
    * guarantee the greedy enjoys; coverage/facility-location objectives
    * are the standard formulation for "which corpora buy the most
    * DIVERSITY per added source"). `pairs` is a (unit, item) relation —
    * e.g. source → distinct content shingle; each round selects the
    * unit adding the most NOT-YET-COVERED items, ties → min unit.
    * Returns one row per round: (round, unit, gain, covered_total).
    *
    * Scale posture: the covered-item set is corpus-scale and stays
    * DISTRIBUTED — per round one left_anti join against the persisted
    * (unit, item) relation plus one combinable count per unit; only the
    * single argmax row is collected per round (the BPE-argmax regime —
    * rounds × 1 row, never item data). Units with zero uncovered items
    * keep a 0-gain row via the unit-list left join, so the argmax is
    * total as long as any unit is unselected.
    *
    * The rounds run on a per-ITEM COVERING-SET CENSUS, not the raw
    * (unit, item) relation (r17, guide §2.3/§2.4): one shuffle groups
    * each item with its sorted set of covering units (collect_set — the
    * same exchange the former distinct paid, minus the duplicate rows).
    * An item is covered exactly when its unit set intersects the
    * selected set, and a unit's marginal gain is the count of uncovered
    * items whose set contains it — so every greedy round is one filter
    * + explode + combinable count over the cached census, instead of
    * the former per-round left_anti join against the pair relation plus
    * a per-round union/distinct/localCheckpoint of the covered-item
    * set (4 rounds paid ~20 jobs; now 1 small job each). The census is
    * item-cardinality like the old persisted relation — strictly fewer
    * rows (one per item, not one per pair). covered_total stays the
    * running gain sum (each gain counts exactly the items its pick
    * newly covers, so Σgains IS the distinct covered count). Exact
    * same greedy: gains and the (g desc, unit) tie-break are unchanged
    * (the PropertySpec driver-side reference pins it). */
  def greedyCoverageSelect(pairs: DataFrame, unit: Column, item: Column,
                           rounds: Int): DataFrame = {
    require(rounds >= 1 && rounds <= 64,
      s"greedyCoverageSelect: rounds=$rounds out of [1, 64] — each round " +
        "is a distributed pass; an unbounded loop is a driver hot loop")
    val spark = pairs.sparkSession
    // collect_set dedups (unit, item) pairs map-side; the census is one
    // row per ITEM carrying its sorted covering-unit set.
    val sig = pairs.select(unit.cast("string").as("u"), item.as("it"))
      .groupBy(col("it"))
      .agg(sort_array(collect_set(col("u"))).as("us"))
      .select(col("us"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val allUnits = sig.select(explode(col("us")).as("u")).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nUnits = allUnits.count() // one scalar; also materializes sig
    val selected = scala.collection.mutable.ArrayBuffer.empty[String]
    val out = scala.collection.mutable.ArrayBuffer
      .empty[(Int, String, Long, Long)]
    var coveredTotal = 0L // running gain sum = distinct covered count
    for (r <- 1 to rounds if selected.size < nUnits) {
      val uncovered =
        if (selected.isEmpty) sig
        else sig.filter(!arrays_overlap(col("us"),
          typedLit(selected.toSeq)))
      val gains = allUnits
        .filter(!col("u").isin(selected.toSeq: _*))
        .join(uncovered.select(explode(col("us")).as("u"))
            .groupBy(col("u")).agg(count(lit(1)).as("g")),
          Seq("u"), "left_outer")
        .select(col("u"), coalesce(col("g"), lit(0L)).as("g"))
      // ONE bounded row crosses to the driver per round.
      val top = gains.orderBy(col("g").desc, col("u")).limit(1).head
      selected += top.getString(0)
      coveredTotal += top.getLong(1)
      out += ((r, top.getString(0), top.getLong(1), coveredTotal))
    }
    sig.unpersist(blocking = false)
    allUnits.unpersist(blocking = false)
    import spark.implicits._
    out.toSeq.toDF("round", "unit", "gain", "covered_total")
  }
}
