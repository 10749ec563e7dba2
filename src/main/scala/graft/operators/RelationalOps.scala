package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational core — joins / dedup / unions from SURVEY.md §2.2-2.4, §2.7.
  *
  * Scale posture: lookup and exclusion sides are dimension-sized →
  * `broadcast()` hints keep them off the shuffle path; composite-key joins
  * shuffle on their keys and rely on AQE for skew; dedup is a single
  * hash-partitioned window (no global sort).
  */
object RelationalOps {

  /** Merkle-style bucket digest of a snapshot: every row lands in one of
    * `buckets` key-hash buckets, and each bucket reduces to (row count,
    * bit_xor of a 60-bit row fingerprint hash). The digest table is the
    * O(buckets) summary two 100 TB snapshot copies EXCHANGE to find out
    * whether (and WHERE) they differ — the anti-entropy primitive behind
    * replica repair and cross-region table reconciliation: comparing
    * digests moves `buckets` rows, not the tables.
    *
    * bit_xor is the right fold: commutative/associative (partial-agg
    * order free — combinable in one shuffle), self-inverse (A ⊕ A = 0,
    * so identical row multisets cancel regardless of order), and
    * sensitive to any single-row change of the fingerprint. (A row
    * DUPLICATED an even number of times xor-cancels — the count column
    * catches that case; for a cryptographic guarantee swap in an
    * order-free additive hash, same shape.)
    *
    * One combinable shuffle of (bucket, hash) pairs; both hashes are the
    * repo's md5-prefix convention, so an external engine (the DuckDB
    * oracle — or a second warehouse entirely) reproduces the digest
    * bit-for-bit. That cross-engine reproducibility IS the point: the
    * two sides of a reconciliation rarely run the same system. */
  def bucketDigest(df: DataFrame, key: Column, fingerprint: Column,
                   buckets: Int): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    df.select(
        pmod(TextOps.hash32(key.cast("string")), lit(buckets)).as("bucket"),
        TextOps.hash60(fingerprint).as("__h"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_rows"), expr("bit_xor(__h)").as("digest"))
  }

  /** Digest-guided snapshot reconciliation: compare two snapshots'
    * [[bucketDigest]] tables, then run the ROW-LEVEL diff only inside
    * the buckets whose digests disagree — added/removed/changed counts
    * per mismatched bucket. Identical buckets (the vast majority of a
    * mostly-in-sync pair) never join at row level: both row scans are
    * semi-joined down to the mismatched buckets before the full-outer
    * diff, so the expensive comparison is delta-sided like q85's
    * incremental dedup — work scales with the DIVERGENCE, not the
    * snapshot size. */
  def reconcileSnapshots(a: DataFrame, b: DataFrame, key: Column,
                         fingerprint: Column, buckets: Int): DataFrame = {
    val da = bucketDigest(a, key, fingerprint, buckets)
      .select(col("bucket"), col("n_rows").as("n_a"),
        col("digest").as("__da"))
    val db = bucketDigest(b, key, fingerprint, buckets)
      .select(col("bucket"), col("n_rows").as("n_b"),
        col("digest").as("__db"))
    // Null-safe: a bucket present on one side only is a mismatch too.
    // BOTH signals gate: digest inequality catches changes, count
    // inequality catches the xor-cancelling even-duplicate case the
    // digest alone is blind to (spec-pinned).
    val mismatch = da.join(db, Seq("bucket"), "full_outer")
      .filter(!(col("__da") <=> col("__db")) ||
        !(col("n_a") <=> col("n_b")))
      .select(col("bucket"), coalesce(col("n_a"), lit(0L)).as("n_a"),
        coalesce(col("n_b"), lit(0L)).as("n_b"))
    def rows(df: DataFrame, fp: String) = df.select(
        pmod(TextOps.hash32(key.cast("string")), lit(buckets)).as("bucket"),
        key.cast("string").as("__k"), fingerprint.as(fp))
      .join(mismatch.select(col("bucket")), Seq("bucket"), "left_semi")
    val diff = rows(a, "__fa")
      .join(rows(b, "__fb"), Seq("bucket", "__k"), "full_outer")
      .groupBy(col("bucket"))
      .agg(sum(when(col("__fa").isNull, 1L).otherwise(0L)).as("n_added"),
        sum(when(col("__fb").isNull, 1L).otherwise(0L)).as("n_removed"),
        sum(when(col("__fa").isNotNull && col("__fb").isNotNull &&
          col("__fa") =!= col("__fb"), 1L).otherwise(0L)).as("n_changed"))
    mismatch.join(diff, "bucket")
  }

  /** F1/J2: anti-semi exclusion (`~isin(codes)` at scale). The exclusion
    * list is broadcast — no shuffle of the probe side.
    * Ref: crime_immigration_etl.py:157-159. */
  def antiJoinExclude(df: DataFrame, key: String,
                      excl: DataFrame, exclKey: String): DataFrame =
    df.join(broadcast(excl), df(key) === excl(exclKey), "left_anti")

  /** J3/J4: broadcast lookup join with miss-fallback — reproduces
    * `COUNTRIES_MAP.get(name, name)` (ref :16-34, :177-179): unmatched keys
    * keep their input value via coalesce.
    *
    * Precondition: `lookupKey` must be unique in `lookup` (a dict has unique
    * keys); duplicate keys would fan out probe rows. Check with
    * [[manyToOneViolations]](lookup, Seq(lookupKey)) when the lookup side is
    * not trusted. */
  def lookupWithFallback(df: DataFrame, key: Column,
                         lookup: DataFrame, lookupKey: String,
                         lookupValue: String, out: String): DataFrame =
    lookupWithFallback(df, key, key, lookup, lookupKey, lookupValue, out)

  /** Variant with a distinct fallback column — mirrors the reference
    * exactly: the dict is probed with the NORMALIZED name but a miss keeps
    * the ORIGINAL value (`COUNTRIES_MAP.get(x.strip().lower(), x)`, :178). */
  def lookupWithFallback(df: DataFrame, key: Column, fallback: Column,
                         lookup: DataFrame, lookupKey: String,
                         lookupValue: String, out: String): DataFrame =
    df.join(broadcast(lookup), key === lookup(lookupKey), "left")
      .withColumn(out, coalesce(lookup(lookupValue), fallback))
      .drop(lookup(lookupKey)).drop(lookup(lookupValue))

  /** A1: deterministic first-wins dedup — `drop_duplicates(subset=keys)`
    * (ref :199-203) made reproducible: first row per key under `order`.
    * One shuffle on the key; window avoids a global sort. */
  def dedupFirst(df: DataFrame, keys: Seq[String], order: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    // Collision-free temp column: suffix until it's not an input column.
    val rn = Iterator.iterate("__rn")(_ + "_").find(!df.columns.contains(_)).get
    df.withColumn(rn, row_number().over(w))
      .filter(col(rn) === 1).drop(rn)
  }

  /** §2.7: UNION ALL of homogeneous batches (per-year page accumulation,
    * ref :123/:132) — name-based so column order can't silently misalign.
    * Requires a non-empty batch list (there is no schema to make an empty
    * union from). */
  def unionAll(dfs: Seq[DataFrame]): DataFrame = {
    require(dfs.nonEmpty, "unionAll requires at least one DataFrame")
    dfs.reduce(_ unionByName _)
  }

  /** J1's `validate="many_to_one"` (ref :288) as an engine-side check:
    * returns duplicate key groups on the `one` side (empty ⇒ valid). */
  def manyToOneViolations(one: DataFrame, keys: Seq[String]): DataFrame =
    one.groupBy(keys.map(col): _*).count().filter(col("count") > 1)

  /** Top-k per group: row_number under (keys, order), kept while ≤ k.
    * One shuffle on the keys; no global sort (contrast orderBy.limit,
    * which is global top-k — Catalyst's TakeOrderedAndProject). */
  def topKPerGroup(df: DataFrame, keys: Seq[String], order: Seq[Column],
                   k: Int, rankCol: String): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    df.withColumn(rankCol, row_number().over(w)).filter(col(rankCol) <= k)
  }

  /** Skew mitigation (SURVEY §4 posture): salted equi-join. The large
    * side gets a pseudo-random salt in [0, salt); the small side is
    * replicated once per salt value; the join key becomes (keys, salt) so
    * one hot key spreads over `salt` reducers. Result is identical to the
    * plain join (salt values match by construction). Use when AQE's
    * skew-join split isn't available or the skew is in an aggregation
    * feeding the join. */
  def saltedJoin(large: DataFrame, small: DataFrame, keys: Seq[String],
                 salt: Int): DataFrame = {
    require(salt > 0, "salt must be positive")
    // Collision-free temp column across BOTH inputs (same guard as
    // dedupFirst/positionalSlice — a caller's __salt must survive).
    val sc = Iterator.iterate("__salt")(_ + "_")
      .find(n => !large.columns.contains(n) && !small.columns.contains(n)).get
    val salted = large.withColumn(sc,
      pmod(monotonically_increasing_id(), lit(salt.toLong)))
    val replicated = small.withColumn(sc,
      explode(sequence(lit(0L), lit(salt.toLong - 1))))
    salted.join(replicated, keys :+ sc).drop(sc)
  }

  /** Semi-join with an EXPLICIT Bloom pre-filter: build a `numBits`-bit
    * Bloom filter over the dim keys as a plain DataFrame aggregate
    * (k hash positions → 64-bit words bit_or'd together), broadcast the
    * word map (numBits/8 bytes — KBs where the dim itself is GBs), and
    * drop non-candidate fact rows MAP-SIDE before the exact semi-join.
    *
    * This is the manual form of the runtime-filter Catalyst injects at
    * cluster thresholds (see PlanShapeSpec's InjectRuntimeFilter proof):
    * spelled out as an operator so the pre-shuffle prune is available
    * unconditionally — at 100 TB the win is that the EXCLUDED fact rows
    * (typically the vast majority against a selective dim) never enter
    * the exchange. False positives cost nothing but a wasted candidate
    * row: the exact semi-join behind the filter decides membership, so
    * the result is bit-identical to the plain semi-join (the oracle IS
    * the plain semi-join — bloom must be result-invisible, q51/q52's
    * salting contract).
    *
    * Hashing reuses the deterministic md5-prefix family (TextOps.hash32
    * with per-probe salts), so the filter itself is reproducible across
    * runs, partitionings, and engines. */
  def bloomSemiJoin(fact: DataFrame, key: Column,
                    dim: DataFrame, dimKey: Column,
                    numBits: Int = 1 << 14, numHashes: Int = 3): DataFrame = {
    require(numBits >= 64 && numBits % 64 == 0,
      s"numBits must be a positive multiple of 64, got $numBits")
    require(numHashes > 0, s"numHashes must be positive, got $numHashes")
    def pos(c: Column, h: Int): Column =
      pmod(TextOps.hash32(concat(lit(s"bf$h:"), c.cast("string"))),
        lit(numBits))
    val words = (0 until numHashes)
      .map(h => dim.select(pos(dimKey, h).as("__pos")))
      .reduce(_ union _)
      .select((col("__pos") / 64).cast("long").as("__w"),
        call_function("shiftleft", lit(1L),
          pmod(col("__pos"), lit(64)).cast("int")).as("__m"))
      .groupBy(col("__w")).agg(expr("bit_or(__m)").as("__bits"))
    val bf = words.agg(map_from_entries(
      collect_list(struct(col("__w"), col("__bits")))).as("__bf"))
    val mayContain = (0 until numHashes).map { h =>
      val p = pos(key, h)
      (coalesce(try_element_at(col("__bf"), (p / 64).cast("long")),
        lit(0L)).bitwiseAND(call_function("shiftleft", lit(1L),
          pmod(p, lit(64)).cast("int")))) =!= 0L
    }.reduce(_ && _)
    fact.crossJoin(broadcast(bf)).filter(mayContain).drop("__bf")
      .join(dim.select(dimKey.as("__dk")).distinct(),
        key === col("__dk"), "left_semi")
  }

  /** F8: positional row slice `df[lo:hi]` (create-maps.py:22-24) — rows at
    * positions (lo, hi] under a total order, returned IN slice order.
    *
    * Fast path (all columns orderable): multiset subtraction — the slice
    * IS `top(hi) EXCEPT ALL top(lo)`. Each side is `orderBy.limit` —
    * Catalyst's TakeOrderedAndProject, a distributed partial top-k (every
    * partition keeps its own top k, one bounded merge) — so no global sort
    * and no single-partition window over the full input ever runs (the r2
    * formulation ranked the whole input through an unpartitioned
    * WindowExec: THE scale killer this operator invites). The EXCEPT ALL
    * rewrite (aggregate + ReplicateRows) destroys row order, so the result
    * is re-sorted — cheap, at most hi-lo rows (ADVICE r3).
    *
    * Tie robustness on the fast path: the two top-k passes evaluate
    * independently, so the caller's `order` is silently extended with
    * every remaining orderable column — full-row lexicographic order.
    * Rows that STILL tie are byte-identical on all orderable columns, and
    * multiset subtraction removes the right count of those regardless of
    * which physical copies each pass picked. Under a caller-total `order`
    * the extension is inert.
    *
    * Fallback (schema has non-orderable columns, e.g. MapType — set ops
    * would throw ADVICE r3): ONE partial top-k bounds the input to hi
    * rows, then a row_number window over those ≤ hi rows (single
    * partition, but of bounded size — not the full-input window) takes the
    * slice. One pass, so ties need no cross-pass consistency. */
  def positionalSlice(df: DataFrame, order: Seq[Column],
                      lo: Long, hi: Long): DataFrame = {
    require(lo >= 0 && hi >= lo, s"need 0 <= lo <= hi, got ($lo, $hi]")
    if (hi > Int.MaxValue)
      throw new IllegalArgumentException(
        s"positionalSlice hi=$hi exceeds limit() range; a slice that deep " +
          "is a full global sort — restructure the query instead")
    import org.apache.spark.sql.catalyst.expressions.RowOrdering
    val allOrderable =
      df.schema.fields.forall(f => RowOrdering.isOrderable(f.dataType))
    if (allOrderable) {
      val tieBreaks = df.schema.fields.map(f => col(f.name)).toSeq
      val top = df.orderBy(order ++ tieBreaks: _*)
      top.limit(hi.toInt).exceptAll(top.limit(lo.toInt))
        .orderBy(order ++ tieBreaks: _*)
    } else {
      val rn = Iterator.iterate("__pos")(_ + "_")
        .find(!df.columns.contains(_)).get
      val w = Window.orderBy(order: _*)
      df.orderBy(order: _*).limit(hi.toInt)
        .withColumn(rn, row_number().over(w))
        .filter(col(rn) > lo).drop(rn)
    }
  }

  /** 2-D skyline (Pareto frontier): the rows for which no other row is
    * at-least-as-good on BOTH axes and strictly better on one —
    * `minimize` smaller-is-better, `maximize` bigger-is-better (flip a
    * sign to change direction). The classic "Skyline operator"
    * (Börzsönyi, Kossmann & Stocker, ICDE 2001), phrased for Spark as
    * bounded aggregation instead of the paper's block-nested-loop.
    *
    * Shape — NO all-pairs dominance join and no corpus-scale global
    * sort: (1) reduce to the per-value frontier `minimize → max(
    * maximize)` (one combinable shuffle, output cardinality = the
    * DISTINCT `minimize` domain, corpus-independent for the discretized
    * measures this engine uses — cents, sizes, counts); (2) one
    * running-max window over that domain-sized table marks the values
    * whose best `maximize` beats every strictly-better `minimize`
    * (RANGE .. -1 = strict, so equal-`minimize` rows never dominate
    * each other through the frame); (3) rows re-attach by membership
    * join against the skyline pair set — consumed exactly ONCE, so no
    * checkpoint and no lingering executor storage blocks (the earlier
    * count-guarded broadcast localCheckpointed the pair set and never
    * released it — leak per call in a long session); AQE converts the
    * join to broadcast at runtime whenever the frontier is small, which
    * on the discretized domains here it always is. Ties on both axes
    * are mutually non-dominating and ALL kept — the standard skyline
    * contract.
    *
    * `minimize` must be integral: the strict-predecessor frame is the
    * value-range [-∞, v−1], which is only "every strictly smaller
    * value" on integer domains (the cents/basis-point discipline —
    * doubles would need a window over a second sort anyway). */
  def skylineMinMax(df: DataFrame, minimize: Column,
                    maximize: Column): DataFrame = {
    val front = df.groupBy(minimize.as("__sk_min"))
      .agg(max(maximize).as("__sk_max"))
    require({
      import org.apache.spark.sql.types._
      Seq(LongType, IntegerType, ShortType, ByteType)
        .contains(front.schema("__sk_min").dataType)
    }, "skylineMinMax: minimize axis must be integral (cents/size/count " +
      "discipline) — the strict-predecessor RANGE frame is value-based")
    val strictlyCheaper = Window.orderBy(col("__sk_min"))
      .rangeBetween(Window.unboundedPreceding, -1)
    val sky = front
      .withColumn("__sk_run", max(col("__sk_max")).over(strictlyCheaper))
      .filter(col("__sk_run").isNull || col("__sk_max") > col("__sk_run"))
      .select(col("__sk_min"), col("__sk_max"))
    df.join(sky,
        minimize === col("__sk_min") && maximize === col("__sk_max"))
      .drop("__sk_min", "__sk_max")
  }
}
