package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Graph operators for the dedup pipeline: connected components over the
  * near-dup pair graph. Pairs ([[DedupOps.nearDupPairs]]) are only half the
  * dedup story — a transitive family of near-dups (A~B, B~C) must collapse
  * into ONE cluster with one survivor, or the "deduplicated" corpus still
  * carries C. Components turn the pair list into cluster ids.
  *
  * Scale posture: iterative MIN-LABEL PROPAGATION. Each round is one
  * equi-join (edges ⋈ labels on node) plus one partial-aggregable groupBy
  * shuffle — both hash-partitioned on the node id, no driver-side graph.
  * Rounds needed = graph DIAMETER, and near-dup clusters are dense balls
  * of mutually-similar docs (diameter 1-3 in practice), so the loop runs
  * 2-4 rounds regardless of corpus size. For adversarial long-chain
  * graphs the alternating large-star/small-star contraction (Kiveris et
  * al., "Connected Components in MapReduce and Beyond", SoCC 2014)
  * converges in O(log n) rounds with the same per-round shuffle shape —
  * the propagation loop is kept here because its per-round cost is lower
  * and its fixpoint is detected exactly.
  *
  * The driver loop is orchestration only (each iteration is a distributed
  * job; the driver sees one changed-row COUNT per round — never row data).
  */
object GraphOps {

  /** Edge-count ceiling for broadcasting the adjacency-array table in
    * [[localClusteringCensusCanon]] (Σ array cells = |E| longs, so ~20M
    * edges ≈ a few hundred MB of hashed relation — comfortable on the
    * 128 GiB local driver and a typical cluster executor). Past it the
    * two attach joins fall back to AQE-sized shuffles; the intersect
    * kernel is unchanged either way. */
  private val ClosureBroadcastMaxEdges = 20000000L

  /** Node-count ceiling for broadcasting per-iteration rank/mass tables
    * in the PageRank family: 10M (long, long, long) rows ≈ 240 MB
    * hashed. The iteration joins attach node-cardinality state to the
    * corpus-scale edge list — broadcast keeps the edge list from
    * re-shuffling every round; past the budget AQE shuffles apply. */
  private val RankBroadcastMaxNodes = 10000000L

  /** Release the executor blocks behind a `localCheckpoint`ed DataFrame.
    * `Dataset.unpersist` is a NO-OP for these (it consults the
    * CacheManager, which has no entry for a LogicalRDD-backed plan — the
    * blocks belong to the checkpointed RDD itself), so the fixpoint
    * loops free each round's blocks by unpersisting that RDD directly;
    * otherwise dead rounds linger until driver GC + ContextCleaner get
    * around to them. (Shared with [[DedupOps.NearDupSweep]]'s clear() —
    * same LogicalRDD-backed lifecycle.) */
  private[graft] def releaseCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed.collect {
      case r: org.apache.spark.sql.execution.LogicalRDD => r.rdd
    }.foreach(_.unpersist(blocking = false))

  /** Connected components of the undirected graph given as an edge list.
    * Returns one row per node: (node, label) where `label` is the MINIMUM
    * node id reachable from `node` — a deterministic, engine-independent
    * cluster id (the same convention a SQL recursive-CTE oracle computes).
    *
    * Each round ends in `localCheckpoint(eager)` — this is load-bearing,
    * not a cache: a mere persist() shortcuts EXECUTION but the logical
    * plan still nests the previous round twice (union + fixpoint join),
    * so plan size doubles per round and analysis itself OOMs after ~20
    * rounds. Checkpointing truncates the plan to the materialized rows.
    * Local (executor-block) checkpoints are the right default for an
    * iterative loop — a lost block just re-runs the loop — but on a
    * cluster where executor loss mid-loop is routine, call
    * `sc.setCheckpointDir` and swap in reliable `checkpoint()`.
    *
    * The returned labels are those checkpointed rows (already
    * materialized; each superseded round's blocks are freed eagerly by
    * unpersisting the checkpointed RDD itself — `Dataset.unpersist` is a
    * no-op for localCheckpoints — and the final round's are released by
    * the ContextCleaner once the result is garbage-collected).
    *
    * Throws after `maxIter` rounds without convergence: a silently partial
    * clustering would under-merge and let duplicates survive. */
  def connectedComponents(edges: DataFrame, src: String, dst: String,
                          maxIter: Int = 25): DataFrame = {
    // Symmetrize once: propagation needs both directions of each edge.
    // Pre-hashed on the per-round join key (the pageRank posture): the
    // cached layout satisfies every round's sym ⋈ labels distribution,
    // so only the node-cardinality label side shuffles per iteration.
    val sym = edges
      .select(col(src).cast("long").as("node"), col(dst).cast("long").as("peer"))
      .union(edges
        .select(col(dst).cast("long").as("node"), col(src).cast("long").as("peer")))
      .repartition(col("node"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var labels = sym.select(col("node")).distinct()
      .withColumn("label", col("node"))
      .localCheckpoint(true)
    var changed = Long.MaxValue
    var iter = 0
    while (changed > 0 && iter < maxIter) {
      // label'(n) = min over the closed neighborhood {n} ∪ N(n).
      val viaPeers = sym.join(labels, "node")
        .select(col("peer").as("node"), col("label"))
      val next = labels.union(viaPeers)
        .groupBy(col("node")).agg(min(col("label")).as("label"))
        .localCheckpoint(true)
      // One count per round detects the exact fixpoint (no lost-update
      // heuristics); both sides read materialized checkpoint blocks.
      changed = next.join(labels.withColumnRenamed("label", "__old"), "node")
        .filter(col("label") =!= col("__old")).count()
      releaseCheckpoint(labels)
      labels = next
      iter += 1
    }
    sym.unpersist(blocking = false)
    if (changed > 0) {
      releaseCheckpoint(labels)
      throw new IllegalStateException(
        s"connectedComponents: no fixpoint after $maxIter rounds — " +
          "raise maxIter (diameter-bound) or switch to star contraction")
    }
    labels
  }

  /** Connected components by ALTERNATING STAR CONTRACTION (Kiveris et
    * al., "Connected Components in MapReduce and Beyond", SoCC 2014) —
    * the adversarial-diameter alternative to [[connectedComponents]]:
    * converges in O(log n) rounds on ANY graph (a 200-node chain
    * contracts in ~10 rounds where propagation needs 200), at the cost
    * of slightly heavier rounds (two half-steps, each one aggregate +
    * one join). Same output contract: (node, label = component min).
    *
    *  - large-star: every node connects its STRICTLY LARGER neighbors to
    *    the minimum of its closed neighborhood — long tails fold onto
    *    small ids without ever disconnecting a component;
    *  - small-star: every node connects its not-larger neighbors (and
    *    itself) to that minimum — stars flatten.
    *
    * The fixpoint (edge set unchanged) is exactly the star graph: each
    * component reduced to (min, member) edges. Both half-steps are
    * hash-partitioned on the grouping node; per-round localCheckpoint
    * truncates plan growth as in the propagation loop.
    *
    * Self-loop-only nodes: canon() drops self-loops from the working edge
    * set (they never merge anything), so the node set is unioned back at
    * the end — a node whose only edge is (n, n) labels itself, exactly as
    * [[connectedComponents]] labels it (ADVICE r5 flagged the two
    * variants diverging on this input). */
  def connectedComponentsStar(edges: DataFrame, src: String, dst: String,
                              maxIter: Int = 50): DataFrame = {
    // Canonical undirected form: (a < b), dedup, self-loops dropped.
    def canon(df: DataFrame, x: Column, y: Column): DataFrame =
      df.select(least(x, y).as("a"), greatest(x, y).as("b"))
        .filter(col("a") =!= col("b")).distinct()
    // Every node mentioned by ANY edge (self-loops included) must appear
    // in the output; contraction below only sees non-loop edges.
    val allNodes = edges.select(col(src).cast("long").as("node"))
      .union(edges.select(col(dst).cast("long").as("node"))).distinct()
    var e = canon(edges,
      col(src).cast("long"), col(dst).cast("long")).localCheckpoint(true)
    var iter = 0
    var stable = false
    while (!stable && iter < maxIter) {
      // Large-star: group both orientations on u; m = min(N(u) ∪ {u});
      // emit (m, v) for strictly larger neighbors v.
      val nbrs = e.select(col("a").as("u"), col("b").as("v"))
        .union(e.select(col("b").as("u"), col("a").as("v")))
      val lsMin = nbrs.groupBy(col("u")).agg(min(col("v")).as("__mv"))
        .select(col("u"), least(col("__mv"), col("u")).as("m"))
      val ls = canon(nbrs.join(lsMin, "u").filter(col("v") > col("u")),
        col("v"), col("m")).localCheckpoint(true)
      // Small-star on the canonical edges: for each node u its smaller
      // neighbors are exactly the a-side rows of (a, u); m = min of them
      // (all < u); emit (m, a_i) for every smaller neighbor plus (m, u).
      val ssMin = ls.groupBy(col("b").as("u")).agg(min(col("a")).as("m"))
      val viaNbrs = ls.join(ssMin, col("b") === col("u"))
        .select(col("a").as("x"), col("m").as("y"))
      val next = canon(viaNbrs.union(
          ssMin.select(col("m").as("x"), col("u").as("y"))),
        col("x"), col("y")).localCheckpoint(true)
      // Fixpoint: the edge multiset is unchanged (both are distinct sets,
      // so two anti-joins detect any difference).
      stable = next.exceptAll(e).isEmpty && e.exceptAll(next).isEmpty
      releaseCheckpoint(e)
      releaseCheckpoint(ls)
      e = next
      iter += 1
    }
    if (!stable)
      throw new IllegalStateException(
        s"connectedComponentsStar: no fixpoint after $maxIter rounds")
    // The fixpoint is a star forest: every edge is (componentMin, member).
    // Isolated (self-loop-only) nodes re-enter as their own label; for
    // star members the self row loses to the component min under min().
    e.select(col("b").as("node"), col("a").as("label"))
      .union(e.select(col("a").as("node"), col("a").as("label")))
      .union(allNodes.select(col("node"), col("node").as("label")))
      .groupBy(col("node")).agg(min(col("label")).as("label"))
  }

  /** Cluster summary over an edge list: one row per multi-member cluster
    * with its size and a deterministic comma-joined member list (members
    * sorted NUMERICALLY — the oracle's `ORDER BY node` twin). */
  def dupClusters(edges: DataFrame, src: String, dst: String): DataFrame =
    dupClustersFromLabels(connectedComponents(edges, src, dst))

  /** The cluster rollup half of [[dupClusters]], over an ALREADY-COMPUTED
    * (node, label) assignment — so a session that shares one
    * [[connectedComponents]] run across consumers ([[CheckpointMemo]])
    * pays the fixpoint loop once and each consumer only its own rollup. */
  def dupClustersFromLabels(labels: DataFrame): DataFrame =
    labels
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n_members"),
        concat_ws(",", transform(sort_array(collect_list(col("node"))),
          _.cast("string"))).as("members"))
      .select(col("label").as("cluster_id"), col("n_members"), col("members"))

  /** PageRank over an undirected edge list, in SCALED-INTEGER arithmetic
    * so the result is exact, order-independent, and engine-reproducible:
    * every rank is a non-negative long in units of `scale⁻¹`, each
    * iteration's mass transfer is `rank div outdeg` (integer floor
    * division — identical in Spark `div` and DuckDB `//` for
    * non-negative operands), and the damping step is
    * `(15·scale) div 100 + (85·mass) div 100`. A float PageRank cannot
    * hash-verify: partial-aggregation order perturbs the low bits of
    * every double sum, and k iterations compound the perturbation.
    *
    * Per iteration: one equi-join (edges ⋈ ranks on the source node) and
    * one combinable sum shuffle — the standard distributed PageRank
    * shape, hash-partitioned on node id, nothing on the driver. Plan
    * depth grows linearly with `iters`; for the fixed small k this runs
    * at (3-5, the analytics norm) no checkpoint is needed — beyond ~10,
    * localCheckpoint per round as in [[connectedComponents]].
    *
    * Overflow bound (checked): the damping multiply needs
    * `85 · nNodes · scale < 2⁶³`, because total mass is conserved at
    * `nNodes · scale` and any single node's in-mass is at most that.
    * `scale` trades precision for headroom: 10⁹ (the default) holds to
    * ~10⁸ nodes with 9 significant digits; a 10⁹-node graph runs at
    * scale 10⁶. Symmetrized edges mean every node has outdeg ≥ 1, so
    * there is no dangling-mass term.
    *
    * Returns (node, rank, outdeg) — ranks sum to ≈ nNodes·scale (floor
    * losses only), i.e. the "ranks average to 1" convention scaled. */
  def pageRank(edges: DataFrame, src: String, dst: String,
               iters: Int = 3, scale: Long = 1000000000L): DataFrame = {
    val e = edges
      .select(least(col(src), col(dst)).cast("long").as("a"),
        greatest(col(src), col(dst)).cast("long").as("b"))
      .filter(col("a") =!= col("b")).distinct()
    // Persist the edge list PRE-HASHED on the join key: every iteration
    // joins sym.u = ranks.node, and an unpartitioned cache would pay an
    // Exchange of the (large) edge list per iteration — partitioned, the
    // cached layout satisfies the join's distribution and only the
    // node-cardinality ranks side shuffles each round. deg's groupBy(u)
    // rides the same layout for free.
    val sym = e.select(col("a").as("u"), col("b").as("v"))
      .union(e.select(col("b").as("u"), col("a").as("v")))
      .repartition(col("u"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val deg = sym.groupBy(col("u").as("node"))
      .agg(count(lit(1)).as("outdeg"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nNodes = deg.count() // one scalar; also materializes sym + deg
    pageRankCore(sym, deg, nNodes, iters, scale, Seq(sym, deg))
  }

  /** [[pageRank]] over an ALREADY-SYMMETRIZED distinct edge list (both
    * directions present, self-loops absent) — the variant a bucketed
    * graph table ([[graft.sources.CatalogOps.writeBucketed]] on the node
    * column) feeds: the scan arrives pre-hash-distributed on `src`, so
    * the normalize + symmetrize + `repartition` prefix — two full
    * edge-list shuffles — is skipped entirely and every iteration's
    * join and the degree aggregate ride the bucket layout. */
  def pageRankSym(symEdges: DataFrame, src: String, dst: String,
                  iters: Int = 3,
                  scale: Long = 1000000000L): DataFrame = {
    val sym = symEdges
      .select(col(src).cast("long").as("u"), col(dst).cast("long").as("v"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val deg = sym.groupBy(col("u").as("node"))
      .agg(count(lit(1)).as("outdeg"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nNodes = deg.count() // one scalar; also materializes sym + deg
    pageRankCore(sym, deg, nNodes, iters, scale, Seq(sym, deg))
  }

  /** [[pageRankSym]] for callers holding the SESSION GRAPH ARTIFACTS
    * (a materialized symmetric edge frame, its exact (node, outdeg)
    * degree table, and the node count) — skips the per-query persist +
    * degree aggregate + count job every `*Sym` entrypoint re-pays
    * (VERDICT r13 #3: those prep actions, repeated across the graph
    * family, were most of its per-query overhead). `symEdges` must be
    * already symmetrized, distinct, self-loop-free, and materialized
    * (checkpoint/cache — each iteration re-reads it); `deg` must be its
    * exact symmetric degree table and `nNodes` its exact node count, or
    * the rank arithmetic silently diverges from the from-scratch
    * variants. */
  def pageRankPrepared(symEdges: DataFrame, src: String, dst: String,
                       deg: DataFrame, nNodes: Long, iters: Int = 3,
                       scale: Long = 1000000000L): DataFrame =
    pageRankCore(
      symEdges.select(col(src).cast("long").as("u"),
        col(dst).cast("long").as("v")),
      deg.select(col("node"), col("outdeg")), nNodes, iters, scale, Nil)

  /** The iteration core shared by the pageRank entrypoints: `owned`
    * frames (the from-scratch variants' persisted sym/deg) are
    * unpersisted before return; prepared callers pass Nil and keep
    * their session artifacts. */
  private def pageRankCore(sym: DataFrame, deg: DataFrame, nNodes: Long,
                           iters: Int, scale: Long,
                           owned: Seq[DataFrame]): DataFrame = {
    require(nNodes == 0 || scale <= Long.MaxValue / 85L / math.max(nNodes, 1L),
      s"pageRank: 85 * $nNodes nodes * scale $scale overflows long — lower scale")
    val teleport = (15L * scale) / 100L
    // Rank tables are NODE-cardinality; the edge list is corpus-scale.
    // Broadcasting ranks each iteration keeps the persisted edge list
    // where it sits (no per-iteration |E| shuffle — only the combinable
    // mass partials move); past the node budget the joins fall back to
    // AQE-sized shuffles.
    val bcast: DataFrame => DataFrame =
      if (nNodes <= RankBroadcastMaxNodes) broadcast(_) else identity
    var ranks = deg.select(col("node"), lit(scale).as("rank"), col("outdeg"))
    for (_ <- 1 to iters) {
      val mass = sym.join(bcast(ranks), sym("u") === ranks("node"))
        .select(col("v").as("node"),
          expr("rank div outdeg").as("contrib"))
        .groupBy(col("node")).agg(sum(col("contrib")).as("mass"))
      // Inner join is total: symmetrization gives every node both an
      // out-edge (it's in deg) and an in-edge (its peers contribute).
      ranks = deg.join(bcast(mass), "node")
        .select(col("node"),
          (lit(teleport) + expr("(85 * mass) div 100")).as("rank"),
          col("outdeg"))
    }
    // Materialize before dropping the cached edge/degree frames the lazy
    // plan still references (the connectedComponents return discipline —
    // the caller gets checkpointed rows, blocks freed by ContextCleaner).
    // PREPARED callers (owned Nil, session-artifact frames that outlive
    // this call) get the LAZY chain instead (r17): their single
    // downstream action drives the iterations directly, skipping one
    // full materialize + block write + re-scan of the result.
    val res = ranks.select(col("node"), col("rank"), col("outdeg"))
    if (owned.isEmpty) res
    else {
      val out = res.localCheckpoint(true)
      owned.foreach(_.unpersist(blocking = false))
      out
    }
  }

  /** Triangle census of an undirected pair graph: nodes, edges, wedges
    * (open 2-paths), triangles, and the global clustering coefficient
    * 3·T/W — the corpus-health shape metric for a near-dup graph (a
    * coefficient near 1 means dup families are closed cliques exact
    * clustering collapses cleanly; near 0 means chainy borderline
    * similarity that transitive clustering will over-merge).
    *
    * Enumeration is DEGREE-ORDERED (Cohen, "Graph Twiddling in a
    * MapReduce World", CiSE 2009): each edge orients from its
    * (degree, id)-smaller endpoint to the larger, wedges expand only
    * from out-neighbor pairs, and a semi-join against the oriented
    * edges closes them. Each triangle has exactly ONE vertex with two
    * out-edges inside it, so no dedup pass is needed — and max
    * out-degree is O(√edges) on ANY graph, so the wedge explosion a
    * hub vertex causes under naive enumeration (deg² wedges on the
    * raw adjacency) cannot happen. All joins are equi-joins on node
    * ids; counts are exact integers, the coefficient is one final
    * double expression. */
  def triangleStats(pairs: DataFrame, a: String, b: String): DataFrame = {
    val e = pairs
      .select(least(col(a), col(b)).as("u"), greatest(col(a), col(b)).as("v"))
      .filter(col("u") =!= col("v")).distinct()
    val deg = e.select(col("u").as("node"))
      .union(e.select(col("v").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("deg"))
    val ranked = e
      .join(deg.select(col("node").as("u"), col("deg").as("du")), "u")
      .join(deg.select(col("node").as("v"), col("deg").as("dv")), "v")
    val uFirst = struct(col("du"), col("u")) < struct(col("dv"), col("v"))
    val o = ranked.select(
      when(uFirst, col("u")).otherwise(col("v")).as("s"),
      when(uFirst, col("v")).otherwise(col("u")).as("d"),
      when(uFirst, struct(col("dv").as("rd"), col("v").as("rn")))
        .otherwise(struct(col("du").as("rd"), col("u").as("rn"))).as("dr"))
    val wedges = o.as("e1").join(o.as("e2"),
        col("e1.s") === col("e2.s") && col("e1.dr") < col("e2.dr"))
      .select(col("e1.d").as("x"), col("e2.d").as("y"))
    val tri = wedges.join(
        o.select(col("s").as("x"), col("d").as("y")), Seq("x", "y"),
        "left_semi")
      .agg(count(lit(1)).as("n_triangles"))
    val sizes = deg.agg(count(lit(1)).as("n_nodes"),
      // integer div AFTER the exact sum (every term is even) — deg*(deg-1)/2
      // inside the sum would be a double division
      expr("sum(deg * (deg - 1)) div 2").as("n_wedges"))
    val edges = e.agg(count(lit(1)).as("n_edges"))
    sizes.crossJoin(edges).crossJoin(tri)
      .withColumn("clustering",
        when(col("n_wedges") > 0,
          (lit(3.0) * col("n_triangles").cast("double")) /
            col("n_wedges").cast("double")).otherwise(lit(0.0)))
  }

  /** Degree-quantile-pinned k-core peel — the cohesion filter for
    * co-occurrence and near-dup graphs: iteratively remove vertices
    * whose degree falls below k, where k = ceil(initial-degree
    * quantile `q`) (pinned ONCE from the unpeeled graph, so the
    * threshold adapts to corpus density while the peel itself is the
    * classic k-core cascade). Runs a FIXED `rounds` peels — the oracle
    * unrolls the identical rounds; convergence on a given corpus is a
    * spec assertion (rounds vs rounds+1 equal), not an unbounded loop.
    *
    * Shape: symmetric edge list persisted PRE-HASHED on `u` (the
    * [[pageRank]] discipline) — each round is one degree aggregate on
    * the cached layout plus two semi-joins against the
    * node-cardinality keep-list; each round's survivor edges are
    * eagerly checkpointed so lineage stays flat. Returns survivors as
    * (node, degree-after-peel, k). */
  def kCorePeel(edges: DataFrame, src: String, dst: String,
                rounds: Int, q: Double): DataFrame = {
    val e0 = edges
      .select(least(col(src), col(dst)).cast("long").as("a"),
        greatest(col(src), col(dst)).cast("long").as("b"))
      .filter(col("a") =!= col("b")).distinct()
    val sym0 = e0.select(col("a").as("u"), col("b").as("v"))
      .union(e0.select(col("b").as("u"), col("a").as("v")))
      .repartition(col("u"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val deg0 = sym0.groupBy(col("u")).agg(count(lit(1)).as("__n"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    kCoreCore(sym0, deg0, deg0.count(), rounds, q, Seq(sym0, deg0))
  }

  /** [[kCorePeel]] over an ALREADY-SYMMETRIZED distinct edge list — the
    * bucketed-table variant ([[pageRankSym]]'s contract): the scan's
    * hash distribution on `src` serves the initial degree aggregate and
    * the per-round semi-joins, skipping the normalize + symmetrize +
    * repartition prefix. */
  def kCorePeelSym(symEdges: DataFrame, src: String, dst: String,
                   rounds: Int, q: Double): DataFrame = {
    val sym0 = symEdges
      .select(col(src).cast("long").as("u"), col(dst).cast("long").as("v"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val deg0 = sym0.groupBy(col("u")).agg(count(lit(1)).as("__n"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    kCoreCore(sym0, deg0, deg0.count(), rounds, q, Seq(sym0, deg0))
  }

  /** [[kCorePeelSym]] over the session graph artifacts
    * ([[pageRankPrepared]]'s contract): `deg` is the exact (node, deg)
    * symmetric degree table, `nNodes` its row count — the initial-degree
    * quantile pin and round-1 keep set read the artifact instead of
    * re-aggregating the edge list, and no per-query persist is paid. */
  def kCorePeelPrepared(symEdges: DataFrame, src: String, dst: String,
                        deg: DataFrame, nNodes: Long, rounds: Int,
                        q: Double): DataFrame =
    kCoreCore(
      symEdges.select(col(src).cast("long").as("u"),
        col(dst).cast("long").as("v")),
      deg.select(col("node").as("u"), col("deg").as("__n")), nNodes,
      rounds, q, Nil)

  /** The peel core shared by the kCore entrypoints: `deg0` is the
    * (u, __n) symmetric degree frame of `sym0`; `owned` frames are
    * unpersisted before return (prepared callers pass Nil). */
  private def kCoreCore(sym0: DataFrame, deg0: DataFrame, nNodes: Long,
                        rounds: Int, q: Double,
                        owned: Seq[DataFrame]): DataFrame = {
    require(rounds >= 1 && rounds <= 8, s"rounds in [1,8], got $rounds")
    require(q > 0.0 && q < 1.0, s"quantile in (0,1), got $q")
    val kTab = deg0
      .agg(ceil(percentile(col("__n"), lit(q))).cast("long").as("k"))
      .localCheckpoint(true)
    // Survivor sets are node-cardinality; broadcasting them makes both
    // semi-joins map-side, so each round's edge frame keeps the
    // partitioning it arrived with (bucketed on u) — no per-round
    // repartition, no |E| shuffle. Past the node budget the semi-joins
    // fall back to AQE shuffles.
    val bcast: DataFrame => DataFrame =
      if (nNodes <= RankBroadcastMaxNodes) broadcast(_) else identity
    var sym = sym0
    for (r <- 1 to rounds) {
      val keep = (if (r == 1) deg0
        else sym.groupBy(col("u")).agg(count(lit(1)).as("__n")))
        .crossJoin(broadcast(kTab))
        .filter(col("__n") >= col("k"))
        .select(col("u"))
      sym = sym
        .join(bcast(keep), Seq("u"), "left_semi")
        .join(bcast(keep.select(col("u").as("v"))), Seq("v"), "left_semi")
        .localCheckpoint(true)
    }
    val res = sym.groupBy(col("u").as("node"))
      .agg(count(lit(1)).as("degree"))
      .crossJoin(broadcast(kTab))
      .select(col("node"), col("degree"), col("k"))
    // Prepared callers get the lazy head over the last round's
    // checkpoint ([[pageRankCore]]'s r17 rule).
    if (owned.isEmpty) res
    else {
      val out = res.localCheckpoint(true)
      owned.foreach(_.unpersist(blocking = false))
      out
    }
  }

  /** Local clustering-coefficient census — the per-node shape
    * complement to [[triangleStats]]'s one global coefficient: how many
    * nodes live in closed neighborhoods (cliquish dup families, tight
    * co-purchase pockets) vs open hubs. Each node's coefficient
    * 2·T_v/(deg_v·(deg_v−1)) buckets by INTEGER division into 11 cells
    * (bucket 10 = fully closed; degree-1 nodes, whose coefficient is
    * undefined, census as bucket −1), so no per-node float ever crosses
    * the engine boundary.
    *
    * Enumeration is [[triangleStats]]'s degree-ordered wedge expansion
    * (max out-degree O(√edges) — no hub wedge explosion) with the
    * closing join kept INNER instead of semi so each triangle emits its
    * three corners once; a single explode + count yields exact per-node
    * triangle counts, joined to the degree table on node id and folded
    * to the ≤12-row census. */
  def localClusteringCensus(pairs: DataFrame, a: String,
                            b: String): DataFrame =
    localClusteringCensusCanon(pairs
      .select(least(col(a), col(b)).as("u"), greatest(col(a), col(b)).as("v"))
      .filter(col("u") =!= col("v")).distinct())

  /** [[localClusteringCensus]] over an ALREADY-CANONICAL (u < v,
    * distinct) edge list — e.g. the map-side `node < peer` filter of a
    * bucketed symmetric graph table, which skips the least/greatest +
    * distinct full-edge-list shuffle the public form pays. Input columns
    * must be named (u, v). */
  def localClusteringCensusCanon(canonEdges: DataFrame): DataFrame =
    localClusteringCensusCanon(canonEdges, None)

  /** [[localClusteringCensusCanon]] with an optional PRECOMPUTED degree
    * frame `(node, deg)` (the session degree artifact): each canonical
    * edge contributes one endpoint row per side, so the derived census
    * degree equals the symmetric-table degree exactly — callers holding
    * the artifact skip the |2E| union-aggregate (VERDICT r11 #5). */
  def localClusteringCensusCanon(canonEdges: DataFrame,
                                 precomputedDeg: Option[DataFrame])
  : DataFrame =
    localClusteringCensusCanon(canonEdges, precomputedDeg, None, None)

  /** [[localClusteringCensusCanon]] with the session artifact COUNTS
    * supplied (`knownNodes` = degree-table rows, `knownEdges` =
    * canonical edge count): the broadcast guards read the known scalars
    * instead of running two count jobs, and with a precomputed degree
    * artifact the edge frame is single-consumer here so its per-query
    * persist is skipped (VERDICT r13 #3). */
  def localClusteringCensusCanon(canonEdges: DataFrame,
                                 precomputedDeg: Option[DataFrame],
                                 knownNodes: Option[Long],
                                 knownEdges: Option[Long]): DataFrame = {
    // The edge frame has two consumers (degree build + rank attach) only
    // when the degree frame is derived here; with the artifact supplied
    // it is read once and a persist would only add a cache write.
    val e =
      if (precomputedDeg.isEmpty)
        canonEdges.persist(StorageLevel.MEMORY_AND_DISK)
      else canonEdges
    val deg = precomputedDeg.getOrElse(e.select(col("u").as("node"))
        .union(e.select(col("v").as("node")))
        .groupBy(col("node")).agg(count(lit(1)).as("deg"))
        .persist(StorageLevel.MEMORY_AND_DISK))
    val o = orientByDegree(e, deg, knownNodes)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val census = censusFromOriented(o, None, deg, knownNodes, knownEdges)
    if (precomputedDeg.isEmpty) {
      e.unpersist(blocking = false)
      deg.unpersist(blocking = false)
    }
    o.unpersist(blocking = false)
    census
  }

  /** Degree-ordered orientation of a canonical (u < v, distinct) edge
    * list: each edge points from its (deg, id)-smaller endpoint `s` to
    * the larger `d`, so max out-degree is O(√E) on ANY graph — the
    * bound that makes compact-forward triangle work (adjacency arrays,
    * per-edge intersections) hub-proof. `deg` is the (node, deg)
    * symmetric degree table. Degrees BROADCAST onto the edge list: the
    * degree table is node-cardinality (~|V|, the catalog) while the
    * edge list is corpus-scale (~|E|) — shuffling |E| twice to attach
    * two ints is the wrong side of both joins. Count-guarded like the
    * PageRank family: past the node budget both joins fall back to
    * AQE-sized shuffles. Exposed (r15) so the co-purchase serving
    * layer can materialize the oriented layout ONCE per session — the
    * same layout a production triangle/clustering service keeps beside
    * its symmetric edges (VERDICT r14 #2). */
  def orientByDegree(canonEdges: DataFrame, deg: DataFrame,
                     knownNodes: Option[Long] = None): DataFrame = {
    val degSide: DataFrame => DataFrame =
      if (knownNodes.getOrElse(deg.count()) <= RankBroadcastMaxNodes)
        broadcast(_)
      else identity
    val ranked = canonEdges
      .join(degSide(deg.select(col("node").as("u"), col("deg").as("du"))),
        "u")
      .join(degSide(deg.select(col("node").as("v"), col("deg").as("dv"))),
        "v")
    val uFirst = struct(col("du"), col("u")) < struct(col("dv"), col("v"))
    ranked.select(
      when(uFirst, col("u")).otherwise(col("v")).as("s"),
      when(uFirst, col("v")).otherwise(col("u")).as("d"))
  }

  /** Per-node out-neighbor arrays of a degree-ordered oriented edge
    * list — the adjacency side of the compact-forward intersect. Array
    * length is O(√E) by the orientation bound. */
  def adjacencyFromOriented(oriented: DataFrame): DataFrame =
    oriented.groupBy(col("s").as("node"))
      .agg(collect_list(col("d")).as("nbrs"))

  /** [[localClusteringCensusCanon]] over the session ORIENTED-layout
    * artifacts ([[pageRankPrepared]]'s contract): `oriented` is the
    * materialized [[orientByDegree]] frame, `adj` its
    * [[adjacencyFromOriented]] arrays, `deg` the (node, deg) degree
    * artifact, and the counts are the memoized session scalars — the
    * census pays only the intersect kernel + the output-scale census
    * folds, never the per-query orientation/adjacency prep (VERDICT
    * r14 #2: q166's cost was exactly that prep plus the closing
    * work). */
  def localClusteringCensusPrepared(oriented: DataFrame, adj: DataFrame,
                                    deg: DataFrame, knownNodes: Long,
                                    knownEdges: Long): DataFrame =
    censusFromOriented(oriented, Some(adj), deg, Some(knownNodes),
      Some(knownEdges))

  /** The compact-forward census core shared by the canon and prepared
    * entrypoints: EDGE-ITERATOR triangle counting — per-node
    * out-neighbor ARRAYS, one join to attach both endpoint arrays to
    * each oriented edge, then a map-side array_intersect — each
    * triangle {a,b,c} (rank a<b<c) is found exactly once, at edge
    * (a,b), as c ∈ N⁺(a)∩N⁺(b). The earlier wedge-join formulation
    * materialized the Σoutdeg² wedge stream as JOIN ROWS (41M at
    * sf0.1; 8.3s of the query's 10s just moving them); here the same
    * Σoutdeg² work runs inside one codegen'd hash-intersect kernel and
    * the only exploded rows are the triangle CREDITS (2 endpoint rows
    * + |intersection| witness rows per closing edge — output-scale,
    * not wedge-scale). Arrays broadcast when |E| fits the budget
    * (Σ array cells = |E| longs); past it the attach joins fall back
    * to shuffles sized by AQE. */
  private def censusFromOriented(o: DataFrame, adjOpt: Option[DataFrame],
                                 deg: DataFrame, knownNodes: Option[Long],
                                 knownEdges: Option[Long]): DataFrame = {
    val adj = adjOpt.getOrElse(adjacencyFromOriented(o))
    val adjSide: DataFrame => DataFrame =
      if (knownEdges.getOrElse(o.count()) <= ClosureBroadcastMaxEdges)
        broadcast(_)
      else identity
    val pairs = o
      .join(adjSide(adj.select(col("node").as("s"), col("nbrs").as("nu"))),
        "s")
      .join(adjSide(adj.select(col("node").as("d"), col("nbrs").as("nv"))),
        "d")
    val triNodes = pairs
      .select(col("s"), col("d"),
        array_intersect(col("nu"), col("nv")).as("ws"))
      .filter(size(col("ws")) > 0)
      .select(explode(concat(
        array(
          struct(col("s").as("node"), size(col("ws")).cast("long").as("c")),
          struct(col("d").as("node"), size(col("ws")).cast("long").as("c"))),
        transform(col("ws"),
          w => struct(w.as("node"), lit(1L).as("c"))))).as("x"))
      .select(col("x.node").as("node"), col("x.c").as("c"))
      .groupBy(col("node")).agg(sum(col("c")).as("tri"))
    deg.join(triNodes, Seq("node"), "left")
      .select(col("deg"), coalesce(col("tri"), lit(0L)).as("tri"))
      .select(when(col("deg") < 2, lit(-1))
        .otherwise(expr("CAST((tri * 2 * 10) div (deg * (deg - 1)) AS INT)"))
        .as("bucket"), col("deg"), col("tri"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_nodes"), sum(col("deg")).as("sum_deg"),
        sum(col("tri")).as("sum_tri"))
      .localCheckpoint(true)
  }

  /** PERSONALIZED PageRank over an already-symmetrized distinct edge
    * list — [[pageRank]]'s scaled-integer discipline with the teleport
    * mass restricted to a SEED set (the "random surfer who always
    * returns to their interests" ranking a recommender serves per
    * user/topic segment): rank₀ = scale on seeds, 0 elsewhere; each
    * iteration rank′ = (seed ? (15·scale) div 100 : 0) +
    * (85·mass) div 100. Total mass stays ≤ nSeeds·scale ≤ nNodes·scale,
    * so [[pageRank]]'s overflow bound applies unchanged; every rank is
    * an exact long, so k iterations hash-verify against an unrolled SQL
    * twin. Same per-iteration shape: one equi-join + one combinable
    * sum, riding the input's hash distribution on `src`. */
  def personalizedPageRankSym(symEdges: DataFrame, src: String,
                              dst: String, isSeed: Column => Column,
                              iters: Int = 3,
                              scale: Long = 1000000000L): DataFrame = {
    val sym = symEdges
      .select(col(src).cast("long").as("u"), col(dst).cast("long").as("v"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val deg = sym.groupBy(col("u").as("node"))
      .agg(count(lit(1)).as("outdeg"))
      .withColumn("is_seed", isSeed(col("node")))
      .persist(StorageLevel.MEMORY_AND_DISK)
    pprCore(sym, deg, deg.count(), iters, scale, Seq(sym, deg))
  }

  /** [[personalizedPageRankSym]] over the session graph artifacts
    * ([[pageRankPrepared]]'s contract): `deg` is the exact (node,
    * outdeg) symmetric degree table, `nNodes` its count — the seed flag
    * is a map-side expression over the artifact, and no per-query
    * persist / degree aggregate / count is paid. */
  def personalizedPageRankPrepared(symEdges: DataFrame, src: String,
                                   dst: String, deg: DataFrame,
                                   nNodes: Long, isSeed: Column => Column,
                                   iters: Int = 3,
                                   scale: Long = 1000000000L): DataFrame =
    pprCore(
      symEdges.select(col(src).cast("long").as("u"),
        col(dst).cast("long").as("v")),
      deg.select(col("node"), col("outdeg"))
        .withColumn("is_seed", isSeed(col("node"))),
      nNodes, iters, scale, Nil)

  /** The iteration core shared by the personalized-PageRank
    * entrypoints: `deg` carries (node, outdeg, is_seed). */
  private def pprCore(sym: DataFrame, deg: DataFrame, nNodes: Long,
                      iters: Int, scale: Long,
                      owned: Seq[DataFrame]): DataFrame = {
    require(nNodes == 0 ||
      scale <= Long.MaxValue / 85L / math.max(nNodes, 1L),
      s"personalizedPageRank: 85 * $nNodes * scale $scale overflows long")
    require(nNodes == 0 || deg.filter(col("is_seed")).limit(1).count() > 0,
      "personalizedPageRank: empty seed set — every rank would be 0")
    val teleport = (15L * scale) / 100L
    // Same broadcast regime as [[pageRankCore]]: node-cardinality rank
    // state attaches to the corpus-scale edge list map-side.
    val bcast: DataFrame => DataFrame =
      if (nNodes <= RankBroadcastMaxNodes) broadcast(_) else identity
    var ranks = deg.select(col("node"),
      when(col("is_seed"), lit(scale)).otherwise(lit(0L)).as("rank"),
      col("outdeg"))
    for (_ <- 1 to iters) {
      val mass = sym.join(bcast(ranks), sym("u") === ranks("node"))
        .select(col("v").as("node"), expr("rank div outdeg").as("contrib"))
        .groupBy(col("node")).agg(sum(col("contrib")).as("mass"))
      ranks = deg.join(bcast(mass), "node")
        .select(col("node"),
          (when(col("is_seed"), lit(teleport)).otherwise(lit(0L)) +
            expr("(85 * mass) div 100")).as("rank"),
          col("outdeg"))
    }
    // Prepared callers get the lazy chain ([[pageRankCore]]'s r17 rule).
    if (owned.isEmpty) ranks
    else {
      val out = ranks.localCheckpoint(true)
      owned.foreach(_.unpersist(blocking = false))
      out
    }
  }

  /** BFS distance-layer census from a deterministic seed (the MINIMUM
    * node id — engine-independent, so a SQL recursive-CTE oracle lands
    * on the same seed) over an ALREADY-SYMMETRIZED distinct edge list.
    * Runs a FIXED `rounds` of frontier expansion — each round one
    * left-semi equi-join (edges ⋈ frontier on the node id) + one
    * anti-join against the visited set, both hash-partitioned, with a
    * per-round localCheckpoint keeping lineage flat (the
    * [[connectedComponents]] discipline); the oracle unrolls the same
    * horizon, and nodes beyond it census as dist −1 ("unreached") —
    * a bounded-round reachability probe, not an unbounded traversal.
    * Returns (dist, n_nodes): one row per non-empty layer 0..rounds
    * plus the −1 row when unreached nodes remain. */
  def bfsLayersSym(symEdges: DataFrame, src: String, dst: String,
                   rounds: Int): DataFrame = {
    // Validate BEFORE the persists + count below (ADVICE r14): bfsCore
    // re-checks, but by then this wrapper has materialized two frames
    // that would leak their persisted blocks until ContextCleaner GC.
    require(rounds >= 1 && rounds <= 8, s"rounds in [1,8], got $rounds")
    val sym = symEdges
      .select(col(src).cast("long").as("u"), col(dst).cast("long").as("v"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nodes = sym.select(col("u").as("node")).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    bfsCore(sym, nodes, nodes.count(), rounds, Seq(sym, nodes))
  }

  /** [[bfsLayersSym]] over the session graph artifacts
    * ([[pageRankPrepared]]'s contract): `nodes` is the exact (node)
    * vertex set (e.g. the degree artifact's key column), `nNodes` its
    * count — skips the per-query edge persist + distinct + count. */
  def bfsLayersPrepared(symEdges: DataFrame, src: String, dst: String,
                        nodes: DataFrame, nNodes: Long,
                        rounds: Int): DataFrame =
    bfsCore(
      symEdges.select(col(src).cast("long").as("u"),
        col(dst).cast("long").as("v")),
      nodes.select(col("node")), nNodes, rounds, Nil)

  /** The frontier-expansion core shared by the BFS entrypoints. Only
    * each round's FRONTIER is checkpointed; the visited set stays a
    * lazy union of the ≤ rounds+1 checkpointed layers (plan depth is
    * linear in the bounded round count, and the union's inputs are
    * already-materialized LogicalRDDs — the former per-round visited
    * checkpoint re-materialized node-cardinality rows every round for
    * no lineage benefit, one extra action per round, VERDICT r13 #3). */
  private def bfsCore(sym: DataFrame, nodes: DataFrame, nNodes: Long,
                      rounds: Int, owned: Seq[DataFrame]): DataFrame = {
    require(rounds >= 1 && rounds <= 8, s"rounds in [1,8], got $rounds")
    val seed = nodes.agg(min(col("node")).as("node"))
    // Frontier and visited sets are node-cardinality; broadcast keeps
    // the per-round semi/anti joins map-side against the edge list
    // (same regime as the PageRank family; AQE shuffles past budget).
    val bcast: DataFrame => DataFrame =
      if (nNodes <= RankBroadcastMaxNodes) broadcast(_) else identity
    val layers = scala.collection.mutable.ArrayBuffer[DataFrame]()
    var frontier = seed.withColumn("dist", lit(0)).localCheckpoint(true)
    layers += frontier
    var visited = frontier
    var d = 0
    while (d < rounds) {
      d += 1
      val next = sym
        .join(bcast(frontier.select(col("node").as("u"))), Seq("u"),
          "left_semi")
        .select(col("v").as("node")).distinct()
        .join(bcast(visited), Seq("node"), "left_anti")
        .withColumn("dist", lit(d))
        .localCheckpoint(true)
      layers += next
      visited = visited.union(next)
      frontier = next
    }
    val unreached = nodes.join(visited, Seq("node"), "left_anti")
      .agg(count(lit(1)).as("n_nodes"))
      .select(lit(-1).as("dist"), col("n_nodes"))
      .filter(col("n_nodes") > 0)
    val out = visited.groupBy(col("dist"))
      .agg(count(lit(1)).as("n_nodes"))
      .union(unreached)
      .localCheckpoint(true)
    layers.foreach(releaseCheckpoint)
    owned.foreach(_.unpersist(blocking = false))
    out
  }

  /** Weighted synchronous label propagation (Raghavan, Albert & Kumara,
    * "Near linear time algorithm to detect community structures in
    * large-scale networks", Phys. Rev. E 76, 2007) over a SYMMETRIC
    * weighted edge list — the community detector that complements the
    * component/k-core/PageRank family: components find connectivity,
    * LPA finds DENSITY (which parts of one giant component cluster
    * together). Returns one (node, lbl) row per node after `iters`
    * synchronous rounds; nodes sharing `lbl` are one community.
    *
    * Determinism (the oracle contract): every node starts labeled with
    * its own id; each round every node simultaneously adopts the label
    * with the LARGEST total incident edge weight among its neighbors,
    * ties broken by the SMALLEST label — a pure function of the input,
    * unlike the randomized asynchronous original. The argmax is the
    * combinable max-of-struct (s, −lbl) aggregate, not a window sort.
    *
    * Scale: per round one equi-join attaching the node-cardinality
    * label table to the corpus-scale edge list (broadcast under the
    * [[RankBroadcastMaxNodes]] budget — the edge list never re-shuffles)
    * plus two partial-aggregable groupBys; labels localCheckpoint per
    * round (bounded plan, dead rounds released). Fixed `iters`, not a
    * fixpoint: LPA label-flip counts decay geometrically on clustered
    * graphs and the synchronous update can 2-cycle on bipartite-ish
    * subgraphs, so a bounded round count IS the termination rule. */
  def labelPropagationSym(symEdges: DataFrame, src: String, dst: String,
                          weight: String, iters: Int = 3): DataFrame = {
    val sym = symEdges
      .select(col(src).cast("long").as("u"), col(dst).cast("long").as("v"),
        col(weight).cast("long").as("w"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nodes = sym.select(col("u").as("node")).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    lpaCore(sym, nodes, nodes.count(), iters, Seq(sym, nodes))
  }

  /** [[labelPropagationSym]] with the vertex-set artifact supplied
    * (`nodes` = the exact (node) set, `nNodes` its count) — skips the
    * per-query node distinct + count. UNLIKE the other Prepared
    * entrypoints, `symEdges` should be the BUCKETED TABLE (or any
    * source whose scan reports the node-hash distribution) and IS
    * persisted for the loop: LPA's per-round tally is an edge-scale
    * (node, lbl) aggregate that needs that distribution to stay
    * exchange-free — a checkpoint frame's UnknownPartitioning would
    * re-shuffle 2|E| rows per round (measured ~30% slower), and the
    * columnar persist preserves the scan's partitioning where a
    * checkpoint does not. */
  def labelPropagationPrepared(symEdges: DataFrame, src: String,
                               dst: String, weight: String,
                               nodes: DataFrame, nNodes: Long,
                               iters: Int = 3): DataFrame = {
    val sym = symEdges
      .select(col(src).cast("long").as("u"), col(dst).cast("long").as("v"),
        col(weight).cast("long").as("w"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    lpaCore(sym, nodes.select(col("node")), nNodes, iters, Seq(sym))
  }

  /** The synchronous-round core shared by the LPA entrypoints. */
  private def lpaCore(sym: DataFrame, nodes: DataFrame, nNodes: Long,
                      iters: Int, owned: Seq[DataFrame]): DataFrame = {
    val bcast: DataFrame => DataFrame =
      if (nNodes <= RankBroadcastMaxNodes) broadcast(_) else identity
    var labels = nodes.select(col("node"), col("node").as("lbl"))
    val stale = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    for (_ <- 1 to iters) {
      // Neighbor-label tally for node u = labels of its peers v weighted
      // by w; (node, lbl) partials combine map-side before the shuffle.
      val tally = sym.join(bcast(labels), sym("v") === labels("node"))
        .select(sym("u").as("node"), col("lbl"), col("w"))
        .groupBy(col("node"), col("lbl")).agg(sum(col("w")).as("s"))
      // max weight, tie → min label: lexicographic max of (s, −lbl).
      // Labels are node ids (≥ 0 by the graph builders' contract), so
      // the negation cannot overflow.
      val next = tally.groupBy(col("node"))
        .agg(max(struct(col("s"), (-col("lbl")).as("nl"))).as("m"))
        .select(col("node"), (-col("m.nl")).as("lbl"))
        .localCheckpoint(true)
      stale += next
      labels = next
    }
    stale.dropRight(1).foreach(releaseCheckpoint)
    owned.foreach(_.unpersist(blocking = false))
    labels
  }

  /** Degree assortativity — the Pearson correlation of endpoint degrees
    * over the (symmetrized) edge list: do heavy nodes attach to heavy
    * nodes (r > 0, social-graph shape) or to leaves (r < 0, hub-spoke
    * shape)? The one-number structural summary that decides whether
    * hub-aware strategies (salting, k-core, degree-ordered enumeration)
    * will matter on a given graph.
    *
    * On the symmetric list the x and y marginals coincide, so r reduces
    * to (n·Σxy − (Σx)²)/(n·Σx² − (Σx)²) — exact decimal(38,0) integer
    * sufficient statistics (the correlation/standardize discipline), ONE
    * double division. `mean_degree` is the EDGE-END mean (the
    * degree-biased Σd²/Σd marginal the correlation is taken over), not
    * the node mean. Shape: dedup edges, one degree aggregate, two
    * equi-joins to attach endpoint degrees, one global reduce. */
  def degreeAssortativity(pairs: DataFrame, a: String,
                          b: String): DataFrame =
    degreeAssortativityCanon(pairs
      .select(least(col(a), col(b)).as("u"), greatest(col(a), col(b)).as("v"))
      .filter(col("u") =!= col("v")).distinct())

  /** [[degreeAssortativity]] over an ALREADY-CANONICAL (u < v, distinct)
    * edge list — the bucketed-table variant
    * ([[localClusteringCensusCanon]]'s contract). */
  def degreeAssortativityCanon(canonEdges: DataFrame): DataFrame =
    degreeAssortativityCanon(canonEdges, None)

  /** [[degreeAssortativityCanon]] with an optional precomputed
    * `(node, d)` degree frame — same contract as the
    * [[localClusteringCensusCanon]] overload. */
  def degreeAssortativityCanon(canonEdges: DataFrame,
                               precomputedDeg: Option[DataFrame])
  : DataFrame = {
    // Same persist discipline as [[localClusteringCensusCanon]]: with
    // the degree artifact supplied, the edge frame is read once (the
    // endpoint attach) and the artifact is already materialized — both
    // per-query persists are skipped.
    val e =
      if (precomputedDeg.isEmpty)
        canonEdges.persist(StorageLevel.MEMORY_AND_DISK)
      else canonEdges
    val deg = precomputedDeg.getOrElse(e.select(col("u").as("node"))
        .union(e.select(col("v").as("node")))
        .groupBy(col("node")).agg(count(lit(1)).as("d"))
        .persist(StorageLevel.MEMORY_AND_DISK))
    val ends = e
      .join(deg.select(col("node").as("u"), col("d").as("du")), "u")
      .join(deg.select(col("node").as("v"), col("d").as("dv")), "v")
    val sym = ends.select(col("du").as("x"), col("dv").as("y"))
      .union(ends.select(col("dv").as("x"), col("du").as("y")))
    val D38 = "decimal(38,0)"
    val stats = sym.agg(count(lit(1)).cast(D38).as("__n"),
      sum(col("x").cast(D38)).as("__sx"),
      sum((col("x").cast(D38)) * (col("y").cast(D38))).as("__sxy"),
      sum((col("x").cast(D38)) * (col("x").cast(D38))).as("__sxx"))
    val nNodes = deg.agg(count(lit(1)).as("n_nodes"))
    // A regular graph (all degrees equal) zeroes the variance term
    // exactly in the decimal integers — 0/0 is engine-divergent, so the
    // degenerate mixing coefficient reads null on both sides.
    val denom = col("__n") * col("__sxx") - col("__sx") * col("__sx")
    val out = stats.crossJoin(nNodes)
      .select(col("n_nodes"),
        expr("CAST(__n AS BIGINT) div 2").as("n_edges"),
        (col("__sx").cast("double") / col("__n").cast("double"))
          .as("mean_degree"),
        when(denom =!= lit(0),
          (col("__n") * col("__sxy") - col("__sx") * col("__sx"))
            .cast("double") / denom.cast("double")).as("assortativity"))
      .localCheckpoint(true)
    if (precomputedDeg.isEmpty) {
      e.unpersist(blocking = false)
      deg.unpersist(blocking = false)
    }
    out
  }
}
