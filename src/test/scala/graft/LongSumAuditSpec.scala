package graft

import org.apache.spark.sql.catalyst.expressions.{Expression, Multiply}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Sum}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan, Window => LWindow}
import org.apache.spark.sql.types.LongType
import org.scalatest.funsuite.AnyFunSuite

/** Systematic sweep for the silent-overflow class VERDICT r10/r11 had to
  * find by hand: a BIGINT `sum()` whose addend contains a PRODUCT.
  * Row-scaled e4 money products (`round(price*100) * (10000 - round(
  * discount*10000))` ≈ 1e11/row) wrap 2⁶³ once the group scales with the
  * corpus (7.8e11 lineitems at 100 TB ≈ sf130k → ~1e23); ANSI mode turns
  * that into a runtime error, but only on data big enough to trip it —
  * no test corpus will. This audit is the static CI form: walk every
  * query's analyzed plan, collect every Sum→LongType whose addend
  * contains a Multiply (aggregate AND window variants), and require each
  * site to be on the reviewed allowlist below, where its boundedness
  * argument lives. A new long product-sum fails here until it is either
  * routed through decimal(38,0) (the corpus-scaled discipline — q202
  * family r11, q199/q339 r12) or argued bounded and allowlisted.
  *
  * Scale anchors used in the arguments (100 TB ≈ sf130k): lineitem
  * 7.8e11 rows, orders 1.5e11, events 1.3e11, documents 6.5e10; per-row
  * cents ≤ 5e7, so even a CORPUS-GLOBAL plain-cents sum peaks ≈ 2.2e18 —
  * inside 2⁶³ with ~4× headroom — which is why un-multiplied cents sums
  * are out of scope and the PRODUCT form is the class that wraps. */
class LongSumAuditSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val sf = "/root/testdata/sf0.001"

  /** (query, canonical addend SQL) pairs REVIEWED as bounded. Grouped by
    * argument:
    *
    * CASE-indicator sums (addend 0/1 or a small constant comparison —
    * the product is inside a predicate, the summed value is ≤ 1):
    * q76/q127/q129/q159/q292.
    *
    * Quantized-domain products: ilog2 pairs ≤ 64² = 4096/row (OLS fits
    * q77/q143/q180/q185 — ≤ 4096·|rows| ≈ 2.6e14); tie counts off a
    * cents-quantized value histogram, t ≤ rows/4e4 → Σ(t²−1) ≤ ~4e17
    * (q103); rater-count confusion cells, raters fixed (q125); counts ×
    * quantized log-ratio ≤ ~100 (q137); bootstrap weight ≤ resamples ×
    * quantized value (q150).
    *
    * Corpus-content bounds: BPE cnt·len ≤ total corpus characters ≤ 1e14
    * (q121); tf products ≤ doc-length² ≈ 1e8 over doc- or pair-bounded
    * groups (q265); co-purchase deg ≤ basket-bounded ~1e4, Σ deg² ≈
    * 2.6e14 (q84); 7·day_cents − s7 is a week-window residual of per-day
    * events cents ≈ 2e12, summed over ≤ 2500 days (q259).
    *
    * Group-bounded money: TPC-H group SIZE is constant as the corpus
    * scales (≈600 lineitems/supplier q213, ≈30/part q247/q294/q332/q347/
    * q356, ≈30/(nation,part) q255, per-customer ≈10 orders q176/q273/
    * q322, per-(type,day)/(month) events q278/q290/q313, per-(region,
    * quarter) ≈ 2.7e17/140 q325, per-(p_type,suppkey) q346, per-user
    * q239, per-quantity-bucket discount e4 ≤ 1e4·1.6e10 q354, corpus
    * KPI cents ≈ 2.2e18 with 4× headroom q300 — each product addend ×
    * group size stays ≥ 10× inside 2⁶³). */
  private val allowlist: Set[(String, String)] = Set(
    ("q103_ranksum", "((__ties * __ties) - 1L)"),
    ("q121_bpe_segment", "(cnt * CAST(length(w) AS BIGINT))"),
    ("q121_bpe_segment", "(cnt * n_subtokens)"),
    ("q125_label_agreement", "(__r * __c)"),
    ("q127_tukey_fences",
      "CASE WHEN (((__v * CAST(8 AS BIGINT)) < ((__q41 * CAST(2 AS BIGINT)) - ((__q43 - __q41) * CAST(3 AS BIGINT)))) OR ((__v * CAST(8 AS BIGINT)) > ((__q43 * CAST(2 AS BIGINT)) + ((__q43 - __q41) * CAST(3 AS BIGINT))))) THEN 1L ELSE 0L END"),
    ("q127_tukey_fences",
      "CASE WHEN (((__v * CAST(4 AS BIGINT)) < (__q41 - ((__q43 - __q41) * CAST(3 AS BIGINT)))) OR ((__v * CAST(4 AS BIGINT)) > (__q43 + ((__q43 - __q41) * CAST(3 AS BIGINT))))) THEN 1L ELSE 0L END"),
    ("q129_dup_span_share",
      "CASE WHEN ((CAST(2 AS BIGINT) * n_dup_spans) >= n_spans) THEN 1L ELSE 0L END"),
    ("q137_dsir_score", "(__c * __lr)"),
    ("q143_zipf_slope", "(__x * __y)"),
    ("q143_zipf_slope", "(__x * __x)"),
    // q150 (r17 column form): the ×b explode became b sum columns, so
    // the b affine-hash weight expressions appear inline per addend —
    // same review as the old (__w * __v): weight = pmod(..,3) ∈ {0,1,2},
    // __v a quantity ≤ ~51, addend ≤ ~102/row. Generated below.
    ("q159_boilerplate",
      "CASE WHEN ((__df * CAST(100 AS BIGINT)) >= (CAST(6 AS BIGINT) * __nd)) THEN 1L ELSE 0L END"),
    ("q176_revenue_gini", "CAST(FLOOR((o_totalprice * 100.0D)) AS BIGINT)"),
    ("q180_heaps_law", "(__x * __y)"),
    ("q180_heaps_law", "(__x * __x)"),
    ("q185_degree_powerlaw", "(__x * __y)"),
    ("q185_degree_powerlaw", "(__x * __x)"),
    ("q213_tpch_q15",
      "(CAST(round((l_extendedprice * CAST(100 AS DOUBLE)), 0) AS BIGINT) * (10000L - CAST(round((l_discount * CAST(10000 AS DOUBLE)), 0) AS BIGINT)))"),
    ("q239_samplesize_planner",
      "CASE WHEN ((event_type = 'purchase') AND (value IS NOT NULL)) THEN CAST((CAST(value AS DECIMAL(12,2)) * CAST(100 AS DECIMAL(3,0))) AS BIGINT) ELSE 0L END"),
    ("q247_tpch_q11",
      "CAST(round((l_extendedprice * CAST(100 AS DOUBLE)), 0) AS BIGINT)"),
    ("q255_nation_top_parts",
      "(CAST(round((l_extendedprice * CAST(100 AS DOUBLE)), 0) AS BIGINT) * (10000L - CAST(round((l_discount * CAST(10000 AS DOUBLE)), 0) AS BIGINT)))"),
    ("q259_seasonal_decompose", "((7L * day_cents) - s7)"),
    ("q265_sparse_sim_join", "(tfa * tfb)"),
    ("q265_sparse_sim_join", "(tf * tf)"),
    ("q273_pareto_concentration",
      "CAST(round((o_totalprice * CAST(100 AS DOUBLE)), 0) AS BIGINT)"),
    ("q278_record_days",
      "CAST(round((value * CAST(100 AS DOUBLE)), 0) AS BIGINT)"),
    ("q290_rollup_lattice_audit",
      "CAST(round((value * CAST(100 AS DOUBLE)), 0) AS BIGINT)"),
    ("q292_attribution_window_sweep",
      "CASE WHEN ((gap_us IS NOT NULL) AND (gap_us <= (window_hours * 3600000000L))) THEN 1L ELSE 0L END"),
    ("q294_topk_movers",
      "(CAST(round((l_extendedprice * CAST(100 AS DOUBLE)), 0) AS BIGINT) * (10000L - CAST(round((l_discount * CAST(10000 AS DOUBLE)), 0) AS BIGINT)))"),
    ("q300_kpi_scorecard",
      "CAST(round((o_totalprice * CAST(100 AS DOUBLE)), 0) AS BIGINT)"),
    ("q313_event_study",
      "CAST(round((value * CAST(100 AS DOUBLE)), 0) AS BIGINT)"),
    ("q322_key_account_risk",
      "CAST(round((o_totalprice * CAST(100 AS DOUBLE)), 0) AS BIGINT)"),
    ("q325_region_qoq",
      "CAST(round((l_extendedprice * CAST(100 AS DOUBLE)), 0) AS BIGINT)"),
    ("q332_seasonal_items",
      "CAST(round((l_extendedprice * CAST(100 AS DOUBLE)), 0) AS BIGINT)"),
    ("q346_supplier_hhi",
      "CAST(round((l_extendedprice * CAST(100 AS DOUBLE)), 0) AS BIGINT)"),
    ("q347_discount_dispersion",
      "CAST(round((l_extendedprice * CAST(100 AS DOUBLE)), 0) AS BIGINT)"),
    ("q354_discount_by_quantity",
      "CAST(round((l_discount * CAST(10000 AS DOUBLE)), 0) AS BIGINT)"),
    ("q356_part_name_census",
      "CAST(round((l_extendedprice * CAST(100 AS DOUBLE)), 0) AS BIGINT)"),
    ("q76_robust_outliers",
      "CASE WHEN (CAST(__dev2 AS DOUBLE) > ((3.0D * 1.4826D) * (CAST(__mad4 AS DOUBLE) / 2.0D))) THEN 1L ELSE 0L END"),
    ("q77_group_trend", "(__x * __y)"),
    ("q77_group_trend", "(__x * __x)"),
    ("q84_triangles", "(deg * (deg - CAST(1 AS BIGINT)))")) ++
    (0 until 32).map(i => ("q150_bootstrap_ci",
      s"(pmod(pmod(((${graft.operators.DedupOps.aCoef(i)}L * __h) + " +
        s"${graft.operators.DedupOps.bCoef(i)}L), " +
        s"${graft.operators.TextOps.HashPrime}L), 3L) * __v)")).toSet

  /** Canonical addend text: strip catalog/db/table qualifiers (session
    * artifact names embed a corpus-dir hash that must not leak into the
    * reviewed keys). */
  private def canon(sql: String): String =
    sql.replaceAll("\\bspark_catalog\\.[A-Za-z0-9_]+\\.[A-Za-z0-9_]+\\.", "")

  private def longProductSums(plan: LogicalPlan): Seq[String] = {
    val out = Seq.newBuilder[String]
    def fromExprs(exprs: Seq[Expression]): Unit = exprs.foreach(_.foreach {
      case ae: AggregateExpression => ae.aggregateFunction match {
        case s: Sum if s.dataType == LongType &&
            s.child.exists(_.isInstanceOf[Multiply]) =>
          out += canon(s.child.sql)
        case _ => ()
      }
      case _ => ()
    })
    plan.foreach {
      case a: Aggregate => fromExprs(a.aggregateExpressions)
      case w: LWindow   => fromExprs(w.windowExpressions)
      case _            => ()
    }
    out.result()
  }

  test("every BIGINT sum-of-products in every query plan is decimal'd " +
    "or on the reviewed bounded-group allowlist") {
    val findings = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val plan = fn(spark, sf).queryExecution.analyzed
        longProductSums(plan).map(sql => (name, sql))
    }.distinct
    val rogue = findings.filterNot(allowlist.contains)
    assert(rogue.isEmpty,
      s"unreviewed BIGINT product-sums (route through decimal(38,0) or " +
        s"review + allowlist):\n" +
        rogue.map { case (q, s) => s"  $q: $s" }.mkString("\n"))
    // The allowlist must not rot: every entry still corresponds to a
    // live site (a stale entry hides a future regression behind the
    // same key).
    val found = findings.toSet
    val stale = allowlist.filterNot(found.contains)
    assert(stale.isEmpty,
      s"allowlist entries with no matching plan site (remove them):\n" +
        stale.map { case (q, s) => s"  $q: $s" }.mkString("\n"))
  }
}
