package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins closed-form identities of the round-10 statistical-query family
  * (q222-q229) on constructed inputs — the oracle twin proves Spark and
  * DuckDB agree, these prove they agree on the RIGHT answer: Qini on a
  * pure-treatment-effect corpus, χ² = 0 under exact independence,
  * priority-sample threshold admission, Mann-Kendall / Pettitt on known
  * monotone and step series, Spearman ±1 on monotone pairs, and the
  * Simpson collision identity.
  */
class StatQuerySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def dirWith(events: Option[DataFrame] = None,
                      documents: Option[DataFrame] = None): String = {
    val dir = Files.createTempDirectory("stat_query_spec_").toString
    events.foreach(_.write.mode("overwrite").parquet(s"$dir/events.parquet"))
    documents.foreach(
      _.write.mode("overwrite").parquet(s"$dir/documents.parquet"))
    dir
  }

  private def evDf(rows: (Long, Long, Long, String, java.lang.Double)*) =
    rows.toDF("event_id", "us", "user_id", "event_type", "value")
      .select(col("event_id"), timestamp_micros(col("us")).as("ts"),
        col("user_id"), col("event_type"), col("value"),
        lit("{}").as("props"))

  private def docDf(rows: (Long, String, String, String, Long)*) =
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")

  private val Day = 86400000000L

  test("q222 qini: pure treatment effect reads uplift 1.0, qini = conv_t") {
    // 8 users, identical pre-period score; odd ids (arm 1) purchase in
    // the post period, even ids only view — a clean causal lift.
    val rows = (1L to 8L).flatMap { u =>
      Seq((u * 10L, 0L, u, "view", null: java.lang.Double)) ++
        (if (u % 2 == 1) Seq((u * 10L + 1L, 3L * Day, u, "purchase",
          java.lang.Double.valueOf(1.0)))
         else Seq((u * 10L + 1L, 3L * Day, u, "view",
           null: java.lang.Double)))
    }
    val dir = dirWith(events = Some(evDf(rows: _*)))
    val out = SparkEntry.queries("q222_qini_deciles")(spark, dir).collect()
    assert(out.length == 1) // one score value -> one value-cut decile
    val r = out.head
    assert(r.getAs[Long]("decile") == 0L)
    assert(r.getAs[Long]("n_t") == 4L && r.getAs[Long]("n_c") == 4L)
    assert(r.getAs[Long]("conv_t") == 4L && r.getAs[Long]("conv_c") == 0L)
    assert(r.getAs[Double]("uplift") == 1.0)
    assert(r.getAs[Double]("qini") == 4.0)
  }

  test("q223 chi2: an exactly independent 2x2 table reads chi2 = 0") {
    val docs = for (s <- Seq("A", "B"); l <- Seq("en", "de"); i <- 1 to 5)
      yield (s.hashCode.toLong * 100 + l.hashCode % 10 + i,
        "t", l, s, 1L)
    val dir = dirWith(documents = Some(docDf(docs: _*)))
    val out =
      SparkEntry.queries("q223_chi2_independence")(spark, dir).collect()
    assert(out.length == 4)
    out.foreach { r =>
      assert(r.getAs[Double]("e") == 5.0)
      assert(r.getAs[Double]("contrib") == 0.0)
      assert(r.getAs[Double]("chi2") == 0.0)
      assert(r.getAs[Long]("dof") == 1L)
    }
  }

  test("q224 priority sample: every kept priority clears tau and the " +
    "HT weight dominates the raw weight") {
    val docs = (1L to 150L).map(i => (i, "t", "en", "s", 10L + i % 7))
    val dir = dirWith(documents = Some(docDf(docs: _*)))
    val q = SparkEntry.queries("q224_priority_sample")(spark, dir)
    val out = q.collect()
    assert(out.length == 100)
    val tau = out.head.getAs[Double]("tau")
    assert(tau > 0.0)
    out.foreach { r =>
      assert(r.getAs[Double]("priority") >= tau)
      assert(r.getAs[Double]("ht_weight") >=
        r.getAs[Long]("n_chars").toDouble)
      assert(r.getAs[Double]("ht_weight") >= tau)
    }
    // deterministic: a second run selects the identical id set
    val again = SparkEntry.queries("q224_priority_sample")(spark, dir)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(again == out.map(_.getAs[Long]("doc_id")).toSet)
  }

  test("q226 mann-kendall: strictly increasing dailies read tau_a = 1") {
    // one event on day 0, two on day 1, ... five on day 4: S = C(5,2)
    val rows = for (d <- 0L to 4L; i <- 0L to d)
      yield (d * 100 + i, d * Day + i, 1L, "x", null: java.lang.Double)
    val dir = dirWith(events = Some(evDf(rows: _*)))
    val r = SparkEntry.queries("q226_mann_kendall")(spark, dir).head
    assert(r.getAs[Long]("n_days") == 5L)
    assert(r.getAs[Long]("s") == 10L)
    assert(r.getAs[Double]("tau_a") == 1.0)
    assert(r.getAs[Double]("z") > 0.0)
  }

  test("q227 pettitt: a clean step series localizes the boundary day " +
    "with K = m*h") {
    // days 0-3 at one event/day, days 4-9 at three events/day:
    // K = 4*6 = 24 at the last low day (day 3).
    val rows = (for (d <- 0L to 3L) yield Seq((d, d * Day, 1L, "x",
        null: java.lang.Double))).flatten ++
      (for (d <- 4L to 9L; i <- 0L until 3L)
        yield (d * 10 + i, d * Day + i, 1L, "x", null: java.lang.Double))
    val dir = dirWith(events = Some(evDf(rows: _*)))
    val r =
      SparkEntry.queries("q227_pettitt_changepoint")(spark, dir).head
    assert(r.getAs[Long]("n_days") == 10L)
    assert(r.getAs[Long]("k_stat") == 24L)
    assert(r.getAs[Long]("change_day") == 3L)
  }

  test("q228 spearman: monotone-up reads +1, monotone-down reads -1") {
    // source "up": token count rises with n_chars; "dn": falls.
    val up = (1L to 5L).map(i =>
      (i, Seq.fill(i.toInt)("w").mkString(" "), "en", "up", i * 10))
    val dn = (1L to 5L).map(i =>
      (100 + i, Seq.fill(6 - i.toInt)("w").mkString(" "), "en", "dn",
        i * 10))
    val dir = dirWith(documents = Some(docDf((up ++ dn): _*)))
    val out = SparkEntry.queries("q228_spearman_rank")(spark, dir)
      .collect().map(r => r.getAs[String]("source") ->
        r.getAs[Double]("rho_spearman")).toMap
    assert(out("up") == 1.0)
    assert(out("dn") == -1.0)
  }

  test("q230 welch: hand-computed two-arm spend reads t and dof exactly") {
    // treated (odd ids) post spends {200, 400} cents, control {100, 300}:
    // means 300/200, sem² 10000 each, t = 100/√20000, Welch dof = 2.
    val rows = Seq(
      (1L, 0L, 1L, "view", null: java.lang.Double),
      (2L, 0L, 2L, "view", null: java.lang.Double),
      (3L, 0L, 3L, "view", null: java.lang.Double),
      (4L, 0L, 4L, "view", null: java.lang.Double),
      (11L, 3L * Day, 1L, "purchase", java.lang.Double.valueOf(2.0)),
      (12L, 3L * Day, 2L, "purchase", java.lang.Double.valueOf(1.0)),
      (13L, 3L * Day, 3L, "purchase", java.lang.Double.valueOf(4.0)),
      (14L, 3L * Day, 4L, "purchase", java.lang.Double.valueOf(3.0)))
    val dir = dirWith(events = Some(evDf(rows: _*)))
    val r = SparkEntry.queries("q230_welch_ttest")(spark, dir).head
    assert(r.getAs[Long]("n_t") == 2L && r.getAs[Long]("n_c") == 2L)
    assert(r.getAs[Double]("mean_t") == 300.0)
    assert(r.getAs[Double]("mean_c") == 200.0)
    assert(r.getAs[Double]("t_stat") == 100.0 / math.sqrt(20000.0))
    assert(r.getAs[Double]("dof_welch") == 2.0)
  }

  test("q231 anova: the textbook two-group example reads F = 8") {
    // A lengths {10,20}, B {30,40}: SSB=400, SSW=100, F=(400/1)/(100/2)=8
    val docs = Seq((1L, "t", "en", "A", 10L), (2L, "t", "en", "A", 20L),
      (3L, "t", "en", "B", 30L), (4L, "t", "en", "B", 40L))
    val dir = dirWith(documents = Some(docDf(docs: _*)))
    val r = SparkEntry.queries("q231_anova_oneway")(spark, dir).head
    assert(r.getAs[Long]("k") == 2L && r.getAs[Long]("n_docs") == 4L)
    assert(r.getAs[Double]("ssb") == 400.0)
    assert(r.getAs[Double]("ssw") == 100.0)
    assert(r.getAs[Double]("f_stat") == 8.0)
  }

  test("q232 kruskal-wallis: tie-free ranks read the closed-form H") {
    // ranks A={1,2}, B={3,4}: H = 12*(4.5+24.5)/(4*5) - 3*5 = 2.4, C=1
    val docs = Seq((1L, "t", "en", "A", 10L), (2L, "t", "en", "A", 20L),
      (3L, "t", "en", "B", 30L), (4L, "t", "en", "B", 40L))
    val dir = dirWith(documents = Some(docDf(docs: _*)))
    val r = SparkEntry.queries("q232_kruskal_wallis")(spark, dir).head
    assert(r.getAs[Long]("k") == 2L && r.getAs[Long]("n_docs") == 4L)
    assert(r.getAs[Double]("tie_correction") == 1.0)
    assert(r.getAs[Double]("h_stat") == 12.0 * 29.0 / 20.0 - 15.0)
  }

  test("q233 cmh: per-stratum null effects read OR_MH = 1 exactly") {
    // stratum 0 (no pre events): 2/4 convert in each arm (OR 1);
    // stratum 1 (one pre event): 3/4 convert in each arm (OR 1).
    val pre = (9L to 16L).map(u => (900L + u, 0L, u, "view",
      null: java.lang.Double))
    val post = (1L to 16L).map { u =>
      val converts = (u <= 8 && (u == 1 || u == 2 || u == 3 || u == 4)) ||
        (u > 8 && u != 15 && u != 16)
      (u, 3L * Day, u, if (converts) "purchase" else "view",
        if (converts) java.lang.Double.valueOf(1.0)
        else null: java.lang.Double)
    }
    val dir = dirWith(events = Some(evDf((pre ++ post): _*)))
    val r = SparkEntry.queries("q233_cmh_odds_ratio")(spark, dir).head
    assert(r.getAs[Long]("n_strata") == 2L)
    assert(r.getAs[Long]("aa") == 5L && r.getAs[Long]("bb") == 3L)
    assert(r.getAs[Long]("cc") == 5L && r.getAs[Long]("dd") == 3L)
    assert(r.getAs[Double]("or_mh") == 1.0)
    assert(r.getAs[Double]("or_crude") == 1.0)
  }

  test("q234 neyman: a zero-variance stratum gets zero allocation") {
    val docs = Seq((1L, "t", "en", "A", 10L), (2L, "t", "en", "A", 10L),
      (3L, "t", "en", "B", 10L), (4L, "t", "en", "B", 20L),
      (5L, "t", "en", "B", 30L))
    val dir = dirWith(documents = Some(docDf(docs: _*)))
    val out = SparkEntry.queries("q234_neyman_allocation")(spark, dir)
      .collect().map(r => r.getAs[String]("source") ->
        r.getAs[Long]("n_alloc")).toMap
    assert(out("A") == 0L)
    assert(out("B") == 1000L)
  }

  test("q235 chapman: one exact pair, two block pairs, one overlap " +
    "reads N-hat = 2") {
    val sameText = "the very same duplicated text body here"
    val p = "shared twenty-four-char "
    val docs = Seq(
      (1L, sameText, "en", "s", sameText.length.toLong),
      (2L, sameText, "en", "s", sameText.length.toLong),
      (3L, p + "tail one", "en", "s", 40L),
      (4L, p + "tail two", "en", "s", 40L))
    val dir = dirWith(documents = Some(docDf(docs: _*)))
    val r =
      SparkEntry.queries("q235_capture_recapture")(spark, dir).head
    assert(r.getAs[Long]("n1") == 1L)
    assert(r.getAs[Long]("n2") == 2L)
    assert(r.getAs[Long]("m") == 1L)
    assert(r.getAs[Double]("chapman_total") == 2.0)
  }

  test("q236 jackknife: theta-hat is the exact conversion rate and " +
    "the SE is finite and nonnegative") {
    val rows = (1L to 40L).map { u =>
      (u, u * 1000L, u, if (u % 4 == 0) "purchase" else "view",
        null: java.lang.Double)
    }
    val dir = dirWith(events = Some(evDf(rows: _*)))
    val r = SparkEntry.queries("q236_jackknife_se")(spark, dir).head
    assert(r.getAs[Long]("n_users") == 40L)
    assert(r.getAs[Long]("n_converters") == 10L)
    assert(r.getAs[Double]("theta_hat") == 0.25)
    val se = r.getAs[Double]("se_jackknife")
    assert(se >= 0.0 && !se.isNaN && !se.isInfinite)
  }

  test("q237 effect sizes: hand-computed 2x4 arms read RD/RR/OR and " +
    "the bucketed AUC exactly") {
    // treated (odd): converts 1→200c, 3→400c; 5,7 don't. control
    // (even): 2→100c; 4,6,8 don't. RD=0.25, RR=2, OR=3; ilog2 buckets
    // give R2_t=42 → AUC=(42-20)/32.
    val pre = (1L to 8L).map(u => (800L + u, 0L, u, "view",
      null: java.lang.Double))
    val post = Seq(
      (1L, 3L * Day, 1L, "purchase", java.lang.Double.valueOf(2.0)),
      (3L, 3L * Day, 3L, "purchase", java.lang.Double.valueOf(4.0)),
      (2L, 3L * Day, 2L, "purchase", java.lang.Double.valueOf(1.0)))
    val dir = dirWith(events = Some(evDf((pre ++ post): _*)))
    val r = SparkEntry.queries("q237_effect_sizes")(spark, dir).head
    assert(r.getAs[Long]("n_t") == 4L && r.getAs[Long]("n_c") == 4L)
    assert(r.getAs[Long]("x_t") == 2L && r.getAs[Long]("x_c") == 1L)
    assert(r.getAs[Double]("risk_diff") == 0.25)
    assert(r.getAs[Double]("relative_risk") == 2.0)
    assert(r.getAs[Double]("odds_ratio") == 3.0)
    assert(r.getAs[Double]("cohens_d") > 0.0)
    assert(r.getAs[Double]("auc_bucketed") == (42.0 - 20.0) / 32.0)
  }

  test("q238 friedman: a perfectly consistent ordering reads the " +
    "k=2 maximum chi2 = n(k-1) = 3") {
    // type a beats type b on every one of 3 days
    val rows = (for (d <- 0L to 2L; i <- 0L until 2L)
      yield (d * 10 + i, d * Day + i, 1L, "a", null: java.lang.Double)) ++
      (for (d <- 0L to 2L)
        yield (d * 10 + 9, d * Day + 9, 1L, "b", null: java.lang.Double))
    val dir = dirWith(events = Some(evDf(rows: _*)))
    val r = SparkEntry.queries("q238_friedman")(spark, dir).head
    assert(r.getAs[Long]("k") == 2L)
    assert(r.getAs[Long]("n_days") == 3L)
    assert(r.getAs[Double]("chi2_friedman") == 3.0)
  }

  test("q241 mcnemar: discordant cells 3 vs 1 read chi2 1.0, cc 0.25") {
    // both: u1,u2; b (pre only): u3,u4,u5; c (post only): u6;
    // neither: u7,u8
    def pre(u: Long, i: Long) = (u * 100 + i, 0L + i, u, "purchase",
      java.lang.Double.valueOf(1.0))
    def post(u: Long, i: Long) = (u * 100 + 50 + i, 3L * Day + i, u,
      "purchase", java.lang.Double.valueOf(1.0))
    def anchor(u: Long) = Seq(
      (u * 100 + 98, 1L, u, "view", null: java.lang.Double),
      (u * 100 + 99, 3L * Day, u, "view", null: java.lang.Double))
    val rows = Seq(pre(1, 1), post(1, 1), pre(2, 2), post(2, 2),
      pre(3, 3), pre(4, 4), pre(5, 5), post(6, 6)) ++
      (1L to 8L).flatMap(anchor)
    val dir = dirWith(events = Some(evDf(rows: _*)))
    val r = SparkEntry.queries("q241_mcnemar")(spark, dir).head
    assert(r.getAs[Long]("both_conv") == 2L)
    assert(r.getAs[Long]("b") == 3L && r.getAs[Long]("c") == 1L)
    assert(r.getAs[Long]("neither") == 2L)
    assert(r.getAs[Double]("chi2_mcnemar") == 1.0)
    assert(r.getAs[Double]("chi2_mcnemar_cc") == 0.25)
  }

  test("q242 wilcoxon: bucketed ranks on +300,+500,-100 read " +
    "W+ = 5 and the closed-form z") {
    // u4's zero delta drops; |d| buckets: 100->6, 300/500 -> 8 (tied,
    // doubled avg rank 5); W2+ = 10 -> W+ = 5; z = 2/sqrt(3.5)
    val rows = Seq(
      (11L, 3L * Day, 1L, "purchase", java.lang.Double.valueOf(3.0)),
      (12L, 3L * Day, 2L, "purchase", java.lang.Double.valueOf(5.0)),
      (13L, 0L, 3L, "purchase", java.lang.Double.valueOf(1.0)),
      (14L, 0L, 4L, "purchase", java.lang.Double.valueOf(2.0)),
      (15L, 3L * Day, 4L, "purchase", java.lang.Double.valueOf(2.0)),
      (16L, 0L, 1L, "view", null: java.lang.Double),
      (17L, 0L, 2L, "view", null: java.lang.Double),
      (18L, 3L * Day, 3L, "view", null: java.lang.Double))
    val dir = dirWith(events = Some(evDf(rows: _*)))
    val r =
      SparkEntry.queries("q242_wilcoxon_signed_rank")(spark, dir).head
    assert(r.getAs[Long]("n_eff") == 3L)
    assert(r.getAs[Double]("w_plus") == 5.0)
    assert(r.getAs[Double]("z_approx") == 2.0 / math.sqrt(3.5))
  }

  test("q243 brown-forsythe: identical per-source spreads read F = 0") {
    val docs = Seq((1L, "t", "en", "A", 10L), (2L, "t", "en", "A", 20L),
      (3L, "t", "en", "A", 30L), (4L, "t", "en", "B", 10L),
      (5L, "t", "en", "B", 20L), (6L, "t", "en", "B", 30L))
    val dir = dirWith(documents = Some(docDf(docs: _*)))
    val r = SparkEntry.queries("q243_brown_forsythe")(spark, dir).head
    assert(r.getAs[Long]("k") == 2L && r.getAs[Long]("n_docs") == 6L)
    assert(r.getAs[Double]("ssb") == 0.0)
    assert(r.getAs[Double]("f_bf") == 0.0)
  }

  test("q229 simpson: two equal languages read lambda 1/3") {
    val docs = Seq((1L, "t", "en", "s", 1L), (2L, "t", "en", "s", 1L),
      (3L, "t", "de", "s", 1L), (4L, "t", "de", "s", 1L))
    val dir = dirWith(documents = Some(docDf(docs: _*)))
    val r = SparkEntry.queries("q229_simpson_diversity")(spark, dir).head
    assert(r.getAs[Long]("n_langs") == 2L)
    assert(r.getAs[Long]("n_docs") == 4L)
    assert(r.getAs[Double]("simpson_lambda") == 4.0 / 12.0)
    assert(r.getAs[Double]("diversity") == 1.0 - 4.0 / 12.0)
  }
}
