package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{CleanseOps => C, RelationalOps => R, VizPrep => V}

object SparkTestSession {
  lazy val spark: SparkSession = {
    // Harness mutual exclusion at the SHARED fixture (ADVICE r15):
    // formerly only CatalogSpec's export-sweep test took the lock, so
    // other suites that read or populate the shared /tmp dumps and
    // warehouse artifacts (LlmOpsSpec session sweeps, ApproxSpec q49
    // warm-ups, every suite running SparkEntry.queries over testdata)
    // ran unguarded beside a live Verify/Bench. Every suite builds this
    // session before touching any of that state, and the lock is
    // JVM-lifetime + same-JVM idempotent, so acquiring here makes the
    // exclusion rule structural for the whole forked test JVM.
    assert(HarnessLock.tryAcquire("sbt-test SparkTestSession"),
      "another graft harness process (Verify/Bench) holds the harness " +
        "lock — test suites share /tmp export dumps and warehouse " +
        "artifacts with it; re-run the suite after it exits")
    Session.builder("local[4]", "4").getOrCreate()
  }
}

/** Unit tests for the cleanse/relational/viz operator kernel, pinning the
  * reference's subtle semantics (SURVEY.md §5 unit strategy). */
class OperatorSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("sessions run under ANSI semantics — overflow raises, never " +
    "wraps (the runtime net behind LongSumAuditSpec's static audit)") {
    assert(spark.conf.get("spark.sql.ansi.enabled") == "true")
    val e = intercept[Exception] {
      Seq(Long.MaxValue, 1L).toDF("x").agg(sum(col("x"))).collect()
    }
    assert(e.getMessage.contains("ARITHMETIC_OVERFLOW") ||
      e.getMessage.toLowerCase.contains("overflow"))
  }

  test("C4/C5 bround is half-even like pandas .round") {
    val df = Seq(2.5, 3.5, 2.675, 18.65, 18.75).toDF("x")
      .select(C.roundHalfEven(col("x"), 0).as("r0"),
        C.roundHalfEven(col("x"), 2).as("r2"),
        C.roundHalfEven(col("x"), 1).as("r1"))
    val rows = df.collect()
    assert(rows.map(_.getDouble(0)).toSeq == Seq(2.0, 4.0, 3.0, 19.0, 19.0))
    // shortest-decimal-repr ties resolve half-even: 2.675→2.68, 18.65→18.6
    assert(rows(2).getDouble(1) == 2.68)
    assert(rows(3).getDouble(2) == 18.6)
    assert(rows(4).getDouble(2) == 18.8)
  }

  test("C2 coercion: invalid → null (pandas to_numeric errors=coerce)") {
    val df = Seq("1.5", "x", "", "2", ":").toDF("s")
      .select(C.coerceDouble(col("s")).as("v"))
    assert(df.collect().map(r => Option(r.get(0))).toSeq ==
      Seq(Some(1.5), None, None, Some(2.0), None))
  }

  test("C3 missing-marker replace before coercion (Eurostat ':')") {
    val df = Seq(":", "7").toDF("s")
      .select(C.coerceDouble(
        C.replaceMissingMarker(col("s"), ":", "0")).as("v"))
    assert(df.collect().map(_.getDouble(0)).toSeq == Seq(0.0, 7.0))
  }

  test("json extraction: missing field, malformed doc, and non-numeric " +
    "value all coerce to null (no ANSI error)") {
    val df = Seq("""{"k": 69}""", """{"x": 1}""", "not json",
        """{"k": "abc"}""", null)
      .toDF("props")
      .select(graft.operators.CleanseOps.jsonLong(col("props"), "$.k")
        .as("k"))
    assert(df.collect().map(r =>
      if (r.isNullAt(0)) None else Some(r.getLong(0))).toSeq ==
      Seq(Some(69L), None, None, None, None))
  }

  test("J3 lookup join falls back to input on miss") {
    val data = Seq("germany", "narnia").toDF("name")
    val lookup = Seq(("germany", "DEU")).toDF("k", "v")
    val out = R.lookupWithFallback(data, col("name"), lookup, "k", "v", "canon")
      .select("canon").as[String].collect().sorted
    assert(out.toSeq == Seq("DEU", "narnia"))
  }

  test("A1 dedupFirst is deterministic first-wins per key") {
    val df = Seq((1, "b", 20), (1, "a", 10), (2, "c", 30)).toDF("k", "s", "v")
    val out = R.dedupFirst(df, Seq("k"), Seq(col("v")))
      .orderBy("k").as[(Int, String, Int)].collect()
    assert(out.toSeq == Seq((1, "a", 10), (2, "c", 30)))
  }

  test("F1/J2 anti-join exclusion equals NOT IN for non-null keys") {
    val df = (1 to 10).toDF("k")
    val excl = Seq(2, 4).toDF("e")
    val got = R.antiJoinExclude(df, "k", excl, "e")
      .as[Int].collect().sorted.toSeq
    assert(got == (1 to 10).filterNot(Set(2, 4)).toSeq)
  }

  test("V2 bucketLabel: inclusive-lower exclusive-upper with legend labels") {
    val df = Seq(0.0, 2.9, 3.0, 49.0, 99.0).toDF("x")
      .select(V.bucketLabel(col("x"), Seq(0L -> 3L, 3L -> 50L)).as("b"))
    assert(df.as[String].collect().toSeq ==
      Seq("0 - 3", "0 - 3", "3 - 50", "3 - 50", "out of range"))
  }

  test("C7 per100k rate with guarded division") {
    val df = Seq((5.0, 1000.0), (1.0, 0.0)).toDF("n", "d")
      .select(C.per100k(col("n"), col("d")).as("r"))
    val rows = df.collect()
    assert(rows(0).getDouble(0) == 500.0)
    assert(rows(1).isNullAt(0)) // try_divide: div-by-zero → null, not error
  }

  test("J1 manyToOneViolations detects duplicate keys") {
    val ok = Seq((1, "a"), (2, "b")).toDF("k", "v")
    val bad = ok.union(Seq((1, "c")).toDF("k", "v"))
    assert(R.manyToOneViolations(ok, Seq("k")).isEmpty)
    assert(!R.manyToOneViolations(bad, Seq("k")).isEmpty)
  }

  test("fuzzyCandidates: in-block typos match with true distance; prefix typos escape") {
    val probes = Seq((1L, "smoll ring"), (2L, "Xmall ring")).toDF("pid", "pn")
    val cat = Seq((10L, "small ring"), (11L, "small king")).toDF("cid", "cn")
    val out = graft.operators.DedupOps.fuzzyCandidates(
        probes, col("pn"), cat, col("cn"), prefixLen = 2, maxDist = 2)
      .select(col("pid"), col("cid"), col("edit_dist"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert(out((1L, 10L)) == 1)  // o->a substitution
    assert(out((1L, 11L)) == 2)  // o->a plus r->k
    // probe 2's typo is INSIDE the 2-char prefix -> different block, no row
    assert(!out.keySet.exists(_._1 == 2L))
  }

  test("fuzzyCandidatesBlocked: a suffix blocker recovers prefix typos, " +
    "one levenshtein per pair across passes") {
    val probes = Seq((2L, "Xmall ring")).toDF("pid", "pn")
    val cat = Seq((10L, "small ring")).toDF("cid", "cn")
    val blockers: Seq[org.apache.spark.sql.Column =>
        org.apache.spark.sql.Column] =
      Seq(n => substring(n, 1, 2), n => substring(n, -2, 2))
    val out = graft.operators.DedupOps.fuzzyCandidatesBlocked(
        probes, col("pn"), cat, col("cn"), blockers, maxDist = 2)
      .select(col("pid"), col("cid"), col("edit_dist"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    // prefix pass misses (typo in prefix), suffix pass ("ng") recovers;
    // exactly ONE row — passes dedup before the distance join
    assert(out == Seq((2L, 10L, 1)))
  }

  test("sortedNeighborhood: each record pairs with its next `window` " +
    "sort neighbors inside its block only; ties totalized by id") {
    val df = Seq(
        ("en", 1L, 100L), ("en", 2L, 101L), ("en", 3L, 105L),
        ("en", 4L, 100L), // ties with id 1 on the key -> id order decides
        ("de", 9L, 100L)) // other block: never pairs with en rows
      .toDF("blk", "id", "len")
    val out = graft.operators.DedupOps.sortedNeighborhood(
        df, col("blk"), col("id"), Seq(col("len")), window = 2)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getInt(3)))
      .toSet
    // en sort order: (100,1) (100,4) (101,2) (105,3); de: (100,9) alone
    assert(out == Set(
      ("en", 1L, 4L, 1), ("en", 1L, 2L, 2),
      ("en", 4L, 2L, 1), ("en", 4L, 3L, 2),
      ("en", 2L, 3L, 1)))
    // candidate count is exactly rows*window minus the per-block tail
    assert(out.size == 5)
  }

  test("sortedNeighborhood: null sort keys pin to NULLS LAST (the " +
    "DuckDB/ANSI default), so neighbor order is cross-engine stable") {
    val df = Seq(
        ("en", 1L, Some(100L)), ("en", 2L, Some(200L)),
        ("en", 3L, Option.empty[Long])) // null key must sort AFTER 200
      .toDF("blk", "id", "len")
    val out = graft.operators.DedupOps.sortedNeighborhood(
        df, col("blk"), col("id"), Seq(col("len")), window = 1)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    // order (100,1) (200,2) (null,3): Spark's asc default (NULLS FIRST)
    // would instead yield (3,1),(1,2) — divergent from the oracle
    assert(out == Set((1L, 2L), (2L, 3L)))
  }

  test("reconcileSnapshots: identical snapshots emit nothing; a single " +
    "change surfaces only its bucket; row diff is semi-joined to " +
    "mismatched buckets") {
    import graft.operators.RelationalOps
    val a = (1L to 100L).map(i => (i, s"fp$i")).toDF("id", "fp")
    val same = RelationalOps.reconcileSnapshots(a, a, col("id"), col("fp"),
      buckets = 8)
    assert(same.collect().isEmpty)
    // change row 42, remove row 7, add row 101
    val b = (1L to 100L).filter(_ != 7L)
      .map(i => (i, if (i == 42L) "fp42-v2" else s"fp$i"))
      .toDF("id", "fp")
      .union(Seq((101L, "fp101")).toDF("id", "fp"))
    val out = RelationalOps.reconcileSnapshots(a, b, col("id"), col("fp"),
      buckets = 8)
    val rows = out.collect().map(r => r.getLong(0) ->
      (r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(rows.values.map(_._1).sum == 1L)   // one added
    assert(rows.values.map(_._2).sum == 1L)   // one removed
    assert(rows.values.map(_._3).sum == 1L)   // one changed
    assert(rows.size <= 3, s"only touched buckets may surface: $rows")
    // scale property: both row scans reach the diff through a LeftSemi
    // against the mismatched-bucket set — identical buckets never join
    // (>= 2: Catalyst may push a semi below a union, duplicating it per
    // union child — even earlier pruning)
    val semis = out.queryExecution.optimizedPlan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join
        if j.joinType.sql == "LEFT SEMI" => j }
    assert(semis.size >= 2, s"expected semi-joined row scans:\n$semis")
    // an even-duplicated row xor-cancels in the digest but the COUNT
    // catches it (the documented reason the digest carries n_rows)
    val dup = a.union(Seq((9L, "fp9"), (9L, "fp9")).toDF("id", "fp"))
    val dupOut = RelationalOps.reconcileSnapshots(a, dup, col("id"),
      col("fp"), buckets = 8).collect()
    assert(dupOut.length == 1 && dupOut.head.getLong(2) ==
      dupOut.head.getLong(1) + 2)
  }

  test("bloomSemiJoin equals the plain semi-join even with forced false positives") {
    // 64-bit filter over 200 fact keys: collisions guaranteed; the exact
    // semi-join behind the bloom must erase them.
    val fact = (1L to 200L).map(k => (k, s"v$k")).toDF("k", "v")
    val dim = Seq(3L, 77L, 199L, 4000L).toDF("dk")
    val got = R.bloomSemiJoin(fact, col("k"), dim, col("dk"),
        numBits = 64, numHashes = 1)
      .select("k").as[Long].collect().sorted.toSeq
    assert(got == Seq(3L, 77L, 199L))
  }

  test("bloomSemiJoin: empty dim yields empty result, not an error") {
    val fact = Seq((1L, "a")).toDF("k", "v")
    val dim = Seq.empty[Long].toDF("dk")
    assert(R.bloomSemiJoin(fact, col("k"), dim, col("dk")).isEmpty)
  }
}

/** Smoke: every declared query runs on sf0.001 and the entry returns rows. */
class QueriesSmokeSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query has an oracle or is explicitly rows-only") {
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(noOracle.isEmpty, s"queries missing oracle SQL: $noOracle")
  }

  test("frozen graded surface: exactly 356 queries, orphan-free oracle " +
    "map (VERDICT r13 #6 — an accidental registration change must not " +
    "silently shrink what the driver grades)") {
    assert(SparkEntry.queries.size == 356,
      s"graded surface drifted: ${SparkEntry.queries.size} != 356 — " +
        "if intentional, update this pin AND SURVEY.md §2")
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty,
      s"oracleSql entries without a registered query: $orphans")
  }

  SparkEntry.queries.foreach { case (name, fn) =>
    test(s"$name runs at sf0.001") {
      val df = fn(spark, sf)
      assert(df.columns.nonEmpty)
      df.count() // materialize
    }
  }
}
