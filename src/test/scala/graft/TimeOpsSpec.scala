package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{TextOps, TimeOps}

/** Pins the as-of join and sessionization edge semantics the oracle query
  * can't isolate: inclusive match, timestamp-tie tie-break, left-outer
  * miss, exact-gap session boundary, and charShingles' short-text
  * fallback. */
class TimeOpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("asofBackward: inclusive match, latest-at-or-before, miss -> null") {
    val l = Seq((1L, 10L, "L10"), (1L, 20L, "L20"), (2L, 5L, "L5"))
      .toDF("k", "lus", "ltag")
      .withColumn("lts", timestamp_micros(col("lus")))
    val r = Seq((1L, 10L, "a"), (1L, 15L, "b"), (2L, 7L, "c"))
      .toDF("k", "rus", "v")
      .withColumn("rts", timestamp_micros(col("rus")))
    val out = TimeOps.asofBackward(l, "lts", r, "rts", Seq("k"),
        Seq("v"), Seq(col("rus")))
      .select(col("ltag"), col("v")).collect().map(x => (x.getString(0),
        if (x.isNullAt(1)) null else x.getString(1))).toMap
    assert(out("L10") == "a")  // rts == lts is a match (inclusive)
    assert(out("L20") == "b")  // latest at-or-before, not first
    assert(out("L5") == null)  // nothing precedes -> left-outer null
  }

  test("asofBackward: equal-timestamp right rows resolve by rightOrder (last wins)") {
    val l = Seq((1L, 20L, "L")).toDF("k", "lus", "ltag")
      .withColumn("lts", timestamp_micros(col("lus")))
    val r = Seq((1L, 20L, 1L, "first"), (1L, 20L, 2L, "second"))
      .toDF("k", "rus", "rid", "v")
      .withColumn("rts", timestamp_micros(col("rus")))
    val out = TimeOps.asofBackward(l, "lts", r, "rts", Seq("k"),
      Seq("v"), Seq(col("rid"))).select(col("v")).head.getString(0)
    assert(out == "second")
  }

  test("asofForward: inclusive match, earliest-at-or-after, miss -> null") {
    val l = Seq((1L, 10L, "L10"), (1L, 3L, "L3"), (2L, 9L, "L9"))
      .toDF("k", "lus", "ltag")
      .withColumn("lts", timestamp_micros(col("lus")))
    val r = Seq((1L, 10L, "a"), (1L, 6L, "b"), (2L, 7L, "c"))
      .toDF("k", "rus", "v")
      .withColumn("rts", timestamp_micros(col("rus")))
    val out = TimeOps.asofForward(l, "lts", r, "rts", Seq("k"),
        Seq("v"), Seq(col("rus")))
      .select(col("ltag"), col("v")).collect().map(x => (x.getString(0),
        if (x.isNullAt(1)) null else x.getString(1))).toMap
    assert(out("L10") == "a")  // rts == lts is a match (inclusive)
    assert(out("L3") == "b")   // earliest at-or-after (6, not 10)
    assert(out("L9") == null)  // nothing follows -> null
  }

  test("asof null timestamps: never match, never get matched (ADVICE r3)") {
    // Backward: the null-rts right row would sort at the HEAD of the asc
    // scan and leak its payload into L5 (which has no true predecessor).
    val l = Seq((1L, Some(5L), "L5"), (1L, None, "Lnull"))
      .toDF("k", "lus", "ltag")
      .withColumn("lts", timestamp_micros(col("lus")))
    val r = Seq((1L, None, "poison"), (1L, Some(30L), "late"))
      .toDF("k", "rus", "v")
      .withColumn("rts", timestamp_micros(col("rus")))
    val back = TimeOps.asofBackward(l, "lts", r, "rts", Seq("k"),
        Seq("v"), Seq(col("rus")))
      .select(col("ltag"), col("v")).collect()
      .map(x => x.getString(0) ->
        (if (x.isNullAt(1)) null else x.getString(1))).toMap
    assert(back("L5") == null)    // not "poison"
    assert(back("Lnull") == null) // null left ts -> no match
    // Forward: the null-lts left row sorts at the TAIL of the desc scan
    // and would pick up the smallest-ts right row ("early").
    val r2 = Seq((1L, Some(1L), "early"), (1L, None, "poison"))
      .toDF("k", "rus", "v")
      .withColumn("rts", timestamp_micros(col("rus")))
    val fwd = TimeOps.asofForward(l, "lts", r2, "rts", Seq("k"),
        Seq("v"), Seq(col("rus")))
      .select(col("ltag"), col("v")).collect()
      .map(x => x.getString(0) ->
        (if (x.isNullAt(1)) null else x.getString(1))).toMap
    assert(fwd("Lnull") == null)  // not "early"
    assert(fwd("L5") == null)     // early(1) < 5: nothing at-or-after
  }

  test("asofBackward rejects payload/left column collisions") {
    val l = Seq((1L, 1L, "x")).toDF("k", "lts", "v")
    val r = Seq((1L, 1L, "y")).toDF("k", "rts", "v")
    assertThrows[IllegalArgumentException] {
      TimeOps.asofBackward(l, "lts", r, "rts", Seq("k"), Seq("v"))
    }
  }

  test("sessionize: splits strictly beyond the gap, not at it") {
    val gapUs = 30L * 60 * 1000000
    val ev = Seq(
      (7L, 0L, 1L),              // session 1
      (7L, gapUs, 2L),           // exactly 30min later -> SAME session
      (7L, 2 * gapUs + 1, 3L),   // 30min + 1us after prev -> new session
      (8L, 5L, 4L))              // other key, own numbering
      .toDF("user_id", "us", "event_id")
      .withColumn("t", timestamp_micros(col("us")))
    val out = TimeOps.sessionize(ev, Seq("user_id"), "t", gapUs,
        Seq(col("t"), col("event_id")))
      .select(col("event_id"), col("session_idx"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(1L) == 1 && out(2L) == 1 && out(3L) == 2)
    assert(out(4L) == 1)
  }

  test("intervalJoin equals the naive inequality join, incl. boundary " +
    "and cross-bin cases; inverted intervals match nothing") {
    // bin width 100us; intervals deliberately span bin boundaries
    val iv = Seq(
      (1L, 10L, 250L, "a"),   // spans bins 0-2
      (1L, 90L, 110L, "b"),   // straddles the bin-0/1 edge
      (2L, 0L, 1000L, "c"),   // whole-range window, other key
      (1L, 300L, 300L, "d"),  // empty interval: matches nothing
      (1L, 400L, 350L, "e"))  // inverted: matches nothing
      .toDF("k", "sus", "eus", "iv_tag")
      .withColumn("s_ts", timestamp_micros(col("sus")))
      .withColumn("e_ts", timestamp_micros(col("eus")))
      .select("k", "s_ts", "e_ts", "iv_tag")
    val pr = Seq(
      (1L, 10L, "p_at_start"),   // == start: included
      (1L, 250L, "p_at_end"),    // == end of a: excluded from a
      (1L, 100L, "p_mid"),       // inside a AND b
      (1L, 299L, "p_solo"),      // outside every live interval
      (2L, 999L, "p_c"),         // inside c only
      (1L, 300L, "p_empty"))     // == both ends of d: excluded
      .toDF("k", "pus", "p_tag")
      .withColumn("p_ts", timestamp_micros(col("pus")))
      .select("k", "p_ts", "p_tag")
    val fast = TimeOps.intervalJoin(pr, "p_ts", iv, "s_ts", "e_ts",
        Seq("k"), 100L)
      .select("p_tag", "iv_tag").as[(String, String)].collect().toSet
    val naive = pr.join(iv, pr("k") === iv("k") &&
        col("p_ts") >= col("s_ts") && col("p_ts") < col("e_ts"))
      .select("p_tag", "iv_tag").as[(String, String)].collect().toSet
    assert(fast == naive)
    assert(fast == Set(("p_at_start", "a"), ("p_mid", "a"), ("p_mid", "b"),
      ("p_c", "c")))
  }

  test("intervalJoin meets each matching pair exactly once (no dup from " +
    "multi-bin intervals)") {
    val iv = Seq((1L, 0L, 950L, "wide")) // spans 10 bins at width 100
      .toDF("k", "sus", "eus", "iv_tag")
      .withColumn("s_ts", timestamp_micros(col("sus")))
      .withColumn("e_ts", timestamp_micros(col("eus")))
      .select("k", "s_ts", "e_ts", "iv_tag")
    val pr = (0L until 10L).map(i => (1L, i * 100L, s"p$i"))
      .toDF("k", "pus", "p_tag")
      .withColumn("p_ts", timestamp_micros(col("pus")))
      .select("k", "p_ts", "p_tag")
    val out = TimeOps.intervalJoin(pr, "p_ts", iv, "s_ts", "e_ts",
      Seq("k"), 100L)
    assert(out.count() == 10L) // one row per probe, never per (probe, bin)
    assert(out.select("p_tag").distinct().count() == 10L)
  }

  test("scd2: merges consecutive same-state rows, half-open contiguous ranges") {
    val e = Seq((1L, 10L, "A", 1L), (1L, 20L, "A", 2L), (1L, 30L, "B", 3L),
        (1L, 40L, "A", 4L))
      .toDF("k", "us", "st", "id")
      .withColumn("ts", timestamp_micros(col("us")))
    val out = TimeOps.scd2(e, Seq("k"), col("st"), "ts",
        Seq(col("us"), col("id")))
      .select(col("state"), col("valid_from_us"), col("valid_to_us"),
        col("is_current"))
      .collect().map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2), r.getInt(3))).sortBy(_._2)
    // A@10 absorbs A@20; B opens at 30; A re-opens at 40 (not merged back)
    assert(out.toSeq == Seq(("A", 10L, 30L, 0), ("B", 30L, 40L, 0),
      ("A", 40L, -1L, 1)))
  }

  test("scd2: null is a real state — null->value and value->null open versions") {
    val e = Seq((1L, 10L, Option.empty[String], 1L),
        (1L, 20L, Option("A"), 2L), (1L, 30L, Option.empty[String], 3L),
        (1L, 40L, Option.empty[String], 4L))
      .toDF("k", "us", "st", "id")
      .withColumn("ts", timestamp_micros(col("us")))
    val out = TimeOps.scd2(e, Seq("k"), col("st"), "ts",
      Seq(col("us"), col("id")))
    assert(out.count() == 3L)  // null, A, null (trailing null run merged)
    assert(out.filter(col("is_current") === 1 && col("state").isNull)
      .count() == 1L)
  }

  test("sessionize parity with Spark's built-in session_window: " +
    "identical memberships at the same gap (both keep diff <= gap — " +
    "the built-in merges adjacent windows)") {
    val gap = 10L
    val df = Seq(
        (1L, 0L, "a"), (1L, 10L, "b"),   // diff == gap: same session
        (1L, 21L, "c"),                  // diff 11 > gap: new session
        (2L, 0L, "d"), (2L, 11L, "e"))   // diff 11: new session
      .toDF("k", "us", "tag")
      .withColumn("ts", timestamp_micros(col("us")))
    def members(sessions: org.apache.spark.sql.DataFrame,
                sessCols: Seq[org.apache.spark.sql.Column]) =
      sessions.groupBy(sessCols: _*)
        .agg(sort_array(collect_list(col("tag"))).as("members"))
        .select(col("members")).as[Seq[String]].collect().toSet
    val ours = members(
      TimeOps.sessionize(df, Seq("k"), "ts", gap, Seq(col("us"))),
      Seq(col("k"), col("session_idx")))
    val builtin = members(df,
      Seq(col("k"), session_window(col("ts"), s"$gap microseconds")))
    assert(ours == builtin,
      "the merge-scan sessionize must replay the built-in's memberships")
    assert(ours == Set(Seq("a", "b"), Seq("c"), Seq("d"), Seq("e")))
    // the boundary is genuinely inclusive in BOTH: one microsecond less
    // gap splits the exact-gap pair in both implementations
    val oursTight = members(
      TimeOps.sessionize(df, Seq("k"), "ts", gap - 1, Seq(col("us"))),
      Seq(col("k"), col("session_idx")))
    val builtinTight = members(df,
      Seq(col("k"), session_window(col("ts"), s"${gap - 1} microseconds")))
    assert(oursTight == builtinTight &&
      oursTight.contains(Seq("a")) && oursTight.contains(Seq("b")))
  }

  test("gapFill: silent days get n=0 + carried forward; spans are " +
    "per-group; observed flags survive") {
    val obs = Seq(("g1", "2024-01-01", 2L), ("g1", "2024-01-04", 3L),
      ("g2", "2024-01-02", 7L))
      .toDF("g", "d", "v").withColumn("d", to_date(col("d")))
    val out = TimeOps.gapFill(obs, col("g"), col("d"), col("v"))
      .select(col("__g"), date_format(col("__day"), "yyyy-MM-dd"),
        col("n"), col("is_observed"), col("carried"))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getBoolean(3), r.getLong(4))).toMap
    assert(out.size == 5,
      "g1 spans 4 days, g2 spans 1 - no cross-group spine")
    assert(out(("g1", "2024-01-01")) == ((2L, true, 2L)))
    assert(out(("g1", "2024-01-02")) == ((0L, false, 2L))) // gap: 0 + ffill
    assert(out(("g1", "2024-01-03")) == ((0L, false, 2L)))
    assert(out(("g1", "2024-01-04")) == ((3L, true, 3L)))
    assert(out(("g2", "2024-01-02")) == ((7L, true, 7L)))
  }

  test("ewmaSmooth: exact halving fold, zero-init, lookback truncation") {
    val s = Seq(("g", 1, 4L), ("g", 2, 0L), ("g", 3, 8L))
      .toDF("g", "t", "n")
    def run(lb: Int) = TimeOps.ewmaSmooth(s, col("g"), col("t"),
        col("n"), lookback = lb)
      .select(col("t"), col("ewma")).collect()
      .map(r => r.getInt(0) -> r.getDouble(1)).toMap
    // full: e1=4/2=2, e2=(2+0)/2=1, e3=(1+8)/2=4.5 — all exact
    assert(run(40) == Map(1 -> 2.0, 2 -> 1.0, 3 -> 4.5))
    // lookback=2 restarts the zero-init fold on the truncated frame
    assert(run(2) == Map(1 -> 2.0, 2 -> 1.0, 3 -> 4.0))
    assertThrows[IllegalArgumentException](
      TimeOps.ewmaSmooth(s, col("g"), col("t"), col("n"), lookback = 0))
  }

  test("charShingles: short text shingles whole; duplicates collapse") {
    val df = Seq("abc", "abcdefgh", "aaaaaaaaaa").toDF("text")
    val out = df.select(TextOps.charShingles(col("text"), 8).as("s"))
      .collect().map(_.getSeq[String](0))
    assert(out(0) == Seq("abc"))
    assert(out(1) == Seq("abcdefgh"))
    // "aaaaaaaaaa" has 3 windows, all identical -> 1 distinct shingle
    assert(out(2) == Seq("aaaaaaaa"))
  }

  test("interpResample: exact hits verbatim, interior ticks on the line, " +
    "grid clipped to the observation span") {
    val ev = Seq((1L, 0L, 10.0), (1L, 100L, 20.0))
      .toDF("g", "us", "v").withColumn("ts", timestamp_micros(col("us")))
    val out = TimeOps.interpResample(ev, col("g"), col("ts"), col("v"),
        stepUs = 10L)
      .collect().map(r => r.getLong(1) -> (r.getDouble(2), r.getInt(3)))
      .toMap
    assert(out.size == 11) // ticks 0, 10, ..., 100
    assert(out(0L) == ((10.0, 1)))   // exact hit, verbatim
    assert(out(100L) == ((20.0, 1)))
    assert(out(50L) == ((15.0, 0)))  // midpoint of the line
    assert(out(10L) == ((11.0, 0)))
  }

  test("interpResample: unaligned observations, same-tick max collapse, " +
    "null measurements dropped, sub-step spans emit nothing") {
    val ev = Seq(
      (1L, 5L, Some(0.0)), (1L, 25L, Some(10.0)),  // grid ticks 10, 20
      (1L, 25L, Some(4.0)),                        // same-tick -> max = 10
      (1L, 15L, None),                             // null: not an anchor
      (2L, 3L, Some(1.0)), (2L, 7L, Some(2.0))     // span < step: no tick
    ).toDF("g", "us", "v").withColumn("ts", timestamp_micros(col("us")))
    val rows = TimeOps.interpResample(ev, col("g"), col("ts"), col("v"),
        stepUs = 10L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getDouble(2), r.getInt(3))).toMap
    assert(rows.keySet == Set((1L, 10L), (1L, 20L)))
    // (0*(25-10) + 10*(10-5)) / (25-5) = 2.5 ; (0*5 + 10*15) / 20 = 7.5
    assert(rows((1L, 10L)) == ((2.5, 0)))
    assert(rows((1L, 20L)) == ((7.5, 0)))
    assertThrows[IllegalArgumentException](
      TimeOps.interpResample(ev, col("g"), col("ts"), col("v"), 0L))
  }

  test("q145 point-in-time join never leaks the future: every probe " +
    "reads the version valid AT its timestamp (sf0.001 corpus)") {
    val out = SparkEntry.queries("q145_pit_join")(spark,
      "/root/testdata/sf0.001").collect()
    assert(out.nonEmpty)
    // valid_from <= probe always (backward-only), and a purchase event
    // is itself a version boundary or continuation — state is never null
    out.foreach { r =>
      val (probe, from) = (r.getLong(2), r.getLong(4))
      assert(from <= probe, s"future version leaked: $from > $probe")
      assert(!r.isNullAt(3))
    }
  }
}
