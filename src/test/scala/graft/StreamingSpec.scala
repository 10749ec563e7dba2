package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamOps
import graft.streaming.StreamOps.SessionEvent

/** Structured Streaming specs via MemoryStream: windowed aggregation with
  * watermark, streaming dedup, and batch/stream result equivalence. */
class StreamingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def ts(min: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$min%02d:00")

  test("windowedStats over a stream matches the batch equivalent") {
    implicit val sc = spark.sqlContext
    val input = MemoryStream[(Timestamp, Double)]
    val events = input.toDF.toDF("ts", "value")
    val q = StreamOps.windowedStats(events, "ts", "value", "10 minutes",
        "5 minutes")
      .writeStream.format("memory").queryName("win_stats")
      .outputMode("complete").start()
    try {
      val data = Seq((ts(1), 1.5), (ts(4), 2.0), (ts(11), 3.0),
        (ts(14), 0.5), (ts(21), 4.0))
      input.addData(data: _*)
      q.processAllAvailable()
      val streamed = spark.table("win_stats")
        .orderBy("window_start")
        .as[(Timestamp, Long, Double)].collect().toSeq
      val batch = StreamOps.windowedStatsBatch(
          data.toDF("ts", "value"), "ts", "value", "10 minutes")
        .orderBy("window_start")
        .as[(Timestamp, Long, Double)].collect().toSeq
      assert(streamed == batch)
      assert(streamed.map(r => (r._2, r._3)) ==
        Seq((2L, 3.5), (2L, 3.5), (1L, 4.0)))
    } finally q.stop()
  }

  test("dedupWithinWatermark drops duplicate keys as they stream in") {
    implicit val sc = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, Double)]
    val events = input.toDF.toDF("event_id", "ts", "value")
    val q = StreamOps.dedupWithinWatermark(events, "ts", "10 minutes",
        Seq("event_id"))
      .writeStream.format("memory").queryName("dedup_stream")
      .outputMode("append").start()
    try {
      input.addData((1L, ts(1), 10.0), (2L, ts(2), 20.0), (1L, ts(3), 99.0))
      q.processAllAvailable()
      input.addData((2L, ts(4), 98.0), (3L, ts(5), 30.0))
      q.processAllAvailable()
      val out = spark.table("dedup_stream")
        .select("event_id", "value").as[(Long, Double)].collect().sorted
      // first arrival wins; later duplicates (even cross-batch) dropped
      assert(out.toSeq == Seq((1L, 10.0), (2L, 20.0), (3L, 30.0)))
    } finally q.stop()
  }

  test("sessionize accumulates per-user state via flatMapGroupsWithState") {
    implicit val sc = spark.sqlContext
    val input = MemoryStream[SessionEvent]
    val q = StreamOps.sessionize(input.toDS)
      .writeStream.format("memory").queryName("sessions")
      .outputMode("update").start()
    try {
      input.addData(SessionEvent(7L, ts(1), 1.0), SessionEvent(7L, ts(5), 2.0),
        SessionEvent(9L, ts(2), 5.0))
      q.processAllAvailable()
      input.addData(SessionEvent(7L, ts(9), 3.0))
      q.processAllAvailable()
      val latest = spark.table("sessions")
        .groupBy("user_id").agg(max(struct(col("n_events"),
          col("sum_value"), col("start_ms"), col("end_ms"))).as("s"))
        .select("user_id", "s.n_events", "s.sum_value")
        .as[(Long, Int, Double)].collect().sortBy(_._1)
      assert(latest.toSeq == Seq((7L, 3, 6.0), (9L, 1, 5.0)))
    } finally q.stop()
  }

  test("sessionize emits sessions CLOSED inside a single batch too") {
    implicit val sc = spark.sqlContext
    val input = MemoryStream[SessionEvent]
    val q = StreamOps.sessionize(input.toDS)
      .writeStream.format("memory").queryName("sessions_gap")
      .outputMode("update").start()
    try {
      // one batch, gap > 30min between the two events: the first session
      // closes AND must still be emitted (regression: mapGroupsWithState
      // could only emit one row per key per batch and dropped it)
      val lateTs = java.sql.Timestamp.valueOf("2024-01-01 11:30:00")
      input.addData(SessionEvent(11L, ts(2), 5.0),
        SessionEvent(11L, lateTs, 7.0))
      q.processAllAvailable()
      val rows = spark.table("sessions_gap")
        .select("n_events", "sum_value", "start_ms")
        .as[(Int, Double, Long)].collect().sortBy(_._3)
      assert(rows.length == 2)
      assert(rows(0) == ((1, 5.0, ts(2).getTime)))      // closed session
      assert(rows(1) == ((1, 7.0, lateTs.getTime)))     // running session
    } finally q.stop()
  }

  test("stream-static enrichment join broadcasts the dim against the stream") {
    implicit val sc = spark.sqlContext
    // The streaming staple the batch suite can't show: a micro-batch
    // stream joined to a STATIC dimension (re-read per batch, broadcast —
    // no stream-side state, unlike stream-stream joins).
    val dim = Seq((1L, "gold"), (2L, "basic")).toDF("user_id", "tier")
    val input = MemoryStream[(Long, Double)]
    val q = input.toDF.toDF("user_id", "value")
      .join(broadcast(dim), Seq("user_id"), "left")
      .writeStream.format("memory").queryName("enriched")
      .outputMode("append").start()
    try {
      input.addData((1L, 10.0), (2L, 20.0), (3L, 30.0))
      q.processAllAvailable()
      val rows = spark.table("enriched")
        .select("user_id", "tier")
        .collect().map(r => r.getLong(0) ->
          (if (r.isNullAt(1)) "none" else r.getString(1))).toMap
      assert(rows == Map(1L -> "gold", 2L -> "basic", 3L -> "none"))
    } finally q.stop()
  }

  test("stream-stream interval join matches batch on one feed and drops " +
    "out-of-window matches") {
    implicit val sc = spark.sqlContext
    val signups = MemoryStream[(Long, Timestamp)]
    val purchases = MemoryStream[(Long, Timestamp, Double)]
    val joined = StreamOps.joinWithinInterval(
      signups.toDF.toDF("user_id", "signup_ts"),
      purchases.toDF.toDF("user_id", "purchase_ts", "amount"),
      Seq("user_id"), "signup_ts", "purchase_ts",
      "30 minutes", 300) // purchases within 5 min of signup
    val q = joined
      .select(col("user_id"), col("purchase_ts"), col("amount"))
      .writeStream.format("memory").queryName("iv_join")
      .outputMode("append").start()
    val sData = Seq((1L, ts(1)), (2L, ts(10)))
    val pData = Seq(
      (1L, ts(3), 5.0),   // within 5 min of u1 signup -> joins
      (1L, ts(9), 7.0),   // 8 min after -> outside interval
      (2L, ts(12), 9.0),  // within -> joins
      (3L, ts(12), 1.0))  // no signup -> no join
    try {
      signups.addData(sData: _*)
      purchases.addData(pData: _*)
      q.processAllAvailable()
      val streamed = spark.table("iv_join")
        .as[(Long, Timestamp, Double)].collect().sortBy(_._1).toSeq
      assert(streamed == Seq((1L, ts(3), 5.0), (2L, ts(12), 9.0)))
      // batch parity: the SAME call on batch frames
      val batch = StreamOps.joinWithinInterval(
          sData.toDF("user_id", "signup_ts"),
          pData.toDF("user_id", "purchase_ts", "amount"),
          Seq("user_id"), "signup_ts", "purchase_ts", "30 minutes", 300)
        .select(col("signup_ts"), col("purchase_ts"), col("amount"))
        .as[(Timestamp, Timestamp, Double)].collect().sortBy(_._1.getTime)
      assert(batch.map(r => (r._2, r._3)).toSeq ==
        Seq((ts(3), 5.0), (ts(12), 9.0)))
    } finally q.stop()
  }

  test("stream-stream LEFT OUTER interval join: unmatched left rows " +
    "surface null-padded once the watermark passes their window") {
    implicit val sc = spark.sqlContext
    val signups = MemoryStream[(Long, Timestamp)]
    val purchases = MemoryStream[(Long, Timestamp, Double)]
    val joined = StreamOps.joinWithinIntervalOuter(
      signups.toDF.toDF("user_id", "signup_ts"),
      purchases.toDF.toDF("user_id", "purchase_ts", "amount"),
      Seq("user_id"), "signup_ts", "purchase_ts",
      "30 minutes", 300)
    val q = joined
      .select(col("user_id"), col("purchase_ts"), col("amount"))
      .writeStream.format("memory").queryName("iv_ljoin")
      .outputMode("append").start()
    val sData = Seq((1L, ts(1)), (2L, ts(10)))
    val pData = Seq(
      (1L, ts(3), 5.0),  // within 5 min of u1 signup -> matches
      (3L, ts(12), 1.0)) // no signup -> never surfaces (left outer)
    try {
      signups.addData(sData: _*)
      purchases.addData(pData: _*)
      q.processAllAvailable()
      // u2 is unmatched but NOT yet emittable: its window closes at
      // ts(10)+5min and the watermark hasn't passed it. Advance both
      // watermarks far beyond every window, then nudge once more so
      // the finalized batch actually runs.
      signups.addData((99L, ts(600)))
      purchases.addData((98L, ts(600), 0.0))
      q.processAllAvailable()
      signups.addData((97L, ts(700)))
      purchases.addData((96L, ts(700), 0.0))
      q.processAllAvailable()
      val streamed = spark.table("iv_ljoin")
        .as[(Long, Option[Timestamp], Option[Double])].collect()
        .filter(_._1 <= 2L).sortBy(_._1).toSeq
      assert(streamed == Seq(
        (1L, Some(ts(3)), Some(5.0)),
        (2L, None, None)),
        s"left-outer stream join emitted: $streamed")
      // batch parity: the SAME call on batch frames
      val batch = StreamOps.joinWithinIntervalOuter(
          sData.toDF("user_id", "signup_ts"),
          pData.toDF("user_id", "purchase_ts", "amount"),
          Seq("user_id"), "signup_ts", "purchase_ts", "30 minutes", 300)
        .select(col("user_id"), col("purchase_ts"), col("amount"))
        .as[(Long, Option[Timestamp], Option[Double])].collect()
        .sortBy(_._1).toSeq
      assert(batch == streamed, s"batch $batch != streamed $streamed")
    } finally q.stop()
  }

  test("streaming sessionize matches batch TimeOps.sessionize on one feed") {
    implicit val sc = spark.sqlContext
    // Deterministic second-precision feed: 3 users x 40 events, gaps of
    // 5..50 minutes so plenty straddle the 30-min session boundary.
    val rng = new scala.util.Random(42)
    val base = Timestamp.valueOf("2024-01-01 00:00:00").getTime
    val evs = (1L to 3L).flatMap { u =>
      var t = base + u * 1000
      (1 to 40).map { _ =>
        t += (5 + rng.nextInt(46)) * 60000L
        SessionEvent(u, new Timestamp(t), 1.0)
      }
    }

    // Streaming path: everything in one batch -> output is every closed
    // session plus the final running one, i.e. the complete session list.
    val input = MemoryStream[SessionEvent]
    val q = StreamOps.sessionize(input.toDS)
      .writeStream.format("memory").queryName("sessions_parity")
      .outputMode("update").start()
    val streamed = try {
      input.addData(evs: _*)
      q.processAllAvailable()
      spark.table("sessions_parity")
        .select("user_id", "start_ms", "end_ms", "n_events")
        .as[(Long, Long, Long, Int)].collect().toSet
    } finally q.stop()

    // Batch path: same gap, micros units.
    val batch = graft.operators.TimeOps.sessionize(
        evs.toDF("user_id", "ts", "value"), Seq("user_id"), "ts",
        StreamOps.SessionGapMs * 1000, Seq(col("ts")))
      .groupBy(col("user_id"), col("session_idx"))
      .agg((min(unix_micros(col("ts"))) / 1000).cast("long").as("start_ms"),
        (max(unix_micros(col("ts"))) / 1000).cast("long").as("end_ms"),
        count(lit(1)).cast("int").as("n_events"))
      .select("user_id", "start_ms", "end_ms", "n_events")
      .as[(Long, Long, Long, Int)].collect().toSet

    assert(streamed == batch)
    assert(batch.size > 3, "expected multiple sessions per user")
  }

  test("driftMonitor: windowed TVD vs reference — exact on a hand-computed feed") {
    implicit val sc = spark.sqlContext
    // reference: group g, 2 bins (width 50, 2 bins), counts r0=2, r1=2
    val ref = Seq(("g", 2L, 2L)).toDF("grp", "r0", "r1")
    // window 1 (00:00): values 10,10,10,60 -> c=(3,1), n=4, m=4
    //   num = |3*4-2*4| + |1*4-2*4| = 4+4 = 8; tvd = 8/(2*4*4) = 0.25
    // window 2 (01:00): values 60,60 -> c=(0,2): num = 8+8=16... wait
    //   |0*4-2*2| + |2*4-2*2| = 4 + 4 = 8; tvd = 8/(2*2*4) = 0.5
    val base = Timestamp.valueOf("2024-01-01 00:00:00").getTime
    def ev(minOff: Int, v: Double) =
      (new Timestamp(base + minOff * 60000L), "g", v)
    val input = MemoryStream[(Timestamp, String, Double)]
    val q = StreamOps.driftMonitor(
        input.toDF.toDF("ts", "g", "v"), "ts", col("g"), col("v"),
        "1 hour", "0 seconds", ref, lo = 0.0, binWidth = 50.0, nBins = 2)
      .writeStream.format("memory").queryName("drift_monitor")
      .outputMode("append").start()
    val rows = try {
      input.addData(ev(1, 10.0), ev(2, 10.0), ev(3, 10.0), ev(4, 60.0),
        ev(61, 60.0), ev(62, 60.0))
      q.processAllAvailable()
      // advance the watermark far enough to close both windows
      input.addData(ev(600, 10.0))
      q.processAllAvailable()
      spark.table("drift_monitor")
        .select(col("grp"), col("n"), col("tvd"))
        .as[(String, Long, Double)].collect().toSet
    } finally q.stop()
    assert(rows.contains(("g", 4L, 0.25)), s"window 1 wrong: $rows")
    assert(rows.contains(("g", 2L, 0.5)), s"window 2 wrong: $rows")
  }

  test("streaming funnelProgress matches batch funnel; late predecessors " +
    "are retroactive") {
    implicit val sc = spark.sqlContext
    import StreamOps.StepEvent
    // 40 users, 3 steps, random times; step events DELIBERATELY fed in
    // two batches with the step-1 events LAST, so a greedy state machine
    // would under-count every user.
    val rng = new scala.util.Random(7)
    val evs = (1L to 40L).flatMap { u =>
      (1 to 3).flatMap { s =>
        (0 until 2).map(_ => StepEvent(u, rng.nextInt(1000).toLong, s))
      }
    }
    val (laterSteps, firstSteps) = evs.partition(_.step > 1)

    val input = MemoryStream[StepEvent]
    val q = StreamOps.funnelProgress(input.toDS, 3)
      .writeStream.format("memory").queryName("funnel_parity")
      .outputMode("update").start()
    val streamed = try {
      input.addData(laterSteps: _*)
      q.processAllAvailable()
      input.addData(firstSteps: _*) // late step-1 arrivals
      q.processAllAvailable()
      // Update mode emits once per (user, batch); reach is monotone in
      // the event set, so the final value is the max
      spark.table("funnel_parity")
        .groupBy(col("user_id"))
        .agg(max(col("reached")).as("reached"))
        .as[(Long, Int)].collect().toMap
    } finally q.stop()

    // Batch twin on the identical event set
    val batchDf = evs.toDF("user_id", "us", "step")
      .withColumn("ts", timestamp_micros(col("us")))
    val perStep = graft.operators.AnalyticsOps.funnel(
        batchDf, col("user_id"), col("ts"),
        (1 to 3).map(s => s.toString -> (col("step") === s)))
      .select(col("step"), col("n_actors")).as[(Int, Long)].collect().toMap
    val streamedPerStep = (1 to 3).map(s =>
      s -> streamed.values.count(_ >= s).toLong).toMap
    assert(streamedPerStep == perStep,
      s"streaming $streamedPerStep vs batch $perStep")
    assert(perStep(2) > 0, "expected some users past step 1")
  }

  test("maintainRollup: stream-maintained rollup == rebuilt-from-scratch " +
    "after 3 epochs; a replayed epoch is a no-op (exactly-once state)") {
    import graft.sources.CatalogOps
    implicit val sc = spark.sqlContext
    val db = "graft_test_stream_rollup"
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $db")
    spark.sql(s"DROP TABLE IF EXISTS $db.ev_rollup")
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_rollup_ckpt").toString
    val input = MemoryStream[(String, Double)]
    val measures = Map("value" -> col("value"))
    val q = StreamOps.maintainRollup(input.toDF.toDF("etype", "value"),
      Seq("etype"), measures, db, "ev_rollup", ckpt)
    val batches = Seq(
      Seq(("a", 1.0), ("a", 2.0), ("b", 10.0)),
      Seq(("b", 0.5), ("c", 7.0)),
      Seq(("a", 4.0), ("c", 0.25)))
    try {
      batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
    } finally q.stop()
    def served(df: org.apache.spark.sql.DataFrame) =
      df.groupBy(col("etype"))
        .agg(sum(col("sum_value")).cast("double").as("s"),
          sum(col("n_rows")).as("n"))
        .as[(String, Double, Long)].collect().toSet
    val maintained = served(spark.table(s"$db.ev_rollup"))
    // rebuilt from scratch over the SAME full data
    CatalogOps.createRollup(spark,
      batches.flatten.toDF("etype", "value"), db, "ev_rollup_full",
      Seq("etype"), measures)
    assert(maintained == served(spark.table(s"$db.ev_rollup_full")))
    assert(maintained == Set(("a", 7.0, 3L), ("b", 10.5, 2L),
      ("c", 7.25, 2L)))
    // forced replay of an already-applied epoch: applied_batch gates it
    val before = spark.table(s"$db.ev_rollup").collect().toSet
    CatalogOps.upsertRollup(spark,
      CatalogOps.rollupPartial(Seq(("a", 99.0)).toDF("etype", "value"),
        Seq("etype"), measures),
      db, "ev_rollup", Seq("etype"), Seq("value"), batchId = 0L)
    assert(spark.table(s"$db.ev_rollup").collect().toSet == before,
      "replaying epoch 0 must not change the table")
  }

  test("maintainFeatures: streamed per-actor state == batch aggregate " +
    "on the same feed; later batches upsert, untouched actors are not " +
    "re-emitted") {
    implicit val sc = spark.sqlContext
    import graft.streaming.StreamOps.FeatEvent
    val b1 = Seq(FeatEvent(1L, ts(1), 100L), FeatEvent(2L, ts(2), 50L),
      FeatEvent(1L, ts(3), 25L))
    val b2 = Seq(FeatEvent(1L, ts(5), 7L), FeatEvent(3L, ts(4), 900L))
    val input = MemoryStream[FeatEvent]
    val q = StreamOps.maintainFeatures(input.toDS)
      .writeStream.format("memory").queryName("feat")
      .outputMode("update").start()
    try {
      input.addData(b1: _*)
      q.processAllAvailable()
      val afterB1 = spark.table("feat")
        .as[StreamOps.FeatRow].collect().map(r => r.user_id -> r).toMap
      assert(afterB1(1L).n_total == 2 && afterB1(1L).cents_total == 125L)
      assert(afterB1(2L).n_total == 1)
      input.addData(b2: _*)
      q.processAllAvailable()
      // Update mode: batch 2 emits ONLY the touched actors (1 and 3) —
      // actor 2's row count stays 1.
      val all = spark.table("feat").as[StreamOps.FeatRow].collect()
      assert(all.count(_.user_id == 2L) == 1,
        "untouched actor must not re-emit")
      // Latest row per actor == the batch groupBy over the whole feed.
      val latest = all.groupBy(_.user_id).map { case (u, rs) =>
        u -> rs.maxBy(_.n_total) }
      val batch = (b1 ++ b2).toDS().toDF()
        .groupBy(col("user_id"))
        .agg(max(unix_micros(col("ts"))).as("last_us"),
          count(lit(1)).as("n_total"), sum(col("cents")).as("cents_total"))
        .collect().map(r => r.getLong(0) ->
          (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
      batch.foreach { case (u, (lus, n, c)) =>
        val got = latest(u)
        assert(got.last_us == lus && got.n_total == n &&
          got.cents_total == c,
          s"actor $u: streamed $got != batch ($lus, $n, $c)")
      }
    } finally q.stop()
  }

  test("maintainFeaturesTtl: watermark past last-event+ttl evicts state " +
    "with a tombstone; a re-appearing actor starts from zero") {
    implicit val sc = spark.sqlContext
    import graft.streaming.StreamOps.{FeatEvent, FeatUpsert}
    val input = MemoryStream[FeatEvent]
    val q = StreamOps.maintainFeaturesTtl(input.toDS,
        watermark = "0 seconds", ttlMs = 10 * 60 * 1000L)
      .writeStream.format("memory").queryName("featttl")
      .outputMode("update").start()
    try {
      // batch 1: two actors at 10:01/10:02
      input.addData(FeatEvent(1L, ts(1), 100L), FeatEvent(2L, ts(2), 50L))
      q.processAllAvailable()
      // batch 2: a third actor 40 min later — advances the watermark to
      // 10:41, past both actors' (last + 10 min) timeouts
      input.addData(FeatEvent(3L, ts(41), 7L))
      q.processAllAvailable()
      // batch 3: any data triggers the pending event-time timeouts
      input.addData(FeatEvent(3L, ts(42), 1L))
      q.processAllAvailable()
      val rows = spark.table("featttl").as[FeatUpsert].collect()
      val tombs = rows.filter(_.tombstone).map(_.user_id).toSet
      assert(tombs == Set(1L, 2L),
        s"idle actors must evict with tombstones, got $tombs")
      // actor 1 re-appears: lifetime features restart from zero
      input.addData(FeatEvent(1L, ts(43), 9L))
      q.processAllAvailable()
      val re = spark.table("featttl").as[FeatUpsert].collect()
        .filter(r => r.user_id == 1L && !r.tombstone)
        .maxBy(_.last_us)
      assert(re.n_total == 1 && re.cents_total == 9L,
        s"re-appearing actor must start fresh, got $re")
    } finally q.stop()
  }

  test("heavyHitters: Misra-Gries state holds <= k counters, matches " +
    "the driver replay on an ordered feed, and keeps the frequency " +
    "guarantee across batches") {
    implicit val sc = spark.sqlContext
    import graft.streaming.StreamOps.HHEvent
    val k = 3
    // skewed feed: 'a' dominates, 'b' frequent, c..h noise
    val feed1 = Seq("a", "b", "a", "c", "a", "d", "b", "a", "e", "a")
    val feed2 = Seq("f", "a", "b", "g", "a", "h", "b", "a", "c", "a")
    val input = MemoryStream[HHEvent]
    val q = StreamOps.heavyHitters(input.toDS, k)
      .writeStream.format("memory").queryName("hh")
      .outputMode("update").start()
    try {
      input.addData(feed1.map(HHEvent("g1", _)): _*)
      q.processAllAvailable()
      input.addData(feed2.map(HHEvent("g1", _)): _*)
      q.processAllAvailable()
      // latest snapshot = rows with the max n_seen
      val t = spark.table("hh")
      val latest = t.filter(col("n_seen") ===
          t.agg(max("n_seen")).head.getLong(0))
        .select("item", "est_count")
        .as[(String, Long)].collect().toMap
      assert(latest.size <= k, s"state must hold <= $k counters: $latest")
      val ref = StreamOps.misraGriesReference(feed1 ++ feed2, k)
      assert(latest == ref,
        s"ordered single-partition feed must replay exactly: " +
          s"$latest vs $ref")
      // MG guarantee: true count 'a'=8 > N/(k+1)=5 → 'a' holds a counter
      // undercounting by at most N/(k+1)
      val n = (feed1 ++ feed2).size
      assert(latest.contains("a"))
      assert(latest("a") >= 8L - n / (k + 1) && latest("a") <= 8L)
    } finally q.stop()
  }
}
