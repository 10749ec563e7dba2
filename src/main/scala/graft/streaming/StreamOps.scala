package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming surface (beyond the batch-only reference — the
  * ingest shapes a continuously-fed training-data pipeline needs):
  * watermarked tumbling-window aggregation, streaming exact dedup within a
  * watermark, and custom sessionization state via mapGroupsWithState.
  *
  * All transforms are source-agnostic `DataFrame => DataFrame` — the same
  * code runs on `readStream` (Kafka/files at scale, MemoryStream in specs)
  * and its batch equivalent. Scale posture: state stores are keyed by the
  * group/window key and bounded by the watermark — late data past the
  * watermark is dropped, so state cannot grow without bound.
  */
object StreamOps {

  /** Tumbling-window event counts/sums with a watermark: the streaming
    * analog of q18's batch time-window aggregate. Append-mode-compatible
    * (windows close once the watermark passes). */
  def windowedStats(events: DataFrame, tsCol: String, valueCol: String,
                    window_ : String, watermark: String): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), window_))
      .agg(count(lit(1)).as("n"),
        sum(col(valueCol).cast("decimal(18,4)")).cast("double")
          .as("sum_value"))
      .select(col("window.start").as("window_start"), col("n"),
        col("sum_value"))

  /** Streaming exact dedup (A2 at ingest time): first event per key wins;
    * duplicate arrivals within the watermark horizon are dropped, state
    * for keys older than the watermark is reclaimed. */
  def dedupWithinWatermark(events: DataFrame, tsCol: String,
                           watermark: String,
                           keys: Seq[String]): DataFrame =
    events.withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(keys.head, keys.tail: _*)

  /** Stream-stream INTERVAL join: right rows within [leftTs, leftTs +
    * maxDelaySec] for the same key — e.g. purchases within an hour of a
    * signup, both sides live streams. Both inputs are watermarked, and
    * the time-bound join condition is what lets Structured Streaming
    * EXPIRE state: without it a stream-stream join must buffer both
    * sides forever. State per side is bounded by watermark + interval.
    * The same call works on batch frames (condition degenerates to a
    * plain range join) — specs pin stream == batch on one feed. */
  def joinWithinInterval(left: DataFrame, right: DataFrame,
                         keys: Seq[String], leftTs: String, rightTs: String,
                         watermark: String, maxDelaySec: Long): DataFrame = {
    val l = left.withWatermark(leftTs, watermark)
    val r = right.withWatermark(rightTs, watermark)
    val cond = keys.map(k => l(k) === r(k)).reduce(_ && _) &&
      r(rightTs) >= l(leftTs) &&
      r(rightTs) <= l(leftTs) + expr(s"INTERVAL $maxDelaySec SECONDS")
    // using-join style output: one copy of each key (the left's)
    keys.foldLeft(l.join(r, cond, "inner"))((df, k) => df.drop(r(k)))
  }

  /** Stream-stream interval join, LEFT OUTER: same bounded state as
    * [[joinWithinInterval]], but a left row with NO in-window match is
    * emitted null-padded once the watermark passes the end of its match
    * window (leftTs + maxDelaySec) — the "signup that never purchased"
    * row a funnel needs without a second batch pass. Structured
    * Streaming admits the outer side ONLY because the time bound
    * exists: the bound is the proof a buffered row can never match
    * again and may be finalized; an unbounded outer stream-stream join
    * would hold state forever. Works on batch frames too (degenerates
    * to a plain left-outer range join) — the spec pins stream == batch
    * on one feed. */
  def joinWithinIntervalOuter(left: DataFrame, right: DataFrame,
                              keys: Seq[String], leftTs: String,
                              rightTs: String, watermark: String,
                              maxDelaySec: Long): DataFrame = {
    val l = left.withWatermark(leftTs, watermark)
    val r = right.withWatermark(rightTs, watermark)
    val cond = keys.map(k => l(k) === r(k)).reduce(_ && _) &&
      r(rightTs) >= l(leftTs) &&
      r(rightTs) <= l(leftTs) + expr(s"INTERVAL $maxDelaySec SECONDS")
    keys.foldLeft(l.join(r, cond, "left_outer"))((df, k) => df.drop(r(k)))
  }

  final case class SessionEvent(user_id: Long, ts: Timestamp, value: Double)
  final case class SessionState(start: Long, lastSeen: Long, n: Int,
                                sum: Double)
  final case class SessionSummary(user_id: Long, start_ms: Long,
                                  end_ms: Long, n_events: Int,
                                  sum_value: Double)

  /** Session gap: a session closes after this much event-time silence. */
  val SessionGapMs: Long = 30 * 60 * 1000L

  /** Custom sessionization via flatMapGroupsWithState: accumulates
    * per-user state, closing a session when an incoming event arrives more
    * than [[SessionGapMs]] of EVENT TIME after the last one. Emits every
    * session CLOSED within the batch plus the running summary of the
    * current session — flatMap, not map, because a single batch can close
    * several sessions for one key and a map emits only one row (which
    * would silently drop the pre-gap sessions). The
    * KeyValueGroupedDataset path: state is per user key, partitioned by
    * the shuffle. (NoTimeout: a processing-time timeout would schedule
    * empty micro-batches forever, which also makes
    * processAllAvailable-style draining impossible.) */
  def sessionize(events: Dataset[SessionEvent])
  : Dataset[SessionSummary] = {
    implicit val outEnc = Encoders.product[SessionSummary]
    events.groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState[SessionState, SessionSummary](
        OutputMode.Update(), GroupStateTimeout.NoTimeout) {
        case (user, es, state: GroupState[SessionState]) =>
          def summary(s: SessionState) =
            SessionSummary(user, s.start, s.lastSeen, s.n, s.sum)
          val sorted = es.toSeq.sortBy(_.ts.getTime)
          var closed = List.empty[SessionSummary]
          var cur = state.getOption
          sorted.foreach { e =>
            val t = e.ts.getTime
            cur = cur match {
              case Some(s) if t - s.lastSeen > SessionGapMs =>
                closed ::= summary(s) // gap: close + start new session
                Some(SessionState(t, t, 1, e.value))
              case Some(s) =>
                Some(SessionState(s.start, math.max(s.lastSeen, t),
                  s.n + 1, s.sum + e.value))
              case None =>
                Some(SessionState(t, t, 1, e.value))
            }
          }
          cur.foreach(state.update)
          (closed.reverse ++ cur.map(summary)).iterator
      }(Encoders.product[SessionState], outEnc)
  }

  /** Streaming distribution-drift monitor — the live twin of the batch
    * TVD drift check (AnalyticsOps.driftTvd): per (event-time window,
    * group), build a fixed equi-width histogram of `valueCol` and score
    * total-variation distance against a static per-group REFERENCE
    * histogram (yesterday's corpus, the training mix).
    *
    * The histogram is one row of `nBins` conditional sums inside a
    * SINGLE streaming aggregation — chained streaming aggregations are
    * unsupported, and a fixed bin count makes the whole window state one
    * row wide. The reference arrives as a static broadcast join; TVD is
    * a FIXED left-to-right fold of |c_i·m − r_i·n| integer terms over
    * the common denominator (the q79 exactness discipline — no
    * accumulation-order float drift), divided once.
    *
    * `reference`: (group, r0..r{nBins-1}) — e.g. yesterday's
    * histogramAgg output. Windows close on the watermark, so the
    * monitor emits once per (window, group) in append mode. */
  def driftMonitor(events: DataFrame, tsCol: String, group: Column,
                   valueCol: Column, windowDur: String, watermark: String,
                   reference: DataFrame, lo: Double, binWidth: Double,
                   nBins: Int): DataFrame = {
    // Shared null-preserving bin (AnalyticsOps.histBin): null values are
    // missing measurements, not top-bin mass — dropped here exactly as
    // the batch twin drops them.
    val bin = graft.operators.AnalyticsOps
      .histBin(valueCol, lo, binWidth, nBins)
    val aggCols = count(lit(1)).as("n") +: (0 until nBins).map(b =>
      sum(when(col("__bin") === b, 1L).otherwise(0L)).as(s"c$b"))
    val hist = events.withWatermark(tsCol, watermark)
      .select(col(tsCol), group.as("grp"), bin.as("__bin"))
      .filter(col("__bin").isNotNull)
      .groupBy(window(col(tsCol), windowDur), col("grp"))
      .agg(aggCols.head, aggCols.tail: _*)
    val refTotal = (0 until nBins).map(b => col(s"r$b"))
      .reduce(_ + _).as("m")
    val joined = hist.join(
      broadcast(reference.select(col("grp") +:
        (0 until nBins).map(b => col(s"r$b")) :+ refTotal: _*)), "grp")
    // decimal(18,0) products — the q79 overflow discipline (exact to
    // 10^18 rows; long*long wraps silently at the 100 TB reference ×
    // busy-window regime)
    val dec = (c: Column) => c.cast("decimal(18,0)")
    val num = (0 until nBins).map(b =>
        abs(dec(col(s"c$b")) * dec(col("m")) -
          dec(col(s"r$b")) * dec(col("n"))))
      .reduce(_ + _)
    // One-sided drop, mirroring the batch twin's na > 0 AND nb > 0
    // filter (driftTvd): a reference row with all-zero bin counts (or a
    // window with none — impossible for a streamed agg, but free to
    // guard) would otherwise emit NaN/Infinity TVD instead of no row.
    joined.filter(col("m") > 0 && col("n") > 0)
      .select(col("window.start").as("window_start"), col("grp"),
        col("n"), col("m"),
        (num.cast("double") /
          ((lit(2.0) * col("n").cast("double")) * col("m").cast("double")))
          .as("tvd"))
  }

  final case class StepEvent(user_id: Long, us: Long, step: Int)
  final case class FunnelBuf(times: Map[Int, List[Long]])
  final case class FunnelReach(user_id: Long, reached: Int,
                               frontier_us: Long)

  /** Streaming strict-sequence funnel via flatMapGroupsWithState: per
    * user, buffer per-step event times and re-derive the batch funnel
    * chain (t₁ = earliest step-1; t_{i+1} = earliest step-(i+1) STRICTLY
    * after t_i) on every trigger, emitting the user's current reach in
    * Update mode — the live twin of [[graft.operators.AnalyticsOps
    * .funnel]], spec-pinned to match it on identical input.
    *
    * Out-of-order safety is WHY the buffer exists: a greedy
    * state-machine (advance on next-step arrival) silently under-counts
    * when a step-k event arrives before its step-(k-1) predecessor —
    * re-deriving from buffered times makes late predecessors retroactive
    * exactly like batch. Earlier arrivals can LOWER an earlier frontier
    * and make previously-useless later times eligible, so no time below
    * the current frontier is safely prunable until event time is closed
    * out: production pairs this with a watermark-driven state timeout
    * (the [[sessionize]] close-out pattern) so the per-user buffer is
    * bounded by the funnel horizon, not the stream's lifetime. */
  def funnelProgress(events: Dataset[StepEvent], nSteps: Int)
  : Dataset[FunnelReach] = {
    implicit val outEnc = Encoders.product[FunnelReach]
    def chain(times: Map[Int, List[Long]]): (Int, Long) = {
      var frontier = Long.MinValue
      var reached = 0
      var i = 1
      var done = false
      while (i <= nSteps && !done) {
        val next = times.getOrElse(i, Nil)
          .filter(t => if (i == 1) true else t > frontier)
        if (next.isEmpty) done = true
        else { frontier = next.min; reached = i }
        i += 1
      }
      (reached, if (reached == 0) 0L else frontier)
    }
    events.groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState[FunnelBuf, FunnelReach](
        OutputMode.Update(), GroupStateTimeout.NoTimeout) {
        case (user, es, state: GroupState[FunnelBuf]) =>
          val buf = es.foldLeft(
            state.getOption.getOrElse(FunnelBuf(Map.empty))) { (b, e) =>
            if (e.step < 1 || e.step > nSteps) b
            else FunnelBuf(b.times.updated(e.step,
              e.us :: b.times.getOrElse(e.step, Nil)))
          }
          state.update(buf)
          val (reached, frontier) = chain(buf.times)
          Iterator.single(FunnelReach(user, reached, frontier))
      }(Encoders.product[FunnelBuf], outEnc)
  }

  /** Batch-equivalence helper: the SAME windowedStats call on a batch
    * frame (no watermark needed for completeness in batch). Used by specs
    * to pin streaming results == batch results on identical input. */
  def windowedStatsBatch(events: DataFrame, tsCol: String,
                         valueCol: String, window_ : String): DataFrame =
    events.groupBy(window(col(tsCol), window_))
      .agg(count(lit(1)).as("n"),
        sum(col(valueCol).cast("decimal(18,4)")).cast("double")
          .as("sum_value"))
      .select(col("window.start").as("window_start"), col("n"),
        col("sum_value"))

  /** L89: streaming rollup maintenance — keep a
    * [[graft.sources.CatalogOps.createRollup]]-shaped table current from
    * a stream, instead of re-aggregating the base table per refresh. Each
    * micro-batch folds its ADDABLE partials (decimal sums + counts, the
    * same decomposability the batch rollup serves from) into the live
    * table via `upsertRollup`, whose stored `applied_batch` epoch makes a
    * replayed batch a NO-OP — at-least-once redelivery from the stream
    * becomes exactly-once table state (spec-pinned: maintained ==
    * rebuilt-from-scratch, and a forced replay changes nothing).
    *
    * foreachBatch is the sanctioned shape for "merge a stream into a
    * table Structured Streaming has no native sink for": the batch holds
    * only the delta, the merge cost is rollup-cardinality per trigger,
    * and the checkpoint dir carries source offsets so a restart resumes
    * (and at-most re-replays) the in-flight epoch. */
  def maintainRollup(stream: DataFrame, dims: Seq[String],
                     measures: Map[String, Column], db: String,
                     table: String, checkpointDir: String)
  : org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row],
                       batchId: Long) =>
        graft.sources.CatalogOps.upsertRollup(batch.sparkSession,
          graft.sources.CatalogOps.rollupPartial(batch.toDF(), dims,
            measures),
          db, table, dims, measures.keys.toSeq, batchId)
      }
      .option("checkpointLocation", checkpointDir)
      .start()

  final case class FeatEvent(user_id: Long, ts: Timestamp, cents: Long)
  final case class FeatState(last_us: Long, n_total: Long,
                             cents_total: Long)
  final case class FeatRow(user_id: Long, last_us: Long, n_total: Long,
                           cents_total: Long)

  /** Streaming feature-store maintenance — the ONLINE half of the q190
    * snapshot: per-actor lifetime features (recency anchor in exact µs,
    * event count, integer-cents total) held in mapGroupsWithState and
    * re-emitted as the actor's CURRENT row whenever a batch touches them
    * — exactly the upsert stream a KV feature store (the serving side of
    * training/serving skew control) applies. State is ONE fixed-width
    * row per actor — bounded by actor cardinality, never stream length;
    * every feature is an associative fold (max, +), so the streamed
    * state is the batch aggregate of the prefix, which the spec pins
    * (streamed == batch groupBy on the same feed — the oracle-boundary
    * discipline for streaming ops). Overflow is a crash, not a wrap
    * (Math.addExact): a corrupted lifetime-cents feature silently
    * poisons every model trained on it. */
  def maintainFeatures(events: Dataset[FeatEvent]): Dataset[FeatRow] = {
    implicit val outEnc = Encoders.product[FeatRow]
    events.groupByKey(_.user_id)(Encoders.scalaLong)
      .mapGroupsWithState[FeatState, FeatRow](GroupStateTimeout.NoTimeout) {
        case (uid, es, state: GroupState[FeatState]) =>
          var last = state.getOption.map(_.last_us).getOrElse(Long.MinValue)
          var n = state.getOption.map(_.n_total).getOrElse(0L)
          var c = state.getOption.map(_.cents_total).getOrElse(0L)
          es.foreach { e =>
            // Timestamp → exact µs: ms epoch (nanos already truncated to
            // ms inside getTime) + the sub-ms µs remainder.
            val us = Math.addExact(
              Math.multiplyExact(e.ts.getTime, 1000L),
              (e.ts.getNanos / 1000L) % 1000L)
            if (us > last) last = us
            n += 1
            c = Math.addExact(c, e.cents)
          }
          state.update(FeatState(last, n, c))
          FeatRow(uid, last, n, c)
      }(Encoders.product[FeatState], outEnc)
  }

  final case class FeatUpsert(user_id: Long, last_us: Long, n_total: Long,
                              cents_total: Long, tombstone: Boolean)

  /** [[maintainFeatures]] with EVENT-TIME TTL EVICTION — the variant an
    * open actor universe requires: NoTimeout state grows with every
    * actor ever seen, and at 100 TB "ever seen" is unbounded. Here each
    * actor's state carries a timeout at (last event time + ttl); once
    * the WATERMARK passes it, the group times out, state is removed,
    * and a TOMBSTONE row is emitted — the DELETE a KV feature store
    * applies downstream, so serving-side staleness is bounded by the
    * same ttl. State is therefore bounded by the ACTIVE actor set
    * within the ttl horizon, not by lifetime cardinality. A re-appearing
    * actor starts from zero — the documented semantics of evicting
    * lifetime features (the alternative, re-hydrating from the offline
    * store, is a serving-side concern). */
  def maintainFeaturesTtl(events: Dataset[FeatEvent], watermark: String,
                          ttlMs: Long): Dataset[FeatUpsert] = {
    require(ttlMs > 0, s"ttlMs must be positive, got $ttlMs")
    implicit val outEnc = Encoders.product[FeatUpsert]
    events.withWatermark("ts", watermark)
      .groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState[FeatState, FeatUpsert](
        OutputMode.Update(), GroupStateTimeout.EventTimeTimeout) {
        case (uid, es, state: GroupState[FeatState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.single(FeatUpsert(uid, 0L, 0L, 0L, tombstone = true))
          } else {
            var last = state.getOption.map(_.last_us)
              .getOrElse(Long.MinValue)
            var n = state.getOption.map(_.n_total).getOrElse(0L)
            var c = state.getOption.map(_.cents_total).getOrElse(0L)
            es.foreach { e =>
              val us = Math.addExact(
                Math.multiplyExact(e.ts.getTime, 1000L),
                (e.ts.getNanos / 1000L) % 1000L)
              if (us > last) last = us
              n += 1
              c = Math.addExact(c, e.cents)
            }
            state.update(FeatState(last, n, c))
            // Timeout must land strictly past the current watermark
            // (late stragglers arrive with event time already behind
            // it); clamping keeps them from throwing instead of
            // evicting next trigger.
            state.setTimeoutTimestamp(
              math.max(state.getCurrentWatermarkMs + 1,
                last / 1000L + ttlMs))
            Iterator.single(FeatUpsert(uid, last, n, c, tombstone = false))
          }
      }(Encoders.product[FeatState], outEnc)
  }

  final case class HHEvent(grp: String, item: String)
  final case class HHState(counters: Map[String, Long], n_seen: Long)
  final case class HHRow(grp: String, item: String, est_count: Long,
                         n_seen: Long)

  /** L160: streaming heavy hitters — Misra–Gries summaries (Misra &
    * Gries 1982) in per-group state: at most `k` counters per group
    * whatever the stream length, with the classic guarantee that every
    * item of true frequency > N/(k+1) HOLDS a counter and each counter
    * undercounts by at most N/(k+1). The bounded-memory "top items right
    * now" a feed monitor serves — a streaming groupBy(item) would hold
    * state per DISTINCT ITEM (unbounded on an open vocabulary); this
    * holds k counters per group, full stop.
    *
    * flatMapGroupsWithState in Update mode emits each group's current
    * counter table per trigger (plus the running N so consumers can form
    * the error bound). Batch-order determinism: within a batch the
    * iterator's arrival order decides WHICH below-threshold items hold
    * counters (never the guarantee itself); the spec feeds a
    * single-partition ordered stream and pins exact equality against a
    * driver-side replay, plus the frequency guarantee against exact
    * batch counts. */
  def heavyHitters(events: Dataset[HHEvent], k: Int): Dataset[HHRow] = {
    require(k >= 1, s"need k >= 1 counters, got $k")
    implicit val outEnc = Encoders.product[HHRow]
    events.groupByKey(_.grp)(Encoders.STRING)
      .flatMapGroupsWithState[HHState, HHRow](
        OutputMode.Update(), GroupStateTimeout.NoTimeout) {
        case (grp, es, state: GroupState[HHState]) =>
          var m = state.getOption.map(_.counters)
            .getOrElse(Map.empty[String, Long])
          var n = state.getOption.map(_.n_seen).getOrElse(0L)
          es.foreach { e =>
            n += 1
            m.get(e.item) match {
              case Some(c) => m = m.updated(e.item, c + 1)
              case None if m.size < k => m = m.updated(e.item, 1L)
              case None =>
                // decrement-all step: every counter pays one, zeros drop
                m = m.view.mapValues(_ - 1).filter(_._2 > 0).toMap
            }
          }
          state.update(HHState(m, n))
          m.iterator.map { case (item, c) => HHRow(grp, item, c, n) }
      }(Encoders.product[HHState], outEnc)
  }

  /** Driver-side Misra–Gries replay (test reference only) — the same
    * fold [[heavyHitters]] runs in state, for pinning the streamed
    * result exactly on an ordered feed. */
  def misraGriesReference(items: Seq[String], k: Int): Map[String, Long] = {
    var m = Map.empty[String, Long]
    items.foreach { it =>
      m.get(it) match {
        case Some(c) => m = m.updated(it, c + 1)
        case None if m.size < k => m = m.updated(it, 1L)
        case None => m = m.view.mapValues(_ - 1).filter(_._2 > 0).toMap
      }
    }
    m
  }
}
