package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured-Streaming surface (SURVEY.md §2.12: the reference is a
  * cron-rerun batch job — il_analysis_git.py:219-222 — so streaming is
  * a north-star extension, not a port).
  *
  * Design rule: every transformation here is *unbounded-safe* — the
  * same code runs in batch mode (where it is oracle-checkable by the
  * driver) and under `readStream` (where it is incrementally
  * maintained with watermark-bounded state). StreamingSpec drives both
  * paths through MemoryStream.
  */
object EventStream {

  /** Tumbling-window per-type counts/sums with a watermark.
    *
    * Streaming: state per (window, event_type) bucket, dropped once
    * the watermark passes `window.end` — bounded state regardless of
    * input volume. Batch: an ordinary two-key hash aggregate (partial
    * + final). At 100 TB the shuffle key (window × type) is low-card;
    * the map-side partial aggregation does nearly all the work.
    */
  def windowedCounts(events: DataFrame,
                     watermarkDelay: String = "10 minutes",
                     windowLen: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), windowLen).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(round(col("value") * 100).cast("long")).as("sum_vc"))
      .select(col("w.start").as("w_start"), col("w.end").as("w_end"),
        col("event_type"), col("n"), col("sum_vc"))

  /** Input row for sessionization (a projection of the events table). */
  case class Ev(user_id: Long, ts: java.sql.Timestamp, value: Double)

  /** One closed (or flushed) session. */
  case class Session(user_id: Long, start: java.sql.Timestamp,
                     end: java.sql.Timestamp, n_events: Int, sum_vc: Long)

  /** Live-session accumulator: (start, end, n, sumVc) — a tuple so the
    * state encoder stays on Spark's stock tuple codegen path. */
  private type SessionState = (Long, Long, Int, Long)

  /** Event-time sessionization with a `gapMs` inactivity gap via
    * `flatMapGroupsWithState` + event-time timeout.
    *
    * State per live user is O(1) (four longs) — no event buffering —
    * and is evicted by the watermark timeout, so executor state stays
    * bounded at any scale. Out-of-order events *within* the watermark
    * are handled by accumulating min(start)/max(end); events later
    * than the watermark are dropped by the engine (correct streaming
    * semantics, not data loss — the reference re-runs the full batch
    * daily for the same reason).
    */
  def sessionize(events: Dataset[Ev], gapMs: Long,
                 watermarkDelay: String = "10 minutes"): Dataset[Session] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (uid, evs, state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val (start, end, n, sumVc) = state.get
            state.remove()
            Iterator.single(Session(uid, new java.sql.Timestamp(start),
              new java.sql.Timestamp(end), n, sumVc))
          } else {
            // Merge this micro-batch's events into (possibly several)
            // sessions, emitting every session closed by a later event.
            val sorted = evs.toSeq.sortBy(_.ts.getTime)
            var cur = state.getOption
            val closed = Seq.newBuilder[Session]
            sorted.foreach { e =>
              val t = e.ts.getTime
              val vc = math.round(e.value * 100)
              cur match {
                case Some((start, end, n, sumVc)) if t - end <= gapMs =>
                  cur = Some((math.min(start, t), math.max(end, t), n + 1, sumVc + vc))
                case Some((start, end, n, sumVc)) =>
                  closed += Session(uid, new java.sql.Timestamp(start),
                    new java.sql.Timestamp(end), n, sumVc)
                  cur = Some((t, t, 1, vc))
                case None =>
                  cur = Some((t, t, 1, vc))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s._2 + gapMs)
            }
            closed.result().iterator
          }
      }
  }

  /** Stream-stream event-time interval join: each `view` matches the
    * `click`s of the same user landing within `[view.ts, view.ts +
    * joinWindow]`.
    *
    * Both sides carry watermarks and the join condition bounds event
    * time in BOTH directions, so the state store holds only rows
    * inside the watermark horizon — bounded memory on unbounded
    * streams (Spark evicts a buffered row once the other side's
    * watermark passes its latest possible match). Batch mode: the
    * same expression is an ordinary range join — oracle-checkable. */
  def intervalJoin(views: DataFrame, clicks: DataFrame,
                   watermarkDelay: String = "10 minutes",
                   joinWindow: String = "5 minutes"): DataFrame =
    views.withWatermark("ts", watermarkDelay).as("v")
      .join(clicks.withWatermark("ts", watermarkDelay).as("c"),
        expr(s"""v.user_id = c.user_id AND
                 c.ts >= v.ts AND c.ts <= v.ts + interval $joinWindow"""))
      .select(col("v.user_id").as("user_id"),
        col("v.ts").as("view_ts"), col("c.ts").as("click_ts"),
        round(col("c.value") * 100).cast("long").as("click_vc"))

  /** Input row for [[asofEnrich]]: `side = 0` publishes a dimension
    * version (v becomes the key's value effective at ts); `side = 1`
    * is a fact to enrich. One tagged stream, like the batch
    * union-window as-of idiom. */
  case class TemporalIn(id: Long, ts: java.sql.Timestamp, side: Int, v: Long)

  /** A fact enriched with the latest dim version at-or-before its
    * event time (`dim_ts`/`dim_v` in epoch ms; None = no version yet —
    * the left-outer null of the batch as-of). */
  case class TemporalOut(id: Long, fact_ts: java.sql.Timestamp, fact_v: Long,
                         dim_ts: Option[Long], dim_v: Option[Long])

  /** Streaming as-of twin of [[graft.plans.AsOfJoinExec]]: facts are
    * enriched with the latest dimension version at-or-before their
    * EVENT time — a temporal join against a slowly-changing dimension
    * (Flink's event-time temporal join; kdb's streaming aj).
    *
    * Semantics match the batch operator: inclusive ties (a version at
    * exactly the fact's ts is taken), left-outer None before the first
    * version, and arrival order within a micro-batch is irrelevant —
    * all of a batch's versions become visible before any of its facts
    * look up, so an out-of-order (fact-before-dim) arrival inside the
    * watermark horizon still enriches correctly.
    *
    * State bound (the streaming-safety argument): per key, the version
    * list holds ONLY versions inside the watermark horizon plus the
    * single newest version at-or-below the watermark — every fact the
    * engine still admits has `ts >= watermark`, so older versions can
    * never be read again and are pruned each invocation. Steady state
    * is O(1) per key for a slowly-changing dimension; keys themselves
    * persist (a dimension keyspace is bounded by definition — facts
    * may reference a version forever). In batch mode the watermark is
    * 0, nothing prunes, and the same code is the exact as-of join. */
  def asofEnrich(in: Dataset[TemporalIn],
                 watermarkDelay: String = "1 hour"): Dataset[TemporalOut] = {
    import in.sparkSession.implicits._
    in.withWatermark("ts", watermarkDelay)
      .groupByKey(_.id)
      .flatMapGroupsWithState[List[(Long, Long)], TemporalOut](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (id, rows, state: GroupState[List[(Long, Long)]]) =>
          val batch = rows.toSeq
          // merge this batch's versions into the stored (ts, v) list;
          // a re-published ts last-write-wins in arrival order
          val incoming = batch.filter(_.side == 0)
            .sortBy(_.ts.getTime).map(e => (e.ts.getTime, e.v))
          var versions = (state.getOption.getOrElse(Nil) ++ incoming)
            .groupBy(_._1).view.mapValues(_.last._2).toList.sortBy(_._1)
          val wm = state.getCurrentWatermarkMs()
          val idx = versions.lastIndexWhere(_._1 <= wm)
          if (idx > 0) versions = versions.drop(idx)
          state.update(versions)
          batch.filter(_.side == 1).sortBy(_.ts.getTime).iterator.map { f =>
            val hit = versions.takeWhile(_._1 <= f.ts.getTime).lastOption
            TemporalOut(id, f.ts, f.v, hit.map(_._1), hit.map(_._2))
          }
      }
  }

  /** Streaming near-duplicate suppression: the text tier's SimHash
    * kernel composed with watermark-bounded streaming dedup state.
    * Each arriving document is fingerprinted in the same codegen'd
    * pass as batch `q_dedup_simhash`; the 62-bit fingerprint is the
    * dedup key within the watermark horizon, so a boilerplate re-post
    * storm is suppressed at ingest with O(distinct fingerprints in
    * horizon) state — not at the next batch dedup run. Hamming-0
    * semantics (identical fingerprints); banding the fingerprint into
    * 4×16-bit keys would extend it to hamming ≤ 3 at 4× the state. */
  def dedupNearStream(docs: DataFrame,
                      watermarkDelay: String = "10 minutes"): DataFrame =
    docs
      .withColumn("fp", graft.functions.F.simhash64(
        graft.text.TextFunctions.tokens(col("text"))))
      .withWatermark("ts", watermarkDelay)
      .dropDuplicatesWithinWatermark("fp")

  /** Count-min-sketch cells over a token stream — the streaming twin
    * of batch `q_heavy_hitters`. Because the sketch is ALGEBRAIC
    * (cells are plain counts, estimate = min over a row's cells), the
    * streaming build is just a running integer aggregate with O(d·w)
    * state REGARDLESS of stream volume or token cardinality — no
    * watermark needed, nothing is ever evicted, and the maintained
    * cells are bit-equal to a batch build over the same prefix
    * (StreamingSpec proves it across micro-batches). This is the
    * state-size contract that lets "what is hot right now" run
    * forever on unbounded input: the exact per-token counter map
    * grows with the vocabulary; the sketch never grows at all.
    *
    * Same hash family / width as the batch query, so estimates from
    * these cells obey the same never-under-count invariant. */
  def cmsCells(toks: DataFrame,
               bases: Seq[Long] = Seq(131L, 137L, 139L),
               width: Long = 64L): DataFrame =
    bases.zipWithIndex.map { case (b, d) =>
      toks.select(lit(d).as("d"),
        pmod(graft.functions.F.polyHash(col("tok"), b), lit(width)).as("w"))
    }.reduce(_ unionByName _)
      .groupBy("d", "w").agg(count(lit(1)).as("cnt"))

  /** Streaming Bloom-filter MAINTENANCE — the streaming twin of
    * `q_bloom_prune`'s build side ([[graft.ops.Bloom]]): the (cell,
    * bits) table runs under streaming aggregation with `bit_or`,
    * which is algebraic and MONOTONE (bits only ever turn on), so the
    * maintained state is bit-equal to a from-scratch batch build over
    * the same key prefix, needs no watermark and never evicts, and is
    * bounded at ≤ Bloom.Cells rows forever. This is how a long-lived
    * join-pruning filter tracks a growing build table: each
    * micro-batch ORs its new keys' bits in, and any moment's snapshot
    * assembles into a valid lut (no false negatives on every key seen
    * so far — StreamingSpec proves both properties live). */
  def bloomCells(keys: DataFrame, keyCol: String): DataFrame =
    graft.ops.Bloom.cells(keys, keyCol)

  /** Streaming KMV distinct sketch per key — the streaming twin of
    * batch `q_kmv_distinct`. The same [[graft.functions.KmvSketch]]
    * TypedImperativeAggregate runs under streaming aggregation: state
    * per key is the K smallest DISTINCT hashes (O(K) longs, never
    * grows), the state-store restore path reuses the aggregate's own
    * buffer merge, and because the buffer is arrival-order- and
    * duplication-free the maintained sketch is bit-equal to a
    * from-scratch batch build over the same prefix (StreamingSpec
    * proves it across micro-batches). This is the distinct-cardinality
    * monitor that runs forever on unbounded input: exact distinct
    * state grows with the id universe; the sketch holds 2 KB per key
    * no matter what, and `(K-1)·M/kth` reads the estimate off the
    * maintained state at any moment. */
  def kmvDistinct(rows: DataFrame, keyCol: String, hashCol: String,
                  k: Int = 256): DataFrame =
    rows.groupBy(keyCol)
      .agg(graft.functions.F.kmvSketch(col(hashCol), k).as("sk"))
      .select(col(keyCol), col("sk.n_kept").as("n_kept"),
        col("sk.kth").as("kth"), col("sk.ks").as("ks"))

  // ---- CDC apply as a foreachBatch sink ----

  case class CdcChange(user_id: Long, event_id: Long,
                       ts: java.sql.Timestamp, op: String, vc: Long)
  case class CdcState(event_id: Long, ts: java.sql.Timestamp,
                      op: String, vc: Long)

  /** Newer-wins precedence fold — the single rule the batch
    * `q_cdc_apply` merge encodes in its `row_number` window
    * (latest (ts, event_id) per key wins; tombstones are retained as
    * versioned markers, NOT hard deletes, so a late upsert that is
    * OLDER than an applied delete can never resurrect the key). */
  def cdcFold(store: scala.collection.concurrent.TrieMap[Long, CdcState],
              c: CdcChange): Unit = {
    val stale = store.get(c.user_id).exists { s =>
      s.ts.getTime > c.ts.getTime ||
        (s.ts.getTime == c.ts.getTime && s.event_id >= c.event_id)
    }
    if (!stale) store.put(c.user_id, CdcState(c.event_id, c.ts, c.op, c.vc))
  }

  case class ScoreEv(user_id: Long, ts: java.sql.Timestamp,
                     event_id: Long, v: Long)
  case class ScoreOut(user_id: Long, event_id: Long, v: Long,
                      decay_sum: Long)

  /** Streaming twin of the batch `q_decay_score` operator: the
    * per-user exponentially-decayed rolling value (α = 1/2, 8 taps)
    * maintained incrementally. State per user is the ≤8 newest
    * (event-time, id, value) triples — CONSTANT, independent of
    * stream length — and each arriving event emits its decayed sum
    * immediately.
    *
    * Ordering contract: within a micro-batch events sort by event
    * time (arrival order inside a batch is irrelevant); ACROSS
    * batches delivery must be per-user in-order — an event older than
    * the stored buffer would retroactively change already-emitted
    * sums, a retraction Append mode cannot express (the same contract
    * as any recurrence state machine; out-of-order tolerance would
    * need a watermark-deep buffer instead of 8 rows).
    * BehaviorStreamSpec proves batch equality under that contract. */
  def decayScoreStream(in: Dataset[ScoreEv]): Dataset[ScoreOut] = {
    import in.sparkSession.implicits._
    in.groupByKey(_.user_id)
      .flatMapGroupsWithState[List[(Long, Long, Long)], ScoreOut](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (uid, rows, state: GroupState[List[(Long, Long, Long)]]) =>
          var buf = state.getOption.getOrElse(Nil) // oldest→newest, ≤8
          val out = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id)).map { e =>
            buf = (buf :+ ((e.ts.getTime, e.event_id, e.v))).takeRight(8)
            val dsum = buf.reverseIterator.zipWithIndex
              .map { case ((_, _, v), k) => v >> k }.sum
            ScoreOut(uid, e.event_id, e.v, dsum)
          }
          state.update(buf)
          out.iterator
      }
  }

  case class CusumEv(key: Long, t: Long, dev: Long)
  case class CusumOut(key: Long, t: Long, cum: Long, s_pos: Long,
                      s_neg: Long, alarm: Long)

  /** Streaming twin of the batch `q_cusum` monitor: per-key one-sided
    * CUSUM charts maintained incrementally with CONSTANT state —
    * (running cum, prefix-min of cum, prefix-max of cum), three
    * longs per key regardless of stream length — and the alarm
    * emitted ON ARRIVAL of the observation that crosses h, not at
    * the next batch recompute (the point of running the monitor
    * live).
    *
    * Deviations arrive pre-centered (dev = x − μ) and `h` is a
    * parameter: μ and the alarm threshold are FITTED OFFLINE on a
    * reference window — the monitoring deployment shape (the batch
    * query fits them in-query only so its oracle is self-contained).
    * The emitted values satisfy the identical closed form the batch
    * query computes with two running windows:
    * S⁺ = cum − min(0, min_{i≤t} cum_i), S⁻ = max(0, max cum) − cum
    * — the prefix clamps at 0 make the (0,0,0) initial state exact,
    * so batch equality is bit-level (StreamingSpec).
    *
    * Ordering contract: same as [[decayScoreStream]] — within a
    * micro-batch rows sort by event time; across batches delivery is
    * per-key in-order (a recurrence cannot retract in Append mode). */
  def cusumStream(in: Dataset[CusumEv], h: Long): Dataset[CusumOut] = {
    import in.sparkSession.implicits._
    in.groupByKey(_.key)
      .flatMapGroupsWithState[(Long, Long, Long), CusumOut](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (key, rows, state: GroupState[(Long, Long, Long)]) =>
          var (cum, mn, mx) = state.getOption.getOrElse((0L, 0L, 0L))
          val out = rows.toSeq.sortBy(_.t).map { e =>
            cum += e.dev
            mn = math.min(mn, cum)
            mx = math.max(mx, cum)
            val sPos = cum - math.min(0L, mn)
            val sNeg = math.max(0L, mx) - cum
            CusumOut(key, e.t, cum, sPos, sNeg,
              if (sPos > h || sNeg > h) 1L else 0L)
          }
          state.update((cum, mn, mx))
          out.iterator
      }
  }

  /** The `q_cdc_apply` merge as an INCREMENTAL sink: each micro-batch
    * folds its change rows into a keyed store under [[cdcFold]]'s
    * precedence, so arrival order — within a batch, across batches,
    * late data — cannot change the final table (StreamingSpec proves
    * equality with the batch window formula under shuffled batches).
    * The live table is `store.filter(_._2.op == "U")`.
    *
    * This in-memory store is the test harness shape; in production
    * foreachBatch issues the same predicate as a transactional MERGE
    * (`WHEN MATCHED AND source.(ts, event_id) > target.(ts, event_id)
    * THEN UPDATE/DELETE-marker ...`) against the warehouse table —
    * foreachBatch gives at-least-once batch delivery, and the
    * precedence predicate makes the merge idempotent under replay. */
  def cdcApplySink(in: Dataset[CdcChange],
                   store: scala.collection.concurrent.TrieMap[Long, CdcState])
      : org.apache.spark.sql.streaming.DataStreamWriter[CdcChange] =
    in.writeStream.outputMode("append")
      .foreachBatch { (batch: Dataset[CdcChange], _: Long) =>
        batch.collect().foreach(cdcFold(store, _))
        ()
      }

  // ---- windowed heavy hitters ----

  /** CMS cells PER event-time WINDOW with watermark eviction — the
    * streaming frequent-items monitor over an unbounded token stream
    * ([[cmsCells]] is the run-forever global twin; this one answers
    * "what was hot BETWEEN 9 and 10" and lets the engine drop a
    * window's d·w cells once the watermark passes its end, so state
    * is O(d·w · open-windows) instead of growing with history).
    * Append output: a window's cells emit exactly once, when it
    * closes — the contract that lets a downstream sink treat each
    * window's sketch as immutable. The per-window cell values are
    * the same algebraic counts as the batch build, so a closed
    * window's sketch is bit-equal to a from-scratch batch CMS over
    * that window's rows (StreamingSpec proves it). */
  def cmsWindowed(toks: DataFrame,
                  watermarkDelay: String = "10 minutes",
                  windowLen: String = "1 hour",
                  bases: Seq[Long] = Seq(131L, 137L, 139L),
                  width: Long = 64L): DataFrame =
    bases.zipWithIndex.map { case (b, d) =>
      toks.select(col("ts"), lit(d).as("d"),
        pmod(graft.functions.F.polyHash(col("tok"), b), lit(width)).as("w"))
    }.reduce(_ unionByName _)
      .withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), windowLen).as("win"), col("d"), col("w"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("win.start").as("w_start"), col("d"), col("w"), col("cnt"))

  // ---- streaming per-group priority reservoir ----

  case class DocIn(doc_id: Long, lang: String, n_chars: Long, prio_q: Long)
  case class ReservoirOut(lang: String, doc_id: Long, n_chars: Long,
                          prio_q: Long, rk: Int)

  /** Streaming twin of the batch `q_group_weighted_sample` operator:
    * the per-language k-smallest-priority reservoir (priority
    * sampling: u/w with hash-uniform u — the same `prio_q` key, so
    * the maintained sample IS the batch sample) kept incrementally.
    *
    * State per language is the ≤k best (prio_q, doc_id, n_chars)
    * triples — CONSTANT, independent of stream length, exactly the
    * O(k)-per-stratum bound the batch plan gets from
    * WindowGroupLimit. Each micro-batch merges its rows, re-sorts the
    * ≤2k candidates, truncates to k, and re-emits the group's current
    * reservoir (Update output — downstream upserts by (lang, rk)).
    *
    * Order-independence contract (ReservoirStreamSpec): the final
    * reservoir is a pure min-k over everything seen, so batch
    * boundaries, arrival order, and at-least-once replays (the merge
    * dedups on (prio_q, doc_id)) cannot change it — after the last
    * batch it is bit-equal to the batch query on the same rows. */
  def reservoirStream(in: Dataset[DocIn], k: Int = 20): Dataset[ReservoirOut] = {
    import in.sparkSession.implicits._
    in.groupByKey(_.lang)
      .flatMapGroupsWithState[List[(Long, Long, Long)], ReservoirOut](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        case (lang, rows, state: GroupState[List[(Long, Long, Long)]]) =>
          val merged =
            (state.getOption.getOrElse(Nil) ++
              rows.map(d => (d.prio_q, d.doc_id, d.n_chars)))
              .distinct.sortBy(t => (t._1, t._2)).take(k)
          state.update(merged)
          merged.zipWithIndex.map { case ((p, id, nc), i) =>
            ReservoirOut(lang, id, nc, p, i + 1)
          }.iterator
      }
  }
}
