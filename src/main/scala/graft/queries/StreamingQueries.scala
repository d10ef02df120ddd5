package graft.queries

import graft.streaming.StreamingOps

/** Structured Streaming operators run to completion over the events replay,
  * graded against batch-equivalent SQL (time windows are calendar buckets /
  * gaps-and-islands in ANSI SQL). Timestamps are compared at microsecond
  * precision on both sides (`make_timestamp(epoch_ns(ts) // 1000)` mirrors
  * Spark's nanos→micros rebuild).
  */
object StreamingQueries {

  def queries: Seq[QueryDef] = Seq(
    QueryDef(
      "stream_tumbling_agg",
      (s, dir) => StreamingOps.familyResult(s, dir, "stream_tumbling_agg"),
      Some("""
        SELECT date_trunc('day', make_timestamp(epoch_ns(ts) // 1000)) AS window_start,
               event_type, count(*) AS n,
               floor((sum(CAST(floor(value * 10000 + 0.5) AS BIGINT)) + 50) / 100) / 100.0 AS total
        FROM events
        GROUP BY 1, 2 ORDER BY window_start, event_type""")
    ),
    QueryDef(
      "stream_tumbling_uniques",
      // Exact unique visitors per day as TWO CHAINED STATEFUL operators
      // (watermarked dropDuplicates → windowed count) in one append-mode
      // query; the dedup emits each (day, user) once so the count is
      // exact distinct with bounded state both stages. Append emission:
      // a window finalizes only once the watermark (max ts − 1h) passes
      // its end, so the oracle applies the same cutoff — the
      // still-open final day is correctly ABSENT on both sides.
      (s, dir) => StreamingOps.familyResult(s, dir, "stream_tumbling_uniques"),
      Some("""
        WITH e AS (
          SELECT make_timestamp(epoch_ns(ts) // 1000) AS ts, user_id
          FROM events),
        wm AS (SELECT max(ts) - INTERVAL 1 HOUR AS w FROM e)
        SELECT date_trunc('day', ts) AS window_start,
               count(DISTINCT user_id) AS uniques
        FROM e, wm
        WHERE date_trunc('day', ts) + INTERVAL 1 DAY <= w
        GROUP BY 1 ORDER BY window_start""")
    ),
    QueryDef(
      "stream_sliding_agg",
      (s, dir) => StreamingOps.familyResult(s, dir, "stream_sliding_agg"),
      Some("""
        WITH starts AS (
          SELECT unnest([
            date_trunc('day', make_timestamp(epoch_ns(ts) // 1000)),
            date_trunc('day', make_timestamp(epoch_ns(ts) // 1000)) - INTERVAL 1 DAY
          ]) AS window_start
          FROM events)
        SELECT window_start, count(*) AS n
        FROM starts GROUP BY 1 ORDER BY window_start""")
    ),
    QueryDef(
      "stream_session",
      (s, dir) => StreamingOps.familyResult(s, dir, "stream_session"),
      Some("""
        WITH e AS (
          SELECT user_id, make_timestamp(epoch_ns(ts) // 1000) AS ts FROM events),
        marked AS (
          SELECT user_id, ts,
                 CASE WHEN lag(ts) OVER w IS NULL
                        OR ts >= lag(ts) OVER w + INTERVAL 30 MINUTE
                      THEN 1 ELSE 0 END AS new_session
          FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        sessions AS (
          SELECT user_id, ts,
                 sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                   ROWS UNBOUNDED PRECEDING) AS sid
          FROM marked)
        SELECT user_id, min(ts) AS session_start, count(*) AS n_events
        FROM sessions GROUP BY user_id, sid
        ORDER BY user_id, session_start""")
    ),
    QueryDef(
      "stream_static_join",
      (s, dir) => StreamingOps.familyResult(s, dir, "stream_static_join"),
      Some("""
        SELECT c_nationkey, count(*) AS n,
               floor((sum(CAST(floor(value * 10000 + 0.5) AS BIGINT)) + 50) / 100) / 100.0 AS total_value
        FROM events JOIN customer ON user_id = c_custkey
        GROUP BY c_nationkey ORDER BY c_nationkey""")
    ),
    QueryDef(
      "stream_stream_join",
      (s, dir) => StreamingOps.familyResult(s, dir, "stream_stream_join"),
      Some("""
        WITH e AS (
          SELECT event_id, user_id, event_type,
                 make_timestamp(epoch_ns(ts) // 1000) AS ts
          FROM events)
        SELECT p.user_id AS user_id,
               c.event_id AS click_id, p.event_id AS purchase_id,
               epoch_us(p.ts) - epoch_us(c.ts) AS gap_us
        FROM e p JOIN e c
          ON c.event_type = 'click' AND p.event_type = 'purchase'
         AND c.user_id = p.user_id
         AND c.ts <= p.ts AND c.ts >= p.ts - INTERVAL 1 HOUR
        ORDER BY 1, 2, 3""")
    ),
    QueryDef(
      "stream_stream_left_join",
      // Left-outer stream–stream join: matched purchases carry their
      // click, unmatched purchases emit (-1, -1) once the watermark closes
      // their state (flush-wave staging makes the finite replay emit ALL
      // outer rows — see StreamingOps.streamStreamLeftJoin). Oracle = the
      // batch left join over the real events.
      (s, dir) => StreamingOps.familyResult(s, dir, "stream_stream_left_join"),
      Some("""
        WITH e AS (
          SELECT event_id, user_id, event_type,
                 make_timestamp(epoch_ns(ts) // 1000) AS ts
          FROM events)
        SELECT p.user_id AS user_id, p.event_id AS purchase_id,
               coalesce(c.event_id, -1) AS click_id,
               coalesce(epoch_us(p.ts) - epoch_us(c.ts), -1) AS gap_us
        FROM e p LEFT JOIN e c
          ON c.event_type = 'click'
         AND c.user_id = p.user_id
         AND c.ts <= p.ts AND c.ts >= p.ts - INTERVAL 1 HOUR
        WHERE p.event_type = 'purchase'
        ORDER BY 1, 2, 3""")
    ),
    QueryDef(
      "stream_stream_full_join",
      // Full-outer stream–stream join: matched pairs plus BOTH sides'
      // unmatched rows with (-1) sentinels, each emitted when the
      // watermark proves no partner can arrive (flush-wave staging — see
      // StreamingOps.streamStreamLeftJoin). Oracle = the batch full join.
      (s, dir) => StreamingOps.familyResult(s, dir, "stream_stream_full_join"),
      Some("""
        WITH e AS (
          SELECT event_id, user_id, event_type,
                 make_timestamp(epoch_ns(ts) // 1000) AS ts
          FROM events),
        p AS (SELECT event_id, user_id, ts FROM e WHERE event_type = 'purchase'),
        c AS (SELECT event_id, user_id, ts FROM e WHERE event_type = 'click')
        SELECT coalesce(p.user_id, c.user_id) AS user_id,
               coalesce(p.event_id, -1) AS purchase_id,
               coalesce(c.event_id, -1) AS click_id
        FROM p FULL JOIN c
          ON c.user_id = p.user_id
         AND c.ts <= p.ts AND c.ts >= p.ts - INTERVAL 1 HOUR
        ORDER BY 1, 2, 3""")
    ),
    QueryDef(
      "stream_topk",
      (s, dir) => StreamingOps.familyResult(s, dir, "stream_topk"),
      Some("""
        SELECT user_id, count(*) AS n,
               floor((sum(CAST(floor(value * 10000 + 0.5) AS BIGINT)) + 50) / 100) / 100.0 AS total
        FROM events GROUP BY user_id
        ORDER BY n DESC, user_id LIMIT 10""")
    ),
    QueryDef(
      "stream_custom_state",
      // flatMapGroupsWithState custom per-key state (running totals +
      // alert), graded: the accumulator is integer cents, so the final
      // state is arrival-order-independent and the batch oracle is a plain
      // per-user aggregate.
      (s, dir) => StreamingOps.familyResult(s, dir, "stream_custom_state"),
      Some("""
        SELECT user_id,
               CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS total_cents,
               count(*) AS n,
               sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) >= 330000 AS alert
        FROM events GROUP BY user_id ORDER BY user_id"""),
    ),
    QueryDef(
      "stream_transform_with_state",
      // Spark-4 transformWithState (StatefulProcessor + named ValueState,
      // RocksDB provider) computing the SAME per-user running-total
      // contract as stream_custom_state — the modern arbitrary-state API
      // graded against the identical batch oracle, with a different alert
      // threshold so the two queries' outputs are independently checked.
      (s, dir) => StreamingOps.familyResult(s, dir, "stream_transform_with_state"),
      Some("""
        SELECT user_id,
               CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS total_cents,
               count(*) AS n,
               sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) >= 250000 AS alert
        FROM events GROUP BY user_id ORDER BY user_id"""),
    ),
    QueryDef(
      "stream_timer_flush",
      // transformWithState REGISTERED TIMERS (the API's distinguishing
      // feature over fMGWS): input rows emit nothing — they fold integer
      // per-user totals into ValueState and re-arm an event-time timer at
      // last event + 30 min; EVERY output row is produced in
      // handleExpiredTimer when the watermark crosses that horizon. State
      // survives firings, so emissions carry monotone running totals and
      // max-by-n per user equals the whole-table batch aggregate — an
      // empty result would mean timers never fired, so the oracle match
      // is itself the timer-emission proof.
      (s, dir) => StreamingOps.familyResult(s, dir, "stream_timer_flush"),
      Some("""
        SELECT user_id,
               CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS total_cents,
               count(*) AS n
        FROM events GROUP BY user_id ORDER BY user_id"""),
    ),
    QueryDef(
      "stream_state_reader",
      // Spark-4 state data source: batch-read the checkpointed state store
      // of a completed streaming aggregation (format("statestore")) and
      // grade the keyed aggregation buffers themselves — state
      // introspection as a first-class operator. Integer buffers make the
      // state content exactly replayable as a batch aggregate.
      (s, dir) => StreamingOps.familyResult(s, dir, "stream_state_reader"),
      Some("""
        SELECT event_type, count(*) AS n,
               CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents
        FROM events GROUP BY event_type ORDER BY event_type"""),
    ),
    QueryDef(
      "stream_late_drop",
      // Late-data drop policy: clicks replay AFTER the watermark advanced
      // past their day-windows AND an eviction batch finalized them
      // (three-wave file staging in StreamingOps.lateDataDrop), so append
      // mode drops them; observable output = closed windows of the on-time
      // (non-click) wave. Batch oracle = the same aggregate filtered at
      // the watermark cutoff (max on-time ts - 1 hour).
      (s, dir) => StreamingOps.familyResult(s, dir, "stream_late_drop"),
      Some("""
        WITH base AS (
          SELECT make_timestamp(epoch_ns(ts) // 1000) AS ts, value
          FROM events WHERE event_type <> 'click'),
        wm AS (SELECT max(ts) - INTERVAL 1 HOUR AS w FROM base)
        SELECT date_trunc('day', ts) AS window_start, count(*) AS n,
               floor((sum(CAST(floor(value * 10000 + 0.5) AS BIGINT)) + 50) / 100) / 100.0 AS total
        FROM base
        WHERE date_trunc('day', ts) + INTERVAL 1 DAY <= (SELECT w FROM wm)
        GROUP BY 1 ORDER BY window_start"""),
    ),
    QueryDef(
      "stream_dedup",
      (s, dir) => StreamingOps.familyResult(s, dir, "stream_dedup"),
      Some("""
        SELECT event_type, count(DISTINCT event_id) AS n
        FROM events GROUP BY event_type ORDER BY event_type""")
    ),
    QueryDef(
      "stream_dedup_bounded",
      // dropDuplicatesWithinWatermark: state evicted once the watermark
      // passes each id's event time + delay — O(lateness window), not
      // O(all ids). The replay has no duplicates beyond the window, so the
      // batch oracle is the same distinct count as stream_dedup.
      (s, dir) => StreamingOps.familyResult(s, dir, "stream_dedup_bounded"),
      Some("""
        SELECT event_type, count(DISTINCT event_id) AS n
        FROM events GROUP BY event_type ORDER BY event_type""")
    ),
    QueryDef(
      "stream_session_timeout",
      // The same 30-minute-gap sessions as stream_session, but via
      // flatMapGroupsWithState + EventTimeTimeout: closed sessions emit
      // when the next event proves the gap; each user's last open session
      // emits through the watermark-driven timeout callback (state
      // eviction = the timeout). Staged three-wave replay forces real
      // cross-batch session continuation; the batch gaps-and-islands
      // oracle grades the emitted sessions.
      (s, dir) => StreamingOps.familyResult(s, dir, "stream_session_timeout"),
      Some("""
        WITH e AS (
          SELECT user_id, make_timestamp(epoch_ns(ts) // 1000) AS ts FROM events),
        marked AS (
          SELECT user_id, ts,
                 CASE WHEN lag(ts) OVER w IS NULL
                        OR ts >= lag(ts) OVER w + INTERVAL 30 MINUTE
                      THEN 1 ELSE 0 END AS new_session
          FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        sessions AS (
          SELECT user_id, ts,
                 sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                   ROWS UNBOUNDED PRECEDING) AS sid
          FROM marked)
        SELECT user_id, min(ts) AS session_start, count(*) AS n_events
        FROM sessions GROUP BY user_id, sid
        ORDER BY user_id, session_start""")
    ),
    QueryDef(
      "stream_upsert_sink",
      // foreachBatch MERGE-upsert: a 3-slice replay folds per-user deltas
      // (count + argmax-last-event) into a versioned parquet state table,
      // one full-outer merge per micro-batch. Both merge components are
      // associative+commutative, so the final state is independent of the
      // batch partitioning — the batch oracle computes the same per-user
      // rollup in one pass. StreamingSpec asserts the replay really was
      // multi-batch.
      (s, dir) => StreamingOps.familyResult(s, dir, "stream_upsert_sink"),
      Some("""
        WITH e AS (
          SELECT user_id, epoch_ns(ts) // 1000 AS ts_us, event_id, value
          FROM events),
        ranked AS (
          SELECT user_id, ts_us, value,
                 row_number() OVER (PARTITION BY user_id
                   ORDER BY ts_us DESC, event_id DESC) AS rn
          FROM e),
        counts AS (SELECT user_id, count(*) AS n_events FROM e GROUP BY user_id)
        SELECT c.user_id, c.n_events,
               make_timestamp(r.ts_us) AS last_ts, r.value AS last_value
        FROM counts c JOIN ranked r ON c.user_id = r.user_id AND r.rn = 1
        ORDER BY c.user_id""")
    ),
    QueryDef(
      "stream_checkpoint_restart",
      // Restart-resume from a checkpoint: drain 2 slices, stop, let a 3rd
      // arrive while down, restart from the SAME checkpoint — committed
      // batches are skipped, only the unseen slice processes. Broken
      // resume would double the first two slices in the append sink; the
      // whole-table oracle catches it.
      (s, dir) => StreamingOps.familyResult(s, dir, "stream_checkpoint_restart"),
      Some("""
        SELECT event_type, count(*) AS n,
               floor((sum(CAST(floor(value * 10000 + 0.5) AS BIGINT)) + 50) / 100) / 100.0 AS total
        FROM events GROUP BY event_type ORDER BY event_type""")
    ),
    QueryDef(
      "stream_observed_totals",
      // Per-micro-batch observed DQ metrics (the streaming twin of
      // observed_write): `observe` rides each batch's processing and the
      // engine reports the values per batch in StreamingQueryProgress.
      // Row count and money quanta are ASSOCIATIVE sums, so the per-batch
      // ledger recomposes to the exact whole-table aggregate, whatever
      // the batch boundaries — which is exactly what the oracle computes
      // in one batch pass. The result exposes the ledger itself
      // (batch-boundary-dependent columns stay out; n_batches is fixed
      // by the 3-slice staging) so the oracle also proves the replay was
      // genuinely multi-batch.
      (s, dir) => StreamingOps.familyResult(s, dir, "stream_observed_totals"),
      Some("""
        SELECT 3 AS n_batches, count(*) AS n_rows,
               floor((sum(CAST(floor(value * 10000 + 0.5) AS BIGINT)) + 50) / 100) / 100.0 AS total_value
        FROM events""")
    )
  )
}
