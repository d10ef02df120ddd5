package graft.streaming

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Structured Streaming operators over the `events` table, replayed as a
  * file stream (`readStream.parquet`) — the same code path a production
  * deployment would run against an arriving directory/Kafka source.
  * (Model per "Structured Streaming: A Declarative API for Real-Time
  * Applications in Apache Spark", SIGMOD 2018 — see PAPERS.md.)
  *
  * Test/verify execution uses the memory sink + `processAllAvailable`,
  * which drives the real incremental engine (state store, watermarks,
  * window merge) to completion over the finite replay. Aggregations run in
  * `complete` mode so the final state is observable after a bounded replay;
  * a production job would run `append`/`update` with the same plans.
  */
/** Typed event for custom-state operators. */
final case class UserEvent(user_id: Long, value: Double)

/** Typed event for the timeout-driven sessionizer: `ts` carries the
  * watermark (EventTimeTimeout requires the watermarked column to survive
  * into the grouped Dataset); `ts_us` is the same instant as a long for
  * exact state arithmetic.
  */
final case class SessEvent(
    user_id: Long, ts: java.sql.Timestamp, ts_us: Long, event_id: Long)

/** Open-session state carried across micro-batches (micros). */
final case class SessState(start_us: Long, last_us: Long, n: Long)

/** Closed session emitted by [[StreamingOps.sessionTimeoutAgg]]. */
final case class SessOut(user_id: Long, session_start_us: Long, n_events: Long)

/** Per-key state carried across micro-batches. */
final case class RunningTotal(total: Double, n: Long)

/** Emitted update row from [[StreamingOps.statefulUserTotals]]. */
final case class UserTotal(user_id: Long, total: Double, n: Long, alert: Boolean)

object StreamingOps {

  /** Schema of the NORMALIZED staged replay files (ts already a proper
    * micros TimestampType — see [[stageDir]]). File streams need an
    * explicit schema; staging normalizes once per data generation so the
    * streaming side never reinterprets raw physical values (the
    * generation-dependent dtype handling lives solely in
    * [[graft.queries.Tables.events]]).
    */
  private val eventsStagedSchema = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)
  ))

  /** Batch read of events with `ts` normalized to TimestampType micros,
    * whatever the parquet generation stores physically.
    */
  private def eventsBatch(spark: SparkSession, dir: String): DataFrame =
    graft.queries.Tables.events(spark, dir)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
        col("value"), col("props"))

  /** File-stream replay of events with a proper timestamp column. The
    * single-file table is staged into a directory first — file streams
    * watch directories (a production replay feeds an arriving directory or
    * Kafka; the transform chain is identical).
    */
  def replayEvents(spark: SparkSession, dir: String): DataFrame = {
    val staged = stageDir(spark, dir)
    spark.readStream
      .schema(eventsStagedSchema)
      .parquet(staged)
  }

  /** Stage the events table as a normalized parquet directory (ts as
    * TimestampType micros, UTC). Re-staged whenever the source file is
    * newer than the staging marker, so a testdata regeneration invalidates
    * the cache instead of silently replaying stale data.
    */
  private def stageDir(spark: SparkSession, dir: String): String = {
    import java.nio.file.Paths
    val hash = Integer.toHexString(dir.hashCode)
    val target = Paths.get(
      System.getProperty("java.io.tmpdir"), s"graft_stream_events_v2_$hash")
    graft.ops.SparkOps.stageOnce(Paths.get(s"$dir/events.parquet"), target) {
      eventsBatch(spark, dir).write.mode("overwrite").parquet(target.toString)
    }
  }

  private val runId = new AtomicInteger(0)

  /** Run a (finite) streaming query to completion into a memory sink and
    * return the result table.
    *
    * State-store partition count: a streaming job fixes its shuffle
    * partitioning at first checkpoint — it is a per-deployment knob sized
    * to key cardinality and throughput, NOT inherited from the batch
    * session default. For the replay workload (tens of keys, one staged
    * dir) 2 partitions are the measured optimum — per-micro-batch
    * state-store commit cost is linear in partition count, so oversizing
    * the store is pure fixed overhead (measured family wall at sf0.1:
    * ~12% worse at 8 vs 4, ~17% better at 2 vs 4, worse again at 1 where
    * the big aggregates lose their reduce parallelism; outputs are
    * partitioning-invariant — A/B-hashed across 1/2/4 at sf0.01 AND
    * sf0.1); a production deployment against a firehose sets it to match
    * its executor fleet before the first start.
    *
    * Trailing NO-DATA batches (`noDataMicroBatches.enabled`) are OFF by
    * default: the replay stagings advance watermarks with real flush-wave
    * files, so for every query but two the trailing empty batch is pure
    * fixed cost (~0.3-0.7 s each; outputs A/B-hashed identical at sf0.01
    * and sf0.1 with it off). The two whose FINAL emission genuinely
    * happens in a no-data batch — tumblingUniques and sessionTimeoutAgg,
    * whose last windows/sessions close only when the watermark advances
    * past the final real event with no further data arriving — pass
    * `needsNoDataBatches = true` and keep engine defaults.
    *
    * State-store BACKEND: the default HDFS-backed provider holds all keyed
    * state on the executor heap — fine for the replay's key counts, a
    * dealbreaker at high cardinality. Production deployments set
    * `spark.sql.streaming.stateStore.providerClass` to
    * `...state.RocksDBStateStoreProvider` (ships with Spark): state spills
    * to local disk and only the working set stays in memory. Every
    * stateful operator here is backend-identical under it —
    * [[graft.streaming]] RocksDbStateSpec pins that contract.
    */
  def runToTable(
      result: DataFrame, mode: String,
      needsNoDataBatches: Boolean = false): DataFrame = {
    val job = StreamJob(s"adhoc_${runId.incrementAndGet()}", mode,
      (_, _) => result, needsNoDataBatches = needsNoDataBatches)
    val out = runJobs(result.sparkSession, "", Seq(job))(job.name)
    // The generated name is never returned, so its ledger entry could
    // never be read back — drop it instead of leaking one Seq of progress
    // objects per ad-hoc replay for the life of the JVM. (Sequential
    // callers read lastRunProgress, which runJobs already set.)
    progressByName.remove(job.name)
    out
  }

  /** One logical streaming query of the events-replay family: a streaming
    * DataFrame builder, its output mode, and the batch post-projection
    * applied to the drained memory table. Expressing each family member as
    * a descriptor is what lets [[runJobs]] drive MANY logical queries as
    * one wave of concurrently-running physical streams (each started once,
    * drained together) instead of paying a serial start/plan/drain/stop
    * cycle per query — the per-query fixed overhead (~0.2-0.3 s of
    * micro-batch planner + state-store + sink setup) is the dominant cost
    * of a finite replay, and it overlaps almost perfectly across queries
    * because each physical stream runs on its own execution thread.
    */
  final case class StreamJob(
      name: String,
      mode: String,
      build: (SparkSession, String) => DataFrame,
      post: DataFrame => DataFrame = identity,
      needsNoDataBatches: Boolean = false,
      rocksDb: Boolean = false)

  /** Run a wave of finite streaming jobs CONCURRENTLY to completion and
    * return each job's post-processed memory table, keyed by job name.
    *
    * Per-query session conf (state-store partition count, trailing
    * no-data batches, state-store provider) is safe to vary across a wave
    * because `start()` clones the session: each `StreamExecution` captures
    * the conf values in force at ITS start and never re-reads the shared
    * session conf. So the wave starts jobs sequentially (setting each
    * job's conf just before its start), then drains them all — every
    * started query advances on its own thread while later ones start, and
    * `processAllAvailable` per query is just the join point.
    */
  def runJobs(
      spark: SparkSession, dir: String,
      jobs: Seq[StreamJob],
      afterStart: () => Unit = () => ()): Map[String, DataFrame] = {
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    // Global provider override (`graft.stream.stateProvider=rocksdb` sysprop
    // or GRAFT_STATE_PROVIDER env): flips EVERY wave member to the RocksDB
    // provider — the configuration a high-cardinality 100 TB deployment
    // runs (state on local SSD, working set in block cache) and what the
    // round-15 `streaming_wave_100x_rocksdb` regime probe measures.
    // Per-job `rocksDb = true` members are unaffected (already RocksDB).
    val forceRocks = "rocksdb".equalsIgnoreCase(
      System.getProperty("graft.stream.stateProvider",
        sys.env.getOrElse("GRAFT_STATE_PROVIDER", "")))
    val prevNd = spark.conf.get("spark.sql.streaming.noDataMicroBatches.enabled")
    val prevProvider = spark.conf.getOption(providerKey)
    // Changelog checkpointing must accompany the RocksDB provider: without
    // it every micro-batch commit synchronously snapshots the instance's
    // SST files to the checkpoint location — measured at 1317 s for the
    // 10M-event 20-member wave on one box (vs 150 s HDFS-provider), the
    // snapshot upload dominating. With it, per-batch durability is the
    // small changelog delta and SST snapshots move to the background
    // maintenance interval — the configuration a high-cardinality
    // deployment actually runs. State contents are unaffected (parity
    // fenced by RocksDbStateSpec; the full registry re-verifies green).
    val changelogKey =
      "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled"
    val prevChangelog = spark.conf.getOption(changelogKey)
    def restoreProvider(): Unit = {
      prevProvider match {
        case Some(v) => spark.conf.set(providerKey, v)
        case None => spark.conf.unset(providerKey)
      }
      prevChangelog match {
        case Some(v) => spark.conf.set(changelogKey, v)
        case None => spark.conf.unset(changelogKey)
      }
    }
    PartitionsScope.enter(spark)
    val started = scala.collection.mutable.ArrayBuffer
      .empty[(StreamJob, String, org.apache.spark.sql.streaming.StreamingQuery)]
    val debug = System.getProperty("graft.stream.debug") != null ||
      sys.env.contains("GRAFT_STREAM_DEBUG")
    val t0 = System.nanoTime()
    def dbg(msg: => String): Unit =
      if (debug) System.err.println(
        f"[wave +${(System.nanoTime() - t0) / 1e9}%6.2fs] $msg")
    try {
      // Round-16: start jobs in CONF GROUPS, concurrently within a group.
      // `start()` clones the session (capturing the conf in force at ITS
      // start), and the only per-job flips are (noDataMicroBatches,
      // provider) — so jobs sharing the same flip tuple can start in
      // parallel without racing the shared conf. The sequential loop paid
      // ~0.13-0.45 s of driver-side planning PER start (16 members ≈ 4 s
      // of the wave wall, traced under GRAFT_STREAM_DEBUG); grouped
      // concurrent starts overlap that planning. groupBy preserves member
      // order within a group; `started` is re-assembled in `jobs` order so
      // downstream accounting (first-member wave attribution) is unchanged.
      val byConf = jobs.zipWithIndex
        .groupBy { case (j, _) => (j.needsNoDataBatches, j.rocksDb || forceRocks) }
      val startFailure =
        new java.util.concurrent.atomic.AtomicReference[Throwable]()
      val startedByIdx = new java.util.concurrent.ConcurrentHashMap[
        Int, (StreamJob, String, org.apache.spark.sql.streaming.StreamingQuery)]()
      byConf.foreach { case ((noData, rocks), members) =>
        spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled",
          noData.toString)
        if (rocks) {
          spark.conf.set(providerKey, "org.apache.spark.sql.execution." +
            "streaming.state.RocksDBStateStoreProvider")
          spark.conf.set(changelogKey, "true")
        } else restoreProvider()
        val starters = members.map { case (job, idx) =>
          val t = new Thread(() => {
            try {
              val table = s"graft_stream_${runId.incrementAndGet()}"
              val q = job.build(spark, dir).writeStream
                .format("memory")
                .queryName(table)
                .outputMode(job.mode)
                .start()
              dbg(s"started ${job.name}")
              startedByIdx.put(idx, (job, table, q))
            } catch {
              case t: Throwable => startFailure.compareAndSet(null,
                new RuntimeException(s"streaming job ${job.name} failed to start", t))
            }
          }, s"graft-start-${job.name}")
          t.setDaemon(true)
          t.start()
          t
        }
        starters.foreach(_.join())
      }
      jobs.indices.foreach { idx =>
        Option(startedByIdx.get(idx)).foreach(started += _)
      }
      if (startFailure.get() != null) throw startFailure.get()
      // Per-start conf flips are done (each query captured its own values
      // at start); restore the shared session conf BEFORE the drain so
      // work overlapped via `afterStart` never observes a mid-flip value.
      spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", prevNd)
      restoreProvider()
      afterStart()
      // Drain on one thread per query and STOP each the moment it is
      // caught up: a drained-but-running query is not free — the engine
      // keeps trigger-checking (and can fire further no-op batches),
      // which steals cores from the still-draining members of the wave.
      // Failures must NOT be swallowed by their drain thread: a query
      // that dies mid-replay would otherwise surface as a silently
      // truncated memory table instead of an error.
      val failure = new java.util.concurrent.atomic.AtomicReference[Throwable]()
      val drainers = started.map { case (job, _, q) =>
        val t = new Thread(() => {
          try {
            q.processAllAvailable()
            val progress = q.recentProgress.toSeq
            progressByName.put(job.name, progress)
            lastProgressRef.set(progress)
            q.stop()
            dbg(s"drained ${job.name} batches=[${
              progress.map(_.batchDuration).mkString(",")}] lastEnd=${
              progress.lastOption.map(_.timestamp).getOrElse("-")}")
          } catch {
            case t: Throwable => failure.compareAndSet(null,
              new RuntimeException(s"streaming job ${job.name} failed", t))
          }
        }, s"graft-drain-${job.name}")
        t.setDaemon(true)
        t.start()
        t
      }
      drainers.foreach(_.join())
      if (failure.get() != null) throw failure.get()
    } finally {
      started.foreach { case (_, _, q) =>
        try q.stop() catch { case _: Throwable => () }
      }
      spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", prevNd)
      restoreProvider()
      PartitionsScope.exit(spark)
    }
    started.map { case (job, table, _) =>
      job.name -> job.post(spark.table(table))
    }.toMap
  }

  /** Reentrant, thread-counted scope for the streaming shuffle-partition
    * override: the first enter saves the session value and applies the
    * `graft.stream.partitions` knob (default 2 — see [[runToTable]] docs
    * for the measurement); the last exit restores. Counting makes
    * concurrent family members (wave + overlapped bespoke loops) safe —
    * a plain save/set/restore per call would let one caller's restore
    * clobber another's still-running scope.
    */
  private object PartitionsScope {
    // Keyed per SESSION: the conf being scoped is session-local, so a
    // process-global depth counter would let two sessions' interleaved
    // enter/exit corrupt each other's shuffle-partition conf (one never
    // overridden, the other restored to the wrong saved value).
    private val state =
      scala.collection.mutable.Map.empty[String, (Int, String)]
    def enter(spark: SparkSession): Unit = synchronized {
      val id = graft.ops.SparkOps.sessionId(spark)
      state.get(id) match {
        case Some((d, prev)) => state(id) = (d + 1, prev)
        case None =>
          val prev = spark.conf.get("spark.sql.shuffle.partitions")
          spark.conf.set("spark.sql.shuffle.partitions",
            System.getProperty("graft.stream.partitions", "2"))
          state(id) = (1, prev)
      }
    }
    def exit(spark: SparkSession): Unit = synchronized {
      val id = graft.ops.SparkOps.sessionId(spark)
      state.get(id).foreach { case (d, prev) =>
        if (d <= 1) {
          spark.conf.set("spark.sql.shuffle.partitions", prev)
          state.remove(id)
        } else state(id) = (d - 1, prev)
      }
    }
  }

  /** Run ONE family job standalone (the per-operator public entry points
    * and specs use this; the graded registry goes through [[familyResult]]
    * so a full verify/bench pass pays one wave, not 16 serial replays).
    */
  private def runSingle(
      spark: SparkSession, dir: String, job: StreamJob): DataFrame =
    runJobs(spark, dir, Seq(job))(job.name)

  /** Results of the graded replay family for `dir`, computed once per
    * process as a single concurrent wave (memory-sink tables outlive their
    * stopped queries, so the memoized frames stay queryable). The memo key
    * is the dataset dir — a different SF replays its own wave.
    */
  def familyResult(spark: SparkSession, dir: String, name: String): DataFrame =
    familyCache.computeIfAbsent(
      (graft.ops.SparkOps.sessionId(spark), dir),
      key => {
        val t0 = System.nanoTime()
        val out = runFamily(spark, dir)
        familyWaveWalls.put(key, (System.nanoTime() - t0) / 1e9)
        out
      })(name)

  /** One wave for the WHOLE graded family: the 16 memory-sink jobs start
    * first; once every start has captured its conf, the four bespoke-loop
    * queries (own start/stop cycles — state reader, upsert sink,
    * checkpoint restart, observed totals) launch on background threads and
    * overlap the drain. Every result the serial path produced, for one
    * wave of wall-clock.
    */
  private def runFamily(spark: SparkSession, dir: String): Map[String, DataFrame] = {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
    val ec = scala.concurrent.ExecutionContext.fromExecutorService(pool)
    var ok = false
    try {
      val bespoke = Seq[(String, () => DataFrame)](
        "stream_upsert_sink" -> (() => foreachBatchUpsert(spark, dir)._1),
        "stream_checkpoint_restart" -> (() => checkpointRestartCounts(spark, dir)),
        "stream_state_reader" -> (() => stateStoreRead(spark, dir)),
        "stream_observed_totals" -> (() => observedTotalsDf(spark, dir)))
      val t0 = System.nanoTime()
      val debug = System.getProperty("graft.stream.debug") != null ||
        sys.env.contains("GRAFT_STREAM_DEBUG")
      def dbg(msg: => String): Unit =
        if (debug) System.err.println(
          f"[family +${(System.nanoTime() - t0) / 1e9}%6.2fs] $msg")
      var futures = Seq.empty[(String, Future[DataFrame])]
      val wave = runJobs(spark, dir, familyJobs,
        afterStart = () =>
          futures = bespoke.map { case (n, f) =>
            n -> Future { val r = f(); dbg(s"bespoke done $n"); r }(ec)
          })
      dbg("wave done")
      val all = wave.toSeq ++ futures.map { case (n, fut) =>
        n -> Await.result(fut, Duration.Inf)
      }
      dbg("bespoke awaited")
      // Materialize each memoized result once (in parallel) so later
      // accesses — bench counts, verify writes, spec compares — read the
      // cached rows instead of re-running the post-projection over the
      // memory table / state source on every action.
      val mat = all.map { case (n, df) =>
        val cached = df.cache()
        n -> Future { cached.count(); dbg(s"materialized $n"); cached }(ec)
      }
      val out = mat.map { case (n, fut) =>
        n -> Await.result(fut, Duration.Inf)
      }.toMap
      dbg("materialized all")
      ok = true
      out
    } finally {
      if (ok) pool.shutdown()
      else {
        // Failure path: a wave member or an Await died while the bespoke
        // replays were still running on the (non-daemon) pool threads —
        // left alone they keep competing for cores and block JVM exit
        // until their replays finish. Interrupt the pool and best-effort
        // stop this session's still-active streaming queries.
        pool.shutdownNow()
        // Stop ONLY this module's own queries (every query StreamingOps
        // starts carries the graft_stream_ name prefix) — a concurrent
        // caller's unrelated streaming query on the same session must
        // not be collateral of a wave failure.
        spark.streams.active
          .filter(q => Option(q.name).exists(_.startsWith("graft_stream_")))
          .foreach { q => try q.stop() catch { case _: Throwable => () } }
      }
    }
  }

  /** The `stream_observed_totals` graded surface over
    * [[observedReplayLedger]]: recompose the per-batch observed metrics
    * into the whole-table totals (associative sums — exact whatever the
    * batch boundaries) plus the batch count proving a multi-batch replay.
    */
  def observedTotalsDf(spark: SparkSession, dir: String): DataFrame = {
    val ledger = observedReplayLedger(spark, dir)
    val rows = ledger.map(_._1).sum
    val vq = ledger.map(_._2).sum
    spark.range(1).select(
      lit(ledger.size).as("n_batches"),
      lit(rows).as("n_rows"),
      (floor((lit(vq) + 50) / 100) / 100.0).as("total_value"))
  }

  private val familyCache = new java.util.concurrent.ConcurrentHashMap[
    (String, String), Map[String, DataFrame]]()

  /** Wall-clock of each memoized wave build, keyed like [[familyCache]].
    * Benchmark accounting: the first family member a bench hits in
    * catalog order absorbs this whole wall while the other members are
    * ~0.05 s memo reads — [[graft.Bench]] emits this split into
    * `bench_last.json` so a driver capture can't misread the absorbing
    * query as a per-query regression (see BASELINE.md, round-12 caveat).
    */
  private val familyWaveWalls = new java.util.concurrent.ConcurrentHashMap[
    (String, String), java.lang.Double]()

  /** Wave wall for `dir`, if the memoized family wave already ran in this
    * session, plus the graded member names (wave + bespoke) whose bench
    * entries are memo reads once the wave is built. The map value is the
    * BOXED Double deliberately: a primitive-valued CHM unboxes a missing
    * key's null to 0.0, which would turn "no wave ran" into Some(0.0) —
    * a phantom zero-second wave in bench_last.json.
    */
  def familyWaveWall(spark: SparkSession, dir: String): Option[Double] =
    Option(familyWaveWalls.get((graft.ops.SparkOps.sessionId(spark), dir)))
      .map(_.doubleValue())
  def familyMemberNames: Seq[String] =
    familyJobs.map(_.name) ++ Seq("stream_upsert_sink",
      "stream_checkpoint_restart", "stream_state_reader",
      "stream_observed_totals")

  /** The 16 memory-sink members of the graded replay family (the four
    * bespoke-loop queries — state reader, upsert sink, checkpoint restart,
    * observed totals — drive their own start/stop cycles and stay
    * standalone). Parameters match the graded registry entries exactly so
    * [[familyResult]] serves the same results the serial path produced.
    */
  private def familyJobs: Seq[StreamJob] = Seq(
    tumblingAggJob, tumblingUniquesJob, slidingAggJob, sessionAggJob,
    staticJoinJob, streamStreamJoinJob, streamStreamLeftJoinJob,
    streamStreamFullJoinJob, topKJob(10), customStateJob(330000L),
    twsJob(250000L), timerFlushJob, lateDropJob, dedupJob, dedupBoundedJob,
    sessionTimeoutJob)

  private val progressByName = new java.util.concurrent.ConcurrentHashMap[
    String, Seq[org.apache.spark.sql.streaming.StreamingQueryProgress]]()

  private val lastProgressRef = new java.util.concurrent.atomic.AtomicReference[
    Seq[org.apache.spark.sql.streaming.StreamingQueryProgress]](Nil)

  /** Per-micro-batch progress ledger of the named job's most recent run —
    * the state-boundedness evidence. At 100 TB the thing that kills a
    * stream-stream join is UNBOUNDED state (watermark never evicting);
    * StreamingSpec asserts over this that each join's
    * `stateOperators.numRowsTotal` DROPS after the watermark closes the
    * flush waves, i.e. eviction is real, not just output-correct. Keyed by
    * job name so concurrent wave members never clobber each other's
    * ledger.
    */
  def progressFor(
      name: String): Seq[org.apache.spark.sql.streaming.StreamingQueryProgress] =
    progressByName.getOrDefault(name, Nil)

  /** Progress of the most recently DRAINED query (kept for sequential
    * callers; prefer [[progressFor]] — inside a wave this is whichever
    * member drained last).
    */
  def lastRunProgress: Seq[org.apache.spark.sql.streaming.StreamingQueryProgress] =
    lastProgressRef.get()

  /** Tumbling 1-day windows per event type (count + exact money total). */
  def tumblingAgg(spark: SparkSession, dir: String): DataFrame =
    runSingle(spark, dir, tumblingAggJob)

  private val tumblingAggJob = StreamJob(
    "stream_tumbling_agg", "complete",
    build = (spark, dir) => replayEvents(spark, dir)
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 day"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        (floor((sum(floor(col("value") * 10000 + 0.5).cast("long")) + 50) / 100) / 100.0)
          .as("total")),
    post = _.select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("total"))
      .orderBy("window_start", "event_type"))

  /** Exact distinct users per tumbling window — the streaming
    * unique-visitors metric, as TWO CHAINED STATEFUL operators in one
    * query (Spark 3.4+ multi-stateful support): stage 1 reduces to one
    * row per (day-window, user) and emits it once the watermark closes
    * the window; stage 2 re-windows on the emitted `window` struct (which
    * carries the event-time attribute, SPARK-40925) and counts survivors
    * — that count IS the exact distinct, with no per-window user sets in
    * stage-2 state. Both stages' state is keyed by a watermarked window
    * and evicts at the horizon. (A dropDuplicates on derived (day, user)
    * keys would NOT bound state: neither key carries the event-time
    * attribute, so dedup state never evicts.)
    */
  def tumblingUniques(spark: SparkSession, dir: String): DataFrame =
    runSingle(spark, dir, tumblingUniquesJob)

  private val tumblingUniquesJob = StreamJob(
    "stream_tumbling_uniques", "append",
    build = (spark, dir) => replayEvents(spark, dir)
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 day"), col("user_id"))
      .agg(count(lit(1)).as("hits"))
      .groupBy(window(col("window"), "1 day"))
      .agg(count(lit(1)).as("uniques")),
    post = _.select(col("window.start").as("window_start"), col("uniques"))
      .orderBy("window_start"),
    needsNoDataBatches = true)

  /** Sliding windows: 2-day length, 1-day slide — each event lands in two
    * windows; watermark bounds state.
    */
  def slidingAgg(spark: SparkSession, dir: String): DataFrame =
    runSingle(spark, dir, slidingAggJob)

  private val slidingAggJob = StreamJob(
    "stream_sliding_agg", "complete",
    build = (spark, dir) => replayEvents(spark, dir)
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "2 days", "1 day"))
      .agg(count(lit(1)).as("n")),
    post = _.select(col("window.start").as("window_start"), col("n"))
      .orderBy("window_start"))

  /** Session windows per user with a 30-minute inactivity gap. */
  def sessionAgg(spark: SparkSession, dir: String): DataFrame =
    runSingle(spark, dir, sessionAggJob)

  private val sessionAggJob = StreamJob(
    "stream_session", "complete",
    build = (spark, dir) => replayEvents(spark, dir)
      .withWatermark("ts", "1 hour")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events")),
    post = _.select(col("user_id"), col("session_window.start").as("session_start"),
        col("n_events"))
      .orderBy("user_id", "session_start"))

  /** Custom arbitrary state via `flatMapGroupsWithState`: running per-user
    * totals with a high-value alert stream — the shape for state machines
    * that windows can't express (counters, CEP-ish transitions, per-key
    * model state). Emits one update row per input batch per user; state is
    * a single running aggregate per key, bounded by key cardinality.
    */
  def statefulUserTotals(
      events: org.apache.spark.sql.Dataset[UserEvent],
      alertThreshold: Double
  ): org.apache.spark.sql.Dataset[UserTotal] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[RunningTotal, UserTotal](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (userId: Long, batch: Iterator[UserEvent], state: GroupState[RunningTotal]) =>
          val prev = state.getOption.getOrElse(RunningTotal(0.0, 0L))
          var total = prev.total
          var n = prev.n
          batch.foreach { e => total += e.value; n += 1 }
          state.update(RunningTotal(total, n))
          Iterator.single(UserTotal(userId, total, n, total >= alertThreshold))
      }
  }

  /** Graded surface for the custom-state path: per-user running totals in
    * integer CENTS (long addition is associative and commutative, so the
    * result is independent of arrival/partition order — the property that
    * makes an arbitrary-stateful operator oracle-checkable; a double
    * accumulator would hash-mismatch on summation order). One emission per
    * (user, micro-batch); `n` is monotone, so max-by-n per user is the
    * final state after any replay batching.
    */
  def statefulUserTotalsGraded(
      spark: SparkSession, dir: String, alertCents: Long): DataFrame =
    runSingle(spark, dir, customStateJob(alertCents))

  private[streaming] def customStateJob(alertCents: Long) = StreamJob(
    "stream_custom_state", "append",
    build = (spark, dir) => {
      import spark.implicits._
      import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
      replayEvents(spark, dir)
        .select(col("user_id"),
          floor(col("value") * 100 + 0.5).cast("long").as("cents"))
        .as[(Long, Long)]
        .groupByKey(_._1)
        .flatMapGroupsWithState[(Long, Long), (Long, Long, Long, Boolean)](
          OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
          (userId: Long, batch: Iterator[(Long, Long)], state: GroupState[(Long, Long)]) =>
            val (prevCents, prevN) = state.getOption.getOrElse((0L, 0L))
            var cents = prevCents
            var n = prevN
            batch.foreach { e => cents += e._2; n += 1 }
            state.update((cents, n))
            Iterator.single((userId, cents, n, cents >= alertCents))
        }
        .toDF("user_id", "total_cents", "n", "alert")
    },
    post = _.groupBy(col("user_id"))
      .agg(max(struct(col("n"), col("total_cents"), col("alert"))).as("s"))
      .select(col("user_id"), col("s.total_cents").as("total_cents"),
        col("s.n").as("n"), col("s.alert").as("alert"))
      .orderBy("user_id"))

  /** The SAME per-user running-total contract as
    * [[statefulUserTotalsGraded]], on Spark 4's `transformWithState`
    * arbitrary-state API — the successor to `flatMapGroupsWithState`: a
    * [[org.apache.spark.sql.streaming.StatefulProcessor]] with NAMED,
    * individually-typed state variables (here one `ValueState`; the API
    * also offers List/Map state, per-variable TTL, and timers), so a
    * production processor evolves state shape without re-encoding one
    * monolithic case class. Requires the RocksDB state-store provider —
    * set per-run and restored, the same conf flip RocksDbStateSpec pins
    * for the rest of the stateful family. Integer-cents accumulation
    * keeps the final state arrival-order-independent (oracle-checkable);
    * `n` is monotone, so max-by-n per user is the final state under any
    * replay batching.
    */
  def statefulUserTotalsTws(
      spark: SparkSession, dir: String, alertCents: Long): DataFrame =
    runSingle(spark, dir, twsJob(alertCents))

  private[streaming] def twsJob(alertCents: Long) = StreamJob(
    "stream_transform_with_state", "append",
    build = (spark, dir) => {
      import spark.implicits._
      import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}
      class TotalsProcessor
          extends StatefulProcessor[Long, (Long, Long), (Long, Long, Long, Boolean)] {
        @transient private var totals: ValueState[(Long, Long)] = _
        override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
          totals = getHandle.getValueState[(Long, Long)]("totals",
            org.apache.spark.sql.Encoders.tuple(
              org.apache.spark.sql.Encoders.scalaLong,
              org.apache.spark.sql.Encoders.scalaLong),
            TTLConfig.NONE)
        override def handleInputRows(
            key: Long,
            rows: Iterator[(Long, Long)],
            timerValues: TimerValues): Iterator[(Long, Long, Long, Boolean)] = {
          val (prevCents, prevN) = if (totals.exists()) totals.get() else (0L, 0L)
          var cents = prevCents
          var n = prevN
          rows.foreach { r => cents += r._2; n += 1 }
          totals.update((cents, n))
          Iterator.single((key, cents, n, cents >= alertCents))
        }
      }
      replayEvents(spark, dir)
        .select(col("user_id"),
          floor(col("value") * 100 + 0.5).cast("long").as("cents"))
        .as[(Long, Long)]
        .groupByKey(_._1)
        .transformWithState(new TotalsProcessor, TimeMode.None(), OutputMode.Append())
        .toDF("user_id", "total_cents", "n", "alert")
    },
    post = _.groupBy(col("user_id"))
      .agg(max(struct(col("n"), col("total_cents"), col("alert"))).as("s"))
      .select(col("user_id"), col("s.total_cents").as("total_cents"),
        col("s.n").as("n"), col("s.alert").as("alert"))
      .orderBy("user_id"),
    rocksDb = true)

  /** TIMER-driven emission on `transformWithState` — the Spark-4 API's
    * distinguishing feature over flatMapGroupsWithState's single timeout:
    * per-key REGISTERED timers (many per key, listable, deletable) drive
    * emission WITHOUT new input for the key. Contract here: input rows
    * emit NOTHING — they only fold integer (cents, n) into ValueState and
    * (re)register an event-time timer at the key's last event + 30 min;
    * every output row is produced inside `handleExpiredTimer` when the
    * WATERMARK crosses that horizon. State is kept across firings (only
    * the timer re-arms), so emissions carry monotone running totals and
    * max-by-n per user is the whole-replay aggregate — which is what
    * makes a timer-driven stream oracle-checkable against the batch
    * per-user rollup: if timers never fired, the output would be EMPTY,
    * so the oracle match IS the proof of timer-driven emission. The
    * session-staged three-wave replay (see [[stageSessionDir]]) forces
    * mid-replay firings for idle users AND a final watermark push past
    * every horizon.
    */
  def timerFlushTotals(spark: SparkSession, dir: String): DataFrame =
    runSingle(spark, dir, timerFlushJob)

  private val timerFlushJob = StreamJob(
    "stream_timer_flush", "append",
    build = (spark, dir) => {
      import spark.implicits._
      import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}
      val watch = stageSessionDir(spark, dir)
      val gapMs = 30L * 60 * 1000
      class FlushProcessor
          extends StatefulProcessor[Long, (Long, Long, Long), (Long, Long, Long)] {
        // (total_cents, n, armed timer ms; -1 = none)
        @transient private var agg: ValueState[(Long, Long, Long)] = _
        override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
          agg = getHandle.getValueState[(Long, Long, Long)]("agg",
            org.apache.spark.sql.Encoders.tuple(
              org.apache.spark.sql.Encoders.scalaLong,
              org.apache.spark.sql.Encoders.scalaLong,
              org.apache.spark.sql.Encoders.scalaLong),
            TTLConfig.NONE)
        override def handleInputRows(
            key: Long,
            rows: Iterator[(Long, Long, Long)],
            timerValues: TimerValues): Iterator[(Long, Long, Long)] = {
          val (c0, n0, t0) = if (agg.exists()) agg.get() else (0L, 0L, -1L)
          var cents = c0
          var n = n0
          var lastMs = Long.MinValue
          rows.foreach { r => cents += r._2; n += 1; lastMs = math.max(lastMs, r._3) }
          // re-arm: one live timer per key at max(previous horizon, new)
          if (t0 >= 0) getHandle.deleteTimer(t0)
          val horizon = math.max(t0, lastMs + gapMs)
          getHandle.registerTimer(horizon)
          agg.update((cents, n, horizon))
          Iterator.empty // inputs NEVER emit — timers do
        }
        override def handleExpiredTimer(
            key: Long,
            timerValues: TimerValues,
            expiredTimerInfo: ExpiredTimerInfo): Iterator[(Long, Long, Long)] = {
          if (!agg.exists()) Iterator.empty
          else {
            val (cents, n, _) = agg.get()
            agg.update((cents, n, -1L)) // keep totals; timer is spent
            Iterator.single((key, cents, n))
          }
        }
      }
      spark.readStream
        .schema(eventsStagedSchema)
        .option("maxFilesPerTrigger", 1)
        .parquet(watch)
        .withWatermark("ts", "1 hour")
        .select(col("user_id"),
          floor(col("value") * 100 + 0.5).cast("long").as("cents"),
          expr("unix_micros(ts) div 1000").as("ts_ms"))
        .as[(Long, Long, Long)]
        .groupByKey(_._1)
        .transformWithState(new FlushProcessor, TimeMode.EventTime(), OutputMode.Append())
        .toDF("user_id", "total_cents", "n")
    },
    post = _.filter(col("user_id") >= 0) // drop the synthetic advancer user
      .groupBy(col("user_id"))
      .agg(max(struct(col("n"), col("total_cents"))).as("s"))
      .select(col("user_id"), col("s.total_cents").as("total_cents"),
        col("s.n").as("n"))
      .orderBy("user_id"),
    needsNoDataBatches = true,
    rocksDb = true)

  /** Streaming-state INTROSPECTION via Spark 4's state data source: run a
    * checkpointed per-type aggregation to completion, then batch-read the
    * state store itself — `spark.read.format("statestore")` over the
    * checkpoint — and project the keyed aggregation buffers. This is the
    * operational tool for debugging a live stateful deployment (inspect
    * exactly what a query holds per key without touching the query); the
    * read is partition-parallel over the state files, and the buffers are
    * integer (count, cents) so the state content has an exact batch
    * oracle. Checkpoint path is dataset-keyed and rebuilt per run (state
    * content, not resume, is what's graded here).
    */
  def stateStoreRead(spark: SparkSession, dir: String): DataFrame = {
    val ckpt = s"${System.getProperty("java.io.tmpdir")}/graft_state_reader_${Integer.toHexString(dir.hashCode)}"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(ckpt))
    val counts = replayEvents(spark, dir)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(floor(col("value") * 100 + 0.5).cast("long")).as("cents"))
    val name = s"graft_stream_state_${runId.incrementAndGet()}"
    PartitionsScope.enter(spark)
    try {
      val q = counts.writeStream.format("memory").queryName(name)
        .outputMode("complete")
        .option("checkpointLocation", ckpt)
        .start()
      try q.processAllAvailable()
      finally q.stop()
    } finally PartitionsScope.exit(spark)
    spark.read.format("statestore").option("path", ckpt).load()
      .select(col("key.event_type").as("event_type"),
        col("value.count").as("n"), col("value.sum").as("cents"))
      .orderBy("event_type")
  }

  /** Stream–static join: enrich the event stream with a batch dimension
    * (customer), then aggregate per nation. Stream–static equi-joins are
    * stateless on the stream side — each micro-batch hash-joins against
    * the (broadcastable) static relation; no watermark, no state store.
    * This is the canonical "enrich events with a dim table" deployment.
    */
  def streamStaticJoin(spark: SparkSession, dir: String): DataFrame =
    runSingle(spark, dir, staticJoinJob)

  private val staticJoinJob = StreamJob(
    "stream_static_join", "complete",
    build = (spark, dir) => {
      val dim = broadcast(
        spark.read.parquet(s"$dir/customer.parquet")
          .select(col("c_custkey"), col("c_nationkey")))
      replayEvents(spark, dir)
        .join(dim, col("user_id") === col("c_custkey"))
        .groupBy(col("c_nationkey"))
        .agg(count(lit(1)).as("n"),
          (floor((sum(floor(col("value") * 10000 + 0.5).cast("long")) + 50) / 100) / 100.0)
            .as("total_value"))
    },
    post = _.orderBy("c_nationkey"))

  /** Stream–stream interval join: purchases matched to a preceding click
    * by the same user within one hour. Both sides are independent
    * streaming sources with watermarks; the time-bound join condition lets
    * the engine evict click state once the interval expires — the shape
    * that keeps stream–stream join state bounded at any throughput.
    */
  def streamStreamJoin(spark: SparkSession, dir: String): DataFrame =
    runSingle(spark, dir, streamStreamJoinJob)

  private val streamStreamJoinJob = StreamJob(
    "stream_stream_join", "append",
    build = (spark, dir) => {
      val clicks = replayEvents(spark, dir)
        .filter(col("event_type") === "click")
        .select(col("event_id").as("click_id"), col("user_id").as("click_user"),
          col("ts").as("click_ts"))
        .withWatermark("click_ts", "1 hour")
      val purchases = replayEvents(spark, dir)
        .filter(col("event_type") === "purchase")
        .select(col("event_id").as("purchase_id"), col("user_id").as("purchase_user"),
          col("ts").as("purchase_ts"))
        .withWatermark("purchase_ts", "1 hour")
      purchases.join(clicks,
        col("click_user") === col("purchase_user") &&
          col("click_ts") <= col("purchase_ts") &&
          col("click_ts") >= col("purchase_ts") - expr("INTERVAL 1 HOUR"))
        .select(col("purchase_user").as("user_id"), col("click_id"),
          col("purchase_id"),
          (unix_micros(col("purchase_ts")) - unix_micros(col("click_ts")))
            .as("gap_us"))
    },
    post = _.orderBy("user_id", "click_id", "purchase_id"))

  /** LEFT OUTER stream–stream join: every purchase emits — matched rows as
    * they join, UNMATCHED rows with a null right side once the watermark
    * proves no matching click can still arrive (click_ts ∈ [p−1h, p] and
    * clicks are ≤1h late ⇒ the purchase's state can close when the
    * watermark passes purchase_ts). Outer emission is watermark-DRIVEN, so
    * a finite replay needs the watermark pushed past the last real event
    * or tail purchases never emit their null rows: the staging appends two
    * flush waves of sentinel events (user −1/−2, max ts + 3h/4h, one click
    * + one purchase each so BOTH sides' event-time maxima advance — the
    * query watermark is the min across watermarked inputs). Wave 1 advances
    * the watermark at its batch end; wave 2 is the data batch that runs
    * WITH the advanced watermark and evicts + emits every closed outer row
    * (same engine behavior lateDataDrop documents: a no-data batch alone
    * does not finalize). Sentinel rows filter out of the result by user id;
    * their own outer rows sit above the final watermark and never emit.
    * Nulls project to −1 sentinels so both engines hash identically.
    */
  def streamStreamLeftJoin(spark: SparkSession, dir: String): DataFrame =
    runSingle(spark, dir, streamStreamLeftJoinJob)

  private val streamStreamLeftJoinJob = StreamJob(
    "stream_stream_left_join", "append",
    build = (spark, dir) => {
      val staged = stageOuterDir(spark, dir)
      def src = spark.readStream
        .schema(eventsStagedSchema)
        .option("maxFilesPerTrigger", "1")
        .parquet(staged)
      val clicks = src.filter(col("event_type") === "click")
        .select(col("event_id").as("click_id"), col("user_id").as("click_user"),
          col("ts").as("click_ts"))
        .withWatermark("click_ts", "1 hour")
      val purchases = src.filter(col("event_type") === "purchase")
        .select(col("event_id").as("purchase_id"), col("user_id").as("purchase_user"),
          col("ts").as("purchase_ts"))
        .withWatermark("purchase_ts", "1 hour")
      purchases.join(clicks,
        col("click_user") === col("purchase_user") &&
          col("click_ts") <= col("purchase_ts") &&
          col("click_ts") >= col("purchase_ts") - expr("INTERVAL 1 HOUR"),
        "left_outer")
        .select(col("purchase_user").as("user_id"), col("purchase_id"),
          coalesce(col("click_id"), lit(-1L)).as("click_id"),
          coalesce(unix_micros(col("purchase_ts")) - unix_micros(col("click_ts")),
            lit(-1L)).as("gap_us"))
    },
    post = _.filter(col("user_id") >= 0)
      .orderBy("user_id", "purchase_id", "click_id"))

  /** FULL OUTER stream–stream join: both sides emit — matched pairs as
    * they join, unmatched PURCHASES and unmatched CLICKS each with a null
    * other side once the watermark closes their state. Same flush-wave
    * staging as [[streamStreamLeftJoin]]; clicks can match any purchase in
    * [click, click + 1h], so click state closes when the watermark passes
    * click_ts + 1h — within the staged margin. Output keys both sides'
    * event ids with −1 sentinels.
    */
  def streamStreamFullJoin(spark: SparkSession, dir: String): DataFrame =
    runSingle(spark, dir, streamStreamFullJoinJob)

  private val streamStreamFullJoinJob = StreamJob(
    "stream_stream_full_join", "append",
    build = (spark, dir) => {
      val staged = stageOuterDir(spark, dir)
      def src = spark.readStream
        .schema(eventsStagedSchema)
        .option("maxFilesPerTrigger", "1")
        .parquet(staged)
      val clicks = src.filter(col("event_type") === "click")
        .select(col("event_id").as("click_id"), col("user_id").as("click_user"),
          col("ts").as("click_ts"))
        .withWatermark("click_ts", "1 hour")
      val purchases = src.filter(col("event_type") === "purchase")
        .select(col("event_id").as("purchase_id"), col("user_id").as("purchase_user"),
          col("ts").as("purchase_ts"))
        .withWatermark("purchase_ts", "1 hour")
      purchases.join(clicks,
        col("click_user") === col("purchase_user") &&
          col("click_ts") <= col("purchase_ts") &&
          col("click_ts") >= col("purchase_ts") - expr("INTERVAL 1 HOUR"),
        "full_outer")
        .select(
          coalesce(col("purchase_user"), col("click_user")).as("user_id"),
          coalesce(col("purchase_id"), lit(-1L)).as("purchase_id"),
          coalesce(col("click_id"), lit(-1L)).as("click_id"))
    },
    post = _.filter(col("user_id") >= 0)
      .orderBy("user_id", "purchase_id", "click_id"))

  /** Events + two flush waves of watermark-advancing sentinel rows (see
    * [[streamStreamLeftJoin]]); mtime-ordered files make the wave order
    * deterministic under `maxFilesPerTrigger=1`.
    */
  private def stageOuterDir(spark: SparkSession, dir: String): String = {
    import java.nio.file.{Files, Paths}
    import java.nio.file.attribute.FileTime
    import scala.jdk.CollectionConverters._
    val hash = Integer.toHexString(dir.hashCode)
    val watch = Paths.get(
      System.getProperty("java.io.tmpdir"), s"graft_stream_outer_v2_$hash")
    graft.ops.SparkOps.stageOnce(Paths.get(s"$dir/events.parquet"), watch) {
      if (Files.exists(watch)) {
        Files.walk(watch).iterator().asScala.toSeq.reverse.foreach(Files.delete)
      }
      Files.createDirectories(watch)
      val ev = eventsBatch(spark, dir)
      val maxUs = ev.agg(max(unix_micros(col("ts")))).head.getLong(0)
      def writeWave(df: DataFrame, name: String, mtime: Long): Unit = {
        val scratch = Paths.get(
          System.getProperty("java.io.tmpdir"), s"graft_stream_outer_v2_${hash}_$name")
        df.coalesce(1).write.mode("overwrite").parquet(scratch.toString)
        val part = Files.list(scratch).iterator().asScala
          .find(_.getFileName.toString.endsWith(".parquet"))
          .getOrElse(sys.error(s"no parquet part written for wave $name"))
        val dst = watch.resolve(s"$name.parquet")
        Files.copy(part, dst)
        Files.setLastModifiedTime(dst, FileTime.fromMillis(mtime))
      }
      def flushWave(uid: Long, idBase: Long, plusUs: Long): DataFrame =
        spark.createDataFrame(
          spark.sparkContext.parallelize(Seq(
            org.apache.spark.sql.Row(idBase, new java.sql.Timestamp(0L), uid, "click", 0.0, "{}"),
            org.apache.spark.sql.Row(idBase + 1, new java.sql.Timestamp(0L), uid, "purchase", 0.0, "{}")), 1),
          eventsStagedSchema)
          .withColumn("ts", timestamp_micros(lit(maxUs + plusUs)))
          .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
            col("value"), col("props"))
      val t0 = (System.currentTimeMillis() / 1000) * 1000 - 300000
      writeWave(ev, "0_data", t0)
      writeWave(flushWave(-1L, -10L, 3L * 3600L * 1000000L), "1_flush", t0 + 60000)
      writeWave(flushWave(-2L, -20L, 4L * 3600L * 1000000L), "2_evict", t0 + 120000)
    }
  }

  /** Streaming top-k: complete-mode aggregation with ORDER BY + LIMIT
    * INSIDE the streaming query — the engine re-ranks the maintained
    * aggregate state on every trigger (sort+limit over streaming relations
    * is legal only in complete mode; in append mode the batch top-k twin
    * is `topk`). State is keyed-aggregate-sized, not input-sized; the
    * (n, user_id) compound order makes the cut deterministic under ties.
    */
  def streamTopK(spark: SparkSession, dir: String, k: Int): DataFrame =
    runSingle(spark, dir, topKJob(k))

  private[streaming] def topKJob(k: Int) = StreamJob(
    "stream_topk", "complete",
    build = (spark, dir) => replayEvents(spark, dir)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n"),
        (floor((sum(floor(col("value") * 10000 + 0.5).cast("long")) + 50) / 100) / 100.0)
          .as("total"))
      .orderBy(col("n").desc, col("user_id"))
      .limit(k),
    post = _.orderBy(col("n").desc, col("user_id")))

  /** Late-data drop: append-mode windowed aggregation where a final wave
    * of files arrives AFTER the watermark has advanced past their windows
    * and the state store has evicted them.
    *
    * Staging makes lateness deterministic — three single-file waves
    * (one micro-batch each via `maxFilesPerTrigger=1`, ordered by file
    * modification time):
    *   wave 0: all non-click events except the latest one — its max event
    *     time advances the watermark to `max(non-click ts) - 1 hour` at
    *     batch end;
    *   wave 1: the single latest non-click event — this batch runs WITH
    *     the advanced watermark, so it finalizes (evicts + emits) every
    *     closed day-window. The eviction batch matters: a late row merges
    *     silently into any window still live in the state store; the drop
    *     policy only bites once the window is evicted (verified against
    *     this engine build — a 2-wave staging observes no drops at all);
    *   wave 2: the click events — now late. Each click either targets an
    *     evicted window (end <= watermark → the row is DROPPED, the policy
    *     under test; state is NOT resurrected, so no duplicate emission)
    *     or the still-open final window, which append mode never emits
    *     because the watermark cannot advance further.
    * The observable result is therefore exactly the closed windows of the
    * on-time (non-click) rows — what the batch oracle computes by
    * filtering at the watermark cutoff.
    */
  def lateDataDrop(spark: SparkSession, dir: String): DataFrame =
    runSingle(spark, dir, lateDropJob)

  private val lateDropJob = StreamJob(
    "stream_late_drop", "append",
    build = (spark, dir) => spark.readStream
      .schema(eventsStagedSchema)
      .option("maxFilesPerTrigger", 1)
      .parquet(stageLateDir(spark, dir))
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 day"))
      .agg(count(lit(1)).as("n"),
        (floor((sum(floor(col("value") * 10000 + 0.5).cast("long")) + 50) / 100) / 100.0)
          .as("total")),
    post = _.select(col("window.start").as("window_start"), col("n"), col("total"))
      .orderBy("window_start"))

  /** Stage events as three single-file waves with controlled modification
    * times (on-time < trickle < late), so the file stream replays them in
    * that order — see [[lateDataDrop]] for why the trickle wave exists.
    */
  private def stageLateDir(spark: SparkSession, dir: String): String = {
    import java.nio.file.{Files, Path, Paths}
    import java.nio.file.attribute.FileTime
    import scala.jdk.CollectionConverters._
    val hash = Integer.toHexString(dir.hashCode)
    val watch = Paths.get(
      System.getProperty("java.io.tmpdir"), s"graft_stream_late_v2_$hash")
    graft.ops.SparkOps.stageOnce(Paths.get(s"$dir/events.parquet"), watch) {
      if (Files.exists(watch)) {
        Files.walk(watch).iterator().asScala.toSeq.reverse.foreach(Files.delete)
      }
      Files.createDirectories(watch)
      val ev = eventsBatch(spark, dir)
      def writeWave(df: DataFrame, name: String, mtime: Long): Unit = {
        val scratch = Paths.get(
          System.getProperty("java.io.tmpdir"), s"graft_stream_late_v2_${hash}_$name")
        df.coalesce(1).write.mode("overwrite").parquet(scratch.toString)
        val part = Files.list(scratch).iterator().asScala
          .find(_.getFileName.toString.endsWith(".parquet"))
          .getOrElse(sys.error(s"no parquet part written for wave $name"))
        val dst = watch.resolve(s"$name.parquet")
        Files.copy(part, dst)
        Files.setLastModifiedTime(dst, FileTime.fromMillis(mtime))
      }
      val nonClick = ev.filter(col("event_type") =!= "click")
      val maxUs = nonClick.agg(max(unix_micros(col("ts")))).head.getLong(0)
      val t0 = (System.currentTimeMillis() / 1000) * 1000 - 300000
      writeWave(nonClick.filter(unix_micros(col("ts")) < maxUs), "0_ontime", t0)
      writeWave(nonClick.filter(unix_micros(col("ts")) === maxUs), "1_trickle", t0 + 60000)
      writeWave(ev.filter(col("event_type") === "click"), "2_late", t0 + 120000)
    }
  }

  /** Stateful streaming dedup on event_id (watermark-scoped state), then a
    * per-type count of the deduplicated stream.
    */
  def streamDedup(spark: SparkSession, dir: String): DataFrame =
    runSingle(spark, dir, dedupJob)

  private val dedupJob = StreamJob(
    "stream_dedup", "complete",
    build = (spark, dir) => replayEvents(spark, dir)
      .withWatermark("ts", "1 hour")
      .dropDuplicates("event_id")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n")),
    post = _.orderBy("event_type"))

  /** Bounded-state streaming dedup: `dropDuplicatesWithinWatermark` keys
    * state by event_id but EVICTS each entry once the watermark passes its
    * event time + delay — the production-safe variant whose state is
    * O(events inside the lateness window), not O(all ids ever seen)
    * (plain `dropDuplicates` state grows without bound on an infinite
    * stream). Semantics differ only for duplicates arriving further apart
    * than the delay; the replay has none, so the batch oracle is the same
    * distinct count.
    */
  def streamDedupWithinWatermark(spark: SparkSession, dir: String): DataFrame =
    runSingle(spark, dir, dedupBoundedJob)

  private val dedupBoundedJob = StreamJob(
    "stream_dedup_bounded", "complete",
    build = (spark, dir) => replayEvents(spark, dir)
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("event_id")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n")),
    post = _.orderBy("event_type"))

  /** Stage the events replay as `n` time-range parquet slices so a file
    * stream with `maxFilesPerTrigger=1` processes a genuinely multi-batch
    * replay (one staged file = one micro-batch). Written once per (dir, n).
    */
  private def stageSlices(spark: SparkSession, dir: String, n: Int): String = {
    import java.nio.file.Paths
    val hash = Integer.toHexString(dir.hashCode)
    val target = Paths.get(
      System.getProperty("java.io.tmpdir"), s"graft_stream_slices_v2_${hash}_$n")
    graft.ops.SparkOps.stageOnce(Paths.get(s"$dir/events.parquet"), target) {
      eventsBatch(spark, dir)
        .repartitionByRange(n, col("ts"))
        .write.mode("overwrite").parquet(target.toString)
    }
  }

  /** Session windows as CUSTOM STATE with event-time TIMEOUTS: the same
    * 30-minute-gap sessions as `session_window`/`sessionize_batch`, but
    * realized with `flatMapGroupsWithState` + `GroupStateTimeout
    * .EventTimeTimeout` — the mechanism for session semantics the built-in
    * window can't express (per-session aggregates beyond count, early
    * alerts, custom merge rules). State per user is ONE open session
    * (start, last, n); closed sessions emit as soon as the next event
    * proves the gap, and the LAST open session emits through the timeout
    * callback when the watermark passes `last + gap` — which is exactly
    * how state is evicted (bounded by active users, not history).
    *
    * The replay stages three waves with ascending mtimes (early half /
    * late half / a far-future watermark-advancer event) so sessions
    * genuinely continue across micro-batches and every real session
    * provably times out by end of replay. In-batch events fold in
    * (ts, event_id) order and the split is time-based, so emitted
    * sessions are batching-independent — the batch gaps-and-islands
    * oracle grades the result.
    */
  def sessionTimeoutAgg(spark: SparkSession, dir: String): DataFrame =
    runSingle(spark, dir, sessionTimeoutJob)

  private val sessionTimeoutJob = StreamJob(
    "stream_session_timeout", "append",
    build = (spark, dir) => {
      import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
      val watch = stageSessionDir(spark, dir)
      val gapUs = 30L * 60 * 1000 * 1000
      val stream = spark.readStream
        .schema(eventsStagedSchema)
        .option("maxFilesPerTrigger", 1)
        .parquet(watch)
        .withWatermark("ts", "1 hour")
        .select(col("user_id"), col("ts"),
          unix_micros(col("ts")).as("ts_us"), col("event_id"))
      import spark.implicits._
      stream.as[SessEvent]
        .groupByKey(_.user_id)
        .flatMapGroupsWithState[SessState, SessOut](
          OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
          (uid: Long, it: Iterator[SessEvent], state: GroupState[SessState]) =>
            if (state.hasTimedOut) {
              // watermark passed last + gap: the open session is final
              val s = state.get
              state.remove()
              Iterator.single(SessOut(uid, s.start_us, s.n))
            } else {
              val evs = it.toArray.sortBy(e => (e.ts_us, e.event_id))
              val out = scala.collection.mutable.ArrayBuffer.empty[SessOut]
              var cur = state.getOption
              evs.foreach { e =>
                cur match {
                  case Some(s) if e.ts_us < s.last_us + gapUs =>
                    cur = Some(SessState(s.start_us, e.ts_us, s.n + 1))
                  case Some(s) =>
                    out += SessOut(uid, s.start_us, s.n)
                    cur = Some(SessState(e.ts_us, e.ts_us, 1))
                  case None =>
                    cur = Some(SessState(e.ts_us, e.ts_us, 1))
                }
              }
              cur.foreach { s =>
                state.update(s)
                // event-time timeout is set in MILLIS; fires once the
                // watermark passes the session's gap horizon
                state.setTimeoutTimestamp((s.last_us + gapUs) / 1000)
              }
              out.iterator
            }
        }
        .toDF()
    },
    post = _.filter(col("user_id") >= 0) // drop the synthetic advancer user
      .select(col("user_id"),
        timestamp_micros(col("session_start_us")).as("session_start"),
        col("n_events"))
      .orderBy("user_id", "session_start"),
    needsNoDataBatches = true)

  /** Three-wave staging for [[sessionTimeoutAgg]]: early half / late half
    * split at the median event time (sessions straddle the boundary →
    * real cross-batch state continuation) plus a far-future single-event
    * advancer wave (synthetic user −1) that drags the watermark past
    * every real session's gap horizon.
    */
  private def stageSessionDir(spark: SparkSession, dir: String): String = {
    import java.nio.file.{Files, Paths}
    import java.nio.file.attribute.FileTime
    import scala.jdk.CollectionConverters._
    val hash = Integer.toHexString(dir.hashCode)
    val watch = Paths.get(
      System.getProperty("java.io.tmpdir"), s"graft_stream_sess_v2_$hash")
    graft.ops.SparkOps.stageOnce(Paths.get(s"$dir/events.parquet"), watch) {
      if (Files.exists(watch)) {
        Files.walk(watch).iterator().asScala.toSeq.reverse.foreach(Files.delete)
      }
      Files.createDirectories(watch)
      val ev = eventsBatch(spark, dir)
        .withColumn("ts_us", unix_micros(col("ts")))
      def writeWave(df: DataFrame, name: String, mtime: Long): Unit = {
        val scratch = Paths.get(
          System.getProperty("java.io.tmpdir"), s"graft_stream_sess_v2_${hash}_$name")
        df.drop("ts_us").coalesce(1).write.mode("overwrite").parquet(scratch.toString)
        val part = Files.list(scratch).iterator().asScala
          .find(_.getFileName.toString.endsWith(".parquet"))
          .getOrElse(sys.error(s"no parquet part written for wave $name"))
        val dst = watch.resolve(s"$name.parquet")
        Files.copy(part, dst)
        Files.setLastModifiedTime(dst, FileTime.fromMillis(mtime))
      }
      val Array(median) = ev.stat.approxQuantile("ts_us", Array(0.5), 0.0)
      val medianUs = median.toLong
      val maxUs = ev.agg(max(col("ts_us"))).head.getLong(0)
      val adv = spark.range(1).select(
        lit(-1L).as("event_id"),
        timestamp_micros(lit(maxUs + 10L * 24 * 3600 * 1000 * 1000)).as("ts"),
        lit(-1L).as("user_id"),
        lit("advance").as("event_type"),
        lit(0.0).as("value"),
        lit("{}").as("props"))
      val t0 = (System.currentTimeMillis() / 1000) * 1000 - 300000
      writeWave(ev.filter(col("ts_us") <= medianUs), "0_early", t0)
      writeWave(ev.filter(col("ts_us") > medianUs), "1_late", t0 + 60000)
      writeWave(adv.withColumn("ts_us", unix_micros(col("ts"))), "2_advance", t0 + 120000)
    }
  }

  /** Checkpointed RESTART-RESUME: the durability contract every
    * production stream stands on. A file stream drains two arriving
    * slices into an append sink under a checkpointLocation and STOPS;
    * the third slice lands while the job is down; a new query started
    * from the SAME checkpoint resumes from the committed offsets and
    * processes only the unseen slice. If restart semantics were broken
    * (offsets lost → reprocessing), the first two slices' rows would
    * appear twice in the sink and the batch oracle over the full table
    * would catch the doubling. foreachBatch + append-parquet makes the
    * committed-batch skip OBSERVABLE; a mid-batch crash would need the
    * transactional/idempotent sink shape instead (see
    * [[foreachBatchUpsert]]'s versioned writes) — clean stop/start is
    * the property under test here.
    *
    * Returns the sink's per-type rollup (exactly the whole-table batch
    * aggregate when resume works).
    */
  def checkpointRestartCounts(spark: SparkSession, dir: String): DataFrame = {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    import scala.jdk.CollectionConverters._
    val slices = stageSlices(spark, dir, 3)
    // Unique across JVMs, not just within one: the per-session runId
    // restarts at 1 in every JVM, and a leftover sink from a previous
    // process would silently union into this run's append sink.
    val base = Paths.get(System.getProperty("java.io.tmpdir"),
      s"graft_ckpt_restart_${java.util.UUID.randomUUID().toString.take(12)}")
    val watch = base.resolve("watch")
    val ckpt = base.resolve("ckpt")
    val sink = base.resolve("sink")
    Files.createDirectories(watch)
    val parts = Files.list(Paths.get(slices)).iterator().asScala
      .filter(_.getFileName.toString.endsWith(".parquet"))
      .toSeq.sortBy(_.getFileName.toString)
    require(parts.size == 3, s"expected 3 staged slices, found ${parts.size}")
    def arrive(p: java.nio.file.Path): Unit =
      Files.copy(p, watch.resolve(p.getFileName),
        StandardCopyOption.REPLACE_EXISTING)
    def drain(): Unit = {
      val q = spark.readStream
        .schema(eventsStagedSchema)
        .option("maxFilesPerTrigger", "1")
        .parquet(watch.toString)
        .select(col("event_type"), col("value"))
        .writeStream
        .option("checkpointLocation", ckpt.toString)
        .foreachBatch { (batch: DataFrame, _: Long) =>
          batch.write.mode("append").parquet(sink.toString)
        }
        .queryName(s"graft_stream_restart_${runId.incrementAndGet()}")
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    arrive(parts(0)); arrive(parts(1))
    drain() // run 1: slices 0-1 commit to the checkpoint
    arrive(parts(2))
    drain() // run 2, same checkpoint: resumes past the committed batches
    spark.read.parquet(sink.toString)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        (floor((sum(floor(col("value") * 10000 + 0.5).cast("long")) + 50) / 100) / 100.0)
          .as("total"))
      .orderBy("event_type")
  }

  /** Per-micro-batch data-quality metrics on a running stream:
    * `Dataset.observe` rides each batch's own processing (zero extra
    * jobs — the streaming twin of the batch `writeParquetObserved`), and
    * the engine reports every batch's observed values in its
    * `StreamingQueryProgress`. This replays events as `nSlices`
    * micro-batches, observes (row count, exact money quanta) per batch,
    * and returns the per-batch ledger plus the recomposed totals —
    * because both metrics are ASSOCIATIVE sums, the recomposition is
    * exactly the batch aggregate over the whole table, which is what the
    * oracle checks. In production this progress stream is the monitoring
    * feed (rows/sec, per-batch null rates) a 100 TB pipeline alarms on;
    * metrics that only merge associatively is the design rule that makes
    * them exact across arbitrary micro-batch boundaries.
    *
    * Returns the per-batch ledger in batch order, one `(n_rows, v_q)`
    * entry per non-empty micro-batch.
    */
  def observedReplayLedger(
      spark: SparkSession, dir: String, nSlices: Int = 3): Seq[(Long, Long)] = {
    val slices = stageSlices(spark, dir, nSlices)
    val obsName = s"graft_stream_dq_${runId.incrementAndGet()}"
    val stream = spark.readStream
      .schema(eventsStagedSchema)
      .option("maxFilesPerTrigger", "1")
      .parquet(slices)
      .observe(obsName,
        count(lit(1)).as("n_rows"),
        sum(floor(col("value") * 10000 + 0.5).cast("long")).as("v_q"))
    PartitionsScope.enter(spark)
    val ledger = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    try {
      val q = stream.writeStream
        .format("noop")
        .queryName(s"graft_stream_observe_${runId.incrementAndGet()}")
        .start()
      try q.processAllAvailable() finally q.stop()
      q.recentProgress.foreach { p =>
        val m = p.observedMetrics.get(obsName)
        if (m != null && m.getAs[Long]("n_rows") > 0) {
          ledger += ((m.getAs[Long]("n_rows"), m.getAs[Long]("v_q")))
        }
      }
    } finally PartitionsScope.exit(spark)
    ledger.toSeq
  }

  /** foreachBatch MERGE-upsert sink: each micro-batch folds its per-user
    * delta into a versioned parquet state table (full-outer join +
    * coalesce — the same lowering as the batch `merge_upsert` query; this
    * is the Delta/Iceberg `MERGE INTO` shape without a table format). The
    * per-user state is (event count, argmax-by-(ts, event_id) last event)
    * — both ASSOCIATIVE and COMMUTATIVE merges, so the final state is
    * identical under any micro-batch partitioning of the replay; that
    * independence is what makes a foreachBatch sink oracle-checkable and
    * is the design rule for production upsert sinks (retries/reordering
    * cannot corrupt state). Versioned writes (v1, v2, …) keep each batch's
    * output immutable while it is still readable as the next batch's
    * input — the poor man's snapshot isolation a real table format
    * provides natively.
    *
    * Returns (final state, number of micro-batches processed).
    */
  def foreachBatchUpsert(spark: SparkSession, dir: String): (DataFrame, Int) = {
    val stateRoot = java.nio.file.Paths.get(
      System.getProperty("java.io.tmpdir"),
      s"graft_upsert_state_${runId.incrementAndGet()}")
    val slices = stageSlices(spark, dir, n = 3)
    val stream = spark.readStream
      .schema(eventsStagedSchema)
      .option("maxFilesPerTrigger", "1")
      .parquet(slices)
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"),
        col("event_id"), col("value"))
    @volatile var version = 0
    PartitionsScope.enter(spark)
    try {
      val q = stream.writeStream
        .foreachBatch { (batch: DataFrame, _: Long) =>
          val delta = batch.groupBy("user_id").agg(
            count(lit(1)).as("n_events"),
            max(struct(col("ts_us"), col("event_id"), col("value"))).as("last"))
          val merged =
            if (version == 0) delta
            else spark.read.parquet(s"$stateRoot/v$version")
              .select(col("user_id"), col("n_events").as("n0"), col("last").as("l0"))
              .join(delta.select(col("user_id"), col("n_events").as("n1"),
                col("last").as("l1")), Seq("user_id"), "full_outer")
              .select(col("user_id"),
                (coalesce(col("n0"), lit(0L)) + coalesce(col("n1"), lit(0L)))
                  .as("n_events"),
                greatest(col("l0"), col("l1")).as("last"))
          merged.write.mode("overwrite").parquet(s"$stateRoot/v${version + 1}")
          version += 1
        }
        .queryName(s"graft_stream_upsert_${runId.incrementAndGet()}")
        .start()
      try q.processAllAvailable() finally q.stop()
    } finally PartitionsScope.exit(spark)
    val state = spark.read.parquet(s"$stateRoot/v$version")
      .select(col("user_id"), col("n_events"),
        timestamp_micros(col("last.ts_us")).as("last_ts"),
        col("last.value").as("last_value"))
      .orderBy("user_id")
    (state, version)
  }
}
