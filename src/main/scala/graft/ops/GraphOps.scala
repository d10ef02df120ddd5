package graft.ops

import graft.ops.SparkOps.Materialize
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Graph operators for dedup pipelines: near-duplicate PAIRS only become
  * removable duplicates once they are grouped into clusters — connected
  * components is the canonical way (the "dedup graph" step in large-scale
  * corpus curation).
  */
object GraphOps {

  /** Connected components by iterative min-label propagation: every vertex
    * starts labeled with its own id; each round every vertex takes the min
    * label among itself and its neighbors; fixpoint = components labeled by
    * their minimum vertex id.
    *
    * Scale shape: each round is one equi-join (edges ⋈ labels on src) plus
    * one groupBy(id).min — both shuffle on the same key, and AQE coalesces
    * the tiny tail rounds. Rounds needed = graph diameter (near-dup
    * clusters are clique-ish, so 2-3 in practice). [[SparkOps.materialize]]
    * truncates the per-round lineage (localCheckpoint by default;
    * reliable checkpoint when `graft.checkpoint.dir` is set).
    * Convergence test: labels only ever decrease, so an unchanged label
    * SUM is a fixpoint proof — one cheap scalar action per round instead
    * of a change-count join.
    *
    * Non-convergence within `maxIter` (possible only on graphs whose
    * compressed diameter exceeds it — not a near-dup workload) returns
    * the in-progress labels and logs a warning.
    */
  def connectedComponents(
      vertices: DataFrame,
      edges: DataFrame,
      maxIter: Int = 50,
      // Regime cut-over, exposed for tests (forcing 0 exercises the
      // iterative path on small graphs; the default is the prod value).
      smallLabelThreshold: Long = 500000L,
      // Upper bound on |V| when the caller knows it statically (e.g. a
      // bounded id window): skips the regime-probe count() — one fewer
      // serial driver-blocking job, which matters because serial segments
      // take a CPU-theft stall at full strength while 32-way stages
      // average it out.
      sizeHint: Option[Long] = None
  ): DataFrame = {
    // TWO REGIMES by |V|. When the LABEL table fits comfortably in one
    // task's memory (≤500k vertices ≈ 8 MB of longs — the same order as
    // the default broadcast threshold), connected components does not
    // need iteration at all: one parallel pass of per-partition
    // union-find over the edges emits a star forest (≤ one row per
    // distinct vertex per partition), a single merge task unions the
    // forests, and a broadcast join labels the vertices — O(|E|) total
    // work, 2 stages, versus O(log d) join-rounds whose per-round fixed
    // cost (planning + codegen + checkpoint + convergence action)
    // dominates at small scale (measured ~0.9s/round × 7 rounds on a
    // 382k-edge graph vs ~1s total for the forest path). At 100 TB the
    // corpus has ~10^9 documents, labels no longer fit, and the
    // iterative min-label path below is the right shape — the regime
    // switch is stats-informed by the exact |V| count, the same
    // size-based call a planner makes for broadcast-vs-shuffle joins.
    // Requires integral vertex ids (true for all graft callers); any
    // other id type uses the iterative path, which is type-agnostic.
    val nVerts = sizeHint.getOrElse(vertices.count())
    val integralIds = vertices.schema("id").dataType match {
      case org.apache.spark.sql.types.ByteType | org.apache.spark.sql.types.ShortType |
           org.apache.spark.sql.types.IntegerType | org.apache.spark.sql.types.LongType => true
      case _ => false
    }
    if (nVerts <= smallLabelThreshold && integralIds) ccViaForest(vertices, edges)
    else ccIterative(vertices, edges, nVerts, maxIter)
  }

  /** Small-|V| regime: per-partition union-find → star forest → one merge
    * task → broadcast label join. See the regime note in
    * [[connectedComponents]]. Labels are the component's minimum vertex
    * id — identical contract to the iterative path.
    */
  private def ccViaForest(vertices: DataFrame, edges: DataFrame): DataFrame = {
    val spark = vertices.sparkSession
    import spark.implicits._
    val idType = vertices.schema("id").dataType
    val star = edges.select(col("src").cast("long"), col("dst").cast("long"))
      .as[(Long, Long)]
      .mapPartitions(partitionForest)
      // repartition — NOT coalesce: coalesce(1) would collapse the
      // parallel forest stage itself into the single merge task; the
      // shuffle boundary keeps phase 1 at the edge table's width and
      // ships only the per-partition star forests (≤ |V| rows each).
      .repartition(1)
      .mapPartitions(mergeForestsMinLabel)
      .toDF("fid", "flabel")
    // Vertices with no incident edge are their own singleton component.
    vertices
      .join(broadcast(star), col("id").cast("long") === col("fid"), "left")
      .select(col("id"),
        coalesce(col("flabel"), col("id").cast("long")).cast(idType).as("label"))
  }

  /** Union-find with path compression over one partition's edges; emits
    * the star forest (vertex, root) — ≤ one row per distinct vertex seen.
    */
  private def partitionForest(it: Iterator[(Long, Long)]): Iterator[(Long, Long)] = {
    val parent = new scala.collection.mutable.LongMap[Long]()
    def find(x0: Long): Long = {
      var x = x0
      while (parent.getOrElse(x, x) != x) x = parent.getOrElse(x, x)
      var y = x0 // path compression
      while (parent.getOrElse(y, y) != y) { val n = parent(y); parent(y) = x; y = n }
      x
    }
    it.foreach { case (a, b) =>
      parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
      val ra = find(a); val rb = find(b)
      if (ra != rb) parent(if (ra < rb) rb else ra) = math.min(ra, rb)
    }
    parent.keysIterator.toArray.iterator.map(v => (v, find(v)))
  }

  /** Merge the per-partition star forests (single task) and emit every
    * seen vertex with its component's MINIMUM member id.
    */
  private def mergeForestsMinLabel(it: Iterator[(Long, Long)]): Iterator[(Long, Long)] = {
    val parent = new scala.collection.mutable.LongMap[Long]()
    def find(x0: Long): Long = {
      var x = x0
      while (parent.getOrElse(x, x) != x) x = parent.getOrElse(x, x)
      var y = x0
      while (parent.getOrElse(y, y) != y) { val n = parent(y); parent(y) = x; y = n }
      x
    }
    it.foreach { case (a, b) =>
      parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
      val ra = find(a); val rb = find(b)
      if (ra != rb) parent(if (ra < rb) rb else ra) = math.min(ra, rb)
    }
    val minOf = new scala.collection.mutable.LongMap[Long]()
    val ids = parent.keysIterator.toArray
    ids.foreach { v =>
      val r = find(v)
      minOf(r) = math.min(minOf.getOrElse(r, v), v)
    }
    ids.iterator.map(v => (v, minOf(find(v))))
  }

  /** Large-|V| regime: iterative min-label propagation with pointer
    * jumping; see [[connectedComponents]].
    */
  private def ccIterative(
      vertices: DataFrame,
      edges: DataFrame,
      nVerts: Long,
      maxIter: Int
  ): DataFrame = {
    // Both edge directions in ONE pass over the (possibly expensive) edge
    // pipeline — union(edges, edges.swap) would embed and execute that
    // pipeline twice. localCheckpoint, not persist: it truncates the
    // edge pipeline's logical tree to a leaf, so the per-round plans the
    // loop below submits don't re-analyze/re-optimize a deep mining
    // lineage every round (see the same note in [[pagerankQuantized]]).
    val e2raw = edges
      .select(explode(array(
        struct(col("src").as("s"), col("dst").as("d")),
        struct(col("dst").as("s"), col("src").as("d")))).as("e"))
      .select(col("e.s").as("src"), col("e.d").as("dst"))
      .materialized
    val nEdges2 = e2raw.count()
    // Size the per-round materializations to the DATA, not the session
    // default: localCheckpoint materializes every partition of the
    // round's output, so a fixed 200-partition default would pay 200
    // tasks per round regardless of data. The per-round join work scales
    // with the directed EDGE table — in a near-dup graph typically 100×
    // the vertex count (a 50k-doc dup-dense corpus yields ~6M directed
    // edges), so sizing by vertices alone would collapse a multi-million-
    // row join into one task per round. Target ~32k directed edges (or
    // ~250k labels) per task: small enough that an O(log d)-round
    // iteration actually uses the available cores — the per-plan
    // `coalesce(parts)` below propagates into the round's join and
    // groupBy stages, so an undersized width serializes the WHOLE round,
    // not just the checkpoint (measured 7×1.1s single-task rounds vs
    // ~0.3s at width 12 on a 382k-edge graph) — while the session
    // default caps the width at its cluster-sized value, so a 10^9-edge
    // graph still spreads over every reducer the session offers. Applied
    // with a per-plan coalesce — NOT by mutating the session-global
    // shuffle-partition conf, which would leak the shrunken value to
    // concurrent queries on the same session.
    val defaultParts =
      vertices.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    val parts = math.max(1L, math.min(defaultParts.toLong,
      math.max(nVerts / 250000L, nEdges2 / 32000L) + 1L)).toInt
    // Pre-partitioned on the probe key (off the already-materialized raw
    // cache, so the doubled pipeline still runs once) and persisted: the
    // cached partitioning is reused by every round's join instead of
    // re-shuffling the edge table per round.
    val e2 = e2raw.repartition(parts, col("src"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    e2.count()
    var labels = vertices.select(col("id"), col("id").as("label"))
      .coalesce(parts)
      .materialized
    var prevSum: java.math.BigDecimal = null
    var iter = 0
    var done = false
    try {
      while (!done && iter < maxIter) {
        val prop = e2.join(labels, e2("src") === labels("id"))
          .select(e2("dst").as("id"), col("label"))
        // Pointer jumping (path halving): also feed label(label) candidates
        // into the min. Labels only decrease and label(y) ≤ y, so the jump
        // is a pure shortcut — chains compress geometrically and rounds
        // drop from O(diameter) to O(log diameter). Both the edge
        // propagation and the jump join against the MATERIALIZED previous
        // labels (no diamond on this round's plan), and one groupBy folds
        // all three candidate sets.
        val l2 = labels.select(col("id").as("lid"), col("label").as("llabel"))
        val jumped = labels.join(l2, labels("label") === l2("lid"))
          .select(labels("id"), col("llabel").as("label"))
        // second application: label(label(label(x))) — still only reads the
        // materialized previous round, compresses chains 4x per round
        val l3 = labels.select(col("id").as("jid"), col("label").as("jlabel"))
        val jumped2 = jumped.join(l3, jumped("label") === l3("jid"))
          .select(jumped("id"), col("jlabel").as("label"))
        val next = labels.union(prop).union(jumped2)
          .groupBy("id").agg(min("label").as("label"))
          // narrow merge down to the vertex-sized width before the
          // checkpoint materializes partitions (no extra shuffle)
          .coalesce(parts)
          .materialized
        val cur = next.agg(sum(col("label")).cast("decimal(38,0)").as("s"))
          .head.getDecimal(0)
        done = prevSum != null && cur.compareTo(prevSum) == 0
        prevSum = cur
        labels = next
        iter += 1
      }
      if (!done) {
        org.slf4j.LoggerFactory.getLogger(getClass).warn(
          s"connectedComponents: no fixpoint after $maxIter rounds — " +
            "returned labels may not be fully converged")
      }
    } finally {
      e2.unpersist()
    }
    // Contract parity with [[ccViaForest]]: emit labels for the VERTICES
    // table only. Edge endpoints absent from it still participate in
    // propagation (connectivity through them is preserved) but carry no
    // output row — without this, the |V|-threshold regime switch would
    // silently change the output row set on inconsistent inputs.
    labels.join(vertices.select(col("id")), Seq("id"), "left_semi")
  }

  /** Session-scoped cache of materialized cluster labelings, keyed by the
    * semantic hash of the source plan + threshold. Cluster labeling is an
    * expensive artifact that several downstream operators consume
    * (canonicalization, per-cluster stats, filtering); a production
    * pipeline writes it once and reuses it — this memo is the in-session
    * equivalent (the cached frame is already localCheckpoint-materialized).
    */
  private val labelCache =
    new BoundedMemo[(String, Int, Double), DataFrame]("graph.labels")

  /** Drop this session's cached labelings (local-checkpoint RDD blocks
    * are cleaner-released once unreferenced; durable checkpoint files
    * follow the cleanCheckpoints conf — see SparkOps.materialize).
    * Invoked by
    * [[graft.ops.DedupOps.clearCaches]] — same cache contract: keys hash
    * the plan, so entries are valid only while source files are immutable.
    */
  private[ops] def clearLabelCache(sessionId: String): Unit =
    labelCache.clearIf(_._1 == sessionId)

  /** Cluster documents by near-duplicate similarity (token Jaccard >=
    * threshold via the exact PPJoin miner) and label each doc with its
    * component (= min doc_id reachable).
    */
  def dedupClusters(docs: DataFrame, threshold: Double): DataFrame = {
    val key = (SparkOps.sessionId(docs.sparkSession),
      docs.queryExecution.logical.semanticHash(), threshold)
    // Compute OUTSIDE the map bin lock (DedupOps.memoize): the build runs
    // a full mine + CC — minutes of Spark jobs — and holding a
    // computeIfAbsent lock for that long would serialize concurrent
    // builds for unrelated keys that hash to the same bin.
    val labels = labelCache.memoize(key)({
      val edges = DedupOps.ngramJaccardCachedUnsorted(docs, threshold)
        .select(col("id_a").as("src"), col("id_b").as("dst"))
      val verts = docs.select(col("doc_id").as("id"))
      // Materialize eagerly: the label table is one row per vertex (tiny —
      // in the forest regime ccViaForest returns a LAZY plan, so an
      // unmaterialized cache entry would re-run the mine+CC on every
      // downstream reuse). The checkpointed RDD is released by the context
      // cleaner once the cache entry is dropped.
      connectedComponents(verts, edges).materialized
    })(_ => ())
    labels
      .select(col("id").as("doc_id"), col("label").as("component"))
      .orderBy("doc_id")
  }

  /** Fixed-iteration PageRank over an undirected pair list with EXACT
    * integer arithmetic: ranks live as 1e-6 quanta (longs), per-edge
    * contributions are integer floor divisions by degree, and each round is
    * `150000 + floor(0.85 · Σ contrib)` — the only float op is one IEEE
    * multiply+floor per vertex per round, identical in any engine, so a
    * fixed iteration count gives bit-stable ranks (floats accumulated
    * per-edge would diverge with partition order). Scale shape per round:
    * one equi-join edges⋈ranks on src plus one groupBy(dst) — the same
    * key-partitioned shuffle pair as a connected-components round; the
    * full algorithm iterates exactly like [[connectedComponents]],
    * checkpointing every `checkpointInterval` rounds so the logical plan
    * stays bounded at any iteration depth (without it each round embeds
    * the whole previous tree — re-planning cost grows geometrically).
    * Checkpoint placement cannot change values: ranks are exact integer
    * quanta, so a materialize-and-reread round is bit-identical.
    *
    * EAGER: the final `localCheckpoint(true)` executes the whole iteration
    * pipeline AT CALL TIME (so the loop-scoped edge/degree caches can be
    * freed before returning), and the returned plan is a LogicalRDD whose
    * blocks are executor-local — lost on executor failure, same caveat as
    * [[connectedComponents]]. Callers that need lazy construction should
    * wrap the call, not the returned frame.
    */
  def pagerankQuantized(
      pairs: DataFrame,
      iterations: Int,
      checkpointInterval: Int = 5,
      // Same regime cut-over philosophy as [[connectedComponents]]: below
      // this many DIRECTED edges the whole graph fits one task comfortably
      // (8M (src,dst) longs ≈ 128 MB) and a fixed-iteration loop of
      // LongMap passes beats paying per-round join+groupBy planning,
      // shuffle and checkpoint fixed costs (measured ~1s/round of fixed
      // cost vs <0.1s of actual arithmetic on the bench graph). Integer
      // quanta make the two regimes BIT-IDENTICAL, so the switch is pure
      // latency routing — exposed for tests to force either path.
      //
      // The CEILING is justified by the single-task regime's hard
      // constraints, not by local wall-clock: one task means one core and
      // one task's memory for the whole graph, so it must stop while the
      // edge array + two LongMaps fit a task comfortably (~128 MB at 8M
      // directed edges) — beyond that the join regime is the only one
      // that still RUNS at cluster scale, whether or not it wins a local
      // race. Measured walls at the 11-12M boundary are genuinely within
      // noise of each other on a shared box (regime_boundary.json's
      // median-of-3 row records both regimes' samples; single runs have
      // flipped sign between rounds), which is exactly why the boundary
      // is placed by the memory bound rather than a local crossover.
      smallEdgeThreshold: Long = 8000000L
  ): DataFrame = {
    require(checkpointInterval > 0)
    // localCheckpoint, not persist: a persisted frame still CARRIES its
    // full logical plan — when `pairs` is a derived mining artifact that
    // tree is deep, and every round's action re-analyzes and re-optimizes
    // it (measured ~5.5s of driver time vs ~1.8s of actual stage time on
    // the 2-round bench shape). The checkpoint truncates the lineage to a
    // LogicalRDD so each round plans against a leaf. Same executor-local
    // durability caveat as the final checkpoint (see scaladoc).
    val edges = pairs
      .select(explode(array(
        struct(col("id_a").as("s"), col("id_b").as("d")),
        struct(col("id_b").as("s"), col("id_a").as("d")))).as("e"))
      .select(col("e.s").as("src"), col("e.d").as("dst"))
      .materialized
    if (edges.count() <= smallEdgeThreshold)
      return pagerankSingleTask(edges, iterations)
    // deg is joined every round — persist, or each round re-aggregates the
    // edge table (and the final unpersist below would invalidate it).
    val deg = edges.groupBy("src").agg(count(lit(1)).as("deg"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // Same stats-informed broadcast call as [[connectedComponents]]: the
    // rank/degree tables are |V|-sized while the per-round join scans the
    // |E|-sized edge table — when |V| fits the broadcast threshold, each
    // round is one map-side join pass over the cached edges plus a single
    // groupBy shuffle, instead of three shuffle stages whose latency
    // dominates a fixed-iteration loop. The count also eagerly
    // materializes the deg cache that every round reuses.
    val broadcastRanks = deg.count() <= 500000L
    var ranks = deg.select(col("src").as("id"), lit(1000000L).as("r"))
    try {
    (1 to iterations).foreach { i =>
      val contrib = edges
        .join(if (broadcastRanks) broadcast(ranks) else ranks,
          edges("src") === ranks("id"))
        .join(if (broadcastRanks) broadcast(deg) else deg, "src")
        .select(col("dst").as("id"), expr("r div deg").as("c"))
      ranks = contrib.groupBy("id")
        .agg((lit(150000L) + floor(lit(0.85) * sum(col("c")))).cast("long").as("r"))
      if (i % checkpointInterval == 0 && i < iterations) {
        ranks = ranks.materialized
      }
    }
    // Materialize the final ranks so the loop-scoped caches can be freed
    // eagerly instead of pinning executor storage until the caller acts.
    ranks.materialized
    } finally {
      // edges' local-checkpoint blocks are cleaner-released once the
      // frame goes out of scope (durable files follow the cleanCheckpoints
      // conf — SparkOps.materialize); only the deg cache needs explicit
      // release — in a finally so a mid-iteration failure can't pin it
      // for the session lifetime (ccIterative's e2 gets the same guard).
      deg.unpersist()
    }
  }

  /** Small-graph PageRank regime: the (already materialized) directed edge
    * list collapses into ONE task that runs the identical quantized
    * recurrence as the distributed loop — per round, contribution
    * `r div deg` (integer long division) per edge, then
    * `150000 + floor(0.85 · Σ)` per vertex, with `0.85 · Σ` the same single
    * long→double promotion and IEEE multiply the DataFrame expression
    * performs. Exact integer state means accumulation order can't change
    * anything: the two regimes are bit-identical (fenced by
    * GraphTextOpsSpec's regime-pinning test).
    */
  private def pagerankSingleTask(edges: DataFrame, iterations: Int): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    edges.select(col("src").cast("long"), col("dst").cast("long"))
      .as[(Long, Long)]
      // repartition — not coalesce — so the single task reads the shuffled
      // narrow rows, not the (wider) upstream plan serialized into one task
      .repartition(1)
      .mapPartitions { it =>
        val es = it.toArray
        val deg = new scala.collection.mutable.LongMap[Long]()
        es.foreach { case (s, _) => deg(s) = deg.getOrElse(s, 0L) + 1L }
        var ranks = new scala.collection.mutable.LongMap[Long]()
        deg.keysIterator.foreach(ranks(_) = 1000000L)
        var i = 0
        while (i < iterations) {
          val acc = new scala.collection.mutable.LongMap[Long]()
          es.foreach { case (s, d) =>
            ranks.get(s).foreach { r =>
              acc(d) = acc.getOrElse(d, 0L) + r / deg(s)
            }
          }
          val next = new scala.collection.mutable.LongMap[Long]()
          acc.foreachEntry((id, sum) =>
            next(id) = 150000L + math.floor(0.85 * sum).toLong)
          ranks = next
          i += 1
        }
        ranks.toList.iterator
      }
      .toDF("id", "r")
  }

  /** Exact triangle count by DEGREE-ORDERED wedge orientation (the
    * node-iterator++ / Schank–Wagner orientation MapReduce folklore runs
    * at web scale): order vertices by (degree, id), orient every
    * undirected edge from its ≺-lower to its ≺-higher endpoint, generate
    * wedges only among each vertex's OUT-neighbors, and close them with a
    * semi-join against the oriented edge list.
    *
    * Why this beats the naive a<b orientation at 100×: under id order, a
    * hub vertex that happens to carry a low id owns out-degree ≈ its full
    * degree c, and the wedge join explodes O(c²) rows on that single join
    * key — the classic triangle-count skew-killer (one boilerplate
    * mega-family of c near-identical docs is exactly this shape). Under
    * degree order every out-degree is ≤ O(√m) (each out-neighbor has
    * degree ≥ the source's, and Σdeg = 2m), so per-key wedge fan-out is
    * bounded no matter how skewed the degree distribution is; a pure-star
    * hub generates ZERO wedges because all its edges point INTO it.
    * Measured on a 5k-spoke star: 12,497,500 wedges under id order vs 0
    * under degree order (regime_boundary.json).
    *
    * Count invariance: each triangle {x ≺ y ≺ z} is counted exactly once,
    * at x (out-neighbors y, z; closing oriented edge y→z exists) — so the
    * result is bit-identical to the id-ordered census
    * (GraphTextOpsSpec pins this on both the real mining and the star).
    *
    * Input: one row per undirected edge, columns (a, b) — orientation of
    * the input does not matter. Output: single row, `n_triangles`.
    *
    * The census is only exact over a SIMPLE undirected edge set — a
    * duplicate edge (either orientation) inflates both degrees and the
    * wedge count, and a self-loop corrupts the strict (deg, id) total
    * order. By default the input is therefore canonicalized first
    * (least/greatest + self-loop filter + dropDuplicates — one |E|-sized
    * hash aggregate). Callers whose edges are distinct canonical pairs BY
    * CONSTRUCTION (the mining pair lists: id_a < id_b, one row per pair)
    * pass `assumeCanonical = true` to skip that exchange; the flag is an
    * explicit contract at the call site, not a silent precondition.
    */
  def triangleCountOriented(
      edges: DataFrame, assumeCanonical: Boolean = false): DataFrame = {
    val raw = edges.select(col("a"), col("b"))
    val e =
      if (assumeCanonical) raw
      else raw.select(
          least(col("a"), col("b")).as("a"),
          greatest(col("a"), col("b")).as("b"))
        .filter(col("a") =!= col("b"))
        .dropDuplicates("a", "b")
    val deg = e.select(col("a").as("v"))
      .unionByName(e.select(col("b").as("v")))
      .groupBy("v").agg(count(lit(1)).as("deg"))
    // attach endpoint degrees (deg is |V|-sized — AQE broadcasts it when
    // small; at scale it shuffles on the vertex key like everything else)
    val withDeg = e
      .join(deg.select(col("v").as("a"), col("deg").as("da")), Seq("a"))
      .join(deg.select(col("v").as("b"), col("deg").as("db")), Seq("b"))
    val aFirst = col("da") < col("db") ||
      (col("da") === col("db") && col("a") < col("b"))
    // oriented edge src→dst with dst's (deg, id) kept for wedge ordering.
    // Materialized EAGERLY (it is |E|-sized, and three consumers read it:
    // both wedge-join sides and the closing semi-join) so AQE sees its
    // true size — against the raw two-join derivation the closing
    // semi-join has no stats, falls back to sort-merge, and shuffles the
    // |wedges|-sized side (measured 2.2× slower at sf0.1's 20M wedges;
    // with the checkpoint AQE broadcasts the edge side whenever it fits
    // and sort-merges otherwise — the right call at either scale).
    // Durability follows graft.checkpoint.dir (SparkOps.materialize).
    val oriented = withDeg.select(
      when(aFirst, col("a")).otherwise(col("b")).as("src"),
      when(aFirst, col("b")).otherwise(col("a")).as("dst"),
      when(aFirst, col("db")).otherwise(col("da")).as("ddeg"))
      .materialized
    // Round-15: close wedges by PER-EDGE SORTED-LIST INTERSECTION instead
    // of materializing every wedge as a row and semi-joining it back
    // (compact-forward / edge-iterator folklore): build each vertex's
    // sorted out-neighbor list once, then for every oriented edge (v, w)
    // count |N⁺(v) ∩ N⁺(w)| with the codegen'd sorted-merge counter the
    // PPJoin verifier already uses. Each triangle {x ≺ y ≺ z} is counted
    // exactly once, at its (x → y) edge (z sits in both out-lists) — the
    // same census as the wedge semi-join, so counts are bit-identical
    // (GraphTextOpsSpec pins it). Cost: the |wedges|-sized exchange +
    // 20M-row semi-join probe at sf0.1 become |E| merge scans whose total
    // work is Σ(|N⁺(v)|+|N⁺(w)|) per edge; list lengths stay ≤ O(√m)
    // under the degree orientation, so the adjacency join shuffles O(m)
    // list entries at any skew (the wedge count is O(Σ outdeg²)).
    graft.functions.SortedIntersectCount.register(edges.sparkSession)
    // sorted_intersect_count is array<bigint>-only. Integral vertex ids
    // cast losslessly to long (no-op for the long ids every in-repo
    // caller uses — SimplifyCasts removes it); any other orderable id
    // type (e.g. string) takes the generic size(array_intersect) census
    // instead — out-lists are DISTINCT by construction (edges are
    // canonicalized), so the two counts are identical (ADVICE r15: the
    // r15 rewrite had silently dropped non-long-id support).
    val integralIds = raw.schema("a").dataType match {
      case org.apache.spark.sql.types.LongType |
           org.apache.spark.sql.types.IntegerType |
           org.apache.spark.sql.types.ShortType |
           org.apache.spark.sql.types.ByteType => true
      case _ => false
    }
    val dst = if (integralIds) col("dst").cast("long") else col("dst")
    val adj = oriented.groupBy(col("src"))
      .agg(sort_array(collect_list(dst)).as("nb"))
    val interCount =
      if (integralIds) expr("sorted_intersect_count(nv, nw)")
      else size(array_intersect(col("nv"), col("nw"))).cast("long")
    oriented.select(col("src"), col("dst"))
      .join(adj.select(col("src"), col("nb").as("nv")), Seq("src"))
      .join(adj.select(col("src").as("w2"), col("nb").as("nw")),
        col("dst") === col("w2"), "left")
      .select(when(col("nw").isNull, lit(0))
        .otherwise(interCount).as("t"))
      .agg(coalesce(sum(col("t")), lit(0L)).as("n_triangles"))
  }

  /** Keep-best representative per near-dup cluster: longest text wins,
    * lowest doc_id breaks ties. Realized as max(struct(n_chars, -doc_id))
    * — an associative argmax, so it partial-aggregates map-side (no
    * per-cluster sort, no window).
    */
  def dedupKeepBest(docs: DataFrame, threshold: Double): DataFrame =
    dedupClusters(docs, threshold)
      .join(docs.select(col("doc_id"), col("n_chars")), "doc_id")
      .groupBy(col("component"))
      .agg(
        count(lit(1)).as("n_docs"),
        max(struct(col("n_chars"), negate(col("doc_id")).as("neg_id"))).as("b"))
      .select(col("component"), col("n_docs"),
        negate(col("b.neg_id")).as("kept_doc"),
        col("b.n_chars").as("kept_chars"))
      .orderBy("component")
}
