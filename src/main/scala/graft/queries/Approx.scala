package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shared home of the RAW approximate operators (sketches, LSH/IVF/PQ
  * candidate generation, DEFLATE ratios) and of the VERDICT-FRAME builders
  * that grade them in-engine against their exact twins.
  *
  * Round 13 graduation of the former `no_oracle` queries: each graded
  * query used to emit the raw approximate output (engine-specific — no
  * DuckDB oracle possible, so the driver recorded only a rows>0 check) and
  * was floor-graded out-of-band in RecallSpec/RecallReport. Now each
  * graded query emits a DETERMINISTIC VERDICT FRAME instead: the exact
  * twin's replayable values plus boolean verdicts ("approx within its
  * guaranteed error bound / recall floor") that Spark computes by running
  * BOTH sides in-engine and DuckDB replays as the exact values + literal
  * TRUE. The approximate computation still runs in full — the booleans
  * depend on it — but the driver's hash gate is now exact on every query.
  *
  * The raw builders stay public so RecallSpec / RecallReport keep grading
  * the underlying accuracy NUMBERS (recall, overlap@k, relative error)
  * against fixed floors — the verdict booleans are the driver-visible
  * projection of those same checks, with identical floors.
  */
object Approx {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.read(s, dir, name)

  // ------------------------------------------------------------------
  // single source of truth: approximate builders + accuracy floors
  //
  // Each (builder, floor) pair below is consumed by THREE places — the
  // graded verdict query, RecallSpec, and RecallReport. Defining them
  // once makes the round-13 invariant structural: the driver-visible
  // verdict booleans are BY CONSTRUCTION the same parameters and floors
  // the numeric grades assert.
  // ------------------------------------------------------------------
  import graft.ops.{DedupOps, SimilarityOps}

  // ------------------------------------------------------------------
  // accuracy BANDS (round 14): each frame carries an integer band column
  // beside its verdict boolean — 2 = accuracy at or above the WATCH
  // threshold, 1 = between watch and the grade floor, 0 = below floor.
  // The oracle replays the literal 2, so accuracy drifting from its
  // current value toward the floor flips the band 2 → 1 and becomes a
  // driver-visible hash mismatch BEFORE the grade floor fails. Watch
  // thresholds are set from measured headroom at ALL THREE grading SFs
  // (sf0.001 / 0.01 / 0.1, 2026-08-16 probe — values cited per constant)
  // with at least one quantization step of margin, so box noise can't
  // flip them; only a real accuracy regression (or a regenerated corpus,
  // which re-measures everything) can.
  // ------------------------------------------------------------------

  /** 2 / 1 / 0 accuracy band of `acc` against (watch, floor). */
  def accuracyBand(acc: org.apache.spark.sql.Column, watch: Double, floor: Double) =
    when(acc >= watch - 1e-9, lit(2))
      .when(acc >= floor - 1e-9, lit(1))
      .otherwise(lit(0))

  /** 2 / 1 / 0 ERROR band: 2 below the watch tolerance, 1 below the grade
    * tolerance (both column-valued so callers can mix rel/abs slack).
    */
  def errorBand(
      err: org.apache.spark.sql.Column,
      watchTol: org.apache.spark.sql.Column,
      tol: org.apache.spark.sql.Column) =
    when(err <= watchTol + lit(1e-9), lit(2))
      .when(err <= tol + lit(1e-9), lit(1))
      .otherwise(lit(0))

  /** Exact token-Jaccard τ=0.8 pairs — MinHash's exact twin (the shared
    * mine-once pair cache the graded dedup family derives from).
    */
  def exactJaccardPairs(docs: DataFrame): DataFrame =
    DedupOps.ngramJaccardCached(docs, threshold = 0.8)
  def minhashPairs(docs: DataFrame): DataFrame =
    DedupOps.minhashLshAuto(docs, threshold = 0.8)
  val MinhashRecallFloor = 0.85
  /** measured recall 0.8916 / 0.8970 / 0.8974 across the three SFs. */
  val MinhashRecallWatch = 0.87

  /** Exact windowed cosine twin (vec_id < 300, cos ≥ 0.4) and the SRP-LSH
    * miner it grades (threshold 0.3 — a margin below the graded 0.4).
    */
  val EmbeddingExactMaxId = 300L
  def embeddingExactPairs(emb: DataFrame): DataFrame =
    DedupOps.cosineNearDupExact(emb, maxId = EmbeddingExactMaxId, threshold = 0.4)
  def embeddingLshPairs(emb: DataFrame): DataFrame =
    DedupOps.cosineLshPairsAuto(emb, threshold = 0.3)
  val EmbeddingLshRecallFloor = 0.85
  /** measured 0.9167 / 1.0 / 0.9583 (22/24, 19/19, 23/24); the exact twin
    * is a ~24-pair set, so the watch sits STRICTLY above the
    * one-pair-lost value (21/24 = 0.875) and below the lowest measured
    * value: losing ONE MORE pair at the smallest twin lands at 0.875 <
    * 0.88 and flips the band while the 0.85 grade floor still holds.
    * (0.875 itself would NOT flip — accuracyBand uses >= watch - 1e-9.)
    */
  val EmbeddingLshRecallWatch = 0.88

  /** ANN top-k raw searches, all at k = 10 over query vec_id 0 (single)
    * or the 0..7 batch — parameters identical to the graded queries.
    */
  def lshTopK(emb: DataFrame): DataFrame =
    SimilarityOps.lshTopK(emb, queryId = 0, k = 10, nBits = 4)
  val LshTopKFloor = 0.8
  /** measured overlap@10 0.9 at all three SFs; watch 0.85 flips the band
    * at the first lost neighbor (0.9 → 0.8) while the floor still holds. */
  val LshTopKWatch = 0.85
  def lshTopKBanded(emb: DataFrame): DataFrame = {
    val (bands, bits) = DedupOps.autoBandConfig(emb, threshold = 0.3, targetRecall = 0.95)
    SimilarityOps.lshTopKBanded(emb, queryId = 0, k = 10, bands, bits)
  }
  val LshTopKBandedFloor = 0.8
  /** measured 0.9 / 1.0 / 0.9. */
  val LshTopKBandedWatch = 0.85
  def ivfTopK(emb: DataFrame): DataFrame =
    SimilarityOps.ivfTopK(emb, queryId = 0, k = 10)
  val IvfTopKFloor = 0.85
  /** measured 0.9 / 0.9 / 1.0 (floor 0.85 is already one step below). */
  val IvfTopKWatch = 0.87
  def pqTopK(emb: DataFrame): DataFrame =
    SimilarityOps.pqTopK(emb, queryId = 0, k = 10)
  val PqTopKFloor = 0.7
  /** measured 1.0 / 1.0 / 0.9 — the widest floor gap of the family; the
    * watch makes a slide to 0.8 visible two steps before the floor. */
  val PqTopKWatch = 0.85
  def ivfBatchTopK(emb: DataFrame): DataFrame =
    SimilarityOps.ivfBatchTopK(emb, 0L to 7L, k = 10)
  val IvfBatchPerQueryFloor = 0.6
  /** measured per-query min 0.7 at all three SFs. */
  val IvfBatchPerQueryWatch = 0.65
  val IvfBatchMeanFloor = 0.85
  /** measured mean 0.9125 / 0.9375 / 0.9125. */
  val IvfBatchMeanWatch = 0.89
  def pqBatchTopK(emb: DataFrame): DataFrame =
    SimilarityOps.pqBatchTopK(emb, 0L to 7L, k = 10, rerank = 64)
  val PqBatchPerQueryFloor = 0.5
  /** measured per-query min 0.7 at all three SFs. */
  val PqBatchPerQueryWatch = 0.65
  val PqBatchMeanFloor = 0.7
  /** measured mean 1.0 / 1.0 / 0.925. */
  val PqBatchMeanWatch = 0.85

  /** Sketch error tolerances (verdict booleans AND numeric grades). */
  val ApproxDistinctRelTol = 0.05 // rsd 0.01 with 5σ headroom
  /** watch at 3σ of the configured rsd (measured max rel err 0.0067).
    * 3σ, not 2σ: HLL's relative error redraws when the corpus
    * regenerates, and at 2σ the ~5% per-estimator tail makes a spurious
    * band flip across the frame's estimators more likely than the drift
    * it guards against; at 3σ that chance is ~0.3% per estimator while
    * the 5σ grade floor still sits a full band above.
    */
  val ApproxDistinctWatchTol = 0.03
  val HllMergeRelTol = 0.04 // lgK=14 ⇒ rse ≈ 0.8%; 5σ
  val HllMergeAbsFloor = 3.0 // small-count floor
  /** watch at ~3σ of lgK=14's rse ≈ 0.8% (measured max rel err 0.0089)
    * — same regen-redraw reasoning as ApproxDistinctWatchTol, times the
    * five per-region estimators in this frame. */
  val HllMergeWatchTol = 0.025
  val HllMergeWatchAbs = 2.0
  val CmsEps = 0.001 // CMS width parameter ⇒ over-estimate ≤ ⌈ε·N⌉
  /** CMS watch: over-estimate ≤ 1 count regardless of N. Measured max
    * over-estimate is 0 at all three SFs — with ≤5 segment keys in 2000
    * counters, an inflated depth-5 MINIMUM needs a collision in every
    * row, which is structural, not corpus luck. Grade slack stays the
    * format's ⌈ε·N⌉ (15 at sf0.1), so the band flips long before it.
    */
  val CmsWatchSlack = 1L
  /** Deflate watch bounds (grade bound = the zlib format worst case):
    * docs ≥ 256 bytes must compress to ≤ 0.8× (natural text measures
    * ≤ 0.57 at all three SFs); shorter docs get the true single-block
    * worst case, 2 (header) + 4 (Adler32) + 5 (stored-block framing)
    * = 11 bytes of excess (measured max 6).
    */
  val DeflateBigDocBytes = 256L
  val DeflateBigDocRatioWatch = 0.8
  val DeflateSmallDocExcessWatch = 11L

  // ------------------------------------------------------------------
  // raw approximate frames
  // ------------------------------------------------------------------

  /** Raw HLL estimates (rsd 0.01) over lineitem: one row
    * `(approx_parts, approx_orders)`. The 100 TB path for COUNT(DISTINCT):
    * fixed-size mergeable registers instead of a distinct shuffle.
    */
  def approxDistinct(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem").agg(
      approx_count_distinct(col("l_partkey"), 0.01).as("approx_parts"),
      approx_count_distinct(col("l_orderkey"), 0.01).as("approx_orders"))

  /** Raw two-level sketch rollup — the property that makes sketches the
    * 100 TB rollup currency: per-nation Datasketches HLL sketches of
    * distinct customers merge LOSSLESSLY to region grain via
    * hll_union_agg, with no second scan of the fact data. Returns
    * `(n_regionkey, approx_customers)`.
    */
  def hllMergeByRegion(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer")
    val n = broadcast(t(s, dir, "nation"))
    c.join(n, c("c_nationkey") === n("n_nationkey"))
      .groupBy(col("n_regionkey"), col("n_nationkey"))
      .agg(expr("hll_sketch_agg(c_custkey, 14)").as("sk"))
      .groupBy(col("n_regionkey"))
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk))").as("approx_customers"))
  }

  /** Raw Count-Min probes: per-nation CMS of the market-segment stream
    * (one pass, mergeable partial aggs, fixed seed 42 ⇒ deterministic),
    * probed for every distinct segment via a broadcast of the tiny
    * segment list. Returns `(c_nationkey, seg, est_n)`.
    */
  def cmsEstimates(s: SparkSession, dir: String): DataFrame = {
    val est = udf((b: Array[Byte], key: String) =>
      org.apache.spark.util.sketch.CountMinSketch
        .readFrom(new java.io.ByteArrayInputStream(b)).estimateCount(key))
    val c = t(s, dir, "customer")
    val sk = c.groupBy(col("c_nationkey"))
      .agg(expr(s"count_min_sketch(c_mktsegment, ${CmsEps}d, 0.99d, 42)").as("sk"))
    val segs = c.select(col("c_mktsegment").as("seg")).distinct()
    sk.crossJoin(broadcast(segs))
      .select(col("c_nationkey"), col("seg"), est(col("sk"), col("seg")).as("est_n"))
  }

  /** Raw mergeable-quantile-sketch percentiles (accuracy = 1000 ⇒
    * guaranteed rank error ≤ n/1000 per group; bounded memory at any
    * group cardinality, map-side combinable). Returns
    * `(l_returnflag, p25, p50, p75, n)`.
    */
  def approxPercentile(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        expr("approx_percentile(l_extendedprice, 0.25, 1000)").as("p25"),
        expr("approx_percentile(l_extendedprice, 0.5, 1000)").as("p50"),
        expr("approx_percentile(l_extendedprice, 0.75, 1000)").as("p75"),
        count(lit(1)).as("n"))

  /** Raw DEFLATE-ratio quality signal (the Gopher/RefinedWeb filter:
    * highly compressible text ⇒ boilerplate/repetition, ratio near 1 ⇒
    * noise): DEFLATE at fixed level 6 per document inside a scalar UDF —
    * a justified UDF, the byte-level LZ77 loop has no Catalyst
    * expression — pure map-side, no shuffle beyond the final sort.
    * Returns `(doc_id, n_chars, n_bytes, n_deflate, deflate_ratio,
    * is_repetitive)`.
    */
  def deflateRatio(docs: DataFrame): DataFrame = {
    val deflated = udf { (text: String) =>
      val bytes = text.getBytes("UTF-8")
      val d = new java.util.zip.Deflater(6, false)
      d.setInput(bytes); d.finish()
      val buf = new Array[Byte](64)
      var n = 0L
      while (!d.finished()) n += d.deflate(buf)
      d.end()
      n
    }
    docs.select(col("doc_id"),
        length(col("text")).as("n_chars"),
        octet_length(col("text")).cast("long").as("n_bytes"),
        deflated(col("text")).as("n_deflate"))
      .withColumn("deflate_ratio",
        round(col("n_deflate") / greatest(col("n_bytes"), lit(1L)), 4))
      .withColumn("is_repetitive", col("deflate_ratio") < 0.25)
  }

  // ------------------------------------------------------------------
  // verdict-frame builders
  // ------------------------------------------------------------------

  /** One-row recall verdict for a pair-mining approximation: the exact
    * twin's pair count (DuckDB-replayable) plus
    * `recall_ok = |exact ∩ approx| / |exact| >= floor` and the 2/1/0
    * `recall_band` against (watch, floor). One pass over the exact frame
    * (left join against the deduped approx pairs, then a single global
    * agg — counters only, no pair rows shuffled twice).
    */
  def pairRecallVerdict(
      exact: DataFrame,
      approx: DataFrame,
      floor: Double,
      watch: Double): DataFrame =
    exact.select("id_a", "id_b")
      .join(
        approx.select("id_a", "id_b").distinct().withColumn("hit", lit(1)),
        Seq("id_a", "id_b"), "left")
      .agg(
        count(lit(1)).as("exact_pairs"),
        sum(coalesce(col("hit"), lit(0))).as("recovered"))
      .select(col("exact_pairs"),
        // empty exact set ⇒ sum() is NULL ⇒ the comparison is NULL, not
        // true — coalesce to the vacuous-recall verdict (0/0 = recalled)
        coalesce(
          col("recovered").cast("double") >=
            col("exact_pairs").cast("double") * floor - 1e-9,
          lit(true)).as("recall_ok"),
        when(col("exact_pairs") === 0L, lit(2)).otherwise(
          accuracyBand(
            col("recovered").cast("double") / col("exact_pairs"),
            watch, floor)).as("recall_band"))

  /** Per-query overlap@k verdict for an ANN top-k approximation against
    * its exact twin. Both frames carry `(q_id, vec_id)`; the exact frame
    * also carries `cosine` (already limited to its top k rows per query).
    * Emits one row per query: the exact top-1 neighbor (replayable — the
    * exact twins are themselves oracle-exact queries),
    * `overlap_ok = |exact ∩ approx| / k >= floor`, and the 2/1/0
    * `overlap_band` against (watch, floor); with `meanFloor` set, also
    * the batch-level `mean_ok` (mean per-query overlap >= meanFloor) and
    * `mean_band` as constant columns, mirroring RecallSpec's batch grade.
    */
  def topKVerdict(
      exact: DataFrame,
      approx: DataFrame,
      floor: Double,
      watch: Double,
      meanFloor: Option[Double] = None,
      meanWatch: Option[Double] = None): DataFrame = {
    val perQ = exact.select("q_id", "vec_id", "cosine")
      .join(
        approx.select("q_id", "vec_id").distinct().withColumn("hit", lit(1)),
        Seq("q_id", "vec_id"), "left")
      .groupBy(col("q_id"))
      .agg(
        count(lit(1)).as("exact_k"),
        sum(coalesce(col("hit"), lit(0))).as("recovered"),
        // argmax by (cosine desc, vec_id asc) as an associative min(struct)
        min(struct((-col("cosine")).as("nc"), col("vec_id").as("v"))).as("b"))
      .select(col("q_id"), col("exact_k"), col("recovered"),
        col("b.v").as("exact_top1"))
    val overlap = col("recovered").cast("double") / col("exact_k")
    def withOk(df: DataFrame) = df
      .withColumn("overlap_ok",
        col("recovered").cast("double") >=
          col("exact_k").cast("double") * floor - 1e-9)
      .withColumn("overlap_band", accuracyBand(overlap, watch, floor))
    meanFloor match {
      case None =>
        withOk(perQ)
          .select("q_id", "exact_top1", "overlap_ok", "overlap_band")
          .orderBy("q_id")
      case Some(mf) =>
        // The batch mean reads the SAME bounded per-query frame as the
        // final select — as a global window, not a crossJoin of a
        // re-computed aggregate, so the exact⋈approx subtree executes
        // exactly once per graded run. A single-partition window is the
        // documented anti-pattern for data-scale frames; here the frame
        // is one row per BATCH QUERY (≤ 8 by construction), so the
        // unpartitioned window is a bounded driver-free reduction.
        val mw = meanWatch.getOrElse(mf)
        val allRows = org.apache.spark.sql.expressions.Window
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
            org.apache.spark.sql.expressions.Window.unboundedFollowing)
        withOk(perQ)
          .withColumn("mean_overlap",
            avg(col("recovered").cast("double") / col("exact_k")).over(allRows))
          .select(col("q_id"), col("exact_top1"), col("overlap_ok"),
            col("overlap_band"),
            (col("mean_overlap") >= mf - 1e-9).as("mean_ok"),
            accuracyBand(col("mean_overlap"), mw, mf).as("mean_band"))
          .orderBy("q_id")
    }
  }
}
