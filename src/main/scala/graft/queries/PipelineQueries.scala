package graft.queries

import graft.ops.{DedupOps, GraphOps, MultimodalOps, SimilarityOps, TextOps}

/** Training-data pipeline operators as graded queries: dedup family,
  * similarity search, text analysis, multimodal plumbing. Probabilistic /
  * engine-hash-based operators (MinHash-LSH, SRP buckets, IVF/PQ) run in
  * full and grade as deterministic VERDICT FRAMES (see [[Approx]]): the
  * exact twin's replayable values + boolean "recall/overlap ≥ floor"
  * verdicts computed in-engine, which DuckDB replays as exact values +
  * literal TRUE — so every query here is hash-checked by the driver.
  */
object PipelineQueries {

  private val docs = (s: org.apache.spark.sql.SparkSession, dir: String) =>
    Tables.read(s, dir, "documents")
  private val emb = (s: org.apache.spark.sql.SparkSession, dir: String) =>
    Tables.read(s, dir, "embeddings")

  /** Exact bounded-heap top-10 twins for the ANN verdict frames — the
    * same computation the oracle-exact similarity_topk /
    * similarity_batch_topk queries grade directly.
    */
  private def exactSingleTopK(s: org.apache.spark.sql.SparkSession, dir: String) =
    SimilarityOps.batchTopK(emb(s, dir), Seq(0L), k = 10)
  private def exactBatchTopK(s: org.apache.spark.sql.SparkSession, dir: String) =
    SimilarityOps.batchTopK(emb(s, dir), 0L to 7L, k = 10)

  /** DuckDB side of the single-query ANN verdicts: exact top-1 of the
    * brute-force cosine top-10 for vec_id 0 (same rounding/tiebreak as
    * the similarity_topk oracle) + literal TRUE for the verdict bit.
    */
  private val singleTopkVerdictOracle = """
        WITH q AS (
          SELECT unnest(embedding) AS qx,
                 generate_subscripts(embedding, 1) AS i
          FROM embeddings WHERE vec_id = 0),
        v AS (
          SELECT vec_id, unnest(embedding) AS vx,
                 generate_subscripts(embedding, 1) AS i
          FROM embeddings WHERE vec_id <> 0),
        d AS (
          SELECT v.vec_id,
                 sum(CAST(v.vx AS DOUBLE) * CAST(q.qx AS DOUBLE)) AS dot,
                 sum(CAST(v.vx AS DOUBLE) * CAST(v.vx AS DOUBLE)) AS vn2
          FROM v JOIN q USING (i) GROUP BY v.vec_id),
        qn AS (SELECT sum(CAST(qx AS DOUBLE) * CAST(qx AS DOUBLE)) AS qn2 FROM q),
        top AS (
          SELECT d.vec_id,
                 floor(dot / (sqrt(vn2) * sqrt(qn2)) * 10000 + 0.5) / 10000 AS cosine
          FROM d, qn ORDER BY cosine DESC, vec_id LIMIT 10)
        SELECT CAST(0 AS BIGINT) AS q_id,
               (SELECT vec_id FROM top ORDER BY cosine DESC, vec_id LIMIT 1)
                 AS exact_top1,
               TRUE AS overlap_ok, 2 AS overlap_band"""

  /** DuckDB side of the batched ANN verdicts: per-query exact top-1 of
    * the 8-query brute-force batch (same shape as the
    * similarity_batch_topk oracle) + literal TRUE verdict bits.
    */
  private val batchTopkVerdictOracle = """
        WITH qv AS (
          SELECT vec_id AS q_id, unnest(embedding) AS qx,
                 generate_subscripts(embedding, 1) AS i
          FROM embeddings WHERE vec_id < 8),
        v AS (
          SELECT vec_id, unnest(embedding) AS vx,
                 generate_subscripts(embedding, 1) AS i
          FROM embeddings),
        n AS (SELECT vec_id, sum(CAST(vx AS DOUBLE) * CAST(vx AS DOUBLE)) AS n2
              FROM v GROUP BY vec_id),
        d AS (
          SELECT qv.q_id, v.vec_id,
                 sum(CAST(v.vx AS DOUBLE) * CAST(qv.qx AS DOUBLE)) AS dot
          FROM v JOIN qv USING (i) WHERE v.vec_id <> qv.q_id
          GROUP BY 1, 2),
        s AS (
          SELECT q_id, d.vec_id,
                 floor(dot / (sqrt(nq.n2) * sqrt(nv.n2)) * 10000 + 0.5) / 10000
                   AS cosine
          FROM d JOIN n nq ON nq.vec_id = d.q_id
                 JOIN n nv ON nv.vec_id = d.vec_id),
        r AS (SELECT *, row_number() OVER (PARTITION BY q_id
                ORDER BY cosine DESC, vec_id) AS rn FROM s)
        SELECT q_id, vec_id AS exact_top1, TRUE AS overlap_ok,
               2 AS overlap_band, TRUE AS mean_ok, 2 AS mean_band
        FROM r WHERE rn = 1 ORDER BY q_id"""

  /** The exact token-Jaccard oracle CTEs, defined ONCE and parameterized
    * (round-13 cleanup of seven hand-synchronized copies): [[tokSharedCte]]
    * = token sets + set sizes + ordered-pair intersection counts;
    * [[pairsAt]] adds the thresholded pair list under a chosen CTE name —
    * a tokenization-convention change now edits ONE string.
    */
  private val tokSizesCte = """toks AS (
          SELECT doc_id, unnest(list_distinct(list_filter(
            string_split_regex(lower(text), '\s+'), t -> t <> ''))) AS tok
          FROM documents),
        sizes AS (SELECT doc_id, count(*) AS sz FROM toks GROUP BY doc_id)"""

  private val tokSharedCte = tokSizesCte + """,
        shared AS (
          SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
          FROM toks a JOIN toks b USING (tok)
          WHERE a.doc_id < b.doc_id GROUP BY 1, 2)"""

  private def pairsAt(threshold: Double, name: String = "pairs"): String =
    tokSharedCte + s""",
        $name AS (
          SELECT id_a, id_b FROM shared
          JOIN sizes sa ON sa.doc_id = id_a
          JOIN sizes sb ON sb.doc_id = id_b
          WHERE CAST(inter AS DOUBLE) / (sa.sz + sb.sz - inter) >= $threshold)"""

  /** Exact token-Jaccard >= 0.95 pairs (toks → sizes → shared → pairs) —
    * the cluster-family oracle base.
    */
  private val pairCte = pairsAt(0.95)

  def queries: Seq[QueryDef] = Seq(
    // ------------------------------------------------------------- dedup
    QueryDef(
      "dedup_ngram_jaccard",
      // Through the pair cache: this τ=0.8 list is the loosest mined
      // artifact, so dedup_incremental (τ=0.9 A×B) and the τ=0.95 cluster
      // family all derive from it instead of re-mining the corpus.
      (s, dir) => DedupOps.ngramJaccardCached(docs(s, dir), threshold = 0.8),
      Some(s"""
        WITH $tokSharedCte
        SELECT id_a, id_b,
               floor((CAST(inter AS DOUBLE) / (sa.sz + sb.sz - inter)) * 10000 + 0.5) / 10000 AS jaccard
        FROM shared
        JOIN sizes sa ON sa.doc_id = id_a
        JOIN sizes sb ON sb.doc_id = id_b
        WHERE CAST(inter AS DOUBLE) / (sa.sz + sb.sz - inter) >= 0.8
        ORDER BY id_a, id_b""")
    ),
    QueryDef(
      "dedup_clusters",
      // Near-dup clustering: exact Jaccard >= 0.95 pairs -> connected
      // components (min-label propagation) -> per-doc component label.
      (s, dir) => GraphOps.dedupClusters(docs(s, dir), threshold = 0.95),
      Some(s"""
        WITH RECURSIVE $pairCte,
        e2 AS (SELECT id_a AS a, id_b AS b FROM pairs
               UNION ALL SELECT id_b, id_a FROM pairs),
        walk(node, label) AS (
          SELECT doc_id, doc_id FROM documents
          UNION
          SELECT e2.b, walk.label FROM walk JOIN e2 ON e2.a = walk.node)
        SELECT node AS doc_id, min(label) AS component
        FROM walk GROUP BY node ORDER BY doc_id""")
    ),
    QueryDef(
      "dedup_keep_best",
      // Canonicalization: keep one representative per near-dup cluster
      // (longest text, doc_id tiebreak) — the step that turns pair mining
      // into an actual deduplicated corpus.
      (s, dir) => GraphOps.dedupKeepBest(docs(s, dir), threshold = 0.95),
      Some(s"""
        WITH RECURSIVE $pairCte,
        e2 AS (SELECT id_a AS a, id_b AS b FROM pairs
               UNION ALL SELECT id_b, id_a FROM pairs),
        walk(node, label) AS (
          SELECT doc_id, doc_id FROM documents
          UNION
          SELECT e2.b, walk.label FROM walk JOIN e2 ON e2.a = walk.node),
        comp AS (
          SELECT node AS doc_id, min(label) AS component
          FROM walk GROUP BY node),
        r AS (
          SELECT c.component, d.doc_id, d.n_chars,
                 row_number() OVER (PARTITION BY c.component
                   ORDER BY d.n_chars DESC, d.doc_id) AS rn,
                 count(*) OVER (PARTITION BY c.component) AS n_docs
          FROM comp c JOIN documents d USING (doc_id))
        SELECT component, n_docs, doc_id AS kept_doc, n_chars AS kept_chars
        FROM r WHERE rn = 1 ORDER BY component""")
    ),
    QueryDef(
      "dedup_minhash_lsh",
      // Band/row split fit per corpus by DedupOps.autoMinHashConfig from a
      // sampled boundary-similarity distribution (recall >= 0.85 modeled
      // against BOTH miss sources: banding and the k-component estimate
      // filter); candidates stay an ids-only band equi-join. Verdict
      // frame: the full LSH mining runs in-engine and is graded against
      // the exact-Jaccard twin (the τ=0.8 pair cache dedup_ngram_jaccard
      // also serves) — emits the exact pair count (replayable) +
      // recall ≥ 0.85, the same floor RecallSpec asserts numerically.
      (s, dir) => {
        val d = docs(s, dir)
        Approx.pairRecallVerdict(
          Approx.exactJaccardPairs(d), Approx.minhashPairs(d),
          floor = Approx.MinhashRecallFloor,
          watch = Approx.MinhashRecallWatch)
      },
      Some(s"""
        WITH ${pairsAt(0.8)}
        SELECT count(*) AS exact_pairs, TRUE AS recall_ok,
               2 AS recall_band FROM pairs""")
    ),
    QueryDef(
      "dedup_decontaminate",
      // Containment-based eval-set decontamination: every 10th doc plays
      // the benchmark side, the rest the training corpus; emit each
      // contaminated eval doc's best train match at C(A,B) ≥ 0.9. Jaccard
      // can't grade this — a question fully embedded in a much larger
      // train doc has low J but C = 1. Output is argmax-per-eval-doc, so
      // it stays |eval|-bounded even on this containment-dense corpus
      // (36% of ordered pairs clear τ=0.9 here).
      (s, dir) => {
        import org.apache.spark.sql.functions.col
        DedupOps.containmentBest(docs(s, dir),
          col("doc_id") % 10 === 0, col("doc_id") % 10 =!= 0, threshold = 0.9)
      },
      Some(s"""
        WITH $tokSizesCte,
        shared AS (
          SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
          FROM toks a JOIN toks b USING (tok)
          WHERE a.doc_id % 10 = 0 AND b.doc_id % 10 <> 0 GROUP BY 1, 2),
        ranked AS (
          SELECT id_a, id_b, inter,
                 row_number() OVER (PARTITION BY id_a
                   ORDER BY inter DESC, id_b) AS rn
          FROM shared)
        SELECT id_a AS eval_doc, id_b AS matched_doc,
               floor(CAST(inter AS DOUBLE) / sa.sz * 10000 + 0.5) / 10000 AS containment
        FROM ranked JOIN sizes sa ON sa.doc_id = id_a
        WHERE rn = 1 AND CAST(inter AS DOUBLE) / sa.sz >= 0.9
        ORDER BY eval_doc""")
    ),
    QueryDef(
      "dedup_incremental",
      // Incoming batch (odd doc_ids) checked against the existing corpus
      // (even doc_ids): the A×B similarity join every incremental ingest
      // and eval-decontamination pass runs. Exact Jaccard >= 0.9. Priming
      // the τ=0.8 pair cache first makes this a derive (membership filter
      // + exact re-verify of the cached list) rather than a re-mine —
      // whichever of the miner family runs first pays the one mining pass.
      (s, dir) => {
        import org.apache.spark.sql.functions.col
        DedupOps.ngramJaccardCachedUnsorted(docs(s, dir), threshold = 0.8)
        DedupOps.ngramJaccardSplit(docs(s, dir),
          col("doc_id") % 2 === 1, col("doc_id") % 2 === 0,
          threshold = 0.9)
      },
      Some(s"""
        WITH $tokSizesCte,
        shared AS (
          SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
          FROM toks a JOIN toks b USING (tok)
          WHERE a.doc_id % 2 = 1 AND b.doc_id % 2 = 0 GROUP BY 1, 2)
        SELECT id_a, id_b,
               floor((CAST(inter AS DOUBLE) / (sa.sz + sb.sz - inter)) * 10000 + 0.5) / 10000 AS jaccard
        FROM shared
        JOIN sizes sa ON sa.doc_id = id_a
        JOIN sizes sb ON sb.doc_id = id_b
        WHERE CAST(inter AS DOUBLE) / (sa.sz + sb.sz - inter) >= 0.9
        ORDER BY id_a, id_b""")
    ),
    QueryDef(
      "dedup_simhash",
      // Exact SQL oracle: the token hash is md5-lower64 (DuckDB's
      // md5_number_lower — see SimHash64), so the oracle rebuilds every
      // signature bit-for-bit and brute-forces Hamming<=3; the 4x16-bit
      // banding is pigeonhole-exact for d<=3, so banded == brute force.
      (s, dir) => DedupOps.simhashPairs(docs(s, dir), maxHamming = 3),
      Some("""
        WITH tok AS (
          SELECT DISTINCT doc_id, t
          FROM (SELECT doc_id,
                       unnest(regexp_split_to_array(lower(text), '\s+')) AS t
                FROM documents)
          WHERE t <> ''),
        h AS (SELECT doc_id, md5_number_lower(t) AS h FROM tok),
        bits AS (
          SELECT doc_id, r.b AS b,
                 sum(CASE WHEN (h >> r.b) & 1 = 1 THEN 1 ELSE -1 END) AS c
          FROM h, range(0, 64) AS r(b)
          GROUP BY 1, 2),
        sig AS (
          SELECT doc_id,
                 CAST(sum(CASE WHEN c > 0 THEN CAST(1 AS UBIGINT) << b
                          ELSE CAST(0 AS UBIGINT) END) AS UBIGINT) AS sh
          FROM bits GROUP BY 1)
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               CAST(bit_count(xor(a.sh, b.sh)) AS INT) AS hamming
        FROM sig a JOIN sig b ON a.doc_id < b.doc_id
        WHERE bit_count(xor(a.sh, b.sh)) <= 3
        ORDER BY id_a, id_b""")
    ),
    QueryDef(
      "dedup_embedding_cosine",
      (s, dir) => DedupOps.cosineNearDupExact(emb(s, dir), maxId = 300, threshold = 0.4),
      Some("""
        WITH e AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 300),
        v AS (SELECT vec_id, unnest(embedding) AS vx,
                     generate_subscripts(embedding, 1) AS i FROM e),
        n AS (SELECT vec_id, sum(CAST(vx AS DOUBLE) * CAST(vx AS DOUBLE)) AS n2
              FROM v GROUP BY vec_id),
        p AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                     sum(CAST(a.vx AS DOUBLE) * CAST(b.vx AS DOUBLE)) AS dot
              FROM v a JOIN v b USING (i) WHERE a.vec_id < b.vec_id
              GROUP BY 1, 2)
        SELECT id_a, id_b,
               floor((dot / (sqrt(na.n2) * sqrt(nb.n2))) * 10000 + 0.5) / 10000 AS cosine
        FROM p JOIN n na ON na.vec_id = id_a JOIN n nb ON nb.vec_id = id_b
        WHERE dot / (sqrt(na.n2) * sqrt(nb.n2)) >= 0.4
        ORDER BY id_a, id_b""")
    ),
    QueryDef(
      "dedup_semantic_clusters",
      // Embedding-side canonicalization: exact cosine pairs (the graded
      // windowed baseline) -> connected components -> per-vector cluster
      // label. The scale path swaps cosineLshPairsAuto in for the exact
      // miner; the CC iteration is identical either way.
      (s, dir) => {
        import org.apache.spark.sql.functions.col
        val pairs = DedupOps
          .cosineNearDupExact(emb(s, dir), maxId = 300, threshold = 0.4)
          .select(col("id_a").as("src"), col("id_b").as("dst"))
        val verts = emb(s, dir).filter(col("vec_id") < 300)
          .select(col("vec_id").as("id"))
        // |V| is statically bounded by the id window — skip the regime
        // probe count (one fewer serial driver-blocking job).
        GraphOps.connectedComponents(verts, pairs, sizeHint = Some(300L))
          .select(col("id").as("vec_id"), col("label").as("component"))
          .orderBy("vec_id")
      },
      Some("""
        WITH RECURSIVE e AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 300),
        v AS (SELECT vec_id, unnest(embedding) AS vx,
                     generate_subscripts(embedding, 1) AS i FROM e),
        n AS (SELECT vec_id, sum(CAST(vx AS DOUBLE) * CAST(vx AS DOUBLE)) AS n2
              FROM v GROUP BY vec_id),
        p AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                     sum(CAST(a.vx AS DOUBLE) * CAST(b.vx AS DOUBLE)) AS dot
              FROM v a JOIN v b USING (i) WHERE a.vec_id < b.vec_id
              GROUP BY 1, 2),
        pairs AS (
          SELECT id_a, id_b FROM p
          JOIN n na ON na.vec_id = id_a JOIN n nb ON nb.vec_id = id_b
          WHERE dot / (sqrt(na.n2) * sqrt(nb.n2)) >= 0.4),
        e2 AS (SELECT id_a AS a, id_b AS b FROM pairs
               UNION ALL SELECT id_b, id_a FROM pairs),
        walk(node, label) AS (
          SELECT vec_id, vec_id FROM e
          UNION
          SELECT e2.b, walk.label FROM walk JOIN e2 ON e2.a = walk.node)
        SELECT node AS vec_id, min(label) AS component
        FROM walk GROUP BY node ORDER BY vec_id""")
    ),
    QueryDef(
      "dedup_embedding_lsh",
      // Band configuration fit by DedupOps.autoBandConfig from a sampled
      // similarity histogram (replaces the hand-picked 16×6 of earlier
      // rounds): bits from corpus size (bucket-population control), bands
      // from the SRP recall identity at the sampled mean agreement of
      // above-threshold pairs. Verdict frame: SRP-LSH mining runs
      // in-engine (threshold 0.3 — a margin below the graded 0.4) and is
      // graded inside the exact twin's id window (vec_id < 300, the
      // dedup_embedding_cosine baseline): exact cos ≥ 0.4 pair count
      // (replayable) + recall ≥ 0.85, RecallSpec's floor (measured 0.92 /
      // 1.00 at sf0.001 / sf0.01).
      (s, dir) => {
        import org.apache.spark.sql.functions.col
        Approx.pairRecallVerdict(
          Approx.embeddingExactPairs(emb(s, dir)),
          Approx.embeddingLshPairs(emb(s, dir))
            .filter(col("id_a") < Approx.EmbeddingExactMaxId &&
              col("id_b") < Approx.EmbeddingExactMaxId),
          floor = Approx.EmbeddingLshRecallFloor,
          watch = Approx.EmbeddingLshRecallWatch)
      },
      Some("""
        WITH e AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 300),
        v AS (SELECT vec_id, unnest(embedding) AS vx,
                     generate_subscripts(embedding, 1) AS i FROM e),
        n AS (SELECT vec_id, sum(CAST(vx AS DOUBLE) * CAST(vx AS DOUBLE)) AS n2
              FROM v GROUP BY vec_id),
        p AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                     sum(CAST(a.vx AS DOUBLE) * CAST(b.vx AS DOUBLE)) AS dot
              FROM v a JOIN v b USING (i) WHERE a.vec_id < b.vec_id
              GROUP BY 1, 2)
        SELECT count(*) AS exact_pairs, TRUE AS recall_ok, 2 AS recall_band
        FROM p JOIN n na ON na.vec_id = id_a JOIN n nb ON nb.vec_id = id_b
        WHERE dot / (sqrt(na.n2) * sqrt(nb.n2)) >= 0.4""")
    ),
    // -------------------------------------------------------- similarity
    //
    // All six ANN queries grade as deterministic verdict frames (round-13
    // graduation): the full approximate index + search runs in-engine, the
    // exact twin (bounded-heap brute-force top-k — itself the oracle-exact
    // similarity_topk / similarity_batch_topk shape) runs beside it, and
    // the emitted frame is per-query (exact_top1, overlap@10 ≥ floor[,
    // batch mean ≥ floor]) — DuckDB replays the exact side + literal TRUE.
    // RecallSpec / RecallReport keep the numeric overlap floors on the raw
    // approximate outputs (same floors as the booleans here).
    QueryDef(
      "similarity_lsh_topk",
      // Query-adaptive multi-probe of a single 4-bit SRP table (margin-
      // ordered probe set, Lv et al.): measured overlap@10 0.9 at
      // sf0.001/0.01/0.1; floor 0.8. Scale path is the _banded variant.
      (s, dir) =>
        Approx.topKVerdict(
          exactSingleTopK(s, dir),
          Approx.lshTopK(emb(s, dir))
            .withColumn("q_id", org.apache.spark.sql.functions.lit(0L)),
          floor = Approx.LshTopKFloor, watch = Approx.LshTopKWatch),
      Some(singleTopkVerdictOracle)
    ),
    QueryDef(
      "similarity_lsh_topk_banded",
      // L independent SRP tables (the production LSH top-k shape — recall
      // is configurable upward at any corpus size, unlike single-table
      // multi-probe above), band config fit per corpus by autoBandConfig
      // at a 0.95 per-pair recall target: measured top-10 overlap vs exact
      // 0.9 / 1.0 / 0.9 at sf0.001 / 0.01 / 0.1; floor 0.8.
      (s, dir) =>
        Approx.topKVerdict(
          exactSingleTopK(s, dir),
          Approx.lshTopKBanded(emb(s, dir))
            .withColumn("q_id", org.apache.spark.sql.functions.lit(0L)),
          floor = Approx.LshTopKBandedFloor,
          watch = Approx.LshTopKBandedWatch),
      Some(singleTopkVerdictOracle)
    ),
    QueryDef(
      "similarity_ivf_topk",
      // Inverted-file routing (centroids trained on a bounded hash-sample,
      // replication ×3, multi-probe): measured overlap@10 0.9; floor 0.85.
      (s, dir) =>
        Approx.topKVerdict(
          exactSingleTopK(s, dir),
          Approx.ivfTopK(emb(s, dir))
            .withColumn("q_id", org.apache.spark.sql.functions.lit(0L)),
          floor = Approx.IvfTopKFloor, watch = Approx.IvfTopKWatch),
      Some(singleTopkVerdictOracle)
    ),
    QueryDef(
      "similarity_ivf_batch_topk",
      // The full production serving path: a broadcast batch of 8 queries
      // routes through the IVF index in ONE cell-id equi-join (each query
      // touches only its probed cells; the corpus is assigned once), then
      // per-query exact re-rank through the bounded-heap grouped top-k.
      // Per-query floor 0.6, batch mean floor 0.85 (measured mean
      // 0.91/0.94/0.91 at sf0.001/0.01/0.1, per-query min 0.7).
      (s, dir) =>
        Approx.topKVerdict(
          exactBatchTopK(s, dir),
          Approx.ivfBatchTopK(emb(s, dir)),
          floor = Approx.IvfBatchPerQueryFloor,
          watch = Approx.IvfBatchPerQueryWatch,
          meanFloor = Some(Approx.IvfBatchMeanFloor),
          meanWatch = Some(Approx.IvfBatchMeanWatch)),
      Some(batchTopkVerdictOracle)
    ),
    QueryDef(
      "similarity_pq_topk",
      // Product-quantization ADC scan (codes instead of vectors) + exact
      // re-rank of the top candidates — the memory-bandwidth-bound ANN
      // shape for corpora whose raw vectors don't fit the scan budget.
      // Floor 0.7 (measured 1.0 at the default rerank budget).
      (s, dir) =>
        Approx.topKVerdict(
          exactSingleTopK(s, dir),
          Approx.pqTopK(emb(s, dir))
            .withColumn("q_id", org.apache.spark.sql.functions.lit(0L)),
          floor = Approx.PqTopKFloor, watch = Approx.PqTopKWatch),
      Some(singleTopkVerdictOracle)
    ),
    QueryDef(
      "similarity_pq_batch_topk",
      // Batched PQ serving — the memory-bandwidth serving tier: one ADC
      // pass over the encoded corpus scores all 8 broadcast distance
      // tables at once (m lookups per query per row), per-query ADC
      // shortlist via the bounded-heap grouped top-k, then one exact
      // re-rank of the bounded shortlist. rerank=64 (vs the single-query
      // default 32): the shortlist is the recall knob, and doubling it
      // costs 640 bounded-heap rows per query — nothing at any scale
      // (measured sf0.1 mean overlap@10 0.76 at 32 → 0.925 at 64,
      // per-query min 0.5 → 0.7). Per-query floor 0.5, mean floor 0.7.
      (s, dir) =>
        Approx.topKVerdict(
          exactBatchTopK(s, dir),
          Approx.pqBatchTopK(emb(s, dir)),
          floor = Approx.PqBatchPerQueryFloor,
          watch = Approx.PqBatchPerQueryWatch,
          meanFloor = Some(Approx.PqBatchMeanFloor),
          meanWatch = Some(Approx.PqBatchMeanWatch)),
      Some(batchTopkVerdictOracle)
    ),
    // ------------------------------------------------------ text analysis
    QueryDef(
      "lang_id",
      (s, dir) => TextOps.langId(docs(s, dir)),
      Some {
        val langs = Seq("en", "es", "de", "fr", "zh")
        def lst(l: String) = TextOps.inListAnsi(TextOps.stopwords(l))
        val scores = langs
          .map(l => s"len(list_filter(toks, t -> t IN ${lst(l)})) AS s_$l")
          .mkString(", ")
        val cases = langs.map { l =>
          val ge = langs.filterNot(_ == l).map(o => s"s_$l >= s_$o").mkString(" AND ")
          s"WHEN $ge THEN '$l'"
        }.mkString(" ")
        s"""
        WITH t AS (
          SELECT doc_id, list_distinct(list_filter(
            string_split_regex(lower(text), '\\s+'), t -> t <> '')) AS toks
          FROM documents),
        s AS (SELECT doc_id, $scores FROM t)
        SELECT doc_id, ${langs.map(l => s"s_$l").mkString(" + ")} AS stopword_hits,
               CASE $cases ELSE 'unk' END AS pred_lang
        FROM s ORDER BY doc_id"""
      }
    ),
    QueryDef(
      "lang_id_confusion",
      // Classifier-eval confusion matrix: labeled `lang` × predicted
      // language from the stopword scorer — the calibration view a
      // curation pipeline checks before trusting the cheap classifier as
      // a filter. Reuses TextOps.langId (same scoring, same deterministic
      // tie order) + one broadcast-sized label join and a 25-cell rollup.
      (s, dir) => {
        import org.apache.spark.sql.functions.{col, count, lit}
        TextOps.langId(docs(s, dir))
          .join(docs(s, dir).select(col("doc_id"), col("lang")), "doc_id")
          .groupBy(col("lang"), col("pred_lang"))
          .agg(count(lit(1)).as("n"))
          .orderBy("lang", "pred_lang")
      },
      Some {
        val langs = Seq("en", "es", "de", "fr", "zh")
        def lst(l: String) = TextOps.inListAnsi(TextOps.stopwords(l))
        val scores = langs
          .map(l => s"len(list_filter(toks, t -> t IN ${lst(l)})) AS s_$l")
          .mkString(", ")
        val cases = langs.map { l =>
          val ge = langs.filterNot(_ == l).map(o => s"s_$l >= s_$o").mkString(" AND ")
          s"WHEN $ge THEN '$l'"
        }.mkString(" ")
        s"""
        WITH t AS (
          SELECT doc_id, lang, list_distinct(list_filter(
            string_split_regex(lower(text), '\\s+'), t -> t <> '')) AS toks
          FROM documents),
        s AS (SELECT doc_id, lang, $scores FROM t),
        p AS (SELECT lang, CASE $cases ELSE 'unk' END AS pred_lang FROM s)
        SELECT lang, pred_lang, count(*) AS n
        FROM p GROUP BY 1, 2 ORDER BY lang, pred_lang"""
      }
    ),
    QueryDef(
      "quality_score",
      (s, dir) => TextOps.qualityScore(docs(s, dir)),
      Some {
        val en = TextOps.inListAnsi(TextOps.stopwords("en"))
        s"""
        WITH t AS (
          SELECT doc_id, list_filter(
            string_split_regex(lower(text), '\\s+'), x -> x <> '') AS toks
          FROM documents)
        SELECT doc_id, len(toks) AS n_tokens,
               floor((CAST(length(regexp_replace(list_aggregate(toks, 'string_agg', ' '), '[A-Za-z0-9 ]', '', 'g')) AS DOUBLE) /
                      greatest(length(list_aggregate(toks, 'string_agg', ' ')), 1)) * 10000 + 0.5) / 10000 AS punct_ratio,
               floor((
                 0.25 * least(CAST(len(toks) AS DOUBLE) / 100.0, 1.0) +
                 0.25 * least((CAST(length(list_aggregate(toks, 'string_agg', '')) AS DOUBLE) /
                               greatest(len(toks), 1)) / 8.0, 1.0) +
                 0.5  * (CAST(len(list_filter(toks, t -> t IN $en)) AS DOUBLE) /
                         greatest(len(toks), 1))
               ) * 10000 + 0.5) / 10000 AS quality
        FROM t ORDER BY doc_id"""
      }
    ),
    QueryDef(
      "token_counts",
      (s, dir) => TextOps.tokenCounts(docs(s, dir)),
      Some("""
        SELECT doc_id,
               len(list_filter(string_split_regex(lower(text), '\s+'), x -> x <> ''))
                 AS n_ws_tokens,
               len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]'))
                 AS n_bpe_tokens
        FROM documents ORDER BY doc_id""")
    ),
    QueryDef(
      "doc_fingerprint",
      (s, dir) => TextOps.fingerprint(docs(s, dir)),
      Some {
        val pows = Seq(27512614111L, 887503681L, 28629151L, 923521L, 29791L, 961L, 31L, 1L)
        val terms = pows.zipWithIndex
          .map { case (p, j) => s"ascii(substr(text, p + $j, 1)) * CAST($p AS BIGINT)" }
          .mkString(" + ")
        s"""
        WITH g AS (
          SELECT doc_id, unnest(list_transform(range(1, length(text) - 6),
            p -> ($terms) % 1000000007)) AS gram_hash
          FROM documents WHERE length(text) >= 8)
        SELECT doc_id, min(gram_hash) AS min_gram_hash,
               count(DISTINCT gram_hash) AS n_distinct_grams
        FROM g GROUP BY doc_id ORDER BY doc_id"""
      }
    ),
    QueryDef(
      "doc_chunking",
      // Pretraining chunker: 30-token windows, stride 20 (10-token overlap).
      (s, dir) => TextOps.chunkDocuments(docs(s, dir), windowTokens = 30, strideTokens = 20),
      Some("""
        WITH t AS (
          SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'),
                                     x -> x <> '') AS toks
          FROM documents),
        w AS (
          SELECT doc_id, unnest(list_transform(
                   range(0, greatest(CAST(ceil((len(toks) - 30) / 20.0) AS INT), 0) + 1),
                   w -> struct_pack(
                     i := w,
                     c := array_to_string(list_slice(toks, w * 20 + 1, w * 20 + 30), ' '))))
                 AS s
          FROM t)
        SELECT doc_id, s.i AS chunk_idx, s.c AS chunk,
               len(string_split(s.c, ' ')) AS chunk_tokens
        FROM w ORDER BY doc_id, chunk_idx""")
    ),
    QueryDef(
      "train_val_split",
      // Deterministic doc-level split: stable key modulo, no RNG.
      (s, dir) =>
        TextOps.deterministicSplit(docs(s, dir), "doc_id", valPct = 5, testPct = 5)
          .groupBy(org.apache.spark.sql.functions.col("split"))
          .agg(org.apache.spark.sql.functions.count(
            org.apache.spark.sql.functions.lit(1)).as("n"))
          .orderBy("split"),
      Some("""
        SELECT CASE WHEN doc_id % 100 < 5 THEN 'val'
                    WHEN doc_id % 100 < 10 THEN 'test'
                    ELSE 'train' END AS split, count(*) AS n
        FROM documents GROUP BY 1 ORDER BY split""")
    ),
    QueryDef(
      "stratified_sample",
      // Mixture knob: downsample the dominant language to 30% while other
      // strata pass at 100% — deterministic mod keying, a pure narrow
      // filter (no shuffle before the reporting aggregate).
      (s, dir) => {
        import org.apache.spark.sql.functions._
        TextOps.stratifiedSample(docs(s, dir), Map("en" -> 30), stratumCol = "lang")
          .groupBy(col("lang"))
          .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("chars"))
          .orderBy("lang")
      },
      Some("""
        SELECT lang, count(*) AS n, CAST(sum(n_chars) AS BIGINT) AS chars
        FROM documents
        WHERE doc_id % 100 < (CASE WHEN lang = 'en' THEN 30 ELSE 100 END)
        GROUP BY lang ORDER BY lang""")
    ),
    QueryDef(
      "domain_mix",
      // Uniform-target domain resampling: per-source keep thresholds
      // computed from observed counts (integer arithmetic), broadcast back
      // onto the corpus — every source contributes ≈ the smallest one.
      (s, dir) => {
        import org.apache.spark.sql.functions._
        TextOps.domainMixUniform(docs(s, dir))
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_kept"))
          .orderBy("source")
      },
      Some("""
        WITH c AS (SELECT source, count(*) AS n_src FROM documents GROUP BY source),
        m AS (SELECT min(n_src) AS n_min FROM c),
        t AS (SELECT source, (n_min * 10000) // n_src AS thr FROM c, m)
        SELECT d.source, count(*) AS n_kept
        FROM documents d JOIN t USING (source)
        WHERE d.doc_id % 10000 < t.thr
        GROUP BY d.source ORDER BY d.source""")
    ),
    QueryDef(
      "quality_weighted_mixture",
      // Quality-WEIGHTED sampling plan (the CCNet/Gopher "keep rate by
      // quality band" curation step, after domain_mix's uniform-target
      // shape): documents band into 8 fixed-width stopword-rate octiles
      // (the fluency proxy — pure integer rate, no double thresholds),
      // each band gets a linearly increasing keep rate, and the
      // deterministic doc_id-hash filter executes the plan in the same
      // pass. One narrow scan + one 8-row aggregate: the per-band rate
      // table is constant-sized at any corpus scale and the filter is
      // map-side — nothing shuffles but the 8-group rollup.
      (s, dir) => {
        import org.apache.spark.sql.functions._
        // escaped via the shared helper (quote-bearing stopword lists must
        // not be able to break out of the spliced literal)
        val en = TextOps.inList(TextOps.stopwords("en"))
        docs(s, dir)
          .select(col("doc_id"),
            expr("filter(split(lower(text), '\\\\s+'), t -> t <> '')").as("toks"))
          .select(col("doc_id"), size(col("toks")).as("n_tokens"),
            expr(s"size(filter(toks, t -> t IN $en))").as("sw"))
          .select(col("doc_id"), col("n_tokens"),
            least(expr("sw * 10000L DIV greatest(n_tokens, 1) DIV 1250"), lit(7L))
              .as("bucket"))
          .withColumn("rate_e6", expr("(bucket + 1) * 1000000L DIV 8"))
          .withColumn("kept",
            (pmod(col("doc_id"), lit(1000000L)) < col("rate_e6")).cast("int"))
          .groupBy("bucket")
          .agg(count(lit(1)).as("n_docs"),
            max(col("rate_e6")).as("rate_e6"),
            sum(col("kept")).as("n_kept"),
            sum(expr("kept * n_tokens")).as("tokens_kept"))
          .orderBy("bucket")
      },
      Some {
        val en = TextOps.inListAnsi(TextOps.stopwords("en"))
        s"""
        WITH t AS (
          SELECT doc_id, list_filter(string_split_regex(lower(text), '\\s+'),
                                     x -> x <> '') AS toks
          FROM documents),
        b AS (
          SELECT doc_id, len(toks) AS n_tokens,
                 least(len(list_filter(toks, t -> t IN $en)) * 10000
                       // greatest(len(toks), 1) // 1250, 7) AS bucket
          FROM t),
        r AS (
          SELECT *, (bucket + 1) * 1000000 // 8 AS rate_e6,
                 CASE WHEN doc_id % 1000000 < (bucket + 1) * 1000000 // 8
                      THEN 1 ELSE 0 END AS kept
          FROM b)
        SELECT CAST(bucket AS BIGINT) AS bucket, count(*) AS n_docs,
               CAST(max(rate_e6) AS BIGINT) AS rate_e6,
               CAST(sum(kept) AS BIGINT) AS n_kept,
               CAST(sum(kept * n_tokens) AS BIGINT) AS tokens_kept
        FROM r GROUP BY bucket ORDER BY bucket"""
      }
    ),
    // ------------------------------------------------- composite pipeline
    QueryDef(
      "pipeline_curation",
      (s, dir) => {
        // The algebra carrying the operators end-to-end as ONE graded
        // query: clean -> quality gate -> exact dedup on cleaned text ->
        // chunk accounting -> per-language corpus stats, composed with
        // `~>` and run as a plain function. Laziness composes: the whole
        // chain is one Catalyst plan (stages don't materialize at node
        // boundaries), so pushdown/pruning cross the `~>` seams.
        import graft.core._
        import org.apache.spark.sql.DataFrame
        import org.apache.spark.sql.functions._
        val clean: Transform[DataFrame, DataFrame] = Node { df =>
          df.select(col("doc_id"), col("lang"), col("text"),
            trim(regexp_replace(lower(col("text")), "[^a-z0-9]+", " "))
              .as("clean_text"))
        }
        val gate: Transform[DataFrame, DataFrame] = Node { df =>
          df.join(TextOps.qualityScore(df.select("doc_id", "text"))
              .select(col("doc_id"), col("quality")), "doc_id")
            .filter(col("quality") >= 0.3)
        }
        val dedup: Transform[DataFrame, DataFrame] = Node { df =>
          df.groupBy(col("clean_text"))
            .agg(min(struct(col("doc_id"), col("lang"))).as("k"))
            .select(col("k.doc_id").as("doc_id"), col("k.lang").as("lang"),
              col("clean_text"))
        }
        val chunks: Transform[DataFrame, DataFrame] = Node { df =>
          df.withColumn("n_toks",
              size(expr("filter(split(clean_text, ' '), t -> t <> '')")))
            .withColumn("n_chunks",
              greatest(ceil((col("n_toks") - 30) / 20.0).cast("int"), lit(0)) + 1)
        }
        val stats: Transform[DataFrame, DataFrame] = Node { df =>
          df.groupBy(col("lang"))
            .agg(count(lit(1)).as("n_docs"), sum(col("n_chunks")).as("total_chunks"))
            .orderBy("lang")
        }
        val pipe = clean ~> gate ~> dedup ~> chunks ~> stats
        pipe(docs(s, dir))
      },
      Some {
        val en = TextOps.inListAnsi(TextOps.stopwords("en"))
        s"""
        WITH t0 AS (
          SELECT doc_id, list_filter(
            string_split_regex(lower(text), '\\s+'), x -> x <> '') AS toks
          FROM documents),
        q AS (
          SELECT doc_id,
                 floor((
                   0.25 * least(CAST(len(toks) AS DOUBLE) / 100.0, 1.0) +
                   0.25 * least((CAST(length(list_aggregate(toks, 'string_agg', '')) AS DOUBLE) /
                                 greatest(len(toks), 1)) / 8.0, 1.0) +
                   0.5  * (CAST(len(list_filter(toks, t -> t IN $en)) AS DOUBLE) /
                           greatest(len(toks), 1))
                 ) * 10000 + 0.5) / 10000 AS quality
          FROM t0),
        c AS (
          SELECT doc_id, lang,
                 trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')) AS clean_text
          FROM documents),
        g AS (
          SELECT c.* FROM c JOIN q USING (doc_id) WHERE q.quality >= 0.3),
        d AS (
          SELECT clean_text, doc_id, lang,
                 row_number() OVER (PARTITION BY clean_text ORDER BY doc_id) AS rn
          FROM g),
        k AS (
          SELECT lang,
                 len(list_filter(string_split(clean_text, ' '), x -> x <> '')) AS n
          FROM d WHERE rn = 1)
        SELECT lang, count(*) AS n_docs,
               CAST(sum(greatest(CAST(ceil((n - 30) / 20.0) AS INT), 0) + 1) AS BIGINT)
                 AS total_chunks
        FROM k GROUP BY lang ORDER BY lang"""
      }
    ),
    QueryDef(
      "dedup_cross_source_matrix",
      // Cross-source contamination matrix — the curation report behind
      // "how much of source A duplicates source B" (web-dump overlap,
      // mirror detection, license triage). Pure DERIVE from the cached
      // τ=0.8 pair mine (mine-once/derive-many): join each pair end to
      // its source label (two broadcast-sized lookups of (doc_id,
      // source)), canonicalize the unordered source pair, count. No new
      // shuffle of the corpus — only of the pair list.
      (s, dir) => {
        import org.apache.spark.sql.functions.{col, count, least, greatest, lit}
        val src = docs(s, dir).select(col("doc_id"), col("source"))
        DedupOps.ngramJaccardCachedUnsorted(docs(s, dir), threshold = 0.8)
          .select("id_a", "id_b")
          .join(src.withColumnRenamed("doc_id", "id_a")
            .withColumnRenamed("source", "src_a"), "id_a")
          .join(src.withColumnRenamed("doc_id", "id_b")
            .withColumnRenamed("source", "src_b"), "id_b")
          .select(least(col("src_a"), col("src_b")).as("source_a"),
            greatest(col("src_a"), col("src_b")).as("source_b"))
          .groupBy("source_a", "source_b")
          .agg(count(lit(1)).as("n_pairs"))
          .orderBy("source_a", "source_b")
      },
      Some(s"""
        WITH ${pairsAt(0.8, "pairs08")}
        SELECT least(da.source, db.source) AS source_a,
               greatest(da.source, db.source) AS source_b,
               count(*) AS n_pairs
        FROM pairs08
          JOIN documents da ON da.doc_id = id_a
          JOIN documents db ON db.doc_id = id_b
        GROUP BY 1, 2 ORDER BY source_a, source_b""")
    ),
    QueryDef(
      "graph_degree_histogram",
      // Degree distribution of the τ=0.8 near-dup graph — the structural
      // corpus-health view (hub documents = template/boilerplate families).
      // Pure derive from the cached pair mine: explode each pair to both
      // endpoints, two small aggregations; only the pair list shuffles,
      // never the corpus.
      (s, dir) => {
        import org.apache.spark.sql.functions.{col, count, explode, array, lit}
        DedupOps.ngramJaccardCachedUnsorted(docs(s, dir), threshold = 0.8)
          .select(explode(array(col("id_a"), col("id_b"))).as("doc_id"))
          .groupBy("doc_id")
          .agg(count(lit(1)).as("degree"))
          .groupBy("degree")
          .agg(count(lit(1)).as("n_docs"))
          .orderBy("degree")
      },
      Some(s"""
        WITH ${pairsAt(0.8, "pairs08")},
        ends AS (SELECT id_a AS doc_id FROM pairs08
                 UNION ALL SELECT id_b FROM pairs08),
        deg AS (SELECT doc_id, count(*) AS degree FROM ends GROUP BY 1)
        SELECT degree, count(*) AS n_docs
        FROM deg GROUP BY degree ORDER BY degree""")
    ),
    QueryDef(
      "dedup_cluster_sizes",
      // Duplication-family size histogram — the corpus-health report a
      // dedup pass is judged by (how much mass sits in large families vs
      // singletons). Reuses the CACHED cluster labeling (mine-once/
      // derive-many: dedupClusters memoizes the checkpointed label
      // table), so this is two tiny aggregations over an already-
      // materialized RDD.
      (s, dir) => {
        import org.apache.spark.sql.functions.{col, count, lit}
        GraphOps.dedupClusters(docs(s, dir), threshold = 0.95)
          .groupBy(col("component"))
          .agg(count(lit(1)).as("sz"))
          .groupBy(col("sz"))
          .agg(count(lit(1)).as("n_clusters"))
          .orderBy("sz")
      },
      Some(s"""
        WITH RECURSIVE $pairCte,
        e2 AS (SELECT id_a AS a, id_b AS b FROM pairs
               UNION ALL SELECT id_b, id_a FROM pairs),
        walk(node, label) AS (
          SELECT doc_id, doc_id FROM documents
          UNION
          SELECT e2.b, walk.label FROM walk JOIN e2 ON e2.a = walk.node),
        comp AS (SELECT node AS doc_id, min(label) AS component
                 FROM walk GROUP BY node),
        szs AS (SELECT component, count(*) AS sz FROM comp GROUP BY component)
        SELECT sz, count(*) AS n_clusters FROM szs GROUP BY sz ORDER BY sz""")
    ),
    QueryDef(
      "graph_triangles",
      // Triangle census of the near-dup graph (same cached τ=0.95 pair
      // mining): triangles measure how CLIQUE-LIKE duplication families
      // are — transitive near-dup sets triangulate, chains don't.
      // DEGREE-ORDERED wedge orientation (GraphOps.triangleCountOriented):
      // every wedge is generated at its (deg, id)-minimum vertex, so
      // per-join-key fan-out stays ≤ O(√m) even when one boilerplate
      // mega-family concentrates degree on a hub — the id-only a<b
      // orientation would put O(c²) wedges on a single key there
      // (measured: 12.5M → 0 on a 5k-spoke star, regime_boundary.json).
      // Counts are orientation-invariant (GraphTextOpsSpec pins both
      // orientations bit-identical), so the DuckDB oracle keeps the
      // simpler a<b form.
      (s, dir) => {
        import org.apache.spark.sql.functions.{col, count, countDistinct, lit}
        val e = DedupOps.ngramJaccardCachedUnsorted(docs(s, dir), threshold = 0.95)
          .select(col("id_a").as("a"), col("id_b").as("b"))
        // miner pairs are distinct with id_a < id_b by construction, so
        // the canonicalization exchange is skipped (explicit contract)
        GraphOps.triangleCountOriented(e, assumeCanonical = true)
          .crossJoin(e.agg(count(lit(1)).as("n_edges")))
          .crossJoin(
            e.select(col("a").as("x")).unionByName(e.select(col("b").as("x")))
              .agg(countDistinct(col("x")).as("n_vertices")))
      },
      Some(s"""
        WITH $pairCte,
        e AS (SELECT id_a AS a, id_b AS b FROM pairs),
        w AS (SELECT e1.a, e1.b, e2.b AS c FROM e e1 JOIN e e2 ON e1.b = e2.a),
        tri AS (
          SELECT 1 AS one FROM w
          WHERE EXISTS (SELECT 1 FROM e WHERE e.a = w.a AND e.b = w.c))
        SELECT (SELECT count(*) FROM tri) AS n_triangles,
               (SELECT count(*) FROM e) AS n_edges,
               (SELECT count(DISTINCT x) FROM
                  (SELECT a AS x FROM e UNION ALL SELECT b FROM e))
                 AS n_vertices"""),
    ),
    QueryDef(
      "graph_pagerank",
      // Two PageRank iterations over the near-dup graph (token Jaccard >=
      // 0.95 pairs — the same cached PPJoin mining dedup_clusters uses):
      // which documents sit at the CENTER of duplication families. Exact
      // quantized-integer rounds (see GraphOps.pagerankQuantized), so the
      // DuckDB replay of the identical recurrence matches bit-for-bit.
      (s, dir) => {
        import org.apache.spark.sql.functions.col
        GraphOps.pagerankQuantized(
            DedupOps.ngramJaccardCachedUnsorted(docs(s, dir), threshold = 0.95)
              .select("id_a", "id_b"),
            iterations = 2)
          .select(col("id").as("doc_id"), col("r").as("rank_q"))
          .orderBy(col("rank_q").desc, col("doc_id"))
          .limit(50)
      },
      Some(s"""
        WITH $pairCte,
        e AS (SELECT id_a AS src, id_b AS dst FROM pairs
              UNION ALL SELECT id_b, id_a FROM pairs),
        deg AS (SELECT src, count(*) AS deg FROM e GROUP BY src),
        r0 AS (SELECT src AS id, CAST(1000000 AS BIGINT) AS r FROM deg),
        r1 AS (SELECT e.dst AS id,
                 CAST(150000 + floor(0.85 * sum(r0.r // deg.deg)) AS BIGINT) AS r
               FROM e JOIN r0 ON e.src = r0.id JOIN deg ON e.src = deg.src
               GROUP BY e.dst),
        r2 AS (SELECT e.dst AS id,
                 CAST(150000 + floor(0.85 * sum(r1.r // deg.deg)) AS BIGINT) AS r
               FROM e JOIN r1 ON e.src = r1.id JOIN deg ON e.src = deg.src
               GROUP BY e.dst)
        SELECT id AS doc_id, r AS rank_q FROM r2
        ORDER BY rank_q DESC, doc_id LIMIT 50""")
    ),
    // --------------------------------------------------------- multimodal
    QueryDef(
      "multimodal_stats",
      // REAL codec decode: one genuine PNG per document (javax.imageio,
      // encoded executor-side), decoded with a per-partition ImageReader to
      // (width, height, channels, R+G+B pixel sum). Geometry and pixels are
      // closed-form in doc_id, so DuckDB replays the expected raster stats
      // exactly — a garbage decode cannot pass this oracle.
      (s, dir) => MultimodalOps.imageStats(s, dir),
      Some("""
        WITH g AS (SELECT doc_id, 8 + doc_id % 16 AS w,
                          8 + (doc_id * 7) % 16 AS h
                   FROM documents)
        SELECT doc_id, CAST(w AS INT) AS width, CAST(h AS INT) AS height,
               CAST(3 AS INT) AS channels,
               CAST(w*h*(doc_id % 256) + h*(w*(w-1)//2) + w*(h*(h-1)//2)
                    AS BIGINT) AS pixel_sum
        FROM g ORDER BY doc_id""")
    ),
    QueryDef(
      "multimodal_audio_stats",
      // REAL audio codec: one genuine RIFF/WAVE payload per document
      // (16-bit signed little-endian PCM, 8 kHz, 1–2 channels), written
      // AND decoded executor-side by javax.sound.sampled.AudioSystem.
      // Frame count, channel count, and every sample are closed-form in
      // doc_id, so DuckDB replays the exact sample sums — a codec that
      // misparsed the RIFF header, frame size, or byte order cannot pass.
      // sample_rate/channels come from the decoded header, not the
      // synthesis constants.
      (s, dir) => MultimodalOps.audioStats(s, dir),
      Some("""
        WITH q AS (SELECT doc_id, 16 + doc_id % 32 AS n_frames,
                          1 + doc_id % 2 AS channels
                   FROM documents),
        e AS (SELECT doc_id, n_frames, channels,
                     unnest(range(0, n_frames)) AS i FROM q),
        e2 AS (SELECT doc_id, n_frames, channels, i,
                      unnest(range(0, channels)) AS c FROM e)
        SELECT doc_id, CAST(8000 AS INT) AS sample_rate,
               CAST(channels AS INT) AS channels,
               CAST(n_frames AS BIGINT) AS n_frames,
               CAST(sum(((doc_id + 31*i + 17*c) % 4096) - 2048) AS BIGINT) AS sample_sum
        FROM e2 GROUP BY 1, 2, 3, 4 ORDER BY doc_id""")
    ),
    QueryDef(
      "multimodal_video_frames",
      // REAL multi-frame (video) decode: one genuine ANIMATED GIF per
      // document — a true multi-frame container written frame-by-frame by
      // the JDK ImageIO GIF writer and decoded by its reader
      // (getNumImages walks the frame directory; each frame decodes to
      // its raster). The explicit 256-gray indexed palette makes the
      // encode lossless, so frame counts, geometry, and per-frame pixel
      // sums are closed-form in doc_id and DuckDB replays them exactly —
      // a decoder that miscounted frames or misread LZW cannot pass.
      (s, dir) => MultimodalOps.videoFrameStats(s, dir),
      Some("""
        WITH g AS (SELECT doc_id, 8 + doc_id % 16 AS w,
                          8 + (doc_id * 7) % 16 AS h,
                          2 + doc_id % 3 AS nf
                   FROM documents),
        k AS (SELECT doc_id, w, h, unnest(range(0, nf)) AS k FROM g),
        yy AS (SELECT doc_id, w, h, k, unnest(range(0, h)) AS y FROM k),
        xx AS (SELECT doc_id, w, h, k, y, unnest(range(0, w)) AS x FROM yy)
        SELECT doc_id, CAST(k AS INT) AS frame_idx, CAST(w AS INT) AS width,
               CAST(h AS INT) AS height,
               CAST(sum((doc_id + 13*k + x + 3*y) % 256) AS BIGINT) AS gray_sum
        FROM xx GROUP BY 1, 2, 3, 4 ORDER BY doc_id, frame_idx""")
    ),
    QueryDef(
      "multimodal_image_pipeline",
      // Full real-codec chain: PNG encode -> decode -> nearest-neighbor
      // resize to 16x16 (out(x,y) = in(x*w/16, y*h/16)) -> PNG re-encode ->
      // decode again. Every stage is mapPartitions with per-partition codec
      // init; NN resample keeps the raster closed-form so the re-decoded
      // pixel sum has an exact integer oracle.
      (s, dir) => MultimodalOps.imagePipeline(s, dir),
      Some("""
        WITH g AS (SELECT doc_id, 8 + doc_id % 16 AS w,
                          8 + (doc_id * 7) % 16 AS h
                   FROM documents)
        SELECT doc_id, CAST(16 AS INT) AS width, CAST(16 AS INT) AS height,
               CAST(3 AS INT) AS channels,
               CAST(256 * (doc_id % 256)
                    + 16 * list_sum(list_transform(range(0, 16), x -> (x*w)//16))
                    + 16 * list_sum(list_transform(range(0, 16), y -> (y*h)//16))
                    AS BIGINT) AS pixel_sum
        FROM g ORDER BY doc_id""")
    ),
    QueryDef(
      "multimodal_dedup",
      // Content-digest dedup over the OPAQUE binary column (the
      // imagededup exact tier): md5 per payload, digest groups with a
      // deterministic keeper — byte-level identity needs no decode, so it
      // runs before any codec work at full ingest rate. Only the 16-byte
      // digest + ids shuffle.
      (s, dir) => {
        import org.apache.spark.sql.functions.{col, count, lit, md5, min}
        graft.ops.MultimodalOps.mediaTable(s, dir).toDF()
          .select(col("doc_id"), md5(col("media")).as("digest"))
          .groupBy("digest")
          .agg(count(lit(1)).as("n_copies"), min(col("doc_id")).as("keep_id"))
          .filter(col("n_copies") > 1)
          .orderBy("digest")
      },
      Some("""
        SELECT md5(text) AS digest, count(*) AS n_copies,
               min(doc_id) AS keep_id
        FROM documents GROUP BY 1 HAVING count(*) > 1 ORDER BY digest""")
    ),
    QueryDef(
      "multimodal_pipeline",
      // The full decode→resize→feature chain end-to-end on the opaque
      // binary column, all stages partition-wise (mapPartitions with
      // per-partition decoder init): resize normalizes every payload to
      // 256 bytes (truncate/zero-pad), feature extraction emits
      // (n_bytes, checksum, feature[4]) per item, and frame sampling runs
      // over the SAME resized payloads. Every output is byte-deterministic,
      // so the whole chain gets a SQL oracle (zero-padding contributes 0 to
      // the checksum; f0 = first byte / 256, exact in float and double).
      (s, dir) => {
        import org.apache.spark.sql.functions._
        val resized = MultimodalOps.resizeStub(
          MultimodalOps.mediaTable(s, dir), targetBytes = 256)
        val feats = MultimodalOps.extractFeatures(resized).toDF()
          .select(col("doc_id"), col("n_bytes"), col("checksum"),
            element_at(col("feature"), 1).cast("double").as("f0"))
        val frames = MultimodalOps.frameSample(resized, frameBytes = 64, stride = 32)
          .toDF().groupBy("doc_id").agg(count(lit(1)).as("n_frames"))
        feats.join(frames, Seq("doc_id"), "left")
          .select(col("doc_id"), col("n_bytes"), col("checksum"), col("f0"),
            coalesce(col("n_frames"), lit(0L)).as("n_frames"))
          .orderBy("doc_id")
      },
      Some("""
        SELECT doc_id, 256 AS n_bytes,
               CAST(coalesce(list_sum(list_transform(
                 range(1, least(length(text), 256) + 1),
                 i -> ascii(substr(text, i, 1)))), 0) % 1000000007 AS BIGINT) AS checksum,
               coalesce(ascii(substr(text, 1, 1)), 0) / 256.0 AS f0,
               7 AS n_frames
        FROM documents ORDER BY doc_id""")
    ),
    QueryDef(
      "multimodal_frames",
      // The frame-sampling (one row → many frames) shape, graded: per-doc
      // frame counts and bytes after a 64-byte/stride-32 sample over the
      // opaque payload. Frame geometry is fully determined by payload
      // length, so the UDTF-ish mapPartitions stage gets a real SQL oracle
      // (docs shorter than one frame keep a 0-frame row via the left join).
      (s, dir) => {
        import org.apache.spark.sql.functions._
        val frames = MultimodalOps
          .frameSample(MultimodalOps.mediaTable(s, dir), frameBytes = 64, stride = 32)
          .toDF()
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_frames"),
            sum(octet_length(col("frame"))).as("frame_bytes"))
        Tables.read(s, dir, "documents").select("doc_id")
          .join(frames, Seq("doc_id"), "left")
          .select(col("doc_id"),
            coalesce(col("n_frames"), lit(0L)).as("n_frames"),
            coalesce(col("frame_bytes"), lit(0L)).as("frame_bytes"))
          .orderBy("doc_id")
      },
      Some("""
        WITH f AS (
          SELECT doc_id,
                 CASE WHEN octet_length(encode(text)) < 64 THEN 0
                      ELSE (octet_length(encode(text)) - 64) // 32 + 1 END AS n_frames
          FROM documents)
        SELECT doc_id, CAST(n_frames AS BIGINT) AS n_frames,
               CAST(64 * n_frames AS BIGINT) AS frame_bytes
        FROM f ORDER BY doc_id""")
    ),
    QueryDef(
      "quality_gopher_rules",
      // Gopher-style hard quality gates (Rae et al. 2021 §A1.1, the rule
      // bundle RefinedWeb/FineWeb run before any model-based scoring):
      // word-count bounds, mean-word-length bounds, symbol-to-word ratio,
      // alphabetic-word fraction, stopword presence. Every ratio
      // threshold is evaluated by INTEGER cross-multiplication (3·w ≤
      // chars, 5·alpha ≥ 4·w, 10·sym ≤ w) — no float ever crosses an
      // engine boundary, so the oracle is hash-exact by construction.
      // Pure map-side per-doc expressions; the only exchange is the
      // output sort. (Word-count lower bound adapted to the synthetic
      // corpus: 20 instead of Gopher's 50.)
      (s, dir) => {
        import org.apache.spark.sql.functions._
        val stop = TextOps.stopwords("en")
        docs(s, dir)
          .select(col("doc_id"),
            expr("filter(split(lower(text), '\\\\s+'), t -> t <> '')").as("toks"),
            lower(col("text")).as("lt"))
          .select(col("doc_id"),
            size(col("toks")).as("n_words"),
            length(array_join(col("toks"), "")).as("wchars"),
            length(regexp_replace(col("lt"), "[a-z0-9 ]", "")).as("sym_chars"),
            expr("size(filter(toks, t -> t rlike '[a-z]'))").as("alpha_words"),
            size(array_intersect(col("toks"),
              array(stop.map(lit(_)): _*))).as("n_stop"))
          .select(col("doc_id"), col("n_words"),
            (col("n_words") >= 20 && col("n_words") <= 100000)
              .cast("int").as("r_wc"),
            (lit(3) * col("n_words") <= col("wchars") &&
              col("wchars") <= lit(10) * col("n_words")).cast("int").as("r_mwl"),
            (lit(10) * col("sym_chars") <= col("n_words")).cast("int").as("r_sym"),
            (lit(5) * col("alpha_words") >= lit(4) * col("n_words"))
              .cast("int").as("r_alpha"),
            (col("n_stop") >= 2).cast("int").as("r_stop"))
          .withColumn("keep",
            col("r_wc") * col("r_mwl") * col("r_sym") * col("r_alpha") * col("r_stop"))
          .orderBy("doc_id")
      },
      Some {
        val stopList = TextOps.listAnsi(TextOps.stopwords("en"))
        s"""
        WITH t AS (
          SELECT doc_id,
                 list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS toks,
                 lower(text) AS lt
          FROM documents),
        m AS (
          SELECT doc_id,
                 len(toks) AS n_words,
                 coalesce(length(list_aggregate(toks, 'string_agg', '')), 0) AS wchars,
                 length(regexp_replace(lt, '[a-z0-9 ]', '', 'g')) AS sym_chars,
                 len(list_filter(toks, x -> regexp_matches(x, '[a-z]'))) AS alpha_words,
                 len(list_intersect(toks, $stopList)) AS n_stop
          FROM t)
        SELECT doc_id, CAST(n_words AS INT) AS n_words,
               CAST(n_words >= 20 AND n_words <= 100000 AS INT) AS r_wc,
               CAST(3 * n_words <= wchars AND wchars <= 10 * n_words AS INT) AS r_mwl,
               CAST(10 * sym_chars <= n_words AS INT) AS r_sym,
               CAST(5 * alpha_words >= 4 * n_words AS INT) AS r_alpha,
               CAST(n_stop >= 2 AS INT) AS r_stop,
               CAST((n_words >= 20 AND n_words <= 100000)
                AND (3 * n_words <= wchars AND wchars <= 10 * n_words)
                AND (10 * sym_chars <= n_words)
                AND (5 * alpha_words >= 4 * n_words)
                AND (n_stop >= 2) AS INT) AS keep
        FROM m ORDER BY doc_id"""
      }
    ),
    QueryDef(
      "corpus_token_mixture",
      // Token-budget mixture planning — the data-mixing step that turns
      // target domain weights into per-domain sampling rates for a fixed
      // token budget (here: half the corpus, rank-by-name weights so the
      // plan is self-contained). Everything after the one per-source
      // token aggregate runs on a bounded #sources-row frame (the window
      // and totals cross-join never see documents), and every rate is
      // integer/decimal floor math — exact at any corpus size, no float
      // drift. needs_upsample flags domains whose target exceeds their
      // inventory (the DoReMi-style deficit signal).
      (s, dir) => {
        import org.apache.spark.sql.functions._
        import org.apache.spark.sql.expressions.Window
        import org.apache.spark.sql.Column
        // EXACT decimal floor division a // b for nonnegative integral
        // decimals: subtract the exact remainder first, so the quotient is
        // an integer and Spark's HALF_UP rounding of division results (to
        // the adjusted scale 6 here) becomes the identity. A bare
        // floor(a / b) would round the quotient up whenever its fractional
        // part exceeds 0.9999995 — diverging from DuckDB's exact `//` once
        // denominators pass ~2e6.
        def floorDiv(a: Column, b: Column): Column =
          ((a - a % b) / b).cast("long")
        val perSrc = docs(s, dir)
          .select(col("source"),
            expr("size(filter(split(lower(text), '\\\\s+'), t -> t <> ''))")
              .cast("long").as("tk"))
          .groupBy("source").agg(sum(col("tk")).as("n_tokens"))
        val w = perSrc.withColumn("weight",
          row_number().over(Window.orderBy("source")).cast("long"))
        val tot = w.agg(sum("n_tokens").as("t_all"), sum("weight").as("w_all"))
        w.crossJoin(tot)
          .select(col("source"), col("n_tokens"), col("weight"),
            floorDiv(col("t_all").cast("decimal(38,0)") * col("weight"),
              lit(2) * col("w_all")).as("target_tokens"))
          .select(col("source"), col("n_tokens"), col("weight"),
            col("target_tokens"),
            // a zero-token domain plans rate 0 (nothing to sample), never a
            // capped full rate and never ANSI DIVIDE_BY_ZERO
            when(col("n_tokens") === 0L, lit(0L))
              .otherwise(least(lit(1000000L),
                floorDiv(col("target_tokens").cast("decimal(38,0)") * 1000000,
                  col("n_tokens")))).as("rate_e6"),
            (col("target_tokens") > col("n_tokens")).cast("int")
              .as("needs_upsample"))
          .withColumn("expected_tokens",
            floorDiv(col("n_tokens").cast("decimal(38,0)") * col("rate_e6"),
              lit(1000000)))
          // positional parity with the oracle (expected_tokens BEFORE
          // needs_upsample) — the driver's comparer sorts columns by name,
          // but nothing should lean on that tolerance
          .select("source", "n_tokens", "weight", "target_tokens", "rate_e6",
            "expected_tokens", "needs_upsample")
          .orderBy("source")
      },
      Some("""
        WITH c AS (
          SELECT source,
                 sum(len(list_filter(string_split_regex(lower(text), '\s+'),
                   t -> t <> ''))) AS n_tokens
          FROM documents GROUP BY source),
        w AS (SELECT source, n_tokens,
                     CAST(row_number() OVER (ORDER BY source) AS BIGINT) AS weight
              FROM c),
        tot AS (SELECT sum(n_tokens) AS t_all, sum(weight) AS w_all FROM w),
        p AS (SELECT source, n_tokens, weight,
                     CAST(CAST(t_all AS HUGEINT) * weight // (2 * w_all) AS BIGINT) AS target_tokens
              FROM w, tot),
        r AS (SELECT *, CASE WHEN n_tokens = 0 THEN CAST(0 AS BIGINT)
                ELSE least(1000000,
                  CAST(CAST(target_tokens AS HUGEINT) * 1000000 // n_tokens AS BIGINT)) END AS rate_e6
              FROM p)
        SELECT source, CAST(n_tokens AS BIGINT) AS n_tokens, weight, target_tokens,
               rate_e6,
               CAST(CAST(n_tokens AS HUGEINT) * rate_e6 // 1000000 AS BIGINT) AS expected_tokens,
               CAST(target_tokens > n_tokens AS INT) AS needs_upsample
        FROM r ORDER BY source""")
    )
  )
}
