package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Two tiers:
  *   - [[bruteForceTopK]]: exact cosine top-k — correct at any n, used as
  *     the graded baseline; one broadcast of the query vector, no shuffle
  *     until the final top-k.
  *   - [[lshTopK]]: sign-random-projection buckets (multi-probe) → exact
  *     re-rank only inside candidate buckets. At 100 TB the bucket join is
  *     an equi-shuffle and the per-bucket candidate sets stay bounded; this
  *     is the IVF/LSH shape without any driver-side index.
  */
object SimilarityOps {

  private[ops] def dotD(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  private[ops] def normD(a: Column): Column = sqrt(dotD(a, a))

  /** Exact cosine top-k neighbors of `queryId` (excluded from results). */
  def bruteForceTopK(emb: DataFrame, queryId: Long, k: Int): DataFrame = {
    val q = emb.filter(col("vec_id") === queryId)
      .select(col("embedding").as("q_embedding"))
    emb.filter(col("vec_id") =!= queryId)
      .join(broadcast(q))
      .select(col("vec_id"),
        (floor(dotD(col("embedding"), col("q_embedding")) /
          (normD(col("embedding")) * normD(col("q_embedding"))) * 10000 + 0.5) / 10000)
          .as("cosine"))
      .orderBy(col("cosine").desc, col("vec_id"))
      .limit(k)
  }

  /** Sign-random-projection bucket id (nBits hyperplanes, deterministic
    * ±1 weights derived from xxhash64(seed=h, i)).
    */
  def srpBucket(nBits: Int): Column =
    expr(
      s"""aggregate(sequence(0, ${nBits - 1}), cast(0 as bigint), (acc, h) ->
            acc | (cast(CASE WHEN
              aggregate(sequence(0, size(embedding) - 1), cast(0.0 as double),
                (s, i) -> s + cast(embedding[i] as double) *
                  CASE WHEN (shiftright(xxhash64(h, i), 1) & 1) = 1 THEN 1.0 ELSE -1.0 END)
              > 0.0 THEN 1 ELSE 0 END as bigint) << h))""")

  /** IVF (inverted-file) approximate top-k: vectors are assigned to their
    * nearest of `nCentroids` centroid vectors; a query searches only its
    * `nProbe` closest centroids' cells exactly. The cluster-scale ANN
    * shape: assignment is one broadcast join + per-vector argmax (no
    * all-pairs), search touches nProbe/nCentroids of the data.
    *
    * Centroid selection here is deterministic (lowest vec_ids) — a stand-in
    * for k-means|| training on a sample; swap the `centroids` DataFrame and
    * nothing else changes.
    */
  def ivfTopK(
      emb: DataFrame,
      queryId: Long,
      k: Int,
      nCentroids: Int = 16,
      nProbe: Int = 4
  ): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val centroids = emb.orderBy("vec_id").limit(nCentroids)
      .select(col("vec_id").as("cid"), col("embedding").as("cvec"))
    val scored = emb.join(broadcast(centroids))
      .select(col("vec_id"), col("embedding"), col("cid"),
        (dotD(col("embedding"), col("cvec")) /
          (normD(col("embedding")) * normD(col("cvec")))).as("c_cos"))
    val byVec = Window.partitionBy(col("vec_id"))
      .orderBy(col("c_cos").desc, col("cid"))
    val assigned = scored
      .withColumn("rn", org.apache.spark.sql.functions.row_number().over(byVec))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("embedding"), col("cid"))

    val probes = scored.filter(col("vec_id") === queryId)
      .orderBy(col("c_cos").desc, col("cid"))
      .limit(nProbe)
      .select(col("cid"))
    val q = emb.filter(col("vec_id") === queryId)
      .select(col("embedding").as("q_embedding"))

    assigned
      .join(broadcast(probes), "cid")
      .filter(col("vec_id") =!= queryId)
      .join(broadcast(q))
      .select(col("vec_id"),
        (floor(dotD(col("embedding"), col("q_embedding")) /
          (normD(col("embedding")) * normD(col("q_embedding"))) * 10000 + 0.5) / 10000)
          .as("cosine"))
      .orderBy(col("cosine").desc, col("vec_id"))
      .limit(k)
  }

  /** Approximate top-k: candidates = vectors whose bucket is within
    * Hamming distance 1 of the query's bucket (multi-probe), re-ranked by
    * exact cosine. Probe expansion happens on the tiny query side.
    *
    * Single-table multi-probe is the textbook starting point but recall
    * decays with corpus/search difficulty (one table, fixed radius) — the
    * production LSH top-k is [[lshTopKBanded]] (L independent tables),
    * kept here as the documented baseline.
    */
  def lshTopK(emb: DataFrame, queryId: Long, k: Int, nBits: Int = 4): DataFrame = {
    val bucketed = emb.withColumn("bucket", srpBucket(nBits))
    val q = bucketed.filter(col("vec_id") === queryId)
      .select(col("embedding").as("q_embedding"), col("bucket").as("q_bucket"))
      // multi-probe: original bucket + all Hamming-1 neighbors
      .select(col("q_embedding"), explode(expr(
        s"""concat(array(q_bucket),
              transform(sequence(0, ${nBits - 1}), b -> q_bucket ^ (cast(1 as bigint) << b)))"""))
        .as("bucket"))
    bucketed.filter(col("vec_id") =!= queryId)
      .join(broadcast(q), Seq("bucket"))
      .select(col("vec_id"),
        (floor(dotD(col("embedding"), col("q_embedding")) /
          (normD(col("embedding")) * normD(col("q_embedding"))) * 10000 + 0.5) / 10000)
          .as("cosine"))
      .orderBy(col("cosine").desc, col("vec_id"))
      .limit(k)
  }

  /** Banded (multi-table) SRP top-k — the same L-independent-tables shape
    * as [[graft.ops.DedupOps.cosineLshPairs]], specialized to one query:
    * a candidate is any vector agreeing with the query on EVERY bit of at
    * least one band. The (band, value) equi-join probes L tables at once;
    * the query side (L rows) broadcasts; candidates re-rank by exact
    * cosine. Recall follows 1 − (1 − p^b)^L (p = 1 − θ/π), so it is
    * CONFIGURABLE upward at any corpus size — unlike single-table
    * multi-probe — and the band config can be fit per corpus with
    * [[graft.ops.DedupOps.autoBandConfig]].
    */
  def lshTopKBanded(
      emb: DataFrame,
      queryId: Long,
      k: Int,
      bands: Int = 24,
      bitsPerBand: Int = 4
  ): DataFrame = {
    graft.functions.SrpBands.register(emb.sparkSession)
    val banded = emb
      .select(col("vec_id"), col("embedding"),
        posexplode(expr(s"srp_bands(embedding, $bands, $bitsPerBand)")))
      .select(col("vec_id"), col("embedding"), col("pos").as("band"), col("col").as("v"))
    val q = banded.filter(col("vec_id") === queryId)
      .select(col("band"), col("v"), col("embedding").as("q_embedding"))
    banded.filter(col("vec_id") =!= queryId)
      .join(broadcast(q), Seq("band", "v"))
      .select(col("vec_id"), col("embedding"), col("q_embedding"))
      .distinct()
      .select(col("vec_id"),
        (floor(dotD(col("embedding"), col("q_embedding")) /
          (normD(col("embedding")) * normD(col("q_embedding"))) * 10000 + 0.5) / 10000)
          .as("cosine"))
      .orderBy(col("cosine").desc, col("vec_id"))
      .limit(k)
  }
}
