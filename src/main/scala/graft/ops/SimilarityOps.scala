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

  /** Approximate top-k: candidates = vectors whose bucket is within
    * Hamming distance 1 of the query's bucket (multi-probe), re-ranked by
    * exact cosine. Probe expansion happens on the tiny query side.
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
}
