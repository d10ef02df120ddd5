package graft.queries

import graft.ops.TextOps
import org.apache.spark.sql.functions._

/** Text / document-corpus operators over the `documents` table (doc_id,
  * text, lang, source, n_chars): exact dedup and corpus statistics. The
  * approximate-dedup family (MinHash-LSH, SimHash, n-gram Jaccard) lives in
  * `graft.ops.DedupOps`.
  */
object TextQueries {

  def queries: Seq[QueryDef] = Seq(
    QueryDef(
      "dedup_exact",
      // Exact content dedup: keep the lowest doc_id per identical text.
      // Groups on the SHA-256 digest, not the body — the shuffle carries
      // 32 bytes per row instead of whole documents (at 100 TB that is the
      // difference between shuffling digests and shuffling the corpus).
      (s, dir) =>
        s.read.parquet(s"$dir/documents.parquet")
          .groupBy(sha2(col("text"), 256))
          .agg(min(col("doc_id")).as("doc_id"))
          .select("doc_id")
          .orderBy("doc_id"),
      Some("""
        SELECT min(doc_id) AS doc_id FROM documents
        GROUP BY text ORDER BY doc_id""")
    ),
    QueryDef(
      "text_stats",
      (s, dir) =>
        s.read.parquet(s"$dir/documents.parquet")
          .groupBy(col("lang"))
          .agg(
            count(lit(1)).as("n_docs"),
            round(avg(col("n_chars")), 4).as("avg_chars"),
            round(avg(size(split(col("text"), " "))), 4).as("avg_tokens")
          )
          .orderBy("lang"),
      Some("""
        SELECT lang, count(*) AS n_docs, round(avg(n_chars), 4) AS avg_chars,
               round(avg(len(string_split(text, ' '))), 4) AS avg_tokens
        FROM documents GROUP BY lang ORDER BY lang""")
    ),
    QueryDef(
      "text_tokens",
      // Whitespace tokenization + per-document token stats.
      (s, dir) =>
        s.read.parquet(s"$dir/documents.parquet")
          .select(
            col("doc_id"),
            size(split(col("text"), " ")).as("n_tokens"),
            length(col("text")).as("len_chars")
          )
          .orderBy("doc_id"),
      Some("""
        SELECT doc_id, len(string_split(text, ' ')) AS n_tokens,
               length(text) AS len_chars
        FROM documents ORDER BY doc_id""")
    ),
    QueryDef(
      "corpus_sample",
      // Deterministic stratified down-sampling for data mixing: keep 40%
      // of English docs and all others, decided by a multiplicative hash
      // of the stable doc key (Knuth 2654435761 mod 2^32) — reproducible
      // across runs/engines/partitionings, unlike rand()-based sampling.
      // Output is the per-lang kept/total accounting a mixing config
      // audits. doc_id*2654435761 < 2^63 at any realistic id, no overflow.
      (s, dir) =>
        s.read.parquet(s"$dir/documents.parquet")
          .withColumn("bucket",
            (col("doc_id") * 2654435761L) % 4294967296L % 100)
          .withColumn("keep",
            when(col("lang") === "en", col("bucket") < 40).otherwise(lit(true)))
          .groupBy(col("lang"))
          .agg(count(lit(1)).as("n_total"),
            sum(when(col("keep"), 1L).otherwise(0L)).as("n_kept"))
          .orderBy("lang"),
      Some("""
        SELECT lang, count(*) AS n_total,
               CAST(sum(CASE WHEN lang <> 'en'
                      OR (doc_id * 2654435761) % 4294967296 % 100 < 40
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
        FROM documents GROUP BY lang ORDER BY lang""")
    ),
    QueryDef(
      "text_clean",
      (s, dir) => TextOps.cleanText(s.read.parquet(s"$dir/documents.parquet")),
      Some("""
        SELECT doc_id, length(text) AS raw_chars,
               trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')) AS clean_text,
               length(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))) AS clean_chars
        FROM documents ORDER BY doc_id""")
    ),
    QueryDef(
      "quality_repetition",
      (s, dir) =>
        TextOps.repetitionSignals(s.read.parquet(s"$dir/documents.parquet")),
      Some("""
        WITH toks AS (
          SELECT doc_id,
                 list_filter(string_split_regex(lower(text), '\s+'), t -> t <> '') AS ts
          FROM documents),
        base AS (
          SELECT doc_id, len(ts) AS n_tokens,
                 floor((1.0 - CAST(len(list_distinct(ts)) AS DOUBLE) /
                   greatest(len(ts), 1)) * 10000 + 0.5) / 10000 AS dup_token_ratio
          FROM toks),
        bg AS (
          SELECT doc_id,
                 unnest(list_transform(range(2, len(ts) + 1),
                   i -> ts[i - 1] || ' ' || ts[i])) AS bigram
          FROM toks WHERE len(ts) >= 2),
        bgc AS (
          SELECT doc_id, bigram, count(*) AS c FROM bg GROUP BY doc_id, bigram),
        top AS (
          SELECT doc_id,
                 floor(CAST(max(c) AS DOUBLE) / sum(c) * 10000 + 0.5) / 10000 AS tbr
          FROM bgc GROUP BY doc_id)
        SELECT b.doc_id, b.n_tokens, b.dup_token_ratio,
               coalesce(t.tbr, 0.0) AS top_bigram_ratio
        FROM base b LEFT JOIN top t ON b.doc_id = t.doc_id
        ORDER BY b.doc_id""")
    ),
    QueryDef(
      "text_tfidf_search",
      (s, dir) =>
        TextOps.tfidfSearch(
          s.read.parquet(s"$dir/documents.parquet"),
          Seq("data", "spark", "dup"), 20),
      Some("""
        WITH tok AS (
          SELECT doc_id, unnest(list_filter(
            string_split_regex(lower(text), '\s+'),
            t -> t IN ('data', 'spark', 'dup'))) AS tok
          FROM documents),
        tf AS (SELECT doc_id, tok, count(*) AS tf FROM tok GROUP BY doc_id, tok),
        df AS (SELECT tok, count(DISTINCT doc_id) AS df FROM tok GROUP BY tok),
        n AS (SELECT count(*) AS n_docs FROM documents),
        scored AS (
          SELECT tf.doc_id,
                 CAST(floor(sum(tf.tf * ln(CAST(n.n_docs AS DOUBLE) / df.df)) * 10000 + 0.5) AS BIGINT) AS score_e4
          FROM tf JOIN df USING (tok) CROSS JOIN n
          GROUP BY tf.doc_id)
        SELECT CAST(row_number() OVER (ORDER BY score_e4 DESC, doc_id) AS INTEGER) AS rank,
               doc_id, score_e4
        FROM scored
        ORDER BY score_e4 DESC, doc_id LIMIT 20""")
    )
  )
}
