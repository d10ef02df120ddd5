package graft.queries

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
    )
  )
}
