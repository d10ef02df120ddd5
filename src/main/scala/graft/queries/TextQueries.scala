package graft.queries

import graft.ops.SparkOps.Materialize
import graft.ops.TextOps
import org.apache.spark.sql.expressions.Window
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
        Tables.read(s, dir, "documents")
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
        Tables.read(s, dir, "documents")
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
        Tables.read(s, dir, "documents")
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
        Tables.read(s, dir, "documents")
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
      "corpus_shuffle_shard",
      // Reproducible GLOBAL SHUFFLE + sharding — the step that randomizes
      // document order before a training run writes its N shards. The
      // permutation key is a seeded md5 of the stable doc key (never
      // rand(): identical across runs, engines, and partitionings); 32-bit
      // halves drive shard routing and within-shard order, and first/last
      // per shard are min_by/max_by on the full (ord, doc_id) struct —
      // exact under hash ties at ANY doc_id width (no bit-packing
      // assumptions). At scale this same keying feeds
      // repartitionByRange(shard, ord) + a partitioned write; graded here
      // as the per-shard accounting a shuffle audit checks.
      (s, dir) => {
        val key = md5(concat(col("doc_id").cast("string"), lit(":s7")))
        Tables.read(s, dir, "documents")
          .select(col("doc_id"),
            conv(substring(key, 1, 8), 16, 10).cast("long").as("sh"),
            conv(substring(key, 9, 8), 16, 10).cast("long").as("ord"))
          .select(col("doc_id"), (col("sh") % 16).as("shard"), col("ord"))
          .groupBy("shard")
          .agg(count(lit(1)).as("n_docs"),
            min_by(col("doc_id"), struct(col("ord"), col("doc_id")))
              .as("first_doc"),
            max_by(col("doc_id"), struct(col("ord"), col("doc_id")))
              .as("last_doc"))
          .orderBy("shard")
      },
      // DuckDB arg_min/arg_max reject struct ordering keys, so the oracle
      // packs (ord, doc_id) into a HUGEINT with a 2^64 multiplier —
      // overflow-free for any ord < 2^32 and doc_id < 2^63.
      Some("""
        WITH k AS (
          SELECT doc_id,
                 ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':s7'), 1, 8))::BIGINT AS sh,
                 ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':s7'), 9, 8))::BIGINT AS ord
          FROM documents)
        SELECT CAST(sh % 16 AS BIGINT) AS shard, count(*) AS n_docs,
               arg_min(doc_id, CAST(ord AS HUGEINT) * 18446744073709551616 + doc_id) AS first_doc,
               arg_max(doc_id, CAST(ord AS HUGEINT) * 18446744073709551616 + doc_id) AS last_doc
        FROM k GROUP BY 1 ORDER BY shard""")
    ),
    QueryDef(
      "text_clean",
      (s, dir) => TextOps.cleanText(Tables.read(s, dir, "documents")),
      Some("""
        SELECT doc_id, length(text) AS raw_chars,
               trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')) AS clean_text,
               length(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))) AS clean_chars
        FROM documents ORDER BY doc_id""")
    ),
    QueryDef(
      "quality_repetition",
      (s, dir) =>
        TextOps.repetitionSignals(Tables.read(s, dir, "documents")),
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
      "pii_scrub",
      // PII redaction — the curation pass every web-scale corpus runs
      // before training. The synthetic documents carry no PII, so the
      // regexes are exercised on a contact string derived from customer
      // columns (email + IPv4 + phone per row); patterns stay in the
      // RE2 ∩ java.util.regex common subset (char classes, bounded
      // repetition, \b) so both engines agree byte-for-byte.
      // regexp_replace/regexp_count are codegen'd — one pass per pattern,
      // no UDF; at 100 TB this is a map-only stage with zero shuffle.
      (s, dir) => {
        val emailPat = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
        val ipPat = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
        val phonePat = "\\b555-\\d{4}\\b"
        Tables.read(s, dir, "customer")
          .withColumn("contact", concat(
            lower(regexp_replace(col("c_name"), "#", ".")),
            lit("@corp.example ip=10."),
            (col("c_custkey") % 256).cast("string"),
            lit(".0.7 call 555-"),
            lpad((col("c_custkey") % 10000).cast("string"), 4, "0")))
          .select(
            col("c_custkey"),
            regexp_count(col("contact"), lit(emailPat)).as("n_email"),
            regexp_count(col("contact"), lit(ipPat)).as("n_ip"),
            regexp_count(col("contact"), lit(phonePat)).as("n_phone"),
            regexp_replace(regexp_replace(regexp_replace(col("contact"),
              emailPat, "[EMAIL]"), ipPat, "[IP]"), phonePat, "[PHONE]")
              .as("scrubbed"))
          .orderBy("c_custkey")
      },
      Some("""
        WITH c AS (
          SELECT c_custkey,
                 lower(replace(c_name, '#', '.')) || '@corp.example ip=10.' ||
                 CAST(c_custkey % 256 AS VARCHAR) || '.0.7 call 555-' ||
                 lpad(CAST(c_custkey % 10000 AS VARCHAR), 4, '0') AS contact
          FROM customer)
        SELECT c_custkey,
               len(regexp_extract_all(contact, '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}')) AS n_email,
               len(regexp_extract_all(contact, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS n_ip,
               len(regexp_extract_all(contact, '\b555-\d{4}\b')) AS n_phone,
               regexp_replace(regexp_replace(regexp_replace(contact,
                 '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}', '[EMAIL]', 'g'),
                 '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '[IP]', 'g'),
                 '\b555-\d{4}\b', '[PHONE]', 'g') AS scrubbed
        FROM c ORDER BY c_custkey""")
    ),
    QueryDef(
      "ngram_counts",
      // Corpus-wide top-20 bigram frequencies — the language-model n-gram
      // statistics pass. explode + groupBy compiles to a partial (map-side)
      // aggregate before the shuffle, so the wire carries one row per
      // distinct bigram per task, not one per occurrence; the top-20 is a
      // TakeOrderedAndProject (per-partition heaps, no global sort).
      // Round-16 probe, NOT kept: widening the scan measured 0.52 -> 0.63
      // (median of 5) — the space-split is cheap and the bigram aggregate
      // partial-aggregates map-side, so the extra exchange does not pay.
      (s, dir) =>
        Tables.read(s, dir, "documents")
          .select(split(col("text"), " ").as("ts"))
          .where(size(col("ts")) >= 2)
          .select(explode(expr(
            "transform(sequence(1, size(ts) - 1), i -> concat_ws(' ', ts[i-1], ts[i]))"))
            .as("bigram"))
          .groupBy("bigram")
          .agg(count(lit(1)).as("n"))
          .orderBy(col("n").desc, col("bigram"))
          .limit(20),
      Some("""
        WITH toks AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
        bg AS (
          SELECT unnest(list_transform(range(2, len(ts) + 1),
                   i -> ts[i - 1] || ' ' || ts[i])) AS bigram
          FROM toks WHERE len(ts) >= 2)
        SELECT bigram, count(*) AS n FROM bg GROUP BY bigram
        ORDER BY n DESC, bigram LIMIT 20""")
    ),
    QueryDef(
      "ngram_lm_prob",
      // Bigram language-model estimation: P(w2|w1) = c(w1,w2) / c(w1·) for
      // the corpus's top-20 bigrams — the MLE table an n-gram LM / quality
      // filter trains. One bigram explode feeds BOTH counts (the w1
      // continuation total derives from the bigram table itself, no second
      // pass); the vocab-sized n1 table broadcasts; ratio is one
      // long/long→double division at the projection. Top-20 under the
      // total order (n12 DESC, w1, w2) → TakeOrderedAndProject.
      // Round-16 probe, NOT kept: widen measured 0.70 -> 0.82 (median of 5)
      // — same reason as ngram_counts.
      (s, dir) => {
        val bi = Tables.read(s, dir, "documents")
          .select(split(col("text"), " ").as("ts"))
          .where(size(col("ts")) >= 2)
          .select(explode(expr(
            "transform(sequence(1, size(ts) - 1), i -> struct(ts[i-1] AS w1, ts[i] AS w2))")).as("b"))
          .select(col("b.w1").as("w1"), col("b.w2").as("w2"))
        val n12 = bi.groupBy("w1", "w2").agg(count(lit(1)).as("n12"))
        val n1 = n12.groupBy("w1").agg(sum(col("n12")).as("n1"))
        n12.join(broadcast(n1), "w1")
          .select(col("w1"), col("w2"), col("n12"), col("n1"),
            round(col("n12").cast("double") / col("n1").cast("double"), 6).as("p"))
          .orderBy(col("n12").desc, col("w1"), col("w2"))
          .limit(20)
      },
      Some("""
        WITH toks AS (SELECT string_split(text, ' ') AS ts FROM documents),
        bi AS (
          SELECT unnest(list_transform(range(2, len(ts) + 1),
                   i -> struct_pack(w1 := ts[i - 1], w2 := ts[i]))) AS b
          FROM toks WHERE len(ts) >= 2),
        n12 AS (SELECT b.w1 AS w1, b.w2 AS w2, count(*) AS n12
                FROM bi GROUP BY 1, 2),
        n1 AS (SELECT w1, CAST(sum(n12) AS BIGINT) AS n1 FROM n12 GROUP BY 1)
        SELECT w1, w2, n12, n1,
               round(CAST(n12 AS DOUBLE) / CAST(n1 AS DOUBLE), 6) AS p
        FROM n12 JOIN n1 USING (w1)
        ORDER BY n12 DESC, w1, w2 LIMIT 20""")
    ),
    QueryDef(
      "text_lm_score",
      // Perplexity-style quality filter: score each document by its mean
      // Laplace-smoothed bigram log-probability under the corpus's own
      // bigram LM — the classic "train a cheap LM on the corpus, drop
      // docs it finds surprising" curation gate (kenlm-filter shape).
      // Each bigram's ln term quantizes to a 1e-6 long IN THE LM TABLE
      // (one value per distinct bigram — order-independent sums per doc);
      // the LM is vocab²-bounded and broadcasts. Scores for doc_id < 50.
      // Round-16 probe, NOT kept: widen measured 0.85 -> 1.27 (median of 5)
      // — both bi consumers re-pay the exchange; the split itself is cheap.
      (s, dir) => {
        val bi = Tables.read(s, dir, "documents")
          .select(col("doc_id"), split(col("text"), " ").as("ts"))
          .where(size(col("ts")) >= 2)
          .select(col("doc_id"), explode(expr(
            "transform(sequence(1, size(ts) - 1), i -> struct(ts[i-1] AS w1, ts[i] AS w2))")).as("b"))
          .select(col("doc_id"), col("b.w1").as("w1"), col("b.w2").as("w2"))
        val n12 = bi.groupBy("w1", "w2").agg(count(lit(1)).as("n12"))
        val n1 = n12.groupBy("w1").agg(sum(col("n12")).as("n1"))
        val v = n12.select("w2").distinct().agg(count(lit(1)).as("vsz"))
        val lm = n12.join(n1, "w1").crossJoin(v)
          .select(col("w1"), col("w2"),
            floor(log((col("n12") + 1).cast("double") /
              (col("n1") + col("vsz")).cast("double")) * 1e6 + 0.5)
              .cast("long").as("term_e6"))
        bi.filter(col("doc_id") < 50)
          .join(broadcast(lm), Seq("w1", "w2"))
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_bigrams"),
            round((sum(col("term_e6")).cast("double") / 1e6) /
              count(lit(1)).cast("double"), 4).as("avg_logprob"))
          .orderBy("doc_id")
      },
      Some("""
        WITH t AS (SELECT doc_id, string_split(text, ' ') AS ts
                   FROM documents WHERE len(string_split(text, ' ')) >= 2),
        bi AS (
          SELECT doc_id,
                 unnest(list_transform(range(2, len(ts) + 1),
                   i -> struct_pack(w1 := ts[i - 1], w2 := ts[i]))) AS b
          FROM t),
        bt AS (SELECT doc_id, b.w1 AS w1, b.w2 AS w2 FROM bi),
        n12 AS (SELECT w1, w2, count(*) AS n12 FROM bt GROUP BY 1, 2),
        n1 AS (SELECT w1, CAST(sum(n12) AS BIGINT) AS n1 FROM n12 GROUP BY 1),
        v AS (SELECT count(DISTINCT w2) AS vsz FROM n12),
        lm AS (
          SELECT w1, w2,
                 CAST(floor(ln(CAST(n12 + 1 AS DOUBLE) /
                   CAST(n1 + vsz AS DOUBLE)) * 1e6 + 0.5) AS BIGINT)
                   AS term_e6
          FROM n12 JOIN n1 USING (w1), v)
        SELECT doc_id, count(*) AS n_bigrams,
               round((CAST(sum(term_e6) AS DOUBLE) / 1e6) /
                 CAST(count(*) AS DOUBLE), 4) AS avg_logprob
        FROM bt JOIN lm USING (w1, w2)
        WHERE doc_id < 50
        GROUP BY doc_id ORDER BY doc_id""")
    ),
    QueryDef(
      "token_oov_rate",
      // Tokenizer-coverage audit: per-language out-of-vocabulary token
      // rate against the corpus's top-16 vocabulary — the metric that
      // decides vocab size / mixture reweighting before training. One
      // token-keyed count table feeds BOTH the vocab top-k and the
      // per-lang rollup (materialized once); the 16-row vocab broadcasts;
      // rate is the single final division.
      // Round-16 probe, NOT kept: widen measured 0.55 -> 0.52 — inside
      // run-to-run noise; not worth the added exchange.
      (s, dir) => {
        val tc = Tables.read(s, dir, "documents")
          .select(col("lang"), explode(expr(
            "filter(split(lower(text), '\\\\s+'), t -> t <> '')")).as("tok"))
          .groupBy("lang", "tok").agg(count(lit(1)).as("n"))
          .materialized
        val vocab = tc.groupBy("tok").agg(sum(col("n")).as("tot"))
          .orderBy(col("tot").desc, col("tok")).limit(16)
          .select(col("tok"), lit(1).as("inv"))
        tc.join(broadcast(vocab), Seq("tok"), "left_outer")
          .groupBy("lang")
          .agg(sum(col("n")).as("total_toks"),
            sum(when(col("inv").isNull, col("n")).otherwise(0L)).as("oov_toks"))
          .select(col("lang"), col("total_toks"), col("oov_toks"),
            round(col("oov_toks").cast("double") / col("total_toks").cast("double"), 6)
              .as("oov_rate"))
          .orderBy("lang")
      },
      Some("""
        WITH tc AS (
          SELECT lang, tok, count(*) AS n
          FROM (SELECT lang, unnest(list_filter(
                  string_split_regex(lower(text), '\s+'), t -> t <> '')) AS tok
                FROM documents)
          GROUP BY 1, 2),
        vocab AS (
          SELECT tok FROM (SELECT tok, sum(n) AS tot FROM tc GROUP BY 1)
          ORDER BY tot DESC, tok LIMIT 16)
        SELECT lang, CAST(sum(n) AS BIGINT) AS total_toks,
               CAST(sum(CASE WHEN tok NOT IN (SELECT tok FROM vocab)
                        THEN n ELSE 0 END) AS BIGINT) AS oov_toks,
               round(CAST(sum(CASE WHEN tok NOT IN (SELECT tok FROM vocab)
                        THEN n ELSE 0 END) AS DOUBLE) /
                     CAST(sum(n) AS DOUBLE), 6) AS oov_rate
        FROM tc GROUP BY lang ORDER BY lang""")
    ),
    QueryDef(
      "dedup_substring",
      // Exact duplicated-substring detection (Lee et al.'s dedup signal at
      // token 13-gram granularity): count, per document, the 13-grams that
      // also appear in at least one OTHER document. distinct
      // (doc, gram) pairs → gram frequency → join back. The gram shuffle
      // carries the raw 13-gram here for oracle comparability; the 100 TB
      // path shuffles xxhash64(gram) digests instead (8 bytes vs ~80) and
      // keeps the same downstream plan, exactly as dedup_exact hashes
      // bodies before its shuffle.
      (s, dir) => {
        val docs = Tables.read(s, dir, "documents")
        val grams = docs
          .select(col("doc_id"), split(col("text"), " ").as("ts"))
          .where(size(col("ts")) >= 13)
          .select(col("doc_id"), explode(expr(
            "transform(sequence(1, size(ts) - 12), i -> array_join(slice(ts, i, 13), ' '))"))
            .as("gram"))
          .distinct()
        val dup = grams.groupBy("gram").agg(count(lit(1)).as("c"))
          .where(col("c") > 1).select("gram")
        val perDoc = grams.join(dup, "gram")
          .groupBy("doc_id").agg(count(lit(1)).as("n_dup_grams"))
        docs.select("doc_id").join(perDoc, Seq("doc_id"), "left")
          .select(col("doc_id"),
            coalesce(col("n_dup_grams"), lit(0L)).as("n_dup_grams"))
          .orderBy("doc_id")
      },
      Some("""
        WITH toks AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
        g AS (
          SELECT DISTINCT doc_id, array_to_string(ts[i : i + 12], ' ') AS gram
          FROM toks, unnest(range(1, len(ts) - 11)) AS t(i)
          WHERE len(ts) >= 13),
        dup AS (SELECT gram FROM g GROUP BY gram HAVING count(*) > 1),
        per_doc AS (
          SELECT g.doc_id, count(*) AS n_dup_grams
          FROM g JOIN dup USING (gram) GROUP BY g.doc_id)
        SELECT d.doc_id, coalesce(p.n_dup_grams, 0) AS n_dup_grams
        FROM documents d LEFT JOIN per_doc p ON d.doc_id = p.doc_id
        ORDER BY d.doc_id""")
    ),
    QueryDef(
      "dedup_substring_hashed",
      // The 100 TB shape of dedup_substring: every exchange carries
      // xxhash64(gram) digests (8 B) instead of raw ~80 B gram strings.
      // DuckDB can't evaluate xxhash64, but digest-distinct counts equal
      // string-distinct counts unless two 13-grams collide in 64 bits
      // (probability ~n²/2⁶⁵ — immaterial at any graded SF, and fenced by
      // RecallReport's set-equality grade vs the string twin), so the
      // string twin's oracle IS this query's exact oracle.
      (s, dir) => graft.ops.TextOps.duplicatedSubstringsHashed(
        Tables.read(s, dir, "documents")),
      Some("""
        WITH toks AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
        g AS (
          SELECT DISTINCT doc_id, array_to_string(ts[i : i + 12], ' ') AS gram
          FROM toks, unnest(range(1, len(ts) - 11)) AS t(i)
          WHERE len(ts) >= 13),
        dup AS (SELECT gram FROM g GROUP BY gram HAVING count(*) > 1),
        per_doc AS (
          SELECT g.doc_id, count(*) AS n_dup_grams
          FROM g JOIN dup USING (gram) GROUP BY g.doc_id)
        SELECT d.doc_id, coalesce(p.n_dup_grams, 0) AS n_dup_grams
        FROM documents d LEFT JOIN per_doc p ON d.doc_id = p.doc_id
        ORDER BY d.doc_id""")
    ),
    QueryDef(
      "dedup_substring_removal",
      // The REMOVAL step of exact substring dedup (Lee et al.): a token
      // position is removed iff it is covered by any 13-gram that also
      // appears in at least one OTHER document. Coverage = distinct
      // (doc, position) after exploding each duplicated gram's 13-token
      // span — set semantics make overlapping spans count once, so the
      // kept-token accounting is exact. All equi-joins (gram keys, then
      // the narrow position explode); per-doc output stays one row.
      (s, dir) => {
        val docs = Tables.read(s, dir, "documents")
        val toks = docs
          .select(col("doc_id"), split(col("text"), " ").as("ts"))
        val grams = toks
          .where(size(col("ts")) >= 13)
          .select(col("doc_id"), posexplode(expr(
            "transform(sequence(1, size(ts) - 12), i -> array_join(slice(ts, i, 13), ' '))")))
          .select(col("doc_id"), (col("pos") + 1).as("i"), col("col").as("gram"))
        val dup = grams.select("doc_id", "gram").distinct()
          .groupBy("gram").agg(count(lit(1)).as("c"))
          .where(col("c") > 1).select("gram")
        val covered = grams.join(dup, "gram")
          .select(col("doc_id"),
            explode(sequence(col("i"), col("i") + 12)).as("p"))
          .distinct()
          .groupBy("doc_id").agg(count(lit(1)).as("n_removed"))
        toks.select(col("doc_id"), size(col("ts")).cast("long").as("n_tokens"))
          .join(covered, Seq("doc_id"), "left")
          .select(col("doc_id"), col("n_tokens"),
            coalesce(col("n_removed"), lit(0L)).as("n_removed"),
            (col("n_tokens") - coalesce(col("n_removed"), lit(0L))).as("n_kept"))
          .orderBy("doc_id")
      },
      Some("""
        WITH toks AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
        g AS (
          SELECT doc_id, i, array_to_string(ts[i : i + 12], ' ') AS gram
          FROM toks, unnest(range(1, len(ts) - 11)) AS t(i)
          WHERE len(ts) >= 13),
        dup AS (SELECT gram FROM (SELECT DISTINCT doc_id, gram FROM g)
                GROUP BY gram HAVING count(*) > 1),
        cov AS (
          SELECT doc_id, count(DISTINCT p) AS n_removed
          FROM g JOIN dup USING (gram), unnest(range(g.i, g.i + 13)) AS u(p)
          GROUP BY doc_id)
        SELECT t.doc_id, CAST(len(t.ts) AS BIGINT) AS n_tokens,
               CAST(coalesce(c.n_removed, 0) AS BIGINT) AS n_removed,
               CAST(len(t.ts) - coalesce(c.n_removed, 0) AS BIGINT) AS n_kept
        FROM toks t LEFT JOIN cov c ON t.doc_id = c.doc_id
        ORDER BY t.doc_id""")
    ),
    QueryDef(
      "agg_heavy_hitters",
      // Exact corpus-wide frequent tokens (> 2% of all occurrences) via
      // the two-pass Misra–Gries pattern (see TextOps.heavyHitters): the
      // candidate sketch pass replaces the full-vocabulary groupBy — at
      // 100 TB that is the difference between shuffling every distinct
      // token and broadcasting a few hundred candidates.
      // Round-16 probe, deliberately NOT kept: staging the tokenize into a
      // widened checkpoint (the token_cooccurrence round-16 shape) was
      // A/B-measured SLOWER here — plain 0.80 s vs widen-only 1.21 vs
      // staged+widened 1.16 (medians of 5, one warm session): with only
      // TWO consumers and no pair expansion, the extra exchange /
      // checkpoint costs more than the saved scan+split at this scale.
      // The two-pass shape over the raw scan stays.
      (s, dir) => TextOps.heavyHitters(
        Tables.read(s, dir, "documents")
          .select(explode(split(col("text"), " ")).as("tok")),
        "tok", denom = 50),
      Some("""
        WITH t AS (SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
        tot AS (SELECT count(*) AS total FROM t),
        c AS (SELECT tok, count(*) AS n FROM t GROUP BY tok)
        SELECT tok, n FROM c, tot WHERE n * 50 > total
        ORDER BY n DESC, tok""")
    ),
    QueryDef(
      "udtf_explode_outer",
      // Null-preserving explode: documents whose filtered token list is
      // EMPTY keep one null row (explode_outer) instead of vanishing — the
      // left-join semantics every enrichment explode needs when "no
      // matches" is itself information. DuckDB lacks an outer unnest, so
      // the oracle pads empty lists with [NULL] first — same contract.
      (s, dir) =>
        Tables.read(s, dir, "documents")
          .select(col("doc_id"),
            explode_outer(expr(
              "filter(split(text, ' '), t -> t like 'q%')")).as("q_token"))
          .orderBy("doc_id", "q_token"),
      Some("""
        WITH l AS (
          SELECT doc_id,
                 list_filter(string_split(text, ' '), t -> t LIKE 'q%') AS qs
          FROM documents)
        SELECT doc_id,
               unnest(CASE WHEN len(qs) = 0 THEN [NULL] ELSE qs END) AS q_token
        FROM l ORDER BY doc_id, q_token""")
    ),
    QueryDef(
      "token_cooccurrence",
      // Document-level co-occurrence counts over a BOUNDED vocabulary: the
      // all-pairs blowup (|tokens|² per doc) is tamed by first restricting
      // to the corpus-frequent tokens (> 2%, the same exact heavy-hitter
      // set as agg_heavy_hitters). The heavy vocabulary is sublinear in
      // corpus size, so it collapses to ONE broadcast array row; each doc
      // intersects its token set with it locally and emits its ordered
      // pairs in place (nested transform over the sorted intersection —
      // i < j gives tok_a < tok_b for free). No self-join, no re-shuffle
      // of the doc-token table: the only wide exchange on the doc path is
      // the final pair aggregation, which is map-side combinable. Top-20
      // pairs by document frequency.
      (s, dir) => {
        // Round-16 single-pass token staging (VERDICT r15 #1): ONE widened
        // tokenize, checkpoint-materialized; the MG candidate pass, the
        // exact-count pass AND the pair pass below all read the staged
        // arrays — before this the corpus was scanned + split three times.
        val ts = graft.ops.SparkOps.widen(
            Tables.read(s, dir, "documents").select(col("text")))
          .select(split(col("text"), " ").as("ts"))
          .materialized
        val tokens = ts.select(explode(col("ts")).as("tok"))
        val heavyArr = TextOps.heavyHitters(tokens, "tok", denom = 50)
          .agg(sort_array(collect_list(col("tok"))).as("hv"))
        ts.crossJoin(broadcast(heavyArr))
          .select(array_sort(array_intersect(
            array_distinct(col("ts")), col("hv"))).as("h"))
          .select(explode(expr(
            """CASE WHEN size(h) < 2
                 THEN cast(array() as array<struct<tok_a: string, tok_b: string>>)
                 ELSE flatten(transform(sequence(1, size(h) - 1),
                   j -> transform(sequence(0, j - 1),
                     i -> struct(h[i] AS tok_a, h[j] AS tok_b))))
               END""")).as("p"))
          .select(col("p.tok_a").as("tok_a"), col("p.tok_b").as("tok_b"))
          .groupBy("tok_a", "tok_b")
          .agg(count(lit(1)).as("n_docs"))
          .orderBy(col("n_docs").desc, col("tok_a"), col("tok_b"))
          .limit(20)
      },
      Some("""
        WITH t AS (SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
        tot AS (SELECT count(*) AS total FROM t),
        heavy AS (
          SELECT tok FROM t, tot GROUP BY tok, total
          HAVING count(*) * 50 > total),
        dt AS (
          SELECT DISTINCT doc_id, tok
          FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
                FROM documents)
          WHERE tok IN (SELECT tok FROM heavy)),
        p AS (
          SELECT a.tok AS tok_a, b.tok AS tok_b, count(*) AS n_docs
          FROM dt a JOIN dt b ON a.doc_id = b.doc_id AND a.tok < b.tok
          GROUP BY 1, 2)
        SELECT tok_a, tok_b, n_docs FROM p
        ORDER BY n_docs DESC, tok_a, tok_b LIMIT 20""")
    ),
    QueryDef(
      "quality_surprise",
      // Bigram-LM rarity score: mean inverse add-one-smoothed conditional
      // probability of each document's bigrams under the corpus model —
      // the perplexity-style "how unusual is this text" quality signal,
      // computed ENTIRELY in integer arithmetic ((c1+V)·1e6 div (c2+1),
      // exact long sums, integer mean). A log-domain NLL would hang
      // engine-portability on libm's last ulp; the inverse-probability
      // form ranks documents the same way and is bit-stable anywhere.
      // Scale: two corpus-stat aggregates (map-side combinable), then the
      // per-occurrence joins key on bigram/unigram — model tables are
      // vocabulary-sized (sublinear in corpus), broadcast here, shuffle
      // (with AQE skew split on stopword-hot tokens) at 100 TB.
      (s, dir) => {
        val toksDf = Tables.read(s, dir, "documents")
          .select(col("doc_id"), split(col("text"), " ").as("ts"))
        val uni = toksDf.select(explode(col("ts")).as("w1"))
          .groupBy("w1").agg(count(lit(1)).as("c1"))
        val vDf = uni.agg(count(lit(1)).as("v"))
        // Round-15 probe, deliberately NOT kept: re-graining to
        // (doc, bigram, k) before the model joins A/B-measured SLOWER at
        // sf0.1 (1.57 vs 1.48 median-of-5) — this corpus repeats almost
        // no bigram within a document (k≈1), so the extra grain exchange
        // + checkpoint buys nothing. The per-occurrence shape stays.
        // Round-16 probe, also NOT kept: widening toksDf (2.58 -> 3.11)
        // and widen+checkpoint staging (2.82) both measured slower — the
        // plain space-split is cheap per row, the cost lives in the
        // bigram/unigram model joins, so extra exchanges don't pay here.
        val bg = toksDf.where(size(col("ts")) >= 2)
          .select(col("doc_id"), explode(expr(
            "transform(sequence(1, size(ts) - 1), i -> struct(ts[i-1] AS w1, concat_ws(' ', ts[i-1], ts[i]) AS b))"))
            .as("x"))
          .select(col("doc_id"), col("x.w1").as("w1"), col("x.b").as("b"))
        val big = bg.groupBy("b").agg(count(lit(1)).as("c2"))
        bg.join(big, "b").join(uni, "w1").crossJoin(broadcast(vDf))
          .select(col("doc_id"),
            expr("((c1 + v) * 1000000) div (c2 + 1)").as("inv_q"))
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_bigrams"), sum(col("inv_q")).as("s"))
          .select(col("doc_id"), col("n_bigrams"),
            expr("s div n_bigrams").as("surprise_q"))
          .orderBy("doc_id")
      },
      Some("""
        WITH toks AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
        uni AS (SELECT w1, count(*) AS c1
                FROM (SELECT unnest(ts) AS w1 FROM toks) GROUP BY w1),
        v AS (SELECT count(*) AS v FROM uni),
        bg AS (SELECT doc_id, ts[i - 1] AS w1, ts[i - 1] || ' ' || ts[i] AS b
               FROM toks, unnest(range(2, len(ts) + 1)) AS r(i)
               WHERE len(ts) >= 2),
        big AS (SELECT b, count(*) AS c2 FROM bg GROUP BY b),
        x AS (SELECT bg.doc_id, ((uni.c1 + v.v) * 1000000) // (big.c2 + 1) AS inv_q
              FROM bg JOIN big USING (b) JOIN uni USING (w1) CROSS JOIN v)
        SELECT doc_id, count(*) AS n_bigrams,
               CAST(sum(inv_q) // count(*) AS BIGINT) AS surprise_q
        FROM x GROUP BY doc_id ORDER BY doc_id""")
    ),
    QueryDef(
      "pack_sequences",
      // Sequence packing for pretraining: concatenate the corpus in doc_id
      // order and cut every 2048 tokens; each doc reports its global token
      // offset and the context-window bins it lands in. The global prefix
      // sum is TWO-PHASE — per-bucket partial sums, a tiny cumulative scan
      // over bucket totals (broadcast back), then a per-bucket window — so
      // no single-partition global window ever materializes; the same
      // doc_id-div bucketing gives deterministic bucket contents at any
      // parallelism. The oracle computes the naive single-window cumsum —
      // equality IS the proof the two-phase plan is exact.
      (s, dir) => {
        val C = 2048
        val bucketSz = 500L
        val docs = Tables.read(s, dir, "documents")
          .select(col("doc_id"),
            size(split(col("text"), " ")).cast("long").as("n_tokens"))
          .withColumn("part", expr(s"doc_id div $bucketSz"))
        val offsets = docs.groupBy("part").agg(sum("n_tokens").as("psum"))
          .withColumn("offset",
            coalesce(sum(col("psum")).over(
              Window.orderBy("part").rowsBetween(Window.unboundedPreceding, -1)),
              lit(0L)))
          .select("part", "offset")
        docs.join(broadcast(offsets), "part")
          .withColumn("end_off",
            col("offset") + sum(col("n_tokens")).over(
              Window.partitionBy("part").orderBy("doc_id")))
          .select(col("doc_id"), col("n_tokens"),
            (col("end_off") - col("n_tokens")).as("start_off"),
            expr(s"(end_off - n_tokens) div $C").as("first_bin"),
            expr(s"(end_off - 1) div $C").as("last_bin"),
            (expr(s"(end_off - n_tokens) div $C") =!= expr(s"(end_off - 1) div $C"))
              .as("crosses_boundary"))
          .orderBy("doc_id")
      },
      Some("""
        WITH d AS (SELECT doc_id, len(string_split(text, ' ')) AS n_tokens FROM documents),
        c AS (SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
                CAST(sum(n_tokens) OVER (ORDER BY doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS end_off
              FROM d)
        SELECT doc_id, n_tokens, end_off - n_tokens AS start_off,
               (end_off - n_tokens) // 2048 AS first_bin,
               (end_off - 1) // 2048 AS last_bin,
               ((end_off - n_tokens) // 2048) <> ((end_off - 1) // 2048) AS crosses_boundary
        FROM c ORDER BY doc_id""")
    ),
    QueryDef(
      "text_tfidf_search",
      (s, dir) =>
        TextOps.tfidfSearch(
          Tables.read(s, dir, "documents"),
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
    ),
    QueryDef(
      "text_bm25_search",
      // BM25 top-20 for the same query terms as text_tfidf_search — the
      // tf-saturating, length-normalized production scorer. Identical
      // float-op order on both sides; score floor-quantized to 1e-4.
      (s, dir) =>
        TextOps.bm25Search(
          Tables.read(s, dir, "documents"),
          Seq("data", "spark", "dup"), 20),
      Some("""
        WITH wl AS (
          SELECT doc_id,
                 len(list_filter(string_split_regex(lower(text), '\s+'),
                   t -> t <> '')) AS dl,
                 text
          FROM documents),
        stats AS (SELECT count(*) AS n_docs, sum(dl) AS sum_dl FROM wl),
        tok AS (
          SELECT doc_id, dl, unnest(list_filter(
            string_split_regex(lower(text), '\s+'),
            t -> t IN ('data', 'spark', 'dup'))) AS tok
          FROM wl),
        tf AS (SELECT doc_id, dl, tok, count(*) AS tf FROM tok GROUP BY 1, 2, 3),
        dft AS (SELECT tok, count(DISTINCT doc_id) AS df FROM tok GROUP BY tok),
        scored AS (
          SELECT tf.doc_id,
                 CAST(floor(sum(
                   ln((stats.n_docs - dft.df + 0.5) / (dft.df + 0.5) + 1.0)
                     * tf.tf * 2.2
                     / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * tf.dl * stats.n_docs / stats.sum_dl))
                 ) * 10000 + 0.5) AS BIGINT) AS score_e4
          FROM tf JOIN dft USING (tok) CROSS JOIN stats
          GROUP BY tf.doc_id)
        SELECT CAST(row_number() OVER (ORDER BY score_e4 DESC, doc_id) AS INTEGER) AS rank,
               doc_id, score_e4
        FROM scored
        ORDER BY score_e4 DESC, doc_id LIMIT 20""")
    ),
    QueryDef(
      "bpe_train_merges",
      // Distributed BPE tokenizer training: the first 6 learned merge
      // rules (the merge table IS the tokenizer artifact). Pair stats are
      // counted over the distinct-word vocab weighted by frequency; one
      // merge rule crosses the driver per iteration. The oracle replays
      // the identical greedy algorithm as 6 chained materialized CTEs.
      (s, dir) => TextOps.bpeTrainMerges(
        Tables.read(s, dir, "documents"), k = 6),
      Some(bpeTrainOracle(6))
    ),
    QueryDef(
      "bpe_encode",
      // BPE ENCODE — the apply side of the tokenizer: size every document
      // in learned-merge tokens (n_words, n_tokens per doc), the
      // "tokenizer cost on this corpus" statistic that sizes a training
      // run. The merge table is the O(k) driver-side artifact from
      // bpe_train_merges (cached per corpus and session, so in catalog
      // order this query reuses the training query's work); it is inlined
      // into the encode expression as literals, making the encode pure
      // map-side work — the only exchange is the map-side-combinable
      // per-document aggregate. The oracle re-derives the identical merge
      // table (same chained CTEs as bpe_train_merges' oracle, proven
      // engine-equal there) and replays the same two-pass replace per
      // word.
      (s, dir) => TextOps.bpeEncodeCounts(
        Tables.read(s, dir, "documents"), k = 6),
      Some(bpeEncodeOracle(6))
    ),
    QueryDef(
      "text_ngram_novelty",
      // Marginal-content curve: per doc, the fraction of its distinct
      // 13-grams whose FIRST corpus appearance (min doc_id) is this doc
      // — the "how much new content does each document add" metric
      // behind dedup-ordering and data-mixing decisions. Same gram
      // machinery as dedup_substring (distinct (doc, gram) pairs →
      // per-gram min → join back); every join is an equi-join on the
      // gram, and the 100 TB path ships gram digests instead of strings.
      (s, dir) => {
        val docsDf = Tables.read(s, dir, "documents")
        val grams = docsDf
          .select(col("doc_id"), split(col("text"), " ").as("ts"))
          .where(size(col("ts")) >= 13)
          .select(col("doc_id"), explode(expr(
            "transform(sequence(1, size(ts) - 12), i -> array_join(slice(ts, i, 13), ' '))"))
            .as("gram"))
          .distinct()
        val firstDoc = grams.groupBy("gram").agg(min(col("doc_id")).as("first_doc"))
        val perDoc = grams.groupBy("doc_id").agg(count(lit(1)).as("n_grams"))
        val novel = grams.join(firstDoc, "gram")
          .filter(col("doc_id") === col("first_doc"))
          .groupBy("doc_id").agg(count(lit(1)).as("n_novel"))
        docsDf.select("doc_id")
          .join(perDoc, Seq("doc_id"), "left")
          .join(novel, Seq("doc_id"), "left")
          .select(col("doc_id"),
            coalesce(col("n_grams"), lit(0L)).as("n_grams"),
            coalesce(col("n_novel"), lit(0L)).as("n_novel"),
            round(coalesce(col("n_novel"), lit(0L)).cast("double")
              / col("n_grams").cast("double"), 4).as("novelty"))
          .orderBy("doc_id")
      },
      Some("""
        WITH toks AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
        g AS (
          SELECT DISTINCT doc_id, array_to_string(ts[i : i + 12], ' ') AS gram
          FROM toks, unnest(generate_series(1, len(ts) - 12)) AS u(i)
          WHERE len(ts) >= 13),
        fd AS (SELECT gram, min(doc_id) AS first_doc FROM g GROUP BY gram),
        pd AS (SELECT doc_id, count(*) AS n_grams FROM g GROUP BY doc_id),
        nv AS (SELECT g.doc_id, count(*) AS n_novel
               FROM g JOIN fd USING (gram)
               WHERE g.doc_id = fd.first_doc GROUP BY g.doc_id)
        SELECT d.doc_id,
               CAST(coalesce(pd.n_grams, 0) AS BIGINT) AS n_grams,
               CAST(coalesce(nv.n_novel, 0) AS BIGINT) AS n_novel,
               round(CAST(coalesce(nv.n_novel, 0) AS DOUBLE)
                 / CAST(pd.n_grams AS DOUBLE), 4) AS novelty
        FROM documents d
          LEFT JOIN pd USING (doc_id) LEFT JOIN nv USING (doc_id)
        ORDER BY d.doc_id""")
    ),
    QueryDef(
      "sample_weighted_k",
      // Weighted sampling WITHOUT RNG state — Efraimidis–Spirakis
      // reservoir as a pure top-k: each doc draws u from a deterministic
      // multiplicative hash (integer arithmetic, engine-identical) and
      // ranks by ln(u)/w with w = n_chars; the top-k by that key is a
      // weighted sample without replacement, reproducible across runs,
      // engines, and retries (the property rand() cannot give).
      // Distributed shape: pure map + TakeOrderedAndProject — no
      // shuffle. Keys are 1e-9-quantized to integers before ranking so
      // the order never hinges on a last double ulp.
      (s, dir) => {
        val M = 4294967296L // 2^32
        val u = ((col("doc_id") * lit(2654435761L)) % M + 1L).cast("double") /
          lit((M + 1L).toDouble)
        Tables.read(s, dir, "documents")
          .filter(col("n_chars") > 0)
          .select(col("doc_id"), col("n_chars"),
            floor(log(u) / col("n_chars").cast("double") * 1e9 + 0.5)
              .cast("long").as("key_e9"))
          .orderBy(col("key_e9").desc, col("doc_id"))
          .limit(20)
      },
      Some("""
        SELECT doc_id, n_chars,
               CAST(floor(ln(CAST((doc_id * 2654435761) % 4294967296 + 1
                   AS DOUBLE) / 4294967297.0)
                 / CAST(n_chars AS DOUBLE) * 1e9 + 0.5) AS BIGINT) AS key_e9
        FROM documents WHERE n_chars > 0
        ORDER BY key_e9 DESC, doc_id LIMIT 20""")
    ),
    QueryDef(
      "doc_length_profile",
      // Per-language length distribution (exact p50/p95 of n_chars) —
      // the statistic that sizes chunking, packing, and length-filter
      // thresholds for a training corpus. Positional selection over a
      // unique (n_chars, doc_id) total order: integer rank positions,
      // no interpolation, no per-group buffering (agg_median_selection's
      // shape on the documents table).
      (s, dir) => {
        val ranked = Window.partitionBy(col("lang"))
          .orderBy(col("n_chars"), col("doc_id"))
        val whole = Window.partitionBy(col("lang"))
        Tables.read(s, dir, "documents")
          .select(col("lang"), col("n_chars"), col("doc_id"))
          .withColumn("rn", row_number().over(ranked))
          .withColumn("n", count(lit(1)).over(whole))
          .filter(col("rn") === expr("(n + 1) div 2") ||
            col("rn") === expr("(n * 95 + 99) div 100"))
          .groupBy("lang")
          .agg(max(col("n")).as("n_docs"),
            max(when(col("rn") === expr("(n + 1) div 2"), col("n_chars")))
              .as("p50_chars"),
            max(when(col("rn") === expr("(n * 95 + 99) div 100"), col("n_chars")))
              .as("p95_chars"))
          .orderBy("lang")
      },
      Some("""
        WITH r AS (
          SELECT lang, n_chars, doc_id,
                 row_number() OVER (PARTITION BY lang
                   ORDER BY n_chars, doc_id) AS rn,
                 count(*) OVER (PARTITION BY lang) AS n
          FROM documents)
        SELECT lang, max(n) AS n_docs,
               max(CASE WHEN rn = (n + 1) // 2 THEN n_chars END) AS p50_chars,
               max(CASE WHEN rn = (n * 95 + 99) // 100 THEN n_chars END)
                 AS p95_chars
        FROM r WHERE rn = (n + 1) // 2 OR rn = (n * 95 + 99) // 100
        GROUP BY lang ORDER BY lang""")
    ),
    QueryDef(
      "dedup_normalized",
      // First-line web dedup: exact dedup AFTER normalization (casefold,
      // punctuation → space, whitespace collapse) — catches the
      // near-identical boilerplate raw hashing misses, at exact-dedup
      // cost. Same shuffle economics as dedup_exact: the group key is
      // the 32-byte digest of the normalized body, never the body
      // itself. Reports the surviving doc and how many collapsed into
      // it.
      (s, dir) => {
        val norm = trim(regexp_replace(
          regexp_replace(lower(col("text")), "[^a-z0-9 ]", " "), " +", " "))
        Tables.read(s, dir, "documents")
          .groupBy(sha2(norm, 256))
          .agg(min(col("doc_id")).as("doc_id"), count(lit(1)).as("n_collapsed"))
          .select("doc_id", "n_collapsed")
          .orderBy("doc_id")
      },
      Some("""
        WITH n AS (
          SELECT doc_id,
                 trim(regexp_replace(regexp_replace(lower(text),
                   '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')) AS norm
          FROM documents)
        SELECT min(doc_id) AS doc_id, count(*) AS n_collapsed
        FROM n GROUP BY norm ORDER BY doc_id""")
    ),
    QueryDef(
      "text_compression_ratio",
      // Deflate-ratio quality signal (the Gopher/RefinedWeb filter:
      // highly compressible text ⇒ boilerplate/repetition, ratio near 1
      // ⇒ noise): DEFLATE at fixed level 6 per document inside a scalar
      // UDF — a justified UDF, the byte-level LZ77 loop has no Catalyst
      // expression — pure map-side, no shuffle beyond the final sort
      // (Approx.deflateRatio). DuckDB has no deflate, so the verdict
      // frame grades the format's GUARANTEED invariant per document
      // (never a corpus-dependent bound — a 44-char incompressible doc
      // legitimately exceeds ratio 1.2 from the fixed zlib framing):
      // exact char count (replayable) + 0 < compressed_bytes ≤
      // n_bytes + 11 + 5·⌈n_bytes/16383⌉, the zlib worst case (2-byte
      // header + 4-byte Adler32 + ≤5 bytes of stored-block framing per
      // 16383-byte block, +1 slack). RecallSpec keeps the stronger
      // corpus fences (determinism across reruns, repetition separating
      // far below natural text, ratios in (0, 1.2) on THIS corpus).
      (s, dir) =>
        Approx.deflateRatio(Tables.read(s, dir, "documents"))
          .select(col("doc_id"), col("n_chars"),
            (col("n_deflate") > 0L &&
              col("n_deflate") <= col("n_bytes") + 12L +
                ceil(col("n_bytes") / 16383.0).cast("long") * 5L)
              .as("ratio_ok"),
            // band: docs ≥ 256 bytes must DEFLATE to ≤ 0.8× (natural text
            // measures ≤ 0.57 at all three SFs — band 1 means the
            // compressibility signal is degrading); shorter docs get the
            // true zlib single-block worst case of 11 excess bytes
            // (2 header + 4 Adler32 + 5 stored-block framing; measured
            // max excess 6), which is format-guaranteed, not corpus luck
            when(col("n_deflate") <= 0L, lit(0)).otherwise(
              Approx.errorBand(
                (col("n_deflate") - col("n_bytes")).cast("double"),
                when(col("n_bytes") >= Approx.DeflateBigDocBytes,
                  col("n_bytes") * (Approx.DeflateBigDocRatioWatch - 1.0))
                  .otherwise(lit(Approx.DeflateSmallDocExcessWatch.toDouble)),
                lit(12.0) + ceil(col("n_bytes") / 16383.0) * 5.0))
              .as("ratio_band"))
          .orderBy("doc_id"),
      Some("""
        SELECT doc_id, length(text) AS n_chars, TRUE AS ratio_ok,
               2 AS ratio_band
        FROM documents ORDER BY doc_id""")
    ),
    QueryDef(
      "text_zipf_alpha",
      // Zipf exponent of the corpus token distribution — the
      // rank-frequency log-log regression over the top-100 types (the
      // corpus-statistics twin of events_powerlaw_alpha's MLE, but the
      // rank-regression estimator lexicographers actually plot). Both
      // ln axes quantize to e6 longs BEFORE any sum; the normal-equation
      // sums Sx/Sy/Sxy/Sxx are exact integer folds over a bounded
      // 100-row frame, and one double division closes the slope. The only
      // data-sized work is the token count; ranking is a top-100
      // TakeOrdered, never a global sort.
      (s, dir) => {
        val freq = Tables.read(s, dir, "documents")
          .select(explode(
            expr("filter(split(lower(text), '\\\\s+'), t -> t <> '')")).as("tok"))
          .groupBy("tok").agg(count(lit(1)).as("f"))
          .orderBy(col("f").desc, col("tok")).limit(100)
        val pts = freq
          .withColumn("r", row_number().over(
            Window.orderBy(col("f").desc, col("tok"))))
          .select(
            floor(log(col("r").cast("double")) * 1e6 + 0.5).cast("long").as("x"),
            floor(log(col("f").cast("double")) * 1e6 + 0.5).cast("long").as("y"))
        pts.agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
            sum(col("y")).as("sy"), sum(col("x") * col("y")).as("sxy"),
            sum(col("x") * col("x")).as("sxx"))
          .select(col("n"),
            // degenerate corpus (<2 distinct types → all points share one
            // rank): slope is undefined — NULL in both engines, never 0/0
            round((col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
              nullif((col("n") * col("sxx") - col("sx") * col("sx")).cast("double"),
                lit(0.0)), 4)
              .as("zipf_slope"))
      },
      Some("""
        WITH f AS (
          SELECT unnest(list_filter(string_split_regex(lower(text), '\s+'),
                   t -> t <> '')) AS tok
          FROM documents),
        c AS (SELECT tok, count(*) AS f FROM f GROUP BY tok
              ORDER BY f DESC, tok LIMIT 100),
        p AS (
          SELECT CAST(floor(ln(CAST(row_number() OVER (ORDER BY f DESC, tok) AS DOUBLE)) * 1e6 + 0.5) AS BIGINT) AS x,
                 CAST(floor(ln(CAST(f AS DOUBLE)) * 1e6 + 0.5) AS BIGINT) AS y
          FROM c)
        SELECT count(*) AS n,
               round(CAST(count(*) * sum(x * y) - sum(x) * sum(y) AS DOUBLE) /
                     nullif(CAST(count(*) * sum(x * x) - sum(x) * sum(x) AS DOUBLE), 0.0),
                     4) AS zipf_slope
        FROM p""")
    ),
    QueryDef(
      "dedup_passage",
      // Passage-level dedup accounting (the granularity between exact-doc
      // and substring dedup that RAG/pretraining corpora dedupe at):
      // 30-token stride-20 windows (doc_chunking's grid), a chunk is
      // duplicated when its text occurs >= 2 times corpus-wide. The
      // chunk frequency table groups and joins on unhex'd md5 DIGESTS
      // (16-byte binary, not the 32-char hex string), so the shuffle
      // after the one chunking pass carries 16-byte keys, never passage
      // text; the dup ratio is integer flooring (e4).
      (s, dir) => {
        val chunks = TextOps
          .chunkDocuments(
            graft.ops.SparkOps.widen(Tables.read(s, dir, "documents")), 30, 20)
          .select(col("doc_id"), unhex(md5(col("chunk"))).as("dig"))
        val freq = chunks.groupBy("dig").agg(count(lit(1)).as("f"))
        chunks.join(freq, Seq("dig"))
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_chunks"),
            sum(when(col("f") >= 2, 1L).otherwise(0L)).as("n_dup_chunks"))
          .select(col("doc_id"), col("n_chunks"), col("n_dup_chunks"),
            // `div`, not `/`: integer floor division to mirror DuckDB //
            expr("n_dup_chunks * 10000L DIV n_chunks").as("dup_pct_e4"))
          .orderBy("doc_id")
      },
      Some("""
        WITH t AS (
          SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'),
                                     x -> x <> '') AS toks
          FROM documents),
        w AS (
          SELECT doc_id, unnest(list_transform(
                   range(0, greatest(CAST(ceil((len(toks) - 30) / 20.0) AS INT), 0) + 1),
                   w -> array_to_string(list_slice(toks, w * 20 + 1, w * 20 + 30), ' ')))
                 AS c
          FROM t),
        fr AS (SELECT c, count(*) AS f FROM w GROUP BY c)
        SELECT doc_id, count(*) AS n_chunks,
               CAST(sum(CASE WHEN fr.f >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_chunks,
               CAST(sum(CASE WHEN fr.f >= 2 THEN 1 ELSE 0 END) * 10000 // count(*) AS BIGINT) AS dup_pct_e4
        FROM w JOIN fr USING (c)
        GROUP BY doc_id ORDER BY doc_id""")
    ),
    QueryDef(
      "text_feature_hashing",
      // Hashing-trick featurization (the fastText/Vowpal-Wabbit recipe
      // that feeds corpus-quality classifiers): adjacent-token bigrams
      // hash into a fixed 8-bucket space, per-doc bucket counts are the
      // feature vector. Pure map-side explode + one (doc_id, bucket)
      // aggregate — the shuffle carries (id, small-int, count) rows, never
      // text, so the shape is flat in corpus size. Bucket ids come from
      // the same md5-prefix integer both engines compute bit-identically.
      (s, dir) => {
        graft.ops.SparkOps.widen(Tables.read(s, dir, "documents"))
          .select(col("doc_id"),
            expr("filter(split(lower(text), '\\\\s+'), t -> t <> '')").as("toks"))
          // sequence(a, b) DESCENDS when a > b — the size >= 2 guard keeps
          // singleton docs from producing a negative-step sequence.
          .select(col("doc_id"),
            explode(expr("""CASE WHEN size(toks) >= 2
              THEN transform(sequence(0, size(toks) - 2),
                             i -> concat(toks[i], ' ', toks[i + 1]))
              ELSE array() END""")).as("bg"))
          .select(col("doc_id"),
            (conv(substring(md5(col("bg")), 1, 8), 16, 10).cast("long") % 8)
              .as("bucket"))
          .groupBy("doc_id", "bucket")
          .agg(count(lit(1)).as("n"))
          .orderBy("doc_id", "bucket")
      },
      Some("""
        WITH toks AS (
          SELECT doc_id, list_filter(
            string_split_regex(lower(text), '\s+'), t -> t <> '') AS toks
          FROM documents),
        bg AS (
          SELECT doc_id,
                 unnest([toks[i] || ' ' || toks[i + 1] for i in range(1, len(toks))]) AS bg
          FROM toks WHERE len(toks) >= 2)
        SELECT doc_id,
               ('0x' || substr(md5(bg), 1, 8))::BIGINT % 8 AS bucket,
               count(*) AS n
        FROM bg GROUP BY 1, 2 ORDER BY doc_id, bucket""")
    ),
    QueryDef(
      "text_rrf_fusion",
      // Reciprocal-rank fusion (Cormack et al.) of the TF-IDF and BM25
      // rankings — the hybrid-retrieval merge step a curation pipeline
      // runs when combining lexical scorers: rrf = Σ 1/(60 + rank) over
      // the rankers that returned the doc. Operates on the two top-20
      // lists (bounded frames, broadcast-size by construction); the
      // contribution sum keeps one fixed order (tfidf first) so the
      // double math is bit-identical across engines, then quantizes e6.
      (s, dir) => {
        val docs = Tables.read(s, dir, "documents")
        val terms = Seq("data", "spark", "dup")
        val t = TextOps.tfidfSearch(docs, terms, 20)
          .select(col("doc_id"), col("rank").as("t_rank"))
        val b = TextOps.bm25Search(docs, terms, 20)
          .select(col("doc_id"), col("rank").as("b_rank"))
        t.join(b, Seq("doc_id"), "full_outer")
          .select(col("doc_id"),
            coalesce(col("t_rank"), lit(0)).as("tfidf_rank"),
            coalesce(col("b_rank"), lit(0)).as("bm25_rank"),
            floor(
              (when(col("t_rank").isNull, lit(0.0))
                  .otherwise(lit(1.0) / (col("t_rank") + 60)) +
                when(col("b_rank").isNull, lit(0.0))
                  .otherwise(lit(1.0) / (col("b_rank") + 60))) * 1000000 + 0.5)
              .cast("long").as("rrf_e6"))
          .withColumn("rank", row_number().over(
            Window.orderBy(col("rrf_e6").desc, col("doc_id"))))
          .select("rank", "doc_id", "tfidf_rank", "bm25_rank", "rrf_e6")
          .orderBy("rank")
      },
      Some("""
        WITH tok AS (
          SELECT doc_id, unnest(list_filter(
            string_split_regex(lower(text), '\s+'),
            t -> t IN ('data', 'spark', 'dup'))) AS tok
          FROM documents),
        tf0 AS (SELECT doc_id, tok, count(*) AS tf FROM tok GROUP BY doc_id, tok),
        df0 AS (SELECT tok, count(DISTINCT doc_id) AS df FROM tok GROUP BY tok),
        n0 AS (SELECT count(*) AS n_docs FROM documents),
        tscored AS (
          SELECT tf0.doc_id,
                 CAST(floor(sum(tf0.tf * ln(CAST(n0.n_docs AS DOUBLE) / df0.df)) * 10000 + 0.5) AS BIGINT) AS score_e4
          FROM tf0 JOIN df0 USING (tok) CROSS JOIN n0
          GROUP BY tf0.doc_id),
        tlist AS (
          SELECT CAST(row_number() OVER (ORDER BY score_e4 DESC, doc_id) AS INTEGER) AS t_rank, doc_id
          FROM tscored ORDER BY score_e4 DESC, doc_id LIMIT 20),
        wl AS (
          SELECT doc_id,
                 len(list_filter(string_split_regex(lower(text), '\s+'),
                   t -> t <> '')) AS dl,
                 text
          FROM documents),
        stats AS (SELECT count(*) AS n_docs, sum(dl) AS sum_dl FROM wl),
        btok AS (
          SELECT doc_id, dl, unnest(list_filter(
            string_split_regex(lower(text), '\s+'),
            t -> t IN ('data', 'spark', 'dup'))) AS tok
          FROM wl),
        btf AS (SELECT doc_id, dl, tok, count(*) AS tf FROM btok GROUP BY 1, 2, 3),
        bdft AS (SELECT tok, count(DISTINCT doc_id) AS df FROM btok GROUP BY tok),
        bscored AS (
          SELECT btf.doc_id,
                 CAST(floor(sum(
                   ln((stats.n_docs - bdft.df + 0.5) / (bdft.df + 0.5) + 1.0)
                     * btf.tf * 2.2
                     / (btf.tf + 1.2 * (1.0 - 0.75 + 0.75 * btf.dl * stats.n_docs / stats.sum_dl))
                 ) * 10000 + 0.5) AS BIGINT) AS score_e4
          FROM btf JOIN bdft USING (tok) CROSS JOIN stats
          GROUP BY btf.doc_id),
        blist AS (
          SELECT CAST(row_number() OVER (ORDER BY score_e4 DESC, doc_id) AS INTEGER) AS b_rank, doc_id
          FROM bscored ORDER BY score_e4 DESC, doc_id LIMIT 20),
        fused AS (
          SELECT COALESCE(tlist.doc_id, blist.doc_id) AS doc_id,
                 COALESCE(t_rank, 0) AS tfidf_rank,
                 COALESCE(b_rank, 0) AS bm25_rank,
                 CAST(floor(
                   (CASE WHEN t_rank IS NULL THEN 0.0 ELSE 1.0 / (t_rank + 60) END +
                    CASE WHEN b_rank IS NULL THEN 0.0 ELSE 1.0 / (b_rank + 60) END) * 1000000 + 0.5) AS BIGINT) AS rrf_e6
          FROM tlist FULL OUTER JOIN blist ON tlist.doc_id = blist.doc_id)
        SELECT CAST(row_number() OVER (ORDER BY rrf_e6 DESC, doc_id) AS INTEGER) AS rank,
               doc_id, tfidf_rank, bm25_rank, rrf_e6
        FROM fused ORDER BY rank""")
    )
  )

  /** The shared merge-training CTE chain of the two BPE oracles:
    * words/w0, then (p_i, m_i) per step with the vocabulary rewrite w_i
    * between steps — textually identical to bpe_train_merges' inline
    * oracle, generated here because the encode oracle needs the chain PLUS
    * a per-document encode chain on top.
    */
  /** One merge rule applied in SQL — guarded for MERGE EXHAUSTION: when
    * the corpus runs out of adjacent pairs before step i, `m_i` is empty
    * and its scalar subqueries are NULL, which would NULL-propagate
    * through regexp_replace and blank the whole chain; the CASE makes an
    * exhausted step the identity, matching the engine's early stop.
    */
  private def bpeApplyMergeSql(col: String, m: String): String =
    s"""CASE WHEN (SELECT a FROM $m) IS NULL THEN $col
                 ELSE regexp_replace(regexp_replace($col,
                   ' ' || (SELECT a FROM $m) || ' ' || (SELECT b FROM $m) || ' ',
                   ' ' || (SELECT a FROM $m) || (SELECT b FROM $m) || ' ', 'g'),
                   ' ' || (SELECT a FROM $m) || ' ' || (SELECT b FROM $m) || ' ',
                   ' ' || (SELECT a FROM $m) || (SELECT b FROM $m) || ' ', 'g') END"""

  private def bpeMergeCtes(k: Int): String = {
    val sb = new StringBuilder
    sb ++= raw"""words AS MATERIALIZED (
          SELECT w AS word, count(*) AS n
          FROM (SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS w FROM documents)
          GROUP BY w),
        w0 AS MATERIALIZED (SELECT ' ' || regexp_replace(word, '(.)', '\1 ', 'g') AS ws, n FROM words)"""
    for (i <- 1 to k) {
      sb ++= s""",
        p$i AS MATERIALIZED (SELECT pr[1] AS a, pr[2] AS b, sum(n) AS cnt
          FROM (SELECT n, unnest(list_transform(range(1, len(l)), j -> [l[j], l[j+1]])) AS pr
                FROM (SELECT n, string_split(trim(ws), ' ') AS l FROM w${i - 1}))
          GROUP BY 1, 2),
        m$i AS MATERIALIZED (SELECT a, b, cnt FROM p$i ORDER BY cnt DESC, a, b LIMIT 1)"""
      if (i < k) sb ++= s""",
        w$i AS MATERIALIZED (SELECT ${bpeApplyMergeSql("ws", s"m$i")} AS ws, n FROM w${i - 1})"""
    }
    sb.toString
  }

  private def bpeEncodeOracle(k: Int): String = {
    val enc = (1 to k).map(i => s""",
        e$i AS (SELECT doc_id, ${bpeApplyMergeSql("ws", s"m$i")} AS ws FROM e${i - 1})""").mkString
    raw"""
        WITH ${bpeMergeCtes(k)},
        docw AS MATERIALIZED (
          SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS word
          FROM documents),
        e0 AS (SELECT doc_id, ' ' || regexp_replace(word, '(.)', '\1 ', 'g') AS ws FROM docw)$enc
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
               CAST(sum(len(string_split(trim(ws), ' '))) AS BIGINT) AS n_tokens
        FROM e$k GROUP BY doc_id ORDER BY doc_id"""
  }

  /** The training oracle, generated from the SAME merge-CTE chain the
    * encode oracle uses (one definition, no drift). An exhausted step's
    * empty `m_i` contributes zero UNION ALL rows — matching the engine's
    * early stop.
    */
  private def bpeTrainOracle(k: Int): String = {
    val rows = (1 to k).map { i =>
      if (i == 1)
        "SELECT 1 AS step, a AS sym_a, b AS sym_b, CAST(cnt AS BIGINT) AS pair_count FROM m1"
      else s"UNION ALL SELECT $i, a, b, CAST(cnt AS BIGINT) FROM m$i"
    }.mkString("\n          ")
    raw"""
        WITH ${bpeMergeCtes(k)}
        SELECT * FROM (
          $rows)
        ORDER BY step"""
  }
}
