package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines: language ID,
  * quality scoring, token counting, content fingerprinting. All pure
  * `Column` expressions (codegen'd, pushdown-safe) — deliberately no UDFs;
  * every one of these runs per-row with no shuffle, so they scale linearly
  * and stack into a single WholeStageCodegen span over the scan.
  */
object TextOps {

  /** Per-language stopword seed lists for the n-gram/stopword heuristic. */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "it"),
    "es" -> Seq("el", "la", "de", "y", "en", "que", "los", "una"),
    "de" -> Seq("der", "die", "das", "und", "zu", "ist", "ein", "nicht"),
    "fr" -> Seq("le", "la", "de", "et", "en", "un", "une", "est"),
    "zh" -> Seq("的", "是", "不", "了", "在", "人", "有", "我")
  )

  private def inList(words: Seq[String]): String =
    words.map(w => s"'$w'").mkString("(", ", ", ")")

  /** Stopword-hit count per language as expression SQL over `toks`. */
  private def scoreExpr(lang: String): String =
    s"size(filter(toks, t -> t IN ${inList(stopwords(lang))}))"

  /** Language identification by stopword-hit ratios: deterministic argmax
    * with fixed priority order (en > es > de > fr > zh) on ties.
    */
  def langId(docs: DataFrame): DataFrame = {
    val langs = Seq("en", "es", "de", "fr", "zh")
    val scored = DedupOps.tokenSets(docs)
      .select(Seq(col("doc_id"), col("toks")) ++
        langs.map(l => expr(scoreExpr(l)).as(s"s_$l")): _*)
    val caseChain = langs.map { l =>
      val geAll = langs.filterNot(_ == l).map(o => s"s_$l >= s_$o").mkString(" AND ")
      s"WHEN $geAll THEN '$l'"
    }.mkString("CASE ", " ", " ELSE 'unk' END")
    scored.select(col("doc_id"),
      (langs.map(l => col(s"s_$l")).reduce(_ + _)).as("stopword_hits"),
      expr(caseChain).as("pred_lang"))
      .orderBy("doc_id")
  }

  /** Document quality score in [0,1]: mix of length saturation, mean token
    * length saturation, and English stopword ratio — the usual cheap
    * pre-filter before expensive model scoring. Engine-neutral arithmetic
    * (floor-trick rounding).
    */
  def qualityScore(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      expr("filter(split(lower(text), '\\\\s+'), t -> t <> '')").as("toks"),
      length(col("text")).as("len")
    ).select(
      col("doc_id"),
      size(col("toks")).as("n_tokens"),
      // punctuation density: non-alphanumeric, non-space chars per char
      expr(
        """floor((CAST(length(regexp_replace(concat_ws(' ', toks), '[A-Za-z0-9 ]', '')) AS DOUBLE) /
             greatest(length(concat_ws(' ', toks)), 1)) * 10000 + 0.5) / 10000""")
        .as("punct_ratio"),
      expr(
        s"""floor((
              0.25 * least(cast(size(toks) as double) / 100.0, 1.0) +
              0.25 * least((cast(length(concat_ws('', toks)) as double) /
                            greatest(size(toks), 1)) / 8.0, 1.0) +
              0.5  * (cast(size(filter(toks, t -> t IN ${inList(stopwords("en"))})) as double) /
                      greatest(size(toks), 1))
            ) * 10000 + 0.5) / 10000""").as("quality")
    ).orderBy("doc_id")

  /** Token counts: whitespace tokens plus a BPE-style pre-tokenizer count
    * (letter runs / digit runs / single non-space symbols) — the cheap
    * proxy for "how many tokens will the tokenizer emit".
    */
  def tokenCounts(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      size(expr("filter(split(lower(text), '\\\\s+'), t -> t <> '')")).as("n_ws_tokens"),
      size(expr("regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\\\s]', 0)"))
        .as("n_bpe_tokens")
    ).orderBy("doc_id")

  /** Pretraining chunker: split each document into overlapping token
    * windows of `windowTokens` with `strideTokens` advance (stride <
    * window ⇒ overlap). One row per chunk, per-row array ops only — no
    * shuffle, scales linearly with corpus size.
    */
  def chunkDocuments(
      docs: DataFrame,
      windowTokens: Int,
      strideTokens: Int
  ): DataFrame = {
    require(strideTokens > 0 && windowTokens > 0)
    docs
      .select(col("doc_id"),
        expr("filter(split(lower(text), '\\\\s+'), t -> t <> '')").as("toks"))
      .select(col("doc_id"),
        posexplode(expr(
          s"""transform(
                sequence(0, greatest(cast(ceil((size(toks) - $windowTokens) / cast($strideTokens as double)) as int), 0)),
                w -> concat_ws(' ', slice(toks, w * $strideTokens + 1, $windowTokens)))""")))
      .select(col("doc_id"), col("pos").as("chunk_idx"), col("col").as("chunk"),
        size(split(col("col"), " ")).as("chunk_tokens"))
      .orderBy("doc_id", "chunk_idx")
  }

  /** Deterministic train/validation/test split on a stable key column —
    * bucket by `key mod 100`: < valPct ⇒ "val", < valPct+testPct ⇒ "test",
    * else "train". Reproducible across runs/engines, no RNG.
    */
  def deterministicSplit(df: DataFrame, keyCol: String, valPct: Int, testPct: Int): DataFrame =
    df.withColumn("split",
      when(col(keyCol) % 100 < valPct, "val")
        .when(col(keyCol) % 100 < valPct + testPct, "test")
        .otherwise("train"))

  /** Content fingerprint from 8-char polynomial rolling hashes (base 31,
    * mod 1e9+7): per doc the minimum gram hash + distinct gram count —
    * an order-invariant signature comparable across engines (plain integer
    * arithmetic, no engine hash functions).
    */
  def fingerprint(docs: DataFrame): DataFrame = {
    // 31^7 .. 31^0 as explicit constants so both engines compute the exact
    // same integer polynomial.
    val pows = Seq(27512614111L, 887503681L, 28629151L, 923521L, 29791L, 961L, 31L, 1L)
    val terms = pows.zipWithIndex
      .map { case (p, j) => s"ascii(substr(text, p + $j, 1)) * cast($p as bigint)" }
      .mkString(" + ")
    // Entirely per-row (array_min / array_distinct on the gram array):
    // zero shuffle, stays in one codegen stage over the scan — vs the
    // naive explode + groupBy which shuffles |text| rows per document.
    docs.filter(length(col("text")) >= 8)
      .select(col("doc_id"),
        expr(s"transform(sequence(1, length(text) - 7), p -> ($terms) % 1000000007)")
          .as("grams"))
      .select(col("doc_id"),
        expr("array_min(grams)").as("min_gram_hash"),
        expr("size(array_distinct(grams))").cast("long").as("n_distinct_grams"))
      .orderBy("doc_id")
  }
}
