package graft.queries

import org.scalatest.funsuite.AnyFunSuite

/** Registry integrity: `SparkEntry.queries` is a Map, so a duplicated
  * QueryDef name would silently shadow an earlier query and its
  * correctness row would vanish without an error — exactly the failure
  * mode the harness can't see. Assert uniqueness and oracle hygiene here.
  */
class CatalogSpec extends AnyFunSuite {

  test("query names are unique — nothing is silently shadowed in the Map") {
    val names = Catalog.all.map(_.name)
    val dups = names.groupBy(identity).collect { case (n, g) if g.size > 1 => n }
    assert(dups.isEmpty, s"duplicate query names: ${dups.mkString(", ")}")
    assert(names.size == Catalog.queriesMap.size)
  }

  test("every oracle is non-empty SQL and every name is a valid identifier") {
    Catalog.all.foreach { q =>
      assert(q.name.matches("[a-z0-9_]+"), s"query name not snake_case: ${q.name}")
      q.oracle.foreach(sql =>
        assert(sql.trim.toUpperCase.startsWith("SELECT") ||
          sql.trim.toUpperCase.startsWith("WITH"),
          s"oracle for ${q.name} must be a SELECT/WITH statement"))
    }
  }

  test("rows-only queries (no oracle) are exactly the accuracy-graded set") {
    val rowsOnly = Catalog.all.filter(_.oracle.isEmpty).map(_.name).toSet
    // Each entry is graded against an exact twin or property fence:
    // most in RecallSpec (thresholded floors; CMS one-sided bound;
    // deflate-ratio bounds/determinism/separation). dedup_simhash and
    // dedup_substring_hashed graduated to exact SQL oracles in round 9
    // (md5-lower64 token hash / digest ≡ string counts) and keep their
    // set-equality grades as belt-and-braces.
    val accuracyGraded = Set(
      "dedup_minhash_lsh", "dedup_embedding_lsh",
      "similarity_lsh_topk", "similarity_lsh_topk_banded",
      "similarity_ivf_topk", "similarity_ivf_batch_topk",
      "similarity_pq_topk", "similarity_pq_batch_topk", "agg_approx_distinct",
      "agg_approx_percentile", "agg_hll_merge",
      "agg_cms_freq", "text_compression_ratio")
    assert(rowsOnly == accuracyGraded,
      s"every no-oracle query needs an exact-twin grading spec; unexpected: ${(rowsOnly -- accuracyGraded).mkString(", ")}; missing: ${(accuracyGraded -- rowsOnly).mkString(", ")}")
  }
}
