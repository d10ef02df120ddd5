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

  test("every registered query has a SQL oracle (no rows-only queries left)") {
    // Round 13 graduated the last 13 rows-only queries (approx sketches +
    // ANN top-k) to deterministic verdict frames: exact-twin values +
    // boolean floors that DuckDB replays as exact values + literal TRUE.
    // RecallSpec keeps the numeric accuracy floors on the raw frames.
    val rowsOnly = Catalog.all.filter(_.oracle.isEmpty).map(_.name)
    assert(rowsOnly.isEmpty,
      s"queries without a DuckDB oracle: ${rowsOnly.mkString(", ")} — " +
        "grade them as verdict frames (see graft.queries.Approx)")
  }
}
