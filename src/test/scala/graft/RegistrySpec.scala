package graft

import org.scalatest.funsuite.AnyFunSuite

/** Registry integrity: `SparkEntry.queries` is a name-keyed Map, so a
  * duplicated QueryDef name would SILENTLY drop a query from the
  * driver's correctness gate — fail loudly here instead. Pure (no Spark
  * session). */
class RegistrySpec extends AnyFunSuite {

  test("query names are unique (the Map the driver consumes loses duplicates)") {
    val names = SparkEntry.allQueries.map(_.name)
    val dups = names.groupBy(identity).collect { case (n, g) if g.size > 1 => n }
    assert(dups.isEmpty, s"duplicated query names: ${dups.mkString(", ")}")
    assert(SparkEntry.queries.size === names.size)
  }

  test("every registered query carries a DuckDB oracle") {
    val missing = SparkEntry.allQueries.filter(_.oracle.isEmpty).map(_.name)
    assert(missing.isEmpty,
      s"rows-only (oracle-less) queries: ${missing.mkString(", ")}")
  }

  test("query names are lowercase snake_case (driver artifact paths)") {
    val bad = SparkEntry.allQueries.map(_.name)
      .filterNot(_.matches("[a-z0-9_]+"))
    assert(bad.isEmpty, s"non-snake-case names: ${bad.mkString(", ")}")
  }

  test("oracle SQL never references scratch paths or absolute filesystem locations") {
    val bad = SparkEntry.allQueries
      .filter(q => q.oracle.exists(o => o.contains("/tmp/") || o.contains("/root/")))
      .map(_.name)
    assert(bad.isEmpty, s"oracles with filesystem paths: ${bad.mkString(", ")}")
  }
}
