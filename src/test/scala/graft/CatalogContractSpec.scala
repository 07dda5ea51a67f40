package graft

import org.scalatest.funsuite.AnyFunSuite

/** The driver-contract invariants that every past round enforced by
  * convention, pinned as a test: every catalog query has an oracle
  * and vice versa (a missing oracle silently downgrades the driver's
  * gate to rows-only — the exact failure mode the catalog is designed
  * to never have), names are unique per the qNN prefix the bench's
  * short-key rendering relies on, and the fenced set stays a subset
  * of the catalog.
  */
class CatalogContractSpec extends AnyFunSuite {

  test("every query has an oracle and every oracle has a query") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((q -- o).isEmpty, s"queries without oracle: ${(q -- o).toSeq.sorted}")
    assert((o -- q).isEmpty, s"oracles without query: ${(o -- q).toSeq.sorted}")
  }

  test("qNN prefixes are unique (bench short-key rendering depends on it)") {
    val prefixes = SparkEntry.queries.keySet.toSeq.map(_.takeWhile(_ != '_'))
    val dups = prefixes.groupBy(identity).filter(_._2.size > 1).keys.toSeq
    assert(dups.isEmpty, s"duplicate qNN prefixes: $dups")
  }

  test("oracle SQL is non-empty and free of Spark-only syntax markers") {
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      assert(sql.trim.nonEmpty, s"$name: empty oracle")
      // DuckDB has no backtick quoting and no lateral view syntax —
      // the two most likely Spark-isms to leak into an oracle
      assert(!sql.contains("`"), s"$name: backtick quoting in oracle")
      assert(!sql.toLowerCase.contains("lateral view"),
        s"$name: Spark LATERAL VIEW in oracle")
    }
  }
}
