package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Smoke-level checks of the oracle-checked surface on sf0.001. The full
  * value-level gate is the driver's DuckDB compare (mimicked locally by
  * tools/check_oracle.py); here we pin schema/row invariants so a refactor
  * that breaks a query fails fast in `sbt test`.
  */
class ParitySpec extends SparkSpec {

  test("every query key has a distinct name and runs on sf0.001") {
    val names = Parity.all.map(_.name)
    assert(names.distinct.size == names.size)
  }

  test("entry returns rows > 0 (driver smoke)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  for (q <- Parity.all) {
    test(s"${q.name} executes and is non-degenerate") {
      val df = q.fn(spark, sf)
      val n = df.count()
      // every parity query must produce rows on the smallest SF
      assert(n > 0, s"${q.name} returned 0 rows at sf0.001")
      assert(df.columns.nonEmpty)
      // column names must be lowercase snake-ish for oracle name-matching
      assert(df.columns.forall(c => c == c.toLowerCase), df.columns.mkString(","))
    }
  }

  test("oracleSql keys are a subset of queries keys") {
    val qk = SparkEntry.queries.keySet
    assert(SparkEntry.oracleSql.keySet.subsetOf(qk))
  }

  test("benchQueries reference existing queries") {
    assert(SparkEntry.benchQueries.nonEmpty)
    assert(SparkEntry.benchQueries.forall(SparkEntry.queries.contains))
  }
}
