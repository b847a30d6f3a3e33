package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Smoke-level checks of the oracle-checked surface on sf0.001. The full
  * value-level gate is the driver's DuckDB compare (mimicked locally by
  * tools/check_oracle.py); here we pin schema/row invariants so a refactor
  * that breaks a query fails fast in `sbt test`.
  */
class ParitySpec extends SparkSpec {

  private val allQ = Parity.all ++ Extensions.all

  test("every query key has a distinct name and runs on sf0.001") {
    val names = allQ.map(_.name)
    assert(names.distinct.size == names.size)
  }

  test("entry returns rows > 0 (driver smoke)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  for (q <- allQ) {
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

  test("approx_count_distinct lands within 5% of exact") {
    import org.apache.spark.sql.functions._
    // the query itself emits the bound check (within_bound) plus the
    // exact count — assert both the flag and the exact side here
    val rows = SparkEntry.queries("q_approx_distinct")(spark, sf)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    val exact = graft.Tables.lineitem(spark, sf)
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_orderkey")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, n) =>
      assert(rows(k)._1 == n, s"$k: exact ${rows(k)._1} vs $n")
      assert(rows(k)._2, s"$k: estimate outside the 5% bound")
    }
  }

  test("built-in uuid() mints distinct RFC-4122 v4 ids (F9)") {
    val ids = graft.Tables.customer(spark, sf).limit(100)
      .select(graft.functions.Security.randomUuid().as("u"))
      .collect().map(_.getString(0))
    val re = "^[0-9a-f]{8}-[0-9a-f]{4}-4[0-9a-f]{3}-[89ab][0-9a-f]{3}-[0-9a-f]{12}$"
    assert(ids.forall(_.matches(re)), ids.take(3).mkString(","))
    assert(ids.distinct.length == ids.length)
  }

  test("benchQueries reference existing queries") {
    assert(SparkEntry.benchQueries.nonEmpty)
    assert(SparkEntry.benchQueries.forall(SparkEntry.queries.contains))
  }
}
