package graft.etl

import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}

/** Bucketed extracts eliminate the per-query shuffle for co-keyed work:
  * the claim is plan-level, so these tests pin the plan.
  */
class BucketingSpec extends SparkSpec {

  private def withNoBroadcast[A](body: => A): A = {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760b")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try body finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("writeBucketed re-buckets FROM the table it replaces (staged swap)") {
    import spark.implicits._
    Bucketing.writeBucketed(Tables.orders(spark, sf), "b_rebucket",
      Seq("o_custkey"), numBuckets = 4)
    val before = spark.table("b_rebucket").count()
    // the normal re-bucket/compact shape: input READS the target table —
    // a drop-before-write would delete the files under the running plan
    Bucketing.writeBucketed(
      Bucketing.readBucketed(spark, "b_rebucket").filter($"o_custkey" % 2 === 0),
      "b_rebucket", Seq("o_custkey"), numBuckets = 2)
    val after = spark.table("b_rebucket").count()
    assert(after > 0 && after < before, s"$after of $before")
  }

  test("join of two tables bucketed on the join key plans with zero Exchange") {
    Bucketing.writeBucketed(Tables.orders(spark, sf), "b_orders",
      Seq("o_orderkey"), numBuckets = 8)
    Bucketing.writeBucketed(
      Tables.lineitem(spark, sf).withColumnRenamed("l_orderkey", "o_orderkey"),
      "b_lineitem", Seq("o_orderkey"), numBuckets = 8)
    withNoBroadcast {
      val joined = Bucketing.readBucketed(spark, "b_orders")
        .join(Bucketing.readBucketed(spark, "b_lineitem"), Seq("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), plan.take(800))

      // and it computes the same rows as the plain join
      val plain = Tables.orders(spark, sf).join(
        Tables.lineitem(spark, sf).withColumnRenamed("l_orderkey", "o_orderkey"),
        Seq("o_orderkey"))
      assert(joined.count() === plain.count())
    }
  }

  test("aggregation on the bucket key plans with zero Exchange") {
    Bucketing.writeBucketed(Tables.orders(spark, sf), "b_orders_agg",
      Seq("o_custkey"), numBuckets = 8)
    val agg = Bucketing.readBucketed(spark, "b_orders_agg")
      .groupBy("o_custkey").agg(count(lit(1)).as("n"))
    val plan = agg.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan.take(800))
    assert(agg.count() ===
      Tables.orders(spark, sf).select("o_custkey").distinct().count())
  }

  test("mismatched bucket counts fall back to a correct (shuffled) join") {
    // self-contained: both tables created HERE, so the test passes when
    // run alone or reordered (no dependency on the first test's tables)
    Bucketing.writeBucketed(Tables.orders(spark, sf), "b_orders_4",
      Seq("o_orderkey"), numBuckets = 4)
    Bucketing.writeBucketed(
      Tables.lineitem(spark, sf).withColumnRenamed("l_orderkey", "o_orderkey"),
      "b_lineitem_8", Seq("o_orderkey"), numBuckets = 8)
    withNoBroadcast {
      val joined = Bucketing.readBucketed(spark, "b_orders_4")
        .join(Bucketing.readBucketed(spark, "b_lineitem_8"), Seq("o_orderkey"))
      // one side re-shuffles (or re-buckets); result still correct
      assert(joined.count() === Tables.lineitem(spark, sf).count())
    }
  }
}
