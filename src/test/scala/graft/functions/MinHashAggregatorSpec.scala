package graft.functions

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}
import graft.ops.Dedup

class MinHashAggregatorSpec extends SparkSpec {
  import spark.implicits._

  test("typed Aggregator signature == codegen'd k-min expression signature") {
    val docs = Tables.documents(spark, sf).limit(100)
    val sh = Dedup.shinglesRaw(docs, "doc_id", "text")

    val viaExpr = Dedup.minhashSignature(sh, k = 4)
      .collect()
      .map(r => r.getLong(0) -> (1 to 4).map(i => r.getString(i)).toSeq)
      .toMap

    val agg = udaf(new MinHashAggregator(4))
    val viaUdaf = sh.groupBy($"id").agg(agg($"shingle").as("sig"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1).toSeq)
      .toMap

    assert(viaUdaf.keySet == viaExpr.keySet)
    viaExpr.foreach { case (id, sig) => assert(viaUdaf(id) == sig, s"doc $id") }
  }
}
