package graft.catalog

import org.apache.spark.sql.functions._

import graft.SparkSpec

class CatalogSpec extends SparkSpec {
  import spark.implicits._

  private lazy val registry = Seq(
    (1L, 10L, "file_available"), (2L, 10L, "syncing"), (3L, 20L, "queued")
  ).toDF("form_id", "user_id", "status")

  test("pointLookup returns exactly the keyed row") {
    val got = Catalog.pointLookup(registry, "form_id", 2L).collect()
    assert(got.length == 1 && got(0).getLong(1) == 10L)
  }

  test("paginate is deterministic and offset-correct") {
    val df = (1 to 25).toDF("id")
    val page = Catalog.paginate(df, Seq("id"), skip = 10, limit = 5)
      .as[Int].collect().toSeq
    assert(page == Seq(11, 12, 13, 14, 15))
  }

  test("upsert: incoming wins on key, others survive, no dup keys") {
    val incoming = Seq((2L, 99L, "file_unavailable")).toDF("form_id", "user_id", "status")
    val out = Catalog.upsert(registry, incoming, Seq("form_id"))
      .orderBy("form_id").collect()
    assert(out.length == 3)
    assert(out(1).getString(2) == "file_unavailable" && out(1).getLong(1) == 99L)
    assert(out(0).getString(2) == "file_available")
  }

  test("dedupFirst keeps the first row per key deterministically") {
    val df = Seq((1L, "a", 5L), (1L, "a", 2L), (1L, "b", 9L), (2L, "a", 7L))
      .toDF("k1", "k2", "ord")
    val out = Catalog.dedupFirst(df, Seq("k1", "k2"), "ord")
      .orderBy("k1", "k2").as[(Long, String, Long)].collect().toSeq
    assert(out == Seq((1L, "a", 2L), (1L, "b", 9L), (2L, "a", 7L)))
  }

  test("existing = semi-join, returns only registered candidates") {
    val cand = Seq((1L, "x"), (4L, "y")).toDF("form_id", "payload")
    val got = Catalog.existing(cand, registry, Seq("form_id")).collect()
    assert(got.map(_.getLong(0)).toSeq == Seq(1L))
    assert(got.head.schema.fieldNames.toSeq == Seq("form_id", "payload"))
  }
}
