package graft.ops

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import graft.SparkSpec

class AsOfSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("asof join: inclusive match, latest-preceding wins, null when none") {
    val left = Seq(
      (1L, 10L, ts("2024-01-01 10:00:00")),  // matches r@10:00 (inclusive)
      (2L, 10L, ts("2024-01-01 10:30:00")),  // matches r@10:00, not r@11:00
      (3L, 10L, ts("2024-01-01 12:00:00")),  // matches r@11:00 (latest)
      (4L, 20L, ts("2024-01-01 10:30:00")),  // other key
      (5L, 30L, ts("2024-01-01 10:00:00"))   // key with no right rows
    ).toDF("id", "k", "t")
    val right = Seq(
      (10L, ts("2024-01-01 10:00:00"), "a"),
      (10L, ts("2024-01-01 11:00:00"), "b"),
      (20L, ts("2024-01-01 10:00:00"), "c")
    ).toDF("k", "rt", "v")

    val out = AsOf.joinAsOf(left, right, Seq("k"), "t", "rt", Seq("rt", "v"))
      .orderBy("id")
      .select($"id", $"asof_v")
      .as[(Long, Option[String])].collect().toSeq
    assert(out === Seq(1L -> Some("a"), 2L -> Some("a"), 3L -> Some("b"),
      4L -> Some("c"), 5L -> None))
  }

  test("asof join: null timestamps never match (SQL comparison semantics)") {
    val left = Seq(
      (1L, 10L, Option(ts("2024-01-01 10:30:00"))),
      (2L, 10L, Option.empty[Timestamp])  // null left ts -> no match
    ).toDF("id", "k", "t")
    val right = Seq(
      (10L, Option.empty[Timestamp], "ghost"),  // null right ts -> never a match
      (10L, Option(ts("2024-01-01 10:00:00")), "a")
    ).toDF("k", "rt", "v")
    val out = AsOf.joinAsOf(left, right, Seq("k"), "t", "rt", Seq("rt", "v"))
      .orderBy("id").select($"id", $"asof_v")
      .as[(Long, Option[String])].collect().toSeq
    assert(out === Seq(1L -> Some("a"), 2L -> None))
  }

  test("asof join matches a window-free oracle on events") {
    val ev = graft.Tables.events(spark, sf)
    val l = ev.filter($"event_type" === "purchase")
      .select($"event_id", $"user_id", $"ts")
    val r = ev.filter($"event_type" === "view")
      .groupBy($"user_id", $"ts".as("rt")).agg(max($"value").as("v"))
    val fast = AsOf.joinAsOf(l, r, Seq("user_id"), "ts", "rt", Seq("rt", "v"))
    // naive correlated formulation: left join all preceding, keep max rt
    val naive = l.join(r, l("user_id") === r("user_id") && $"rt" <= $"ts", "left")
      .groupBy(l("user_id").as("user_id"), $"event_id", $"ts")
      .agg(max(struct($"rt", $"v")).as("m"))
      .select($"event_id", $"user_id", $"ts",
        $"m.rt".as("asof_rt"), $"m.v".as("asof_v"))
    assert(fast.exceptAll(naive).isEmpty && naive.exceptAll(fast).isEmpty)
  }

  test("range join: boundary semantics and bin-edge intervals") {
    val left = Seq(
      (1L, ts("2024-01-01 10:10:00")),  // inside w1
      (2L, ts("2024-01-01 10:50:00")),  // == w1 end -> excluded
      (3L, ts("2024-01-01 11:00:00")),  // == w2 start -> included
      (4L, ts("2024-01-01 09:59:59"))   // before everything
    ).toDF("id", "t")
    val right = Seq(
      (ts("2024-01-01 10:10:00"), ts("2024-01-01 10:50:00"), "w1"),
      // interval spanning a bin edge (11:00 with 3600s bins)
      (ts("2024-01-01 10:55:00"), ts("2024-01-01 11:05:00"), "w2")
    ).toDF("s", "e", "w")
    val out = RangeJoin.joinRange(left, "t", right, "s", "e", binSeconds = 3600)
      .select($"id", $"w").as[(Long, String)].collect().toSet
    assert(out === Set(1L -> "w1", 3L -> "w2"))
  }

  test("range join emits overlapping-interval matches once each") {
    val left = Seq((1L, ts("2024-01-01 10:30:00"))).toDF("id", "t")
    val right = Seq(
      (ts("2024-01-01 10:00:00"), ts("2024-01-01 11:00:00"), "a"),
      (ts("2024-01-01 08:00:00"), ts("2024-01-01 12:00:00"), "b")  // 4h interval
    ).toDF("s", "e", "w")
    val out = RangeJoin.joinRange(left, "t", right, "s", "e", binSeconds = 1800)
      .select($"w").as[String].collect().toSeq.sorted
    assert(out === Seq("a", "b"))
  }
}
