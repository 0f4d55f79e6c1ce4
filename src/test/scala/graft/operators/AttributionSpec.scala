package graft.operators

import java.sql.Timestamp
import graft.SparkSpec

class AttributionSpec extends SparkSpec {
  import spark.implicits._

  private def t(s: Int) = new Timestamp(1700000000000L + s * 1000L)

  private def report(rows: Seq[(Long, Timestamp, Long, String)],
                     model: String, lookback: Long = 100L) =
    Attribution.report(
      rows.toDF("event_id", "ts", "user_id", "event_type"),
      "user_id", "ts", "event_type", "purchase",
      Seq("view", "click", "signup"), lookback, model)
      .as[(String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap

  test("position model: 40/20/40 with the floor remainder on the last " +
    "touch; every conversion's credit sums to exactly 1e6 ppm") {
    val rows = Seq(
      // user 10: 4 touches then a purchase → 400k / 100k / 100k / 400k
      (1L, t(10), 10L, "view"), (2L, t(20), 10L, "click"),
      (3L, t(30), 10L, "view"), (4L, t(40), 10L, "signup"),
      (5L, t(50), 10L, "purchase"),
      // user 20: 5 touches → middles get 200000 div 3 = 66666, the last
      // takes 400000 + remainder 2 = 400002
      (6L, t(10), 20L, "view"), (7L, t(15), 20L, "click"),
      (8L, t(20), 20L, "click"), (9L, t(25), 20L, "click"),
      (10L, t(30), 20L, "signup"), (11L, t(60), 20L, "purchase"),
      // user 30: a single touch → the full 1e6
      (12L, t(10), 30L, "click"), (13L, t(20), 30L, "purchase"),
      // user 40: two touches → 50/50
      (14L, t(10), 40L, "view"), (15L, t(20), 40L, "click"),
      (16L, t(30), 40L, "purchase"))
    val got = report(rows, "position")
    // u10: view@10 rn1 400000, click@20 mid 100000, view@30 mid 100000,
    //      signup@40 last 400000
    // u20: view@10 rn1 400000; clicks@15/20/25 mids 66666 each;
    //      signup@30 last 400002 (remainder)
    // u30: click alone 1000000; u40: view/click 500000 each
    val expect = Map(
      "view" -> ((4L, 400000L + 100000L + 400000L + 500000L)),
      "click" -> ((6L,
        100000L + 66666L * 3 + 1000000L + 500000L)),
      "signup" -> ((2L, 400000L + 400002L)))
    assert(got == expect, s"$got")
    assert(got.values.map(_._2).sum == 4L * 1000000L)
  }

  test("linear model splits evenly with the remainder on the last touch") {
    val rows = Seq(
      (1L, t(10), 10L, "view"), (2L, t(20), 10L, "click"),
      (3L, t(30), 10L, "signup"), (4L, t(40), 10L, "purchase"))
    val got = report(rows, "linear")
    // n = 3: 333333 each, last takes 1000000 - 2·333333 = 333334
    assert(got == Map("view" -> ((1L, 333333L)),
      "click" -> ((1L, 333333L)), "signup" -> ((1L, 333334L))), s"$got")
  }

  test("boundaries: same-instant touches don't count, the lookback is " +
    "inclusive, and a touch credits only its NEXT conversion") {
    val rows = Seq(
      // same-instant touch: strictly-before excludes it
      (1L, t(20), 10L, "view"), (2L, t(20), 10L, "purchase"),
      // exactly lookback (100s) before: inclusive → counts
      (3L, t(10), 20L, "click"), (4L, t(110), 20L, "purchase"),
      // one past the lookback: dropped
      (5L, t(10), 30L, "signup"), (6L, t(111), 30L, "purchase"),
      // two conversions: the touch credits the FIRST (next) one only
      (7L, t(10), 40L, "view"), (8L, t(20), 40L, "purchase"),
      (9L, t(30), 40L, "purchase"))
    val got = report(rows, "position")
    assert(got == Map("click" -> ((1L, 1000000L)),
      "view" -> ((1L, 1000000L))), s"$got")
    intercept[IllegalArgumentException] {
      report(rows, "timedecay")
    }
    intercept[IllegalArgumentException] {
      Attribution.report(rows.toDF("event_id", "ts", "user_id", "event_type"),
        "user_id", "ts", "event_type", "purchase", Seq("purchase"), 100L)
    }
  }

  test("tieCol needs no global uniqueness: two users sharing per-user " +
    "event counters keep separate credit groups (the r17 advisory)") {
    // both users use event_ids 1..3 (per-user counters); if credit
    // groups partitioned by conv id alone, the two conversions (both
    // id=3) would merge into one 4-touch group and mis-split the ppm
    val rows = Seq(
      (1L, t(10), 10L, "view"), (2L, t(20), 10L, "click"),
      (3L, t(30), 10L, "purchase"),
      (1L, t(10), 20L, "view"), (2L, t(20), 20L, "click"),
      (3L, t(30), 20L, "purchase"))
    val got = report(rows, "position")
    // per user: 2 touches → 50/50; merged they'd be rn1=400k/mid/mid/last
    assert(got == Map("view" -> ((2L, 1000000L)),
      "click" -> ((2L, 1000000L))), s"$got")
  }
}
