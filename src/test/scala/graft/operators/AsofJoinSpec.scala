package graft.operators

import java.sql.Timestamp
import graft.SparkSpec

class AsofJoinSpec extends SparkSpec {
  import spark.implicits._

  private def t(s: Int) = new Timestamp(1700000000000L + s * 1000L)

  test("asof join picks latest right row at-or-before each left row, per key") {
    val left = Seq(
      (1L, 10L, t(100)), // after both rights for key 10 → matches r2
      (2L, 10L, t(50)),  // between → matches r1
      (3L, 10L, t(5)),   // before all → null
      (4L, 20L, t(100)), // other key → matches r3
      (5L, 30L, t(100))  // key with no rights → null
    ).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (101L, 10L, t(10)),  // r1
      (102L, 10L, t(60)),  // r2
      (103L, 20L, t(99))   // r3
    ).toDF("click_id", "user_id", "rts")

    val out = AsofJoin(left, right, Seq("user_id"), "ts", "rts", Seq("click_id"))
      .select("event_id", "asof_click_id").as[(Long, Option[Long])]
      .collect().toMap
    assert(out == Map(
      1L -> Some(102L), 2L -> Some(101L), 3L -> None, 4L -> Some(103L), 5L -> None))
  }

  test("asof join equal timestamps count as 'at-or-before'") {
    val left = Seq((1L, 10L, t(60))).toDF("event_id", "user_id", "ts")
    val right = Seq((102L, 10L, t(60))).toDF("click_id", "user_id", "rts")
    val out = AsofJoin(left, right, Seq("user_id"), "ts", "rts", Seq("click_id"))
      .select("asof_click_id").as[Option[Long]].head()
    assert(out.contains(102L))
  }

  test("tolerance nulls out stale matches without changing WHICH row matches") {
    val left = Seq(
      (1L, 10L, t(100)), // nearest preceding is r2 at t(60): 40s stale
      (2L, 10L, t(65))   // nearest preceding is r2: 5s fresh
    ).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (101L, 10L, t(10)),
      (102L, 10L, t(60))
    ).toDF("click_id", "user_id", "rts")
    val out = AsofJoin(left, right, Seq("user_id"), "ts", "rts",
        Seq("click_id"), toleranceSeconds = 10.0)
      .select("event_id", "asof_click_id").as[(Long, Option[Long])]
      .collect().toMap
    // row 1: r2 is the nearest but stale → null (NOT r1, which is within
    // nothing — tolerance is a null-out on the nearest, not a search)
    assert(out == Map(1L -> None, 2L -> Some(102L)), s"$out")
  }

  test("forward direction picks the earliest right at-or-after; inclusive " +
    "boundary; tolerance applies") {
    val left = Seq(
      (1L, 10L, t(50)),  // rights at 60, 90 follow → picks 60
      (2L, 10L, t(60)),  // equal instant → inclusive, picks 60
      (3L, 10L, t(95)),  // nothing after → null
      (4L, 20L, t(50))   // no rights for key → null
    ).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (102L, 10L, t(60)),
      (103L, 10L, t(90))
    ).toDF("click_id", "user_id", "rts")
    val out = AsofJoin(left, right, Seq("user_id"), "ts", "rts",
        Seq("click_id"), direction = "forward")
      .select("event_id", "asof_click_id").as[(Long, Option[Long])]
      .collect().toMap
    assert(out == Map(1L -> Some(102L), 2L -> Some(102L), 3L -> None,
      4L -> None), s"$out")
    val tol = AsofJoin(left, right, Seq("user_id"), "ts", "rts",
        Seq("click_id"), direction = "forward", toleranceSeconds = 5.0)
      .select("event_id", "asof_click_id").as[(Long, Option[Long])]
      .collect().toMap
    // row 1's nearest following (60) is 10s ahead → stale under 5s
    assert(tol == Map(1L -> None, 2L -> Some(102L), 3L -> None,
      4L -> None), s"$tol")
    intercept[IllegalArgumentException] {
      AsofJoin(left, right, Seq("user_id"), "ts", "rts", Seq("click_id"),
        direction = "sideways")
    }
  }

  test("nearest direction picks the smaller |gap| either side, ties " +
    "toward backward; per-direction tolerance precedes the choice") {
    val left = Seq(
      (1L, 10L, t(50)),  // back r1@40 (10s) vs fwd r2@70 (20s) → backward
      (2L, 10L, t(65)),  // back r1@40 (25s) vs fwd r2@70 (5s) → forward
      (3L, 10L, t(55)),  // tie: 15s both sides → backward wins
      (4L, 10L, t(40)),  // exact hit → gap 0, backward
      (5L, 20L, t(50)),  // key with no rights → null
      (6L, 10L, t(200))  // both sides far → nearest is r2@70 (130s)
    ).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (101L, 10L, t(40)),  // r1
      (102L, 10L, t(70))   // r2
    ).toDF("click_id", "user_id", "rts")
    val out = AsofJoin(left, right, Seq("user_id"), "ts", "rts",
        Seq("click_id"), direction = "nearest")
      .select("event_id", "asof_click_id").as[(Long, Option[Long])]
      .collect().toMap
    assert(out == Map(1L -> Some(101L), 2L -> Some(102L), 3L -> Some(101L),
      4L -> Some(101L), 5L -> None, 6L -> Some(102L)), s"$out")
    // tolerance nulls each DIRECTION before the choice: at 12s, row 1
    // keeps only its backward match, row 2 only its forward one, row 6
    // nothing — and a stale nearer side LOSES to a fresh farther one:
    // row 7 (t=49) is 9s from r1 (in tolerance) and 21s from r2 → r1
    // even though the pre-tolerance nearest for row 3 (15s/15s) is gone
    val withRow7 = left.unionByName(
      Seq((7L, 10L, t(49))).toDF("event_id", "user_id", "ts"))
    val tol = AsofJoin(withRow7, right, Seq("user_id"), "ts", "rts",
        Seq("click_id"), direction = "nearest", toleranceSeconds = 12.0)
      .select("event_id", "asof_click_id").as[(Long, Option[Long])]
      .collect().toMap
    assert(tol == Map(1L -> Some(101L), 2L -> Some(102L), 3L -> None,
      4L -> Some(101L), 5L -> None, 6L -> None, 7L -> Some(101L)), s"$tol")
    // equal-timestamp rights: the greatest payload wins, same as the
    // other directions
    val dupRight = Seq(
      (101L, 10L, t(40)), (105L, 10L, t(40))
    ).toDF("click_id", "user_id", "rts")
    val dup = AsofJoin(Seq((1L, 10L, t(45))).toDF("event_id", "user_id", "ts"),
        dupRight, Seq("user_id"), "ts", "rts",
        Seq("click_id"), direction = "nearest")
      .select("asof_click_id").as[Option[Long]].head()
    assert(dup.contains(105L), s"$dup")
  }
}
