package graft.operators

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.SparkSpec

class TemporalSpec extends SparkSpec {
  import spark.implicits._

  private def t(s: Int) = new Timestamp(1700000000000L + s * 1000L)

  test("validityIntervals collapses no-op updates and emits half-open " +
    "version intervals") {
    val obs = Seq(
      // key 1: A, A (no-op), B, B (no-op), A again → 3 versions
      (1L, t(10), 100L, "A"),
      (1L, t(20), 101L, "A"),
      (1L, t(30), 102L, "B"),
      (1L, t(40), 103L, "B"),
      (1L, t(50), 104L, "A"),
      // key 2: a single observation → 1 current version
      (2L, t(10), 200L, "X"),
      // key 3: same-timestamp tie — order falls to the tie column, so
      // (C at tie 301) precedes (D at tie 302) deterministically
      (3L, t(10), 301L, "C"),
      (3L, t(10), 302L, "D")
    ).toDF("k", "ts", "tie", "st")
    val got = Temporal.validityIntervals(obs, "k", "ts", Seq("st"), "tie")
      .select("k", "st", "valid_from", "valid_to", "version", "is_current")
      .as[(Long, String, Timestamp, Option[Timestamp], Long, Int)]
      .collect().toList.sortBy(r => (r._1, r._5))
    assert(got == List(
      (1L, "A", t(10), Some(t(30)), 1L, 0),
      (1L, "B", t(30), Some(t(50)), 2L, 0),
      (1L, "A", t(50), None, 3L, 1),
      (2L, "X", t(10), None, 1L, 1),
      (3L, "C", t(10), Some(t(10)), 1L, 0),
      (3L, "D", t(10), None, 2L, 1)), s"$got")
  }

  test("null-safe change detection: null→value and value→null both " +
    "open versions; null→null does not") {
    val obs = Seq(
      (1L, t(10), 1L, Option.empty[String]),
      (1L, t(20), 2L, Option.empty[String]), // null→null: no-op
      (1L, t(30), 3L, Option("A")),          // null→A: new version
      (1L, t(40), 4L, Option.empty[String])  // A→null: new version
    ).toDF("k", "ts", "tie", "st")
    val got = Temporal.validityIntervals(obs, "k", "ts", Seq("st"), "tie")
      .select("version", "st").as[(Long, Option[String])]
      .collect().toList.sortBy(_._1)
    assert(got == List((1L, None), (2L, Some("A")), (3L, None)), s"$got")
  }

  test("snapshotAt returns exactly one version per key valid at T") {
    val obs = Seq(
      (1L, t(10), 1L, "A"), (1L, t(30), 2L, "B"),
      (2L, t(20), 3L, "X")
    ).toDF("k", "ts", "tie", "st")
    val v = Temporal.validityIntervals(obs, "k", "ts", Seq("st"), "tie")
    // at t(15): key 1 is in version A (B starts at 30), key 2 not yet born
    val at15 = Temporal.snapshotAt(v, lit(t(15)))
      .select("k", "st").as[(Long, String)].collect().toSet
    assert(at15 == Set((1L, "A")))
    // at t(30): B's half-open interval [30, ∞) has begun; A's [10, 30) ended
    val at30 = Temporal.snapshotAt(v, lit(t(30)))
      .select("k", "st").as[(Long, String)].collect().toSet
    assert(at30 == Set((1L, "B"), (2L, "X")))
    // multi-attribute change detection: either column changing versions
    val multi = Seq(
      (1L, t(10), 1L, "A", 5), (1L, t(20), 2L, "A", 6), (1L, t(30), 3L, "B", 6)
    ).toDF("k", "ts", "tie", "st", "tier")
    val mv = Temporal.validityIntervals(multi, "k", "ts",
      Seq("st", "tier"), "tie")
    assert(mv.count() == 3)
    intercept[IllegalArgumentException] {
      Temporal.validityIntervals(obs, "k", "ts", Seq(), "tie")
    }
  }
}
