package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ConstraintsSpec extends SparkSpec {
  import spark.implicits._
  import Constraints._

  private val df = Seq(
    (Option(1L), Option("a"), 10.0, "X"),
    (Option(2L), Option("b"), -5.0, "Y"),   // range violation
    (Option(2L), Option("c"), 50.0, "X"),   // duplicate key 2
    (Option.empty[Long], Option("d"), 200.0, "Z"), // null key + range hi + bad enum
    (Option(4L), Option.empty[String], 30.0, "X")  // null name
  ).toDF("k", "name", "v", "status")

  test("every rule kind counts its exact violations; declaration order " +
    "preserved") {
    val dim = Seq(1L, 2L).toDF("k")
    val got = check(df, Seq(
        NotNull("k"), NotNull("name"),
        Unique(Seq("k")),
        InRange("v", 0.0, 100.0),
        InSet("status", Seq("X", "Y")),
        RefIntegrity("k", dim, "k")))
      .as[(String, Long, Long, Int)].collect().toList
    assert(got == List(
      ("not_null:k", 1L, 5L, 0),
      ("not_null:name", 1L, 5L, 0),
      // both rows of key 2 participate in the duplicated group; the
      // null key groups with itself only (1 row, not duplicated)
      ("unique:k", 2L, 5L, 0),
      // -5 below, 200 above — and the null v would count if present
      ("in_range:v", 2L, 5L, 0),
      ("in_set:status", 1L, 5L, 0),
      // non-null keys {1, 2, 2, 4}: 4 is absent from the dim; null is
      // NotNull's business
      ("ref:k", 1L, 5L, 0)), s"$got")
  }

  test("a clean table passes everything; bad declarations throw") {
    val clean = Seq((1L, "a"), (2L, "b")).toDF("k", "name")
    val got = check(clean, Seq(NotNull("k"), Unique(Seq("k"))))
      .as[(String, Long, Long, Int)].collect().toList
    assert(got == List(("not_null:k", 0L, 2L, 1), ("unique:k", 0L, 2L, 1)))
    intercept[IllegalArgumentException] { check(clean, Seq()) }
    intercept[IllegalArgumentException] {
      check(clean, Seq(NotNull("k"), NotNull("k")))
    }
    intercept[IllegalArgumentException] { InRange("v", 5.0, 1.0) }
    intercept[IllegalArgumentException] { Unique(Seq()) }
  }
}
