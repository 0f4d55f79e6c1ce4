package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CooccurrenceSpec extends SparkSpec {
  import spark.implicits._

  private def pairs(rows: Seq[(String, String)], maxBasket: Int,
                    minSupport: Long = 1L) =
    Cooccurrence.pairs(rows.toDF("basket", "item"), "basket", "item",
        maxBasket, minSupport)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getLong(6), r.getLong(7), r.getLong(8)))
      .toMap

  test("hand-computed support/confidence/lift; pairs ordered a < b; " +
    "duplicate (basket, item) rows collapse") {
    // baskets: u1 {a,b,c}, u2 {a,b}, u3 {b,c} — N=3
    val rows = Seq("u1" -> "a", "u1" -> "b", "u1" -> "c", "u1" -> "a",
      "u2" -> "b", "u2" -> "a", "u3" -> "c", "u3" -> "b")
    val got = pairs(rows, maxBasket = 10)
    // n_a=2, n_b=3, n_c=2
    assert(got == Map(
      // (a,b): pair 2 → support 2/3, conf a→b 2/2, conf b→a 2/3,
      // lift = (1000000 * 3) div 3 = 1000000
      ("a", "b") -> ((2L, 2L, 3L, 666666L, 1000000L, 666666L, 1000000L)),
      // (a,c): pair 1 → conf a→c 500000, conf c→a 500000,
      // lift = (500000 * 3) div 2 = 750000
      ("a", "c") -> ((1L, 2L, 2L, 333333L, 500000L, 500000L, 750000L)),
      // (b,c): pair 2 → conf b→c 666666, conf c→b 1000000,
      // lift = (666666 * 3) div 2 = 999999 (the documented floor
      // composition — 1 ppm under the exact 10⁶)
      ("b", "c") -> ((2L, 3L, 2L, 666666L, 666666L, 1000000L, 999999L))),
      got.toString)
  }

  test("oversized baskets drop WHOLE and leave every denominator " +
    "(n_baskets, item counts)") {
    val rows = Seq("u1" -> "a", "u1" -> "b",
      "big" -> "a", "big" -> "b", "big" -> "c")
    val got = pairs(rows, maxBasket = 2)
    // only u1 survives: N=1, n_a=n_b=1 — the big basket contributes to
    // NOTHING (not even item counts)
    assert(got == Map(("a", "b") ->
      ((1L, 1L, 1L, 1000000L, 1000000L, 1000000L, 1000000L))), got.toString)
  }

  test("minSupport prunes below-threshold pairs; guards throw") {
    val rows = Seq("u1" -> "a", "u1" -> "b", "u2" -> "a", "u2" -> "b",
      "u3" -> "a", "u3" -> "c")
    val got = pairs(rows, maxBasket = 5, minSupport = 2)
    assert(got.keySet == Set(("a", "b"))) // (a,c) has support 1
    intercept[IllegalArgumentException] {
      Cooccurrence.pairs(Seq(("u", "a")).toDF("basket", "item"),
        "basket", "item", maxBasket = 1)
    }
    intercept[IllegalArgumentException] {
      Cooccurrence.pairs(Seq(("u", "a")).toDF("basket", "item"),
        "basket", "item", maxBasket = 2, minSupport = 0)
    }
  }

  test("single-item baskets produce no pairs but count in N") {
    val rows = Seq("u1" -> "a", "u2" -> "a", "u2" -> "b", "u3" -> "b")
    val got = pairs(rows, maxBasket = 5)
    // N=3: support for (a,b) = 1/3
    assert(got == Map(("a", "b") ->
      ((1L, 2L, 2L, 333333L, 500000L, 500000L, 750000L))), got.toString)
  }
}
