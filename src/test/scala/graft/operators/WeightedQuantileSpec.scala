package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class WeightedQuantileSpec extends SparkSpec {
  import spark.implicits._

  test("weighted median: the value where cumulative weight first " +
    "reaches half the mass — not the row median") {
    val rows = Seq(
      // group a: values 1,2,3 with weights 1,1,8 → median mass sits in 3
      ("a", 1.0, 1.0), ("a", 2.0, 1.0), ("a", 3.0, 8.0),
      // group b: uniform weights → plain median (left-continuous: 2)
      ("b", 1.0, 1.0), ("b", 2.0, 1.0), ("b", 3.0, 1.0),
      // group c: tie rows collapse first — two rows of value 2 carry
      // the mass together
      ("c", 1.0, 1.0), ("c", 2.0, 3.0), ("c", 2.0, 3.0), ("c", 9.0, 1.0)
    ).toDF("g", "v", "w")
    val med = WeightedQuantile.perGroup(rows, "g", "v", "w", 500000L)
      .as[(String, Double)].collect().toMap
    assert(med == Map("a" -> 3.0, "b" -> 2.0, "c" -> 2.0), s"$med")
    // boundary quantiles: ppm=1 → min, ppm=1e6 → max
    val lo = WeightedQuantile.perGroup(rows, "g", "v", "w", 1L)
      .as[(String, Double)].collect().toMap
    val hi = WeightedQuantile.perGroup(rows, "g", "v", "w", 1000000L)
      .as[(String, Double)].collect().toMap
    assert(lo == Map("a" -> 1.0, "b" -> 1.0, "c" -> 1.0))
    assert(hi == Map("a" -> 3.0, "b" -> 3.0, "c" -> 9.0))
    // exact-boundary mass: group b at ppm 333334 needs cum 1.000002/3 →
    // second value; at 333333 ppm cum*1e6 (1000000) >= 333333*3
    // (999999) holds at the FIRST value — the integer-scaled test has
    // no float wobble at the boundary
    val q1 = WeightedQuantile.perGroup(rows, "g", "v", "w", 333333L)
      .as[(String, Double)].collect().toMap
    val q2 = WeightedQuantile.perGroup(rows, "g", "v", "w", 333334L)
      .as[(String, Double)].collect().toMap
    assert(q1("b") == 1.0 && q2("b") == 2.0, s"$q1 / $q2")
    intercept[IllegalArgumentException] {
      WeightedQuantile.perGroup(rows, "g", "v", "w", 0L)
    }
  }
}
