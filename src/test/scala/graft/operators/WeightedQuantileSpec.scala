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

  test("single-bin recursion: a constant-heavy group (99% of mass on one " +
    "value, outlier-stretched range) re-bins the threshold bin and still " +
    "answers exactly") {
    // group z: one value (10.0) carries 9900 of ~10000 mass, 100 ladder
    // values sit just above it, and an outlier at 64000 stretches the
    // top-level equi-width range so bins 1..63 are empty — EVERYTHING
    // lands in bin 0, which therefore holds ~all the mass and triggers
    // the recursion; the sub-bin histogram over [10, 110] then splits
    // the ladder
    val heavy = Seq(("z", 10.0, 9900.0)) ++
      (1 to 100).map(i => ("z", 10.0 + i, 1.0)) ++
      Seq(("z", 64000.0, 1.0)) ++
      // group u: uniform — must be untouched by z's recursion branch
      (1 to 9).map(i => ("u", i.toDouble, 1.0))
    val df = heavy.toDF("g", "v", "w")
    // same integer-scaled threshold test as the operator (weights here
    // are integer-valued, so the arithmetic is exact in doubles)
    def brute(ppm: Long): Double = {
      val zs = heavy.filter(_._1 == "z").groupBy(_._2).view
        .mapValues(_.map(_._3).sum).toSeq.sortBy(_._1)
      val tot = zs.map(_._2).sum
      var cum = 0.0
      zs.find { case (_, w) => cum += w; cum * 1e6 >= ppm * tot }.get._1
    }
    for (ppm <- Seq(500000L, 990001L, 995000L, 999991L)) {
      val got = WeightedQuantile.perGroup(df, "g", "v", "w", ppm)
        .as[(String, Double)].collect().toMap
      assert(got("z") == brute(ppm), s"ppm=$ppm: $got")
      assert(got("u") == (if (ppm <= 500000L) 5.0 else 9.0),
        s"ppm=$ppm u: $got")
    }
    // median of z is the heavy value itself (bin 0's single-value floor:
    // recursion picks the sub-bin holding 10.0 — one row, exact)
    val med = WeightedQuantile.perGroup(df, "g", "v", "w", 500000L)
      .as[(String, Double)].collect().toMap
    assert(med("z") == 10.0 && med("u") == 5.0, s"$med")
  }
}
