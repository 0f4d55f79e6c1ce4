package graft

import org.apache.spark.sql.functions._
import graft.operators.Cardinality

class CardinalitySpec extends SparkSpec {
  import spark.implicits._

  test("two appended runs report like one pass; estimates within 5% of exact") {
    val reg = "card_reg_spec"
    graft.sources.Warehouse.dropTableAndLocation(spark, reg)
    Cardinality.createSketchRegistry(spark, reg, buckets = 4)
    // run 1: source A sends urls 0..999, B sends 0..199 (overlapping ids
    // are distinct per group — groups are independent universes)
    val run1 = ((0 until 1000).map(i => ("A", s"u$i")) ++
      (0 until 200).map(i => ("B", s"u$i"))).toDF("src", "url")
    // run 2: A re-sends 500..1499 (500 new), B sends nothing new
    val run2 = ((500 until 1500).map(i => ("A", s"u$i")) ++
      (0 until 200).map(i => ("B", s"u$i"))).toDF("src", "url")
    assert(Cardinality.appendSketches(run1, "src", "url", reg) === 2L)
    assert(Cardinality.appendSketches(run2, "src", "url", reg) === 2L)
    val est = Cardinality.distinctPerGroup(spark, reg)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // exact: A=1500, B=200
    assert(math.abs(est("A") - 1500L) <= 75, s"A est ${est("A")}")
    assert(math.abs(est("B") - 200L) <= 10, s"B est ${est("B")}")

    // the same data sketched in ONE pass estimates within 2% — HLL
    // union keeps the error bound (registers may differ slightly, so
    // estimates are near- but not bit-equal)
    val onePass = "card_reg_onepass"
    graft.sources.Warehouse.dropTableAndLocation(spark, onePass)
    Cardinality.createSketchRegistry(spark, onePass, buckets = 4)
    Cardinality.appendSketches(run1.unionByName(run2), "src", "url", onePass)
    val est1 = Cardinality.distinctPerGroup(spark, onePass)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    est1.foreach { case (g, e) =>
      assert(math.abs(e - est(g)) <= math.max(2, e / 50),
        s"$g: union $e vs one-pass ${est(g)}") }

    // registry growth is sketch-sized: 2 rows per run, not per item
    assert(spark.table(reg).count() === 4L)
  }

  test("sketching is deterministic and null values are uncounted") {
    val reg1 = "card_det_1"; val reg2 = "card_det_2"
    for (r <- Seq(reg1, reg2)) {
      graft.sources.Warehouse.dropTableAndLocation(spark, r)
      Cardinality.createSketchRegistry(spark, r, buckets = 2)
    }
    val data = ((0 until 500).map(i => ("s", Some(s"v${i % 300}"))) :+
      ("s", Option.empty[String])).toDF("src", "url")
    Cardinality.appendSketches(data, "src", "url", reg1)
    Cardinality.appendSketches(data.repartition(7), "src", "url", reg2)
    val e1 = Cardinality.distinctPerGroup(spark, reg1).collect()(0).getLong(1)
    val e2 = Cardinality.distinctPerGroup(spark, reg2).collect()(0).getLong(1)
    assert(e1 === e2) // same inputs → same estimate at any partitioning
    assert(math.abs(e1 - 300L) <= 15, s"est $e1")
  }
}
