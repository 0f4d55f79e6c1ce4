package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Warehouse.applyChanges — the CDC MERGE primitive: per-key winner
  * election over the change batch, delete/upsert/insert/passthrough
  * semantics, deterministic tie-breaks, schema contract.
  */
class MergeSpec extends SparkSpec {
  import spark.implicits._

  private val base = Seq(
    (1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0), (4L, "d", 40.0)
  ).toDF("k", "v", "x")

  test("upsert replaces, delete drops, insert adds, untouched pass through") {
    val changes = Seq(
      (2L, "b2", 21.0, "U", 1L),  // update key 2
      (3L, "c", 30.0, "D", 1L),   // delete key 3
      (9L, "i", 90.0, "I", 1L)    // insert new key 9
    ).toDF("k", "v", "x", "op", "seq")
    val got = Warehouse.applyChanges(base, changes, "k", Seq("seq"), "op")
      .as[(Long, String, Double)].collect().toSet
    assert(got == Set((1L, "a", 10.0), (2L, "b2", 21.0), (4L, "d", 40.0),
      (9L, "i", 90.0)), s"$got")
  }

  test("per-key winner: the greatest sequence wins; a later delete beats " +
    "an earlier update and vice versa") {
    val delWins = Seq(
      (2L, "b2", 21.0, "U", 1L),
      (2L, "b", 20.0, "D", 2L)
    ).toDF("k", "v", "x", "op", "seq")
    val got1 = Warehouse.applyChanges(base, delWins, "k", Seq("seq"), "op")
      .as[(Long, String, Double)].collect().toSet
    assert(!got1.exists(_._1 == 2L), s"$got1")
    val updWins = Seq(
      (2L, "b", 20.0, "D", 1L),
      (2L, "b2", 21.0, "U", 2L)
    ).toDF("k", "v", "x", "op", "seq")
    val got2 = Warehouse.applyChanges(base, updWins, "k", Seq("seq"), "op")
      .as[(Long, String, Double)].collect().toSet
    assert(got2.contains((2L, "b2", 21.0)), s"$got2")
  }

  test("tied sequences break deterministically on the payload struct — " +
    "repartition-stable") {
    val tied = Seq(
      (2L, "zz", 1.0, "U", 5L),
      (2L, "aa", 9.0, "U", 5L)
    ).toDF("k", "v", "x", "op", "seq")
    // greatest payload struct wins: ("zz", 1.0) > ("aa", 9.0)
    for (parts <- Seq(1, 7)) {
      val got = Warehouse.applyChanges(base, tied.repartition(parts), "k",
          Seq("seq"), "op")
        .filter(col("k") === 2L).as[(Long, String, Double)].head()
      assert(got == ((2L, "zz", 1.0)), s"parts=$parts: $got")
    }
  }

  test("multi-column sequences order lexicographically; schema contract " +
    "enforced") {
    val changes = Seq(
      (2L, "early", 1.0, "U", 1L, 9L), // (1, 9)
      (2L, "late", 2.0, "U", 2L, 0L)   // (2, 0) > (1, 9)
    ).toDF("k", "v", "x", "op", "seq1", "seq2")
    val got = Warehouse.applyChanges(base, changes, "k",
        Seq("seq1", "seq2"), "op")
      .filter(col("k") === 2L).as[(Long, String, Double)].head()
    assert(got == ((2L, "late", 2.0)))
    intercept[IllegalArgumentException] {
      Warehouse.applyChanges(base, changes.drop("x"), "k", Seq("seq1"), "op")
    }
    intercept[IllegalArgumentException] {
      Warehouse.applyChanges(base, changes, "k", Seq(), "op")
    }
  }
}
