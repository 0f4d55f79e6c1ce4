package graft

import org.apache.spark.sql.functions._
import graft.dedup.Containment

class ContainmentSpec extends SparkSpec {
  import spark.implicits._

  private def pairs(df: org.apache.spark.sql.DataFrame, tauPct: Int,
                    minShingles: Int, prefix: Boolean) =
    Containment.containmentPairs(df, "text", "id",
        k = 3, tauPct = tauPct, minShingles = minShingles,
        prefixFilter = prefix)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getLong(2), r.getLong(3))).toSet

  test("quote detection: small doc inside aggregator found; resemblance-invisible") {
    val quote = (1 to 14).map(i => s"q$i").mkString(" ") // 12 shingles
    val filler = (1 to 300).map(i => s"f$i").mkString(" ")
    val docs = Seq(
      (1L, quote),
      (2L, s"$filler $quote"), // aggregator quoting doc 1 verbatim
      (3L, "unrelated words that share nothing with anyone else here"))
      .toDF("id", "text")
    val got = pairs(docs, tauPct = 80, minShingles = 10, prefix = true)
    // 1 ⊂ 2 fully: n_common = n_a = 12 (the "q1..q14" gram block; the
    // filler/quote seam adds f299 f300 q1-style grams only to doc 2)
    assert(got === Set((1L, 2L, 12L, 12L)))
    // Jaccard of the pair is tiny — the resemblance tier must NOT see it
    val j = 12.0 / (298 + 12 + 2)
    assert(j < 0.05)
  }

  test("threshold boundary is exact integer arithmetic; direction asymmetric") {
    // a: tokens t1..t12 → 10 shingles; b contains 8 of them (τ=80 keeps),
    // c contains 7 (drops). Shingle i = "t{i} t{i+1} t{i+2}".
    val a = (1 to 12).map("t" + _).mkString(" ")
    val b = (1 to 10).map("t" + _).mkString(" ") + " zz " +
      (1 to 40).map("x" + _).mkString(" ") // shingles t1..t8 block present
    val c = (1 to 9).map("t" + _).mkString(" ") + " zz " +
      (1 to 40).map("y" + _).mkString(" ")
    val docs = Seq((1L, a), (2L, b), (3L, c)).toDF("id", "text")
    val got = pairs(docs, tauPct = 80, minShingles = 10, prefix = true)
    assert(got.contains((1L, 2L, 8L, 10L)))
    assert(!got.exists(p => p._1 == 1L && p._2 == 3L))
    // big docs are never "contained" in the small one
    assert(!got.exists(_._1 == 2L))
  }

  test("identical docs are mutually contained; prefix ≡ naive on a generated corpus") {
    val rnd = new scala.util.Random(7)
    val vocab = (1 to 25).map("w" + _)
    def doc() = (0 until (20 + rnd.nextInt(40)))
      .map(_ => vocab(rnd.nextInt(vocab.length))).mkString(" ")
    val base = (1L to 60L).map(i => (i, doc()))
    // plant: a pair of identical docs and one verbatim quote
    val docs = (base :+ (100L, base.head._2) :+
      (101L, base(1)._2 + " " + base(2)._2))
      .toDF("id", "text").repartition(7)
    val fast = pairs(docs, tauPct = 70, minShingles = 5, prefix = true)
    val naive = pairs(docs, tauPct = 70, minShingles = 5, prefix = false)
    assert(fast === naive) // the prefix filter is lossless
    assert(fast.exists(p => p._1 == 1L && p._2 == 100L))
    assert(fast.exists(p => p._1 == 100L && p._2 == 1L))
    assert(fast.exists(p => p._1 == 2L && p._2 == 101L && p._3 == p._4))
    // partitioning invariance
    val re = Containment.containmentPairs(docs.repartition(3), "text", "id",
      k = 3, tauPct = 70, minShingles = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getLong(2), r.getLong(3))).toSet
    assert(re === fast)
  }

  test("every materialization strategy returns identical containment pairs") {
    import graft.pipeline.Materialize
    val docs = Seq(
      (1L, "a b c d e f g h i j k l m n o p"),
      (2L, "a b c d e f g h i j k l m n o p q r s t u v w x y z aa bb cc"),
      (3L, "z y x w v u t s r q p o n m l k")
    ).toDF("id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft-cont").toString
    def run(m: Materialize) = Containment.containmentPairs(docs, "text", "id",
        k = 3, tauPct = 70, minShingles = 5, materialize = m)
      .collect().map(_.toString).sorted.toSeq
    val expected = run(Materialize.Local)
    for (m <- Seq(Materialize.Off, Materialize.Disk, Materialize.Reliable(dir)))
      assert(run(m) == expected, s"strategy $m diverged")
    // Reliable actually spilled (the returned frame is file-backed)
    assert(new java.io.File(dir).listFiles()
      .exists(_.getName.startsWith("containment-pairs-")))
  }

  test("short docs excluded as contained side; sub-k docs shingle to empty") {
    val docs = Seq(
      (1L, "a b c"),          // 1 shingle — below minShingles
      (2L, "a b"),            // sub-k: zero shingles
      (3L, "a b c " + (1 to 30).map("y" + _).mkString(" ")))
      .toDF("id", "text")
    assert(pairs(docs, tauPct = 50, minShingles = 2, prefix = true)
      .forall(_._1 == 3L) )
    // with minShingles=1 the tiny doc IS eligible and is found in doc 3
    val got = pairs(docs, tauPct = 100, minShingles = 1, prefix = true)
    assert(got.contains((1L, 3L, 1L, 1L)))
  }
}
