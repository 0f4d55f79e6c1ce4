package graft

import org.apache.spark.sql.functions._
import graft.dedup.FuzzyJoin

class FuzzyJoinSpec extends SparkSpec {
  import spark.implicits._

  private def pairs(rows: Seq[(Long, String)], k: Int, q: Int = 2) =
    FuzzyJoin.editDistancePairs(rows.toDF("id", "s"), "id", "s", k, q)
      .as[(Long, Long, Long)].collect().toSet

  private def brute(rows: Seq[(Long, String)], k: Int) = {
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0 }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    (for {
      (ia, sa) <- rows; (ib, sb) <- rows if ia < ib
      d = lev(sa, sb) if d <= k
    } yield (ia, ib, d.toLong)).toSet
  }

  test("planted typos: substitution, insertion, deletion, transposition " +
    "all surface with exact distances") {
    val rows = Seq(
      (1L, "the quick brown fox"),
      (2L, "the quick brown fux"),   // 1 substitution
      (3L, "the quick browwn fox"),  // 1 insertion
      (4L, "the quik brown fox"),    // 1 deletion
      (5L, "the quick brwon fox"),   // transposition = 2 edits
      (6L, "a completely different title"))
    val got = pairs(rows, k = 2)
    assert(got == brute(rows, 2), s"$got")
    assert(got.contains((1L, 2L, 1L)) && got.contains((1L, 3L, 1L)) &&
      got.contains((1L, 4L, 1L)) && got.contains((1L, 5L, 2L)))
    assert(!got.exists(p => p._1 == 6L || p._2 == 6L))
  }

  test("blocking is recall-exact vs brute force on a pseudo-random corpus " +
    "with planted near-dups, at several k") {
    def h(x: Long) = {
      var z = x + 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      math.abs(z ^ (z >>> 27))
    }
    val alpha = "abcdefgh"
    val base = (0L until 60L).map { i =>
      (i, (0 until 12).map(j => alpha(((h(i * 13 + j) % 8).toInt + 8) % 8))
        .mkString)
    }
    // plant mutated copies: one char substituted / dropped
    val planted = base.take(10).map { case (i, s) =>
      (1000L + i, s.updated(3, 'z'))
    } ++ base.slice(10, 18).map { case (i, s) => (2000L + i, s.drop(1)) }
    val rows = base ++ planted
    for (k <- Seq(1, 2, 3))
      assert(pairs(rows, k) == brute(rows, k), s"k=$k")
  }

  test("short-string corner: strings below gramLen still pair with " +
    "near-short partners via the sentinel bucket") {
    val rows = Seq(
      (1L, "a"),      // no bigram at all
      (2L, "ab"),     // ed("a","ab") = 1
      (3L, "b"),      // ed("a","b") = 1
      (4L, "abcdef"), // far from the shorts at k=2
      (5L, ""))       // empty: ed("", "a") = 1
    val got = pairs(rows, k = 2)
    assert(got == brute(rows, 2), s"$got")
    assert(got.contains((1L, 2L, 1L)) && got.contains((1L, 3L, 1L)) &&
      got.contains((1L, 5L, 1L)))
    intercept[IllegalArgumentException] {
      FuzzyJoin.editDistancePairs(rows.toDF("id", "s"), "id", "s", -1)
    }
  }

  test("low-gram-diversity corner: pairs whose entire gram intersection " +
    "one edit can destroy still surface (r16 ADVICE regression)") {
    // "abc"/"axc" at k=1: bigram sets {ab,bc} vs {ax,xc} are disjoint and
    // both of size 2 = gramLen*k — the prefix pigeonhole gives nothing.
    val r1 = Seq((1L, "abc"), (2L, "axc"), (3L, "abd"), (4L, "zzz"))
    assert(pairs(r1, k = 1) == brute(r1, 1))
    assert(pairs(r1, k = 1).contains((1L, 2L, 1L)))
    // "abababab"/"cbcbcbcb" at d29's k=6: 2 distinct bigrams each,
    // disjoint sets, ed = 4 <= 6.
    val r2 = Seq((1L, "abababab"), (2L, "cbcbcbcb"), (3L, "ababab"))
    assert(pairs(r2, k = 6) == brute(r2, 6))
    assert(pairs(r2, k = 6).contains((1L, 2L, 4L)))
    // pseudo-random low-alphabet corpus (diversity hovers around the
    // sentinel threshold) stays recall-exact at several k
    def h(x: Long) = {
      var z = x + 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      math.abs(z ^ (z >>> 27))
    }
    val rows = (0L until 40L).map { i =>
      (i, (0 until (4 + (h(i) % 8).toInt))
        .map(j => "abc"((h(i * 31 + j) % 3).toInt)).mkString)
    }
    for (k <- Seq(1, 2, 3))
      assert(pairs(rows, k) == brute(rows, k), s"k=$k")
  }
}
