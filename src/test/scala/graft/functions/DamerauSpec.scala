package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

class DamerauSpec extends SparkSpec {
  import spark.implicits._

  private def d(a: String, b: String): Int =
    DamerauFn.dist(UTF8String.fromString(a), UTF8String.fromString(b))

  test("kernel matches DuckDB's unrestricted damerau_levenshtein on " +
    "the reference pairs (CA->ABC = 2 pins the variant — OSA says 3)") {
    val ref = Seq(
      ("CA", "ABC", 2), ("ab", "ba", 1), ("abcdef", "abcfed", 2),
      ("kitten", "sitting", 3), ("", "abc", 3), ("abc", "abc", 0),
      ("ac", "cba", 2), ("teh", "the", 1), ("a cat", "an act", 2),
      ("x", "", 1))
    for ((a, b, want) <- ref) {
      assert(d(a, b) == want, s"dl($a, $b) = ${d(a, b)}, want $want")
      assert(d(b, a) == want, s"dl($b, $a) symmetric")
    }
  }

  test("kernel never exceeds plain levenshtein and drops exactly 1 per " +
    "adjacent transposition") {
    assert(d("abcd", "abdc") == 1) // levenshtein 2
    assert(d("abcd", "badc") == 2) // two transpositions; levenshtein 3+
  }

  test("damerauPairs: transposition-only pairs at the block boundary " +
    "are found (levenshtein would need 2k); equals brute force on a " +
    "randomized typo corpus") {
    // long enough that the non-sentinel signature path is exercised
    val rows = Seq(
      (1L, "abcdefghij"), (2L, "abcdefghji"), // DL 1 (L 2)
      (3L, "zyxwvutsrq"), (4L, "qrstuvwxyz")).toDF("id", "s")
    val got = graft.dedup.FuzzyJoin.damerauPairs(rows, "id", "s",
        maxDist = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set((1L, 2L, 1L)), got.toString)

    // randomized corpus: base strings + deterministic mutations
    // (substitutions, deletions, transpositions); assert the blocked
    // join equals the all-pairs scan at maxDist = 2
    val alpha = "abcdefgh"
    def mut(s: String, seed: Int): String = {
      val r = new scala.util.Random(seed)
      val sb = new StringBuilder(s)
      r.nextInt(3) match {
        case 0 if sb.nonEmpty => // substitution
          sb.setCharAt(r.nextInt(sb.length), alpha(r.nextInt(alpha.length)))
        case 1 if sb.length > 1 => // deletion
          sb.deleteCharAt(r.nextInt(sb.length))
        case _ if sb.length > 1 => // adjacent transposition
          val i = r.nextInt(sb.length - 1)
          val c = sb.charAt(i); sb.setCharAt(i, sb.charAt(i + 1))
          sb.setCharAt(i + 1, c)
        case _ =>
      }
      sb.toString
    }
    val rnd = new scala.util.Random(42)
    val bases = (0 until 12).map(_ =>
      (0 until 12).map(_ => alpha(rnd.nextInt(alpha.length))).mkString)
    val corpus = bases.zipWithIndex.flatMap { case (s, i) =>
      Seq((i * 10L, s), (i * 10L + 1, mut(s, i)),
        (i * 10L + 2, mut(mut(s, i + 100), i + 200)))
    }
    val df = corpus.toDF("id", "s")
    val blocked = graft.dedup.FuzzyJoin.damerauPairs(df, "id", "s",
        maxDist = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val brute = (for {
      (ia, sa) <- corpus; (ib, sb) <- corpus if ia < ib
      dd = d(sa, sb) if dd <= 2
    } yield (ia, ib, dd.toLong)).toSet
    assert(blocked == brute,
      s"missing=${brute -- blocked} extra=${blocked -- brute}")
  }
}
