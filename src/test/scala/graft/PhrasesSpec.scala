package graft

import org.apache.spark.sql.functions._
import graft.text.Phrases

class PhrasesSpec extends SparkSpec {
  import spark.implicits._

  test("automaton: suffix outputs, overlap, case, nulls (classic AC corpus)") {
    val ac = new Phrases.PhraseAutomaton(Array("he", "she", "his", "hers"))
    // "ushers" contains she, he (inside "shers"), hers — the suffix-output
    // merge the fail chain exists for; "his" absent.
    assert(ac.matchPhrases("ushers").toSet === Set("he", "she", "hers"))
    assert(ac.matchPhrases("HIS?").toSet === Set("his"))
    assert(ac.matchPhrases(null).isEmpty)
    assert(ac.matchPhrases("xyz").isEmpty)
    // duplicate + empty + null phrases collapse; distinct-by-phrase hits
    val ac2 = new Phrases.PhraseAutomaton(Array("ab", "AB", "", null, "ab"))
    assert(ac2.phrases.toSeq === Seq("ab"))
    assert(ac2.matchPhrases("abab abab").toSeq === Seq("ab"))
  }

  test("automaton equals naive per-phrase contains on a generated corpus") {
    val rnd = new scala.util.Random(42)
    val alpha = "abcd "
    def randText(n: Int): String =
      (0 until n).map(_ => alpha(rnd.nextInt(alpha.length))).mkString
    val phrases = (0 until 60).map(_ => randText(1 + rnd.nextInt(6)))
      .filter(_.trim.nonEmpty).distinct.toArray
    val ac = new Phrases.PhraseAutomaton(phrases)
    val lowered = ac.phrases
    (0 until 200).foreach { _ =>
      val doc = randText(rnd.nextInt(120))
      val expect = lowered.filter(p => doc.toLowerCase.contains(p)).toSet
      assert(ac.matchPhrases(doc).toSet === expect, s"doc=<$doc>")
    }
  }

  test("phraseHits/phraseHitCount run distributed; filterBlockedPhrases gates") {
    val docs = Seq(
      (1L, "a fast key scan over the table"),
      (2L, "nothing to see"),
      (3L, "Fast Key Scan AND slow fast moves"),
      (4L, null.asInstanceOf[String])).toDF("id", "text")
    val hits = docs.select(col("id"),
      Phrases.phraseHits(col("text"), Seq("fast key scan", "slow fast")).as("h"),
      Phrases.phraseHitCount(col("text"), Seq("fast key scan", "slow fast")).as("n"))
      .orderBy("id").collect()
    assert(hits.map(r => (r.getLong(0), r.getSeq[String](1).toSet, r.getInt(2))).toSeq ===
      Seq((1L, Set("fast key scan"), 1),
          (2L, Set.empty[String], 0),
          (3L, Set("fast key scan", "slow fast"), 2),
          (4L, Set.empty[String], 0)))

    val blocked = Seq("fast key scan").toDF("phrase")
    val kept = Phrases.filterBlockedPhrases(docs, "text", blocked)
      .select("id").as[Long].collect().sorted
    // null text has no evidence → keeps (corrupt-survives convention)
    assert(kept.toSeq === Seq(2L, 4L))

    val big = spark.range(10).select(concat(lit("p"), col("id")).as("phrase"))
    intercept[IllegalArgumentException] {
      Phrases.filterBlockedPhrases(docs, "text", big, maxPhrases = 5)
    }
  }
}
