package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-pattern PHRASE matching — the crawl-curation gate t37's word
  * list cannot express: blocklist entries that span token boundaries
  * ("how to make a", UT1-style multi-word categories, benchmark prompt
  * prefixes). The naive plan is one `contains`/regex scan PER phrase —
  * O(|P|·len) per document, hopeless at a 100k-entry list — so this
  * builds the classic Aho–Corasick automaton (goto/fail/output links)
  * and scans each document ONCE: O(len + matches), independent of list
  * size.
  *
  * Scale shape: only the phrase ARRAY serializes into the task binary
  * (Spark broadcasts task binaries per stage); the automaton itself is
  * `@transient lazy`, built once per executor JVM and shared by every
  * task on it. Memory is O(total phrase chars) — a 1M-phrase list of
  * ~30-char entries is tens of MB of trie, an executor-comfortable
  * broadcast-dim size, and [[filterBlockedPhrases]] bounds the driver
  * collect with `maxPhrases` so an unbounded "list" table fails loudly
  * instead of OOMing the driver. Matching is row-local (scan hot path
  * safe, no shuffle).
  *
  * Semantics: case-insensitive SUBSTRING matching (both sides folded
  * per-char with `Character.toLowerCase` — locale-independent, BMP char
  * level); a word-boundary variant is the
  * caller padding its phrases with spaces against pre-normalized text.
  * Null text matches nothing. Hits report each matched phrase at most
  * once (distinct by phrase, not by occurrence).
  */
object Phrases {

  /** Aho–Corasick automaton over `phrases` (lowercased, deduped, empties
    * dropped). Serializable by shipping only the phrase array; the
    * goto/fail/output tables rebuild lazily per executor.
    *
    * Case folding is PER-CHAR (`Character.toLowerCase`, BMP char level)
    * on BOTH sides — the scan folds one char at a time, so the trie must
    * be built with the identical 1:1 fold. A locale/string-level fold
    * here (1:N mappings like U+0130 'İ' → "i" + combining dot) would
    * build trie edges the per-char scanner can never traverse, and such
    * phrases would silently never match.
    */
  final class PhraseAutomaton(rawPhrases: Array[String]) extends Serializable {
    val phrases: Array[String] = {
      val seen = new scala.collection.mutable.LinkedHashSet[String]
      rawPhrases.foreach { p =>
        if (p != null) {
          val t = p.map(Character.toLowerCase)
          if (t.nonEmpty) seen += t
        }
      }
      seen.toArray
    }

    // trie: per-node char→child map; fail links BFS'd; out = phrase ids
    // ending at the node (suffix outputs merged via the fail chain at
    // build time, so the scan never walks fail links for output).
    @transient private lazy val (children, fail, out) = build()

    private def build(): (Array[java.util.HashMap[Character, Integer]],
                          Array[Int], Array[Array[Int]]) = {
      val ch = scala.collection.mutable.ArrayBuffer(
        new java.util.HashMap[Character, Integer]())
      val outB = scala.collection.mutable.ArrayBuffer(Array.empty[Int])
      var i = 0
      while (i < phrases.length) {
        var node = 0
        val p = phrases(i)
        var j = 0
        while (j < p.length) {
          val c = Character.valueOf(p.charAt(j))
          val nxt = ch(node).get(c)
          if (nxt == null) {
            ch += new java.util.HashMap[Character, Integer]()
            outB += Array.empty[Int]
            ch(node).put(c, ch.length - 1)
            node = ch.length - 1
          } else node = nxt
          j += 1
        }
        outB(node) = outB(node) :+ i
        i += 1
      }
      val failB = Array.fill(ch.length)(0)
      val queue = new java.util.ArrayDeque[Int]()
      ch(0).forEach { (_, v) => queue.add(v) }
      while (!queue.isEmpty) {
        val u = queue.poll()
        ch(u).forEach { (c, v) =>
          var f = failB(u)
          while (f != 0 && ch(f).get(c) == null) f = failB(f)
          val t = ch(f).get(c)
          failB(v) = if (t != null && t != v) t else 0
          // merge suffix outputs so scanning needs no fail-chain walk
          if (outB(failB(v)).nonEmpty) outB(v) = outB(v) ++ outB(failB(v))
          queue.add(v)
        }
      }
      (ch.toArray, failB, outB.toArray)
    }

    /** Distinct phrase ids matched anywhere in `text` (empty for null). */
    def matchIds(text: String): Array[Int] = {
      if (text == null || phrases.isEmpty) return Array.empty
      val hits = new java.util.BitSet(phrases.length)
      var node = 0
      var i = 0
      while (i < text.length) {
        val c = Character.valueOf(Character.toLowerCase(text.charAt(i)))
        var n = node
        while (n != 0 && children(n).get(c) == null) n = fail(n)
        val t = children(n).get(c)
        node = if (t != null) t else 0
        val o = out(node)
        var k = 0
        while (k < o.length) { hits.set(o(k)); k += 1 }
        i += 1
      }
      val res = new Array[Int](hits.cardinality())
      var b = hits.nextSetBit(0); var k = 0
      while (b >= 0) { res(k) = b; k += 1; b = hits.nextSetBit(b + 1) }
      res
    }

    def matchPhrases(text: String): Array[String] =
      matchIds(text).map(phrases)
  }

  /** Sorted distinct array of listed phrases found in `text` — one
    * automaton scan per row regardless of list size.
    */
  def phraseHits(text: Column, phrases: Seq[String]): Column = {
    require(phrases.nonEmpty, "phraseHits: empty phrase list")
    val ac = new PhraseAutomaton(phrases.toArray)
    val u = udf { (s: String) => ac.matchPhrases(s).sorted }
    u(text)
  }

  /** Count of DISTINCT listed phrases present in `text`. */
  def phraseHitCount(text: Column, phrases: Seq[String]): Column = {
    require(phrases.nonEmpty, "phraseHitCount: empty phrase list")
    val ac = new PhraseAutomaton(phrases.toArray)
    val u = udf { (s: String) => ac.matchIds(s).length }
    u(text)
  }

  /** Drop every row whose text contains ANY phrase from the `blocked`
    * table (the t36 domain-gate convention, phrase-shaped). The list
    * collects to the driver under a loud `maxPhrases` bound — phrase
    * blocklists are list-shaped (≤ millions of short strings), never
    * corpus-shaped; a corpus-sized "list" is a modeling error this
    * require surfaces instead of an OOM.
    */
  def filterBlockedPhrases(df: DataFrame, textCol: String,
                           blocked: DataFrame, phraseCol: String = "phrase",
                           maxPhrases: Int = 5000000): DataFrame = {
    val rows = blocked.select(col(phraseCol).cast("string"))
      .na.drop().distinct().limit(maxPhrases + 1).collect()
    require(rows.length <= maxPhrases,
      s"filterBlockedPhrases: list exceeds maxPhrases=$maxPhrases")
    val phrases = rows.map(_.getString(0)).filter(_.nonEmpty)
    if (phrases.isEmpty) df
    else df.filter(phraseHitCount(col(textCol), phrases.toSeq) === 0)
  }
}
