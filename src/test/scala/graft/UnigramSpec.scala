package graft

import org.apache.spark.sql.functions._
import graft.text.Unigram
import graft.text.Unigram.{Unk, UnigramModel}

/** Semantics tests for the unigram-LM (SentencePiece-family) tokenizer:
  * Viterbi segmentation under integer micro-nat scores, the canonical tie
  * order, hard-EM training determinism, and the model-artifact round trip.
  */
class UnigramSpec extends SparkSpec {
  import spark.implicits._

  // Hand-built models pin the DP comparator without depending on training.
  private def model(pieces: (String, Long)*): UnigramModel =
    UnigramModel(pieces.sortBy(_._1), pieces.map(_._2).min - 1000000L, 3)

  private def enc(m: UnigramModel, text: String): List[String] =
    Seq((1L, text)).toDF("doc_id", "text")
      .select(Unigram.encode(spark, m, col("text")))
      .head().getSeq[String](0).toList

  test("Viterbi picks the max-score segmentation under integer scores") {
    // "abc": [ab, c] = -30, [a, bc] = -60, [a, b, c] = -70, [abc] absent
    val m = model("a" -> -20L, "b" -> -30L, "c" -> -20L,
      "ab" -> -10L, "bc" -> -40L)
    assert(enc(m, "abc") == List("ab", "c"))
  }

  test("score ties prefer fewer pieces, then the longer final piece") {
    // "ab": [ab] = -100 (1 piece) ties [a, b] = -100 (2 pieces) → [ab]
    val m1 = model("a" -> -50L, "b" -> -50L, "ab" -> -100L)
    assert(enc(m1, "ab") == List("ab"))
    // "aab": [aa, b] and [a, ab] both score -20 with 2 pieces; the
    // last-piece-longest rule picks [a, ab]
    val m2 = model("a" -> -10L, "b" -> -10L, "aa" -> -10L, "ab" -> -10L)
    assert(enc(m2, "aab") == List("a", "ab"))
  }

  test("unknown characters surface as <unk> at unkScore, never fail") {
    val m = model("a" -> -10L, "b" -> -10L)
    assert(enc(m, "axb") == List("a", Unk, "b"))
    // whole-word unknown: one <unk> per character
    assert(enc(m, "zz") == List(Unk, Unk))
    // <unk> is strictly below every piece, so known chars never use it
    assert(enc(m, "ab") == List("a", "b"))
  }

  test("encodeDetail: n and score are consistent with the piece list") {
    val m = model("a" -> -10L, "b" -> -20L, "ab" -> -25L)
    val r = Seq((1L, "ab a b"), (2L, null.asInstanceOf[String]), (3L, "  "))
      .toDF("doc_id", "text")
      .select(col("doc_id"), Unigram.encodeDetail(spark, m, col("text")).as("e"))
      .select(col("doc_id"), col("e.pieces"), col("e.n"), col("e.score"))
      .collect().map(r => r.getLong(0) -> r).toMap
    val r1 = r(1L)
    assert(r1.getSeq[String](1) == Seq("ab", "a", "b"))
    assert(r1.getInt(2) == 3)
    assert(r1.getLong(3) == -25L + -10L + -20L)
    assert(r(2L).isNullAt(1) && r(2L).isNullAt(2) && r(2L).isNullAt(3))
    // whitespace-only text: zero pieces, zero score (not null)
    assert(r(3L).getInt(2) == 0 && r(3L).getLong(3) == 0L)
    // tokenCount agrees with the piece-list length
    val n = Seq((1L, "ab a b")).toDF("doc_id", "text")
      .select(Unigram.tokenCount(spark, m, col("text"))).head().getInt(0)
    assert(n == 3)
  }

  test("train keeps every character, learns frequent substrings, and segments") {
    val text = (Seq.fill(8)("tokens") ++ Seq.fill(6)("token") ++
      Seq.fill(4)("broken")).mkString(" ")
    val docs = Seq((1L, text)).toDF("doc_id", "text")
    val m = Unigram.train(docs, "text", vocabSize = 12, maxPieceLen = 3)
    val pieces = m.pieces.map(_._1).toSet
    // encodability floor: every corpus character is a piece
    for (c <- "tokensbr") assert(pieces.contains(c.toString), s"missing $c")
    // the dominant trigrams survive pruning
    assert(pieces.exists(_.length > 1), s"no multi-char piece in $pieces")
    // Viterbi reassembles each training word exactly (no <unk>)
    val out = enc(m, "tokens broken")
    assert(out.mkString == "tokensbroken" && !out.contains(Unk), s"$out")
    // trained segmentation beats chars: fewer pieces than characters
    assert(out.length < "tokensbroken".length)
  }

  test("training is partition-invariant and maxWords-guarded") {
    val docs = (1L to 60L).map(i =>
      (i, s"alpha beta gamma token${i % 9} alpha beta")).toDF("doc_id", "text")
    val m1 = Unigram.train(docs, "text", vocabSize = 30)
    val m2 = Unigram.train(docs.repartition(7), "text", vocabSize = 30)
    assert(m1 == m2)
    val e = intercept[IllegalArgumentException] {
      Unigram.train(docs, "text", vocabSize = 30, maxWords = 3)
    }
    assert(e.getMessage.contains("maxWords"))
  }

  test("vocabSize caps multi-char pieces; chars always survive") {
    val docs = Seq((1L, "abcdef abcdef fedcba")).toDF("doc_id", "text")
    val m = Unigram.train(docs, "text", vocabSize = 7, maxPieceLen = 3)
    val (chars, multi) = m.pieces.map(_._1).partition(_.length == 1)
    assert(chars.toSet == Set("a", "b", "c", "d", "e", "f"))
    assert(chars.size + multi.size <= 7)
  }

  test("oovReport: hand-computed coverage counters and integral ppm") {
    val m = model("a" -> -10L, "b" -> -20L, "ab" -> -25L)
    // src0: "ab a" → pieces [ab],[a] (2, 0 unk); "zb" → [<unk>],[b] (2, 1)
    // src1: null text only → null sums, null ppm
    val docs = Seq(("src0", "ab a"), ("src0", "zb"),
      ("src1", null.asInstanceOf[String])).toDF("source", "text")
    val got = Unigram.oovReport(spark, docs, "text", "source", m)
      .orderBy("source").collect()
    assert(got.length == 2)
    assert(got(0).getString(0) == "src0" && got(0).getLong(1) == 4 &&
      got(0).getLong(2) == 1 && got(0).getLong(3) == 250000L, s"${got(0)}")
    assert(got(1).getString(0) == "src1" && got(1).isNullAt(1) &&
      got(1).isNullAt(2) && got(1).isNullAt(3), s"${got(1)}")
  }

  test("streaming OOV probe: per-batch reports ≡ the batch core under the " +
    "persisted model, with correct batch ids") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val docs = Seq((1L, "tok tok broke")).toDF("doc_id", "text")
    val m = Unigram.train(docs, "text", vocabSize = 10, maxPieceLen = 3)
    graft.sources.Warehouse.dropTableAndLocation(spark, "uni_oov_model")
    Unigram.saveModel(spark, m, "uni_oov_model")
    val in = MemoryStream[(String, String)]
    val got = scala.collection.mutable.ArrayBuffer[(String, Long, Long, Long, Long)]()
    val q = graft.streaming.EventStreams.oovProbeStream(
        in.toDF().toDF("src", "text"), "src", "text", "uni_oov_model") { out =>
      got ++= out.collect().map(r =>
        (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    }
    try {
      in.addData(("a", "tok broke"), ("a", "tok 9"), ("b", "tok"))
      q.processAllAvailable()
      in.addData(("a", "zzz"))
      q.processAllAvailable()
    } finally q.stop()
    // batch 0 ≡ the batch core over the same rows
    val expect0 = Unigram.oovReport(spark,
        Seq(("a", "tok broke"), ("a", "tok 9"), ("b", "tok"))
          .toDF("src", "text"), "text", "src", m)
      .orderBy("src").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), 0L))
    assert(got.filter(_._5 == 0L).sortBy(_._1).toSeq == expect0.toSeq,
      s"stream ${got.toList} vs batch ${expect0.toList}")
    // batch 1: "zzz" is all-unknown → ppm 1000000, batch_id 1
    val b1 = got.filter(_._5 == 1L)
    assert(b1.size == 1 && b1.head._1 == "a" && b1.head._4 == 1000000L,
      s"$b1")
  }

  test("model persists as a warehouse artifact and round-trips exactly") {
    val docs = Seq((1L, "low lower lowest newest new")).toDF("doc_id", "text")
    val m = Unigram.train(docs, "text", vocabSize = 16)
    graft.sources.Warehouse.dropTableAndLocation(spark, "unigram_model_rt")
    Unigram.saveModel(spark, m, "unigram_model_rt")
    val back = Unigram.loadModel(spark, "unigram_model_rt")
    assert(back == m)
    val probe = Seq((1L, "lowest new zap")).toDF("doc_id", "text")
    val a = probe.select(Unigram.encode(spark, m, col("text"))).head().getSeq[String](0)
    val b = probe.select(Unigram.encode(spark, back, col("text"))).head().getSeq[String](0)
    assert(a == b)
  }
}
