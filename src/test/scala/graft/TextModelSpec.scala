package graft

import org.apache.spark.sql.functions._
import graft.text.{Classifier, Importance, LangModel, TextOps}

/** Semantics tests for the model-based quality tiers (bigram-LM
  * cross-entropy, hashed linear classifier) and the per-source quota.
  */
class TextModelSpec extends SparkSpec {
  import spark.implicits._

  // --- bigram LM -----------------------------------------------------

  test("bigram LM: hand-computable counts and Laplace smoothing") {
    // corpus: "a b a b" + "a b c" → grams: (a,b)x3? no: doc1 grams
    // (a,b),(b,a),(a,b); doc2 grams (a,b),(b,c). V = {a,b,c} = 3.
    val docs = Seq((1L, "a b a b"), (2L, "a b c")).toDF("doc_id", "text")
    val lm = LangModel.trainBigramLm(docs, "text")
    val biMap = lm.bigrams.collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    assert(biMap == Map(("a", "b") -> 3L, ("b", "a") -> 1L, ("b", "c") -> 1L))
    val ctx = lm.contexts.collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(ctx == Map("a" -> 3L, "b" -> 2L))
    assert(lm.vocab == 3L)

    val scored = LangModel.crossEntropy(docs, "text", "doc_id", lm)
      .collect().map(r => (r.getLong(0), (r.getInt(1), r.getDouble(2)))).toMap
    // doc1: grams (a,b)k=2, (b,a)k=1
    //   lp(a,b) = ln(4/6); lp(b,a) = ln(2/5)
    val d1 = -(2 * math.log(4.0 / 6) + 1 * math.log(2.0 / 5)) / 3
    assert(scored(1L)._1 == 3)
    assert(math.abs(scored(1L)._2 - math.rint(d1 * 1e4) / 1e4) < 1e-9)
    // doc2: (a,b) ln(4/6), (b,c) ln(2/5)
    val d2 = -(math.log(4.0 / 6) + math.log(2.0 / 5)) / 2
    assert(math.abs(scored(2L)._2 - math.rint(d2 * 1e4) / 1e4) < 1e-9)
  }

  // --- interpolated Kneser–Ney trigram LM ----------------------------

  test("KN trigram: hand-computed ladder — counts, continuation mass, OOV floor") {
    // corpus: "a b c a b c" + "a b d"
    // tri: (a,b,c)×2 (b,c,a) (c,a,b) (a,b,d); cbi all 1; nn=4, ww=4, V=4
    val ref = Seq((1L, "a b c a b c"), (2L, "a b d")).toDF("doc_id", "text")
    val lm = LangModel.trainKnTrigramLm(ref, "text")
    assert(lm.nBigramTypes == 4 && lm.nUnigramTypes == 4 && lm.vocab == 4)
    val tri = lm.trigrams.collect()
      .map(r => ((r.getString(0), r.getString(1), r.getString(2)), r.getLong(3))).toMap
    assert(tri == Map(("a","b","c") -> 2L, ("b","c","a") -> 1L,
      ("c","a","b") -> 1L, ("a","b","d") -> 1L))

    // P1(seen w) = 0.25/4 + 0.75*4/4*(1/5) = 0.2125; 4·0.2125 + 0.15 OOV
    // floor = 1.0 exactly (the distribution property the continuation
    // construction guarantees)
    val p1 = 0.2125
    // probe "a b c": P2(c|b) = 0.25/2 + 0.75*2/2*p1; P3 = 1.25/3 + 0.75*2/3*P2
    val p2c = 0.25 / 2 + 0.75 * 2 / 2 * p1
    val p3abc = 1.25 / 3 + 0.75 * 2 / 3 * p2c
    // probe "c a b": P2(b|a) = 0.25/1 + 0.75*1/1*p1; P3 = 0.25/1 + 0.75*1/1*P2
    val p2b = 0.25 / 1 + 0.75 * 1 / 1 * p1
    val p3cab = 0.25 / 1 + 0.75 * 1 / 1 * p2b
    // probe "x y z": everything OOV → P1 floor 0.75*4/4*(1/5) = 0.15
    val probes = Seq((10L, "a b c"), (11L, "c a b"), (12L, "x y z"),
      (13L, "a b")).toDF("doc_id", "text")
    val out = LangModel.knCrossEntropy(probes, "text", "doc_id", lm)
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), if (r.isNullAt(2)) Double.NaN else r.getDouble(2))).toMap
    def r4(x: Double) = math.rint(x * 1e4) / 1e4
    assert(out(10L)._1 == 1 && math.abs(out(10L)._2 - r4(-math.log(p3abc))) < 1e-9)
    assert(out(11L)._2 == r4(-math.log(p3cab)))
    assert(out(12L)._2 == r4(-math.log(0.15)))
    assert(out(13L)._1 == 0 && out(13L)._2.isNaN) // under 3 tokens: null
    // the OOV doc scores strictly worse than both in-distribution probes
    assert(out(12L)._2 > out(10L)._2 && out(12L)._2 > out(11L)._2)
  }

  test("KN trigram: partitioning-invariant; save/load scores identical") {
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents").limit(80)
    val lm1 = LangModel.trainKnTrigramLm(docs.repartition(1), "text")
    val lm8 = LangModel.trainKnTrigramLm(docs.repartition(8), "text")
    val a = LangModel.knCrossEntropy(docs, "text", "doc_id", lm1)
      .orderBy("doc_id").collect().toSeq
    val b = LangModel.knCrossEntropy(docs.repartition(8), "text", "doc_id", lm8)
      .orderBy("doc_id").collect().toSeq
    assert(a == b)
    for (t <- Seq("kn_model_rt", "kn_model_rt_meta"))
      graft.sources.Warehouse.dropTableAndLocation(spark, t)
    LangModel.saveKnModel(spark, lm1, "kn_model_rt")
    val back = LangModel.loadKnModel(spark, "kn_model_rt")
    assert(back.vocab == lm1.vocab && back.discount == lm1.discount &&
      back.nBigramTypes == lm1.nBigramTypes &&
      back.nUnigramTypes == lm1.nUnigramTypes)
    val c = LangModel.knCrossEntropy(docs, "text", "doc_id", back)
      .orderBy("doc_id").collect().toSeq
    assert(c == a)
  }

  test("KN trigram: served scores row-locally, equals knCrossEntropy; oversized throws") {
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents").limit(60)
    val lm = LangModel.trainKnTrigramLm(docs, "text")
    val served = LangModel.serveKn(lm)
    val viaJoin = LangModel.knCrossEntropy(docs, "text", "doc_id", lm)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(2)) null else r.getDouble(2)))
    val viaLocal = docs.select(col("doc_id"),
        LangModel.scoreKnColumn(spark, served, col("text")).as("ce"))
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) null else r.getDouble(1)))
    assert(viaJoin.toSeq == viaLocal.toSeq)
    intercept[IllegalArgumentException](LangModel.serveKn(lm, maxEntries = 3))
  }

  test("KN trigram: a trigram-free reference corpus fails loudly at train time") {
    import spark.implicits._
    // no document reaches 3 tokens → zero trigrams → every ladder level
    // would be 0/0 (NaN) — the guard must fire at train/serve, never as a
    // NumberFormatException inside a gated scoring job
    val degenerate = Seq((1L, "one two"), (2L, "x"), (3L, "")).toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException](
      LangModel.trainKnTrigramLm(degenerate, "text"))
    assert(e.getMessage.contains("degenerate"), e.getMessage)
  }

  test("curate() KN gate composes with the bigram gate and drops OOV soup") {
    import graft.pipeline.CorpusPipeline
    val english =
      "the quick brown fox jumps over the lazy dog and it was happy for the day " * 3
    val ref = (1L to 20L).map(i => (i, english + s"variant $i")).toDF("doc_id", "text")
    val kn = LangModel.serveKn(LangModel.trainKnTrigramLm(ref, "text"))
    val gibberish = ("the zqx the jkw the vbn the wpf the qrt " * 6) + "end"
    val docs = Seq(
      (1L, english + "one"), (2L, english + "two"),
      (3L, gibberish)) // passes lang gate (the-votes), fails KN gate
      .toDF("doc_id", "text")
    val scores = docs.select(col("doc_id"),
        LangModel.scoreKnColumn(spark, kn, col("text")).as("ce"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(scores(3L) > math.max(scores(1L), scores(2L)),
      "OOV doc must score above every clean doc under KN")
    val out = CorpusPipeline.curate(docs, "text", "doc_id",
      CorpusPipeline.Config(nearDupThreshold = 2.0, minQuality = 0.0,
        knModel = Some(kn),
        maxKnCrossEntropy = (math.max(scores(1L), scores(2L)) + scores(3L)) / 2))
    assert(out.select("doc_id").as[Long].collect().sorted.toSeq == Seq(1L, 2L))
  }

  test("streaming curateDocs applies the KN gate like batch curate()") {
    val english =
      "the quick brown fox jumps over the lazy dog and it was happy for the day " * 3
    val ref = (1L to 20L).map(i => (i, english + s"variant $i")).toDF("doc_id", "text")
    val kn = LangModel.serveKn(LangModel.trainKnTrigramLm(ref, "text"))
    val gibberish = ("the zqx the jkw the vbn the wpf the qrt " * 6) + "end"
    val ceiling = {
      val s = Seq((1L, english + "one"), (2L, gibberish)).toDF("doc_id", "text")
        .select(col("doc_id"), LangModel.scoreKnColumn(spark, kn, col("text")).as("ce"))
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
      (s(1L) + s(2L)) / 2
    }
    implicit val sqlCtx = spark.sqlContext
    val in = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, java.sql.Timestamp, String)]
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val q = graft.streaming.EventStreams.curateDocs(
        in.toDF().toDF("doc_id", "ts", "text"), "text", "ts",
        langs = Set("en"), minQuality = 0.0,
        knModel = Some(kn), maxKnCrossEntropy = ceiling)
      .writeStream.format("memory").queryName("kn_curate_sink")
      .outputMode("append").start()
    try {
      in.addData((1L, t0, english + "one"), (2L, t0, gibberish))
      q.processAllAvailable()
      val ids = spark.table("kn_curate_sink").select("doc_id")
        .as[Long].collect().sorted.toSeq
      assert(ids == Seq(1L), s"survivors: $ids")
    } finally q.stop()
  }

  test("bigram LM: unseen grams smooth instead of dropping; OOV docs score worst") {
    val ref = Seq(
      (1L, "the cat sat on the mat and the dog sat on the rug"),
      (2L, "the dog ran to the cat and the cat ran to the mat")).toDF("doc_id", "text")
    val lm = LangModel.trainBigramLm(ref, "text")
    val probe = Seq(
      (10L, "the cat sat on the mat"),       // in-distribution
      (11L, "the cat zzz qqq vvv mat"),      // unseen tokens mid-sentence
      (12L, "zzz"),                          // 1 token → no grams
      (13L, "")).toDF("doc_id", "text")      // empty
    val out = LangModel.crossEntropy(probe, "text", "doc_id", lm)
      .collect().map(r => (r.getLong(0), (r.getInt(1), Option(r.get(2)).map(_.asInstanceOf[Double])))).toMap
    assert(out(10L)._2.get < out(11L)._2.get, "OOV doc must score higher cross-entropy")
    assert(out(12L) == ((0, None)) && out(13L) == ((0, None)), "gram-free docs: 0 grams, null score")
    // every probe row survives the left join
    assert(out.size == 4)
  }

  test("bigram LM: score is invariant to corpus partitioning") {
    val docs = (1L to 40L).map(i => (i, s"tok${i % 7} tok${(i + 1) % 7} tok${(i + 2) % 7} tok${i % 5}"))
      .toDF("doc_id", "text")
    val lm1 = LangModel.trainBigramLm(docs.repartition(1), "text")
    val lm8 = LangModel.trainBigramLm(docs.repartition(8), "text")
    val a = LangModel.crossEntropy(docs, "text", "doc_id", lm1)
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toMap
    val b = LangModel.crossEntropy(docs.repartition(8), "text", "doc_id", lm8)
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toMap
    assert(a == b)
  }

  test("served LM scores row-locally, equals crossEntropy; pruning = unseen") {
    val docs = (1L to 30L).map(i =>
      (i, s"tok${i % 5} tok${(i + 1) % 5} tok${(i + 2) % 5} tok${i % 3} tok${i % 7}"))
      .toDF("doc_id", "text")
    val lm = LangModel.trainBigramLm(docs, "text")
    val served = LangModel.serve(lm)
    val viaJoin = LangModel.crossEntropy(docs, "text", "doc_id", lm)
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toMap
    val viaServed = docs.select(col("doc_id"),
        LangModel.scoreColumn(spark, served, col("text")).as("ce"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(viaJoin == viaServed, "served scoring must equal the join path")
    // pruning: minCount high enough to drop rare grams → those grams score
    // as unseen, so cross-entropy can only rise (denominators stay exact)
    val pruned = LangModel.serve(lm, minCount = 8)
    assert(pruned.bigrams.size() < served.bigrams.size(), "pruning must bite")
    val viaPruned = docs.select(col("doc_id"),
        LangModel.scoreColumn(spark, pruned, col("text")).as("ce"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(viaJoin.forall { case (id, ce) => viaPruned(id) >= ce - 1e-9 })
    assert(viaJoin.exists { case (id, ce) => viaPruned(id) > ce })
    // the loud-failure contract: a cap below the model size throws
    intercept[IllegalArgumentException](LangModel.serve(lm, maxEntries = 3))
  }

  test("curate() model gates: LM drops OOV soup, classifier drops junk, quota caps") {
    import graft.pipeline.CorpusPipeline
    val english =
      "the quick brown fox jumps over the lazy dog and it was happy for the day " * 3
    val ref = (1L to 20L).map(i => (i, english + s"variant $i")).toDF("doc_id", "text")
    val served = LangModel.serve(LangModel.trainBigramLm(ref, "text"))
    // junk classifier: label 1 = good prose, 0 = planted junk vocabulary
    val trainDf = spamHam(400, seed = 11).toDF("doc_id", "text", "spam")
      .withColumn("label", lit(1.0) - col("spam"))
    val model = Classifier.train(trainDf, "text", "label", bits = 14, iters = 25)
    val gibberish = ("the zqx the jkw the vbn the wpf the qrt " * 6) + "end"
    val junky = english + " " + Seq.fill(6)("winner free prize claim click offer").mkString(" ")
    val docs = Seq(
      (1L, "srcA", english + "one"),
      (2L, "srcA", english + "two"),
      (3L, "srcA", english + "three"),
      (4L, "srcB", english + "four"),
      (5L, "srcB", gibberish),   // passes lang gate (the-votes), fails LM gate
      (6L, "srcB", junky)        // junk vocabulary → classifier gate
    ).toDF("doc_id", "source", "text")
    // pick the LM ceiling from the data: between the clean max and the
    // OOV doc's score, so the assertion tests the gate, not a constant
    val scores = docs.select(col("doc_id"),
        LangModel.scoreColumn(spark, served, col("text")).as("ce"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    val cleanMax = (Seq(1L, 2L, 3L, 4L) ++ Seq(6L)).map(scores).max
    assert(scores(5L) > cleanMax, "OOV doc must score above every clean doc")
    val out = CorpusPipeline.curate(docs, "text", "doc_id",
      CorpusPipeline.Config(nearDupThreshold = 2.0, minQuality = 0.0,
        lmModel = Some(served), maxCrossEntropy = (cleanMax + scores(5L)) / 2,
        qualityModel = Some(model), minModelScore = 0.35,
        maxPerSource = Some(2)))
    val ids = out.select("doc_id").as[Long].collect().sorted.toSeq
    // 5 fails LM, 6 fails classifier; srcA capped 3→2 (smallest ids win)
    assert(ids == Seq(1L, 2L, 4L), s"survivors: $ids")
    assert(out.columns.contains("split"))
  }

  test("curate() importance stage selects the target-like topN after dedup, with evidence") {
    import graft.pipeline.CorpusPipeline
    val english =
      "the quick brown fox jumps over the lazy dog and it was happy for the day " * 3
    val target = Seq(
      (100L, english + "distributed query optimization and join planning for engines"),
      (101L, english + "query planners choose join orders for distributed engines"))
      .toDF("doc_id", "text")
    val sports = english + "football scores and celebrity gossip with lottery numbers"
    val docs = Seq(
      (1L, english + "distributed query optimization with join planning for engines"),
      (2L, sports),
      (3L, english + "join planning for distributed query engines and optimization"),
      (4L, english + "more football gossip lottery celebrity scores and horoscopes"),
      (5L, sports) // exact replica of 2 — must be deduped BEFORE selection
    ).toDF("doc_id", "text")
    val out = CorpusPipeline.curate(docs, "text", "doc_id",
      CorpusPipeline.Config(nearDupThreshold = 2.0, minQuality = 0.0,
        importanceTarget = Some(target), importanceTopN = Some(2)))
    val ids = out.select("doc_id").as[Long].collect().sorted.toSeq
    assert(ids == Seq(1L, 3L), s"selected: $ids")
    // survivors carry the selector's evidence and the pipeline's split
    assert(out.columns.contains("log_weight") && out.columns.contains("split"))
    val e = intercept[IllegalArgumentException] {
      CorpusPipeline.curate(docs, "text", "doc_id",
        CorpusPipeline.Config(importanceTarget = Some(target)))
    }
    assert(e.getMessage.contains("importanceTopN"))
  }

  test("streaming curateDocs applies the served-LM and classifier gates") {
    implicit val sqlCtx = spark.sqlContext
    val english =
      "the quick brown fox jumps over the lazy dog and it was happy for the day " * 3
    val ref = (1L to 20L).map(i => (i, english + s"variant $i")).toDF("doc_id", "text")
    val served = LangModel.serve(LangModel.trainBigramLm(ref, "text"))
    val trainDf = spamHam(400, seed = 12).toDF("doc_id", "text", "spam")
      .withColumn("label", lit(1.0) - col("spam"))
    val model = Classifier.train(trainDf, "text", "label", bits = 14, iters = 25)
    val gibberish = ("the zqx the jkw the vbn the wpf the qrt " * 6) + "end"
    val junky = english + " " + Seq.fill(6)("winner free prize claim click offer").mkString(" ")
    // LM ceiling picked between the junky doc's score (junk tokens are
    // unseen too, but diluted by the seen prose) and the all-OOV soup —
    // so the LM gate is what drops 2 and the classifier is what drops 3
    val ces = Seq((1L, english + "one"), (2L, gibberish), (3L, junky))
      .toDF("doc_id", "text")
      .select(col("doc_id"), LangModel.scoreColumn(spark, served, col("text")).as("ce"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(ces(2L) > ces(3L) && ces(3L) > ces(1L))
    val ceiling = (ces(2L) + ces(3L)) / 2
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, java.sql.Timestamp, String)]
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val query = graft.streaming.EventStreams.curateDocs(
        input.toDF().toDF("doc_id", "ts", "text"), "text", "ts",
        langs = Set("en"), minQuality = 0.0,
        qualityModel = Some(model), minModelScore = 0.35,
        lmModel = Some(served), maxCrossEntropy = ceiling)
      .writeStream.format("memory").queryName("model_gate_stream")
      .outputMode("append").start()
    try {
      input.addData((1L, t0, english + "one"), (2L, t0, gibberish), (3L, t0, junky))
      query.processAllAvailable()
      val ids = spark.table("model_gate_stream")
        .select("doc_id").as[Long].collect().sorted.toSeq
      assert(ids == Seq(1L), s"survivors: $ids")
    } finally query.stop()
  }

  // --- hashed linear classifier -------------------------------------

  private def spamHam(n: Int, seed: Int) = {
    val spamWords = Array("winner", "free", "claim", "prize", "click", "offer", "cash", "urgent")
    val hamWords = Array("meeting", "report", "quarter", "review", "draft", "agenda", "notes", "team")
    val r = new scala.util.Random(seed)
    (1 to n).map { i =>
      val spam = i % 2 == 0
      val pool = if (spam) spamWords else hamWords
      val text = Seq.fill(12)(pool(r.nextInt(pool.length))).mkString(" ")
      (i.toLong, text, if (spam) 1.0 else 0.0)
    }
  }

  test("classifier separates planted spam from ham and generalizes") {
    val train = spamHam(400, seed = 1).toDF("doc_id", "text", "label")
    val model = Classifier.train(train, "text", "label", bits = 14, iters = 25)
    val held = spamHam(200, seed = 99).toDF("doc_id", "text", "label")
    val preds = held.select(col("label"),
        (Classifier.score(spark, model, col("text")) > 0.5).cast("double").as("p"))
      .collect()
    val acc = preds.count(r => r.getDouble(0) == r.getDouble(1)).toDouble / preds.length
    assert(acc >= 0.98, s"held-out accuracy $acc")
  }

  test("classifier training is reproducible and null-safe") {
    val train = spamHam(200, seed = 2).toDF("doc_id", "text", "label")
    val m1 = Classifier.train(train, "text", "label", bits = 12, iters = 10)
    val m2 = Classifier.train(train.repartition(7), "text", "label", bits = 12, iters = 10)
    // full-batch gradients: only float-sum association order can differ
    assert(math.abs(m1.bias - m2.bias) < 1e-9)
    assert(m1.weights.zip(m2.weights).forall { case (a, b) => math.abs(a - b) < 1e-9 })
    // null text scores at the bias point instead of throwing
    val nullScore = Seq((1L, null: String)).toDF("doc_id", "text")
      .select(Classifier.score(spark, m1, col("text")).as("s"))
      .head().getDouble(0)
    assert(nullScore > 0.0 && nullScore < 1.0)
  }

  test("classifier persists as a warehouse artifact and scores identically") {
    val train = spamHam(200, seed = 3).toDF("doc_id", "text", "label")
    val model = Classifier.train(train, "text", "label", bits = 12, iters = 10)
    graft.sources.Warehouse.dropTableAndLocation(spark, "clf_model")
    Classifier.saveModel(spark, model, "clf_model")
    val back = Classifier.loadModel(spark, "clf_model")
    assert(back.bits == model.bits && back.bias == model.bias)
    assert(back.weights.toSeq == model.weights.toSeq)
    val docs = spamHam(40, seed = 4).toDF("doc_id", "text", "label")
    val a = docs.select(col("doc_id"),
        Classifier.score(spark, model, col("text")).as("s"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    val b = docs.select(col("doc_id"),
        Classifier.score(spark, back, col("text")).as("s"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(a == b)
  }

  test("bigram LM persists as warehouse tables and scores identically") {
    val docs = (1L to 40L).map(i =>
      (i, s"tok${i % 7} tok${(i + 1) % 7} tok${(i + 2) % 7}"))
      .toDF("doc_id", "text")
    val lm = LangModel.trainBigramLm(docs, "text")
    for (t <- Seq("lm_model", "lm_model_meta"))
      graft.sources.Warehouse.dropTableAndLocation(spark, t)
    LangModel.saveModel(spark, lm, "lm_model")
    val back = LangModel.loadModel(spark, "lm_model")
    assert(back.vocab == lm.vocab)
    val a = LangModel.crossEntropy(docs, "text", "doc_id", lm)
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toMap
    val b = LangModel.crossEntropy(docs, "text", "doc_id", back)
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toMap
    assert(a == b)
    // the loaded model serves too (the deployment shape)
    val s = LangModel.serve(back)
    assert(s.vocab == lm.vocab)
  }

  // --- per-source profile -------------------------------------------

  test("sourceProfile aggregates per-source volume and quality report") {
    val docs = Seq(
      (1L, "a", "alpha beta gamma delta"),          // 4 toks
      (2L, "a", "epsilon zeta"),                    // 2 toks
      (3L, "b", "!!! ??? ###")                      // symbols
    ).toDF("doc_id", "source", "text")
    val out = TextOps.sourceProfile(docs, "source", "text")
      .orderBy("source").collect()
    val a = out(0)
    assert(a.getString(0) == "a" && a.getLong(1) == 2 && a.getLong(2) == 6)
    assert(a.getDouble(3) == 3.0) // median of 4,2
    val b = out(1)
    assert(b.getString(0) == "b" && b.getLong(1) == 1)
    assert(b.getDouble(5) > 0.8, "symbol-only doc must report high symbol density")
  }

  // --- streaming per-source quota -----------------------------------

  test("quotaPerSource admits at most N per source across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String, String)]
    val query = graft.streaming.EventStreams.quotaPerSource(
        input.toDF().toDF("doc_id", "source", "text"), "source", "doc_id", 3)
      .writeStream.format("memory").queryName("quota_out")
      .outputMode("append").start()
    try {
      // batch 1: A has room for both; B admits its first
      input.addData((5L, "A", "x"), (2L, "A", "x"), (1L, "B", "x"))
      query.processAllAvailable()
      // batch 2: A has 1 slot left — the smallest id in the batch wins;
      // B admits two more and is now full
      input.addData((9L, "A", "x"), (1L, "A", "x"), (4L, "A", "x"),
        (7L, "B", "x"), (8L, "B", "x"))
      query.processAllAvailable()
      // batch 3: both sources exhausted — everything drops
      input.addData((100L, "A", "x"), (100L, "B", "x"))
      query.processAllAvailable()
      val admitted = spark.table("quota_out")
        .as[(Long, String, String)].collect().map(t => (t._2, t._1)).toSet
      assert(admitted == Set(("A", 5L), ("A", 2L), ("A", 1L),
        ("B", 1L), ("B", 7L), ("B", 8L)))
    } finally query.stop()
  }

  // --- per-source quota ---------------------------------------------

  test("sourceQuota keeps the N smallest ids per source, salted ≡ naive window") {
    val r = new scala.util.Random(5)
    // skewed: src_hot has 5000 docs, others 20
    val rows = (1L to 5000L).map(i => (i, "src_hot")) ++
      (5001L to 5100L).map(i => (i, s"src${i % 5}"))
    val df = r.shuffle(rows).toDF("doc_id", "source")
    val out = TextOps.sourceQuota(df, "source", "doc_id", 7)
      .collect().map(r2 => (r2.getString(1), r2.getLong(0)))
    val bySrc = out.groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
    assert(bySrc("src_hot") == (1L to 7L))
    for (s <- 0 until 5)
      assert(bySrc(s"src$s") == (5001L to 5100L).filter(_ % 5 == s).sorted.take(7))
    // parity with the naive single window at several salt widths
    val naive = {
      val w = org.apache.spark.sql.expressions.Window.partitionBy("source").orderBy("doc_id")
      df.withColumn("__r", row_number().over(w)).filter(col("__r") <= 7).drop("__r")
        .collect().map(r2 => (r2.getLong(0), r2.getString(1))).toSet
    }
    for (parts <- Seq(1, 3, 64)) {
      val salted = TextOps.sourceQuota(df, "source", "doc_id", 7, saltParts = parts)
        .collect().map(r2 => (r2.getLong(0), r2.getString(1))).toSet
      assert(salted == naive, s"saltParts=$parts diverged")
    }
  }

  // --- BPE tokenizer -------------------------------------------------

  test("BPE train learns the classic merges in count-then-lex order") {
    import graft.text.Bpe
    // the Sennrich corpus: low×5 lower×2 newest×6 widest×3
    val text = (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")).mkString(" ")
    val docs = Seq((1L, text)).toDF("doc_id", "text")
    val model = Bpe.train(docs, "text", numMerges = 4)
    // pair counts: (e,s)=(s,t)=(t,</w>)=9 → lex picks (e,s); then (es,t)=9
    // vs (t,</w>)=9 → (es,t); then (est,</w>)=9; then (l,o)=(o,w)=7 → (l,o)
    assert(model.merges == Seq(("e", "s"), ("es", "t"), ("est", "</w>"),
      ("l", "o")), s"merges: ${model.merges}")
  }

  test("BPE encode applies merges greedily by rank; unseen words fall back to chars") {
    import graft.text.Bpe
    val text = (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")).mkString(" ")
    val docs = Seq((1L, text)).toDF("doc_id", "text")
    val model = Bpe.train(docs, "text", numMerges = 4)
    val enc = Seq((1L, "newest low zap"), (2L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
      .select(col("doc_id"), Bpe.encode(spark, model, col("text")).as("t"))
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) null else r.getSeq[String](1).toList)).toMap
    assert(enc(1L) == List("n", "e", "w", "est</w>", "lo", "w", "</w>",
      "z", "a", "p", "</w>"), s"encoded: ${enc(1L)}")
    assert(enc(2L) == null)
    // token counts shrink as merges apply: 4-merge model beats chars
    val n = Seq((1L, "newest newest lowest"))
      .toDF("doc_id", "text")
      .select(Bpe.tokenCount(spark, model, col("text")).as("n"))
      .head().getInt(0)
    val chars = Seq((1L, "newest newest lowest"))
      .toDF("doc_id", "text")
      .select(Bpe.tokenCount(spark, Bpe.BpeModel(Nil), col("text")).as("n"))
      .head().getInt(0)
    assert(n < chars, s"trained $n !< untrained $chars")
  }

  test("BPE model persists as a warehouse artifact and round-trips exactly") {
    import graft.text.Bpe
    val docs = Seq((1L, "low lower lowest newest new")).toDF("doc_id", "text")
    val model = Bpe.train(docs, "text", numMerges = 8)
    graft.sources.Warehouse.dropTableAndLocation(spark, "bpe_model_rt")
    Bpe.saveModel(spark, model, "bpe_model_rt")
    val back = Bpe.loadModel(spark, "bpe_model_rt")
    assert(back.merges == model.merges)
    // encoding under the reloaded model is byte-identical
    val probe = Seq((1L, "lowest new zap")).toDF("doc_id", "text")
    val a = probe.select(Bpe.encode(spark, model, col("text"))).head().getSeq[String](0)
    val b = probe.select(Bpe.encode(spark, back, col("text"))).head().getSeq[String](0)
    assert(a == b)
  }

  test("BPE training is partition-invariant and maxWords-guarded") {
    import graft.text.Bpe
    val docs = (1L to 60L).map(i =>
      (i, s"alpha beta gamma token${i % 9} alpha beta")).toDF("doc_id", "text")
    val m1 = Bpe.train(docs, "text", numMerges = 12)
    val m2 = Bpe.train(docs.repartition(7), "text", numMerges = 12)
    assert(m1.merges == m2.merges)
    val e = intercept[IllegalArgumentException] {
      Bpe.train(docs, "text", numMerges = 2, maxWords = 3)
    }
    assert(e.getMessage.contains("maxWords"))
  }

  // --- mixed-language segmentation -------------------------------------

  test("langSegments: per-line votes merge into contiguous segments") {
    val docs = Seq(
      (1L, "the of and to\nel los de la\nel es la y\nder und die das"),
      (2L, "the of and to"),
      (3L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val got = TextOps.langSegments(docs, "text", "doc_id")
      .orderBy("doc_id", "seg_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getInt(3),
        r.getLong(4)))
    // doc 1: en / es+es (merged) / de; doc 2 single segment; doc 3 no rows
    assert(got.toList == List(
      (1L, 0, "en", 0, 1L), (1L, 1, "es", 1, 2L), (1L, 2, "de", 3, 1L),
      (2L, 0, "en", 0, 1L)), s"${got.toList}")
  }

  test("corpusHealth: hand-computed counters and language entropy") {
    val docs = Seq(
      (1L, "a b c", "en", "s0"), (2L, "d e", "en", "s0"),
      (3L, null.asInstanceOf[String], "fr", "s1"),
      (4L, "f", null.asInstanceOf[String], "s1"))
      .toDF("doc_id", "text", "lang", "source")
    val r = TextOps.corpusHealth(docs, "text", "lang", "source").head()
    assert(r.getLong(0) == 4 && r.getLong(1) == 1 && r.getLong(2) == 6)
    assert(r.getLong(3) == 2 && r.getLong(4) == 2)
    assert(r.getDouble(5) == 1.5) // 6 tokens / 4 docs
    // langs over non-null: en 2/3, fr 1/3 → H = −Σ p ln p ≈ 0.6365
    assert(r.getDouble(6) == 0.6365, s"entropy ${r.getDouble(6)}")
  }

  test("langPurity: dominant-language share with deterministic tie-break") {
    val docs = Seq(
      (1L, "the of and to\nel los de la\nel es la y\nder und die das"),
      (2L, "the of and to\nel los de la"), // 1-1 tie → lang ASC → en
      (3L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val got = TextOps.langPurity(docs, "text", "doc_id")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(got.toList == List(
      (1L, "es", 4L, 2L, 500000L),
      (2L, "en", 2L, 1L, 500000L)), s"${got.toList}")
  }

  // --- deterministic stratified sampling ------------------------------

  test("stratifiedSample: n per group, invariant to layout, insertion-stable") {
    val docs = (1L to 200L).map(i => (i, s"s${i % 4}")).toDF("doc_id", "src")
    val a = TextOps.stratifiedSample(docs, "src", "doc_id", 5).collect()
    assert(a.length == 20)
    val byG = a.groupBy(_.getString(1))
    assert(byG.size == 4 &&
      byG.values.forall(_.map(_.getInt(2)).sorted.toSeq == (1 to 5)),
      s"ranks not contiguous 1..5: ${a.toList}")
    // the sample is a pure function of the ids: any partitioning, any
    // input order, same rows and ranks
    val b = TextOps.stratifiedSample(
      docs.repartition(7).orderBy(col("doc_id").desc), "src", "doc_id", 5)
      .collect()
    assert(a.map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSet ==
      b.map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSet)
    // insertion-stable: a row sampled from the grown corpus that already
    // existed in the smaller one was sampled there too (hash order is
    // stable under appends — ranks only shrink as rows are removed)
    val small = TextOps.stratifiedSample(
      docs.filter(col("doc_id") <= 100), "src", "doc_id", 5)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val fromBig = a.filter(_.getLong(0) <= 100)
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(fromBig.subsetOf(small), s"$fromBig not within $small")
    // a group smaller than n returns whole; n=0 throws
    val tiny = Seq((1L, "g"), (2L, "g")).toDF("doc_id", "src")
    assert(TextOps.stratifiedSample(tiny, "src", "doc_id", 5).count() == 2)
    intercept[IllegalArgumentException] {
      TextOps.stratifiedSample(tiny, "src", "doc_id", 0)
    }
  }

  // --- global token-budget sharding ----------------------------------

  test("shardByTokenBudget: hand-computed shard cuts, null text counts 0") {
    val docs = Seq((1L, "a b c"), (2L, "d e f g"), (3L, "h"), (4L, "i j"),
      (5L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val out = TextOps.shardByTokenBudget(docs, "text", "doc_id", 5)
      .select("doc_id", "n_tokens", "shard")
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    // tokens-before: 0, 3, 7, 8, 10 → div 5 → shards 0, 0, 1, 1, 2
    assert(out == Map(1L -> ((3L, 0L)), 2L -> ((4L, 0L)), 3L -> ((1L, 1L)),
      4L -> ((2L, 1L)), 5L -> ((0L, 2L))))
  }

  test("shardByTokenBudget rejects a non-numeric ordering column loudly") {
    // approxQuantile needs numerics: a string id must fail with the
    // documented message, not a deep runtime analysis error
    val docs = Seq(("a", "x y"), ("b", "z")).toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      TextOps.shardByTokenBudget(docs, "text", "doc_id", 5)
    }
    assert(e.getMessage.contains("NUMERIC ordering"), e.getMessage)
    // a numeric surrogate order key over the same string ids works
    val out = TextOps.shardByTokenBudget(
      docs.withColumn("__ord", xxhash64(col("doc_id"))),
      "text", "doc_id", 5, orderCol = "__ord")
    assert(out.count() == 2)
  }

  test("shardByTokenBudget equals the naive global window at any parts") {
    val r = new scala.util.Random(11)
    // clustered ids (quantile boundaries land unevenly) + shuffled input
    val rows = r.shuffle((1L to 200L).map(i => i * i) ++ (90000L to 90300L))
      .map(i => (i, Seq.fill(1 + (i % 37).toInt)("w").mkString(" ")))
    val df = rows.toDF("doc_id", "text").repartition(13)
    val naive = {
      df.withColumn("n_tokens", TextOps.tokenCount(col("text")).cast("long"))
        .withColumn("shard",
          expr("coalesce(sum(n_tokens) over (order by doc_id rows between " +
            "unbounded preceding and 1 preceding), 0L) div 256"))
        .select("doc_id", "n_tokens", "shard")
        .collect().map(r2 => (r2.getLong(0), (r2.getLong(1), r2.getLong(2)))).toMap
    }
    for (parts <- Seq(1, 3, 64)) {
      val got = TextOps.shardByTokenBudget(df, "text", "doc_id", 256, parts = parts)
        .select("doc_id", "n_tokens", "shard")
        .collect().map(r2 => (r2.getLong(0), (r2.getLong(1), r2.getLong(2)))).toMap
      assert(got == naive, s"parts=$parts diverged from the global window")
    }
  }

  test("shuffledShards equals the naive window over the md5 order at any parts") {
    val r = new scala.util.Random(12)
    val rows = r.shuffle((1L to 300L).toVector)
      .map(i => (i, Seq.fill(1 + (i % 23).toInt)("w").mkString(" ")))
    val df = rows.toDF("doc_id", "text").repartition(7)
    val naive = df
      .withColumn("shuffle_key",
        conv(substring(md5(concat(lit("ep1:"), col("doc_id").cast("string"))),
          1, 15), 16, 10).cast("long"))
      .withColumn("n_tokens", TextOps.tokenCount(col("text")).cast("long"))
      .withColumn("shard",
        expr("coalesce(sum(n_tokens) over (order by shuffle_key, doc_id rows " +
          "between unbounded preceding and 1 preceding), 0L) div 128"))
      .select("doc_id", "shuffle_key", "shard")
      .collect().map(r2 => (r2.getLong(0), (r2.getLong(1), r2.getLong(2)))).toMap
    for (parts <- Seq(1, 3, 64)) {
      val got = TextOps.shuffledShards(df, "text", "doc_id", 128,
          seed = "ep1", parts = parts)
        .select("doc_id", "shuffle_key", "shard")
        .collect().map(r2 => (r2.getLong(0), (r2.getLong(1), r2.getLong(2)))).toMap
      assert(got == naive, s"parts=$parts diverged from the global window")
    }
  }

  test("shuffledShards decorrelates id order; a new seed is a new epoch") {
    val docs = (1L to 400L).map(i => (i, "w w w w")).toDF("doc_id", "text")
    val s1 = TextOps.shuffledShards(docs, "text", "doc_id", 40, seed = "a")
      .select("doc_id", "shard")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // consecutive ids mostly land in different shards (id order would put
    // runs of 10 together; the permutation scatters them)
    val together = (1L until 400L).count(i => s1(i) == s1(i + 1))
    assert(together < 120, s"$together consecutive pairs share a shard")
    // every shard is full: 400 docs × 4 tokens / 40 = 40 shards
    assert(s1.values.toSet.size == 40)
    val s2 = TextOps.shuffledShards(docs, "text", "doc_id", 40, seed = "b")
      .select("doc_id", "shard")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(s1 != s2, "seed change must produce a different permutation")
    // determinism: the same seed reproduces exactly
    val s1b = TextOps.shuffledShards(docs.repartition(17), "text", "doc_id",
        40, seed = "a")
      .select("doc_id", "shard")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(s1 == s1b)
  }

  // --- DSIR importance resampling ------------------------------------

  test("importance weights: hand-computed likelihood ratios") {
    // target grams: {(a b): 1}; raw grams: {(a b): 2, (b a): 1, (x y): 1}
    // → rt = 4, tt = 1, V = |{a b, b a, x y}| = 3
    val target = Seq((100L, "a b")).toDF("doc_id", "text")
    val raw = Seq((1L, "a b a b"), (2L, "x y"), (3L, "z")).toDF("doc_id", "text")
    val m = Importance.trainImportanceModel(raw, target, "text")
    assert((m.rawTotal, m.targetTotal, m.features) == ((4L, 1L, 3L)))
    val w = Importance.importanceWeights(raw, "text", "doc_id", m)
      .collect().map(r => (r.getLong(0), (r.getInt(1),
        if (r.isNullAt(2)) null else r.getDouble(2)))).toMap
    val lwAb = math.log(2.0 / 4) - math.log(3.0 / 7)
    val lwBa = math.log(1.0 / 4) - math.log(2.0 / 7)
    val lwXy = lwBa // same counts (rcnt 1, tcnt 0)
    def r4(d: Double) = new java.math.BigDecimal(d)
      .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()
    assert(w(1L) == ((3, r4(2 * lwAb + lwBa))))
    assert(w(2L) == ((1, r4(lwXy))))
    // the target-only doc "a b a b" must out-rank the OOV doc "x y"
    assert(w(1L)._2.asInstanceOf[Double] > w(2L)._2.asInstanceOf[Double])
    // a gram-free doc carries no evidence: n_grams 0, null weight
    assert(w(3L) == ((0, null)))
  }

  test("resampleTop selects target-like docs deterministically; nulls rank last") {
    val target = Seq(
      (100L, "the theory of distributed query optimization and join planning"),
      (101L, "query planners choose join orders for distributed execution")).toDF("doc_id", "text")
    val raw = Seq(
      (1L, "celebrity gossip and football scores with lottery numbers today"),
      (2L, "distributed query optimization chooses join orders via planning"),
      (3L, "more celebrity football lottery gossip scores and daily horoscopes"),
      (4L, "join planning in distributed query execution and optimization"),
      (5L, "x")).toDF("doc_id", "text")
    val top = Importance.resampleTop(raw, target, "text", "doc_id", 2)
      .select("doc_id").as[Long].collect().toSet
    assert(top == Set(2L, 4L), s"selected $top")
    // the gram-free doc can never be selected even when n exceeds the pool
    val all = Importance.resampleTop(raw, target, "text", "doc_id", 5).collect()
    assert(all.length == 5 && all.last.getLong(0) == 5L && all.last.isNullAt(2))
  }

  test("importance weights are invariant to corpus partitioning") {
    val target = Seq((100L, "alpha beta gamma delta alpha beta")).toDF("doc_id", "text")
    val raw = (1L to 40L).map(i =>
      (i, s"alpha beta token$i gamma delta token${i % 7} alpha")).toDF("doc_id", "text")
    val m1 = Importance.trainImportanceModel(raw, target, "text")
    val w1 = Importance.importanceWeights(raw, "text", "doc_id", m1)
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toMap
    val m2 = Importance.trainImportanceModel(raw.repartition(7), target.repartition(3), "text")
    val w2 = Importance.importanceWeights(raw.repartition(11), "text", "doc_id", m2)
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toMap
    assert(w1 == w2)
  }

  test("hashed feature mode bounds the model and preserves the ranking signal") {
    val target = Seq(
      (100L, "the theory of distributed query optimization and join planning"),
      (101L, "query planners choose join orders for distributed execution")).toDF("doc_id", "text")
    val raw = Seq(
      (1L, "celebrity gossip and football scores with lottery numbers today"),
      (2L, "distributed query optimization chooses join orders via planning"),
      (3L, "more celebrity football lottery gossip scores and daily horoscopes")).toDF("doc_id", "text")
    val m = Importance.trainImportanceModel(raw, target, "text", hashBuckets = Some(1 << 10))
    // the model is bounded by the OBSERVED bucket count, never above 2^10,
    // and smoothing divides by the full fixed dimension
    assert(m.grams.count() <= (1 << 10) && m.features == (1 << 10))
    val w = Importance.importanceWeights(raw, "text", "doc_id", m)
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toMap
    assert(w(2L) > w(1L) && w(2L) > w(3L), s"hashed ranking: $w")
  }
}
