package graft

import org.apache.spark.sql.functions._
import graft.pipeline.CorpusPipeline

/** End-to-end curation: every planted defect class is removed by exactly
  * the stage that owns it, and survivors come out split-assigned.
  */
class CorpusPipelineSpec extends SparkSpec {
  import spark.implicits._

  private val english =
    "the quick brown fox jumps over the lazy dog and it was happy for the day " * 3

  private val english2 =
    "meanwhile the river ran slow past the old stone mill and the miller kept his ledger dry " * 2

  test("curate removes junk, dups, and contamination; survivors get splits") {
    val benchmark = Seq((100L, "benchmark question text that is the held out eval set for this run"))
      .toDF("doc_id", "text")
    val docs = Seq(
      (1L, english + "one"),                              // keeper
      (2L, english + "one"),                              // exact dup of 1
      (3L, english + "two"),                              // near dup of 1
      (4L, "le chat est dans la maison et il est content et le jour est bon " * 3), // wrong lang
      (5L, "x"),                                          // low quality
      (6L, "the full benchmark question text that is the held out eval set for this run " +
        "was pasted into the web and then it was scraped back with more of the text around it " +
        "so the tokens keep the original run intact for the gate to catch with room to spare"), // contaminated
      (7L, "an entirely different english document about the history of the spark engine " +
        "that is long enough to pass the quality gate and it was written for this test " * 2)  // keeper
    ).toDF("doc_id", "text")

    val out = CorpusPipeline.curate(docs, "text", "doc_id",
      CorpusPipeline.Config(nearDupThreshold = 0.6, contaminationNgram = 8),
      benchmark = Some(benchmark))

    val ids = out.select("doc_id").as[Long].collect().sorted.toSeq
    assert(ids == Seq(1L, 7L), s"survivors: $ids")
    val splits = out.select("split").as[String].collect().toSet
    assert(splits.subsetOf(Set("train", "val", "test")))
    assert(out.columns.contains("lang") && out.columns.contains("quality"))
  }

  test("curateAudit labels every input with the first stage that " +
    "dropped it") {
    val benchmark = Seq((100L, "benchmark question text that is the held out eval set for this run"))
      .toDF("doc_id", "text")
    val docs = Seq(
      (1L, english + "one"),                              // kept
      (2L, english + "one"),                              // exact dup of 1
      (3L, english + "two"),                              // near dup of 1
      (4L, "le chat est dans la maison et il est content et le jour est bon " * 3),
      (5L, "x"),                                          // low quality
      (6L, "the full benchmark question text that is the held out eval set for this run " +
        "was pasted into the web and then it was scraped back with more of the text around it " +
        "so the tokens keep the original run intact for the gate to catch with room to spare"),
      (7L, "an entirely different english document about the history of the spark engine " +
        "that is long enough to pass the quality gate and it was written for this test " * 2)
    ).toDF("doc_id", "text")
    val audit = CorpusPipeline.curateAudit(docs, "text", "doc_id",
      CorpusPipeline.Config(nearDupThreshold = 0.6, contaminationNgram = 8),
      benchmark = Some(benchmark))
      .as[(Long, String)].collect().toMap
    assert(audit === Map(
      1L -> "kept", 2L -> "exact_dup", 3L -> "near_dup",
      4L -> "lang_quality", 5L -> "lang_quality",
      6L -> "contaminated", 7L -> "kept"))
    // audit agrees with the real output and explains every drop
    assert(!audit.values.exists(_ == "dropped_other"))
    val kept = CorpusPipeline.curate(docs, "text", "doc_id",
      CorpusPipeline.Config(nearDupThreshold = 0.6, contaminationNgram = 8),
      benchmark = Some(benchmark)).select("doc_id").as[Long].collect().toSet
    assert(audit.filter(_._2 == "kept").keySet === kept)
    // quota drops label as quota (a later stage than the dedups)
    val qa = CorpusPipeline.curateAudit(
      docs.withColumn("source", lit("s1")), "text", "doc_id",
      CorpusPipeline.Config(nearDupThreshold = 0.6, contaminationNgram = 8,
        maxPerSource = Some(1)),
      benchmark = Some(benchmark)).as[(Long, String)].collect().toMap
    assert(qa.values.count(_ == "kept") === 1)
    assert(qa.values.count(_ == "quota") === 1)
  }

  test("curate fixEncoding: a mojibake refetch dedups against the clean " +
    "original") {
    // doc 2 is doc 1 mis-decoded (the apostrophe U+2019 became the
    // cp1252 triple U+00E2 U+20AC U+2122) — without repair the bytes
    // differ and both survive exact dedup; with fixEncoding they
    // canonicalize to the same text and the lower id wins
    val clean = english + "and the engine’s log was dry"
    val docs = Seq(
      (1L, clean),
      (2L, clean.replace("’", "â€™"))
    ).toDF("doc_id", "text")
    val without = CorpusPipeline.curate(docs, "text", "doc_id",
      CorpusPipeline.Config(nearDupThreshold = 0.99))
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(without == Seq(1L, 2L), s"mojibake twin should survive: $without")
    val out = CorpusPipeline.curate(docs, "text", "doc_id",
      CorpusPipeline.Config(nearDupThreshold = 0.99, fixEncoding = true))
    val ids = out.select("doc_id").as[Long].collect().sorted.toSeq
    assert(ids == Seq(1L), s"repaired twin must collapse: $ids")
    // the survivor's text is the canonical form
    val t = out.select("text").as[String].collect().head
    assert(t.contains("’") && !t.contains("€"))
  }

  test("curate span-surgical decontamination keeps the clean remainder") {
    val benchmark = Seq(
      (100L, "benchmark question text that is the held out eval set for this run"))
      .toDF("doc_id", "text")
    val docs = Seq(
      (1L, english + "one"), // clean keeper
      (6L, "scraped page that quotes the benchmark question text that is the " +
        "held out eval set for this run and then continues with plenty of " +
        "ordinary english words about engines and data and pipelines written " +
        "at length so the document stays well past the quality gate")
    ).toDF("doc_id", "text")
    val out = CorpusPipeline.curate(docs, "text", "doc_id",
      CorpusPipeline.Config(nearDupThreshold = 0.6, contaminationNgram = 8,
        decontaminateSpanTokens = Some(3)),
      benchmark = Some(benchmark))
    val ids = out.select("doc_id").as[Long].collect().sorted.toSeq
    // the doc-level gate would drop 6 entirely; the surgical stage keeps it
    assert(ids == Seq(1L, 6L), s"survivors: $ids")
    val text6 = out.filter($"doc_id" === 6L).select("text").as[String].head()
    assert(!text6.contains("held out eval"),
      s"benchmark text survived the cut: $text6")
    assert(text6.contains("ordinary english words"),
      s"clean remainder was lost: $text6")
  }

  test("curate without a benchmark skips the contamination stage") {
    val docs = Seq(
      (1L, english + "one"),
      (2L, english + "completely different tail of words here")
    ).toDF("doc_id", "text")
    val out = CorpusPipeline.curate(docs, "text", "doc_id",
      CorpusPipeline.Config(nearDupThreshold = 0.9))
    assert(out.count() == 2)
  }

  test("registryTable makes curate incremental across runs; update=false is report-only") {
    import graft.dedup.Dedup
    val reg = "curate_reg_spec"
    graft.sources.Warehouse.dropTableAndLocation(spark, reg)
    Dedup.createRegistry(spark, reg, buckets = 4)
    val cfg = CorpusPipeline.Config(nearDupThreshold = 1.5,
      registryTable = Some(reg))
    val day1 = Seq(
      (1L, english + "one"),
      (2L, english + "one"),  // within-day exact dup — one hash registered
      (3L, english + "two")
    ).toDF("doc_id", "text")
    val out1 = CorpusPipeline.curate(day1, "text", "doc_id", cfg)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(out1 == Seq(1L, 3L), s"day 1 survivors: $out1")
    val day2 = Seq(
      (10L, english + "one"),   // replay of day 1 under a new id — dropped
      (11L, english + "three"), // genuinely new — kept and registered
      (12L, english + "three")  // within-day-2 dup of 11
    ).toDF("doc_id", "text")
    val out2 = CorpusPipeline.curate(day2, "text", "doc_id", cfg)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(out2 == Seq(11L), s"day 2 survivors: $out2")
    // report-only: the same day-2 batch replayed with update=false drops
    // against the registry (11's hash is in it now) without growing it
    val before = spark.table(reg).count()
    val replay = CorpusPipeline.curate(day2, "text", "doc_id",
      cfg.copy(registryUpdate = false))
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(replay.isEmpty, s"report-only replay survivors: $replay")
    assert(spark.table(reg).count() == before,
      "update=false must not append to the registry")
  }

  test("nearIndexTable makes curate's near-dedup incremental across runs") {
    import graft.dedup.Dedup
    val doc1 = "an article about the restoration of old sailing ships and the " +
      "carpenters who keep the craft alive in small harbor towns along the " +
      "rocky northern coast through the long quiet winter months every year"
    val doc1mut = doc1.replace("carpenters", "shipwrights")
    val doc2 = "a different piece on the migration patterns of arctic birds " +
      "and the scientists who follow them across the seasons with radio " +
      "trackers and long patient nights in the cold northern field camps"
    val idx = "curate_nearidx_spec"
    for (t <- Seq(idx, s"${idx}_sigs", s"${idx}_mhspec"))
      graft.sources.Warehouse.dropTableAndLocation(spark, t)
    Dedup.writeMinhashIndex(
      Seq((0L, "seed corpus placeholder text for the empty day zero"))
        .toDF("doc_id", "text"), "text", "doc_id", idx, buckets = 4)
    val cfg = CorpusPipeline.Config(nearDupThreshold = 1.5,
      nearIndexTable = Some(idx), nearIndexJaccard = 0.6)
    // day 1: both docs are new — they survive and register
    val out1 = CorpusPipeline.curate(
      Seq((1L, doc1), (2L, doc2)).toDF("doc_id", "text"), "text", "doc_id", cfg)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(out1 == Seq(1L, 2L), s"day 1 survivors: $out1")
    // day 2: a MUTATED replay of day 1's doc (invisible to exact dedup
    // and to any within-run stage) is dropped by the index; new content
    // survives — and report-only leaves the index untouched
    val doc3 = "yet another unrelated story about bread baking with flour " +
      "water salt and patience plus a hot oven and a heavy pan for the " +
      "crust and a long slow fermentation in the cellar before morning"
    val before = spark.table(s"${idx}_sigs").count()
    val out2 = CorpusPipeline.curate(
      Seq((10L, doc1mut), (11L, doc3)).toDF("doc_id", "text"), "text", "doc_id",
      cfg.copy(nearIndexUpdate = false))
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(out2 == Seq(11L), s"day 2 survivors: $out2")
    assert(spark.table(s"${idx}_sigs").count() == before,
      "nearIndexUpdate=false must not grow the index")
  }

  test("semanticIndexTable makes curate's semantic dedup incremental across runs") {
    import graft.dedup.Dedup
    import graft.similarity.Similarity
    val idx = "curate_semidx_spec"
    for (t <- Seq(idx, s"${idx}_centroids"))
      graft.sources.Warehouse.dropTableAndLocation(spark, t)
    val rng = new scala.util.Random(11)
    def vec() = Array.fill(8)(rng.nextGaussian().toFloat)
    val indexed = vec()
    Similarity.writeIvfIndex(
      Seq((100L, indexed), (101L, vec())).toDF("doc_id", "embedding"),
      "doc_id", "embedding", idx, nCentroids = 2, lloydIters = 1, buckets = 2)
    val cfg = CorpusPipeline.Config(minQuality = 0.0, nearDupThreshold = 1.5,
      embCol = Some("embedding"), semanticCentroids = 2,
      semanticIndexTable = Some(idx), semanticIndexThreshold = 0.95)
    // day 1: a scaled twin of an INDEXED embedding (cross-run semantic
    // replay — invisible to every text stage) is dropped; fresh survives
    // and its vector registers for day 2
    val freshVec = vec()
    val day1 = Seq(
      (1L, english + "replayed doc", indexed.map(x => x * 1.01f)),
      (2L, english + "fresh doc", freshVec)
    ).toDF("doc_id", "text", "embedding")
    val out1 = CorpusPipeline.curate(day1, "text", "doc_id", cfg)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(out1 == Seq(2L), s"day 1 survivors: $out1")
    // day 2: the day-1 survivor's embedding replays under a new id and
    // different text — only the grown index can catch it; report-only
    // leaves the index untouched
    val before = spark.table(idx).count()
    val day2 = Seq(
      (10L, english + "same embedding new words", freshVec),
      (11L, english + "genuinely new doc", vec())
    ).toDF("doc_id", "text", "embedding")
    val out2 = CorpusPipeline.curate(day2, "text", "doc_id",
      cfg.copy(semanticIndexUpdate = false))
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(out2 == Seq(11L), s"day 2 survivors: $out2")
    assert(spark.table(idx).count() == before,
      "semanticIndexUpdate=false must not grow the index")
  }

  test("nearDupThreshold > 1.0 disables near-dedup: near dups survive, exact dups don't") {
    val docs = Seq(
      (1L, english + "one"),
      (2L, english + "one"), // exact dup — still removed
      (3L, english + "two")  // near dup — kept when the stage is off
    ).toDF("doc_id", "text")
    val out = CorpusPipeline.curate(docs, "text", "doc_id",
      CorpusPipeline.Config(nearDupThreshold = 1.5))
    val ids = out.select("doc_id").as[Long].collect().sorted.toSeq
    assert(ids == Seq(1L, 3L), s"survivors: $ids")
  }

  test("spanDedupTokens cuts repeated boilerplate spans out of survivors") {
    // doc 2 embeds doc 1's first span as leading boilerplate; doc 3 is
    // built ENTIRELY of doc 1's spans (reordered) and must disappear
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma red orange yellow green blue purple"),
      (3L, "delta epsilon zeta alpha beta gamma")
    ).toDF("doc_id", "text")
    val cfg = CorpusPipeline.Config(langs = Set("und"), minQuality = 0.0,
      nearDupThreshold = 1.5, spanDedupTokens = Some(3))
    val out = CorpusPipeline.curate(docs, "text", "doc_id", cfg)
    val rows = out.select("doc_id", "text").as[(Long, String)].collect().toMap
    // doc 1 is the corpus-first owner of each of its spans — untouched
    assert(rows(1L) == "alpha beta gamma delta epsilon zeta")
    // doc 2 loses exactly the boilerplate span, keeps its own content
    assert(rows(2L) == "red orange yellow green blue purple")
    // doc 3: every span already owned by doc 1 — the document disappears
    assert(!rows.contains(3L))
    // the split keys on the REWRITTEN text: doc 2's assignment must equal
    // splitAssign of the residual string, not of the original
    val sp = out.filter(col("doc_id") === 2L).select("split").as[String].head()
    val expected = spark.range(1)
      .select(graft.text.TextOps.splitAssign(lit("red orange yellow green blue purple")))
      .as[String].head()
    assert(sp == expected)
    // stage off → doc 3 survives untouched
    val off = CorpusPipeline.curate(docs, "text", "doc_id",
      cfg.copy(spanDedupTokens = None))
    assert(off.count() == 3)
  }

  test("dropRepeatedLines runs first: a footer-padded refetch still dedups") {
    val docs = Seq(
      (1L, english + "one\nfooter nav\nfooter nav"),
      // same page refetched with one MORE footer repeat — raw texts
      // differ, cleaned texts are identical, so exact dedup must drop it
      (2L, english + "one\nfooter nav\nfooter nav\nfooter nav"),
      (3L, english + "two\nfooter nav")
    ).toDF("doc_id", "text")
    val out = CorpusPipeline.curate(docs, "text", "doc_id",
      CorpusPipeline.Config(nearDupThreshold = 1.5, minQuality = 0.3,
        dropRepeatedLines = true))
    val byId = out.collect().map(r =>
      (r.getAs[Long]("doc_id"), r.getAs[String]("text"))).toMap
    assert(byId.keySet == Set(1L, 3L), s"survivors: ${byId.keySet}")
    assert(byId(1L).endsWith("one\nfooter nav"), byId(1L))
    // without the cleanup the refetch survives (raw texts differ)
    val raw = CorpusPipeline.curate(docs, "text", "doc_id",
      CorpusPipeline.Config(nearDupThreshold = 1.5, minQuality = 0.3))
    assert(raw.count() == 3)
  }

  test("line-shape caps gate bullet spam; substring stage strips shifted repeats") {
    val bullets = (1 to 12).map(i => s"- item $i").mkString("\n")
    val docs = Seq(
      (1L, english + "one"),
      (2L, english + "one\n" + bullets), // > 60% bullet lines → gated
      // doc 3 embeds doc 1's opening 8+ tokens at an offset: the span
      // grid would need alignment, the sliding windows must strip it
      (3L, "prefix tokens first " + english + "three " + english2)
    ).toDF("doc_id", "text")
    val out = CorpusPipeline.curate(docs, "text", "doc_id",
      CorpusPipeline.Config(nearDupThreshold = 1.5, minQuality = 0.3,
        maxBulletFrac = 0.6, substringWindowTokens = Some(8)))
    val byId = out.collect().map(r =>
      (r.getAs[Long]("doc_id"), r.getAs[String]("text"))).toMap
    assert(byId.keySet == Set(1L, 3L), s"survivors: ${byId.keySet}")
    // doc 3 lost the english run it shared with doc 1 but kept its own
    assert(byId(3L).startsWith("prefix tokens first"), byId(3L))
    assert(!byId(3L).contains("quick brown fox"), byId(3L))
    assert(byId(3L).contains(english2.split(" ").take(4).mkString(" ")), byId(3L))
  }

  test("redactPii=true masks PII after dedup and split, like the streaming intake") {
    val docs = Seq(
      (1L, english + "reach admin@example.net or 10.1.2.3 now"),
      (2L, english + "reach admin@example.net or 10.1.2.3 now"), // exact dup — still collapses
      (3L, english + "clean tail")
    ).toDF("doc_id", "text")
    val out = CorpusPipeline.curate(docs, "text", "doc_id",
      CorpusPipeline.Config(nearDupThreshold = 1.5, redactPii = true))
      .select("doc_id", "text", "split").as[(Long, String, String)].collect().sortBy(_._1)
    assert(out.map(_._1).toSeq == Seq(1L, 3L))
    assert(out.head._2.contains("<EMAIL>") && out.head._2.contains("<IP>"))
    assert(!out.head._2.contains("admin@"))
    // split keyed on the RAW text: identical to a run without redaction
    val plain = CorpusPipeline.curate(docs, "text", "doc_id",
      CorpusPipeline.Config(nearDupThreshold = 1.5))
      .select("doc_id", "split").as[(Long, String)].collect().sortBy(_._1)
    assert(out.map(r => (r._1, r._3)).toSeq == plain.toSeq)
  }

  test("every materialization strategy produces identical output") {
    import graft.pipeline.Materialize
    val benchmark = Seq((100L, "benchmark question text that is the held out eval set for this run"))
      .toDF("doc_id", "text")
    val docs = Seq(
      (1L, english + "one"),
      (2L, english + "one"),
      (3L, english + "two"),
      (7L, "an entirely different english document about the history of the spark engine " +
        "that is long enough to pass the quality gate and it was written for this test " * 2)
    ).toDF("doc_id", "text")
    val ckptDir = java.nio.file.Files.createTempDirectory("graft-ckpt").toString
    def run(m: Materialize) = CorpusPipeline.curate(docs, "text", "doc_id",
      CorpusPipeline.Config(nearDupThreshold = 0.6, materialize = m),
      benchmark = Some(benchmark))
      .select("doc_id", "lang", "quality", "split")
      .collect().map(_.toString).sorted.toSeq
    val expected = run(Materialize.Off)
    for (m <- Seq(Materialize.Local, Materialize.Disk, Materialize.Reliable(ckptDir)))
      assert(run(m) == expected, s"strategy $m diverged")
  }

  test("embCol enables the semantic-dedup stage: embedding near-copies collapse to min id") {
    val v1 = Seq.tabulate(8)(i => (i + 1).toFloat)
    val v2 = Seq.tabulate(8)(i => (8 - i).toFloat) // cosine(v1, v2) ≈ 0.59
    val docs = Seq(
      (1L, english + "one", v1),
      // distinct text (passes the text-keyed dedups) but a byte-identical
      // embedding — exactly what the semantic stage exists to catch
      (2L, english + "completely different tail of words here", v1),
      (3L, english + "a third unrelated document body for this test", v2)
    ).toDF("doc_id", "text", "embedding")
    val cfg = CorpusPipeline.Config(nearDupThreshold = 1.5,
      embCol = Some("embedding"), semanticThreshold = 0.9, semanticCentroids = 2)
    val out = CorpusPipeline.curate(docs, "text", "doc_id", cfg)
    val ids = out.select("doc_id").as[Long].collect().sorted.toSeq
    assert(ids == Seq(1L, 3L), s"survivors: $ids")
    // survivors flow through the later stages: split assigned, every input
    // column (embedding included) preserved
    assert(out.columns.contains("embedding") && out.columns.contains("split"))
    // stage off → the embedding twin survives untouched
    val off = CorpusPipeline.curate(docs, "text", "doc_id", cfg.copy(embCol = None))
    assert(off.count() == 3)
  }

  test("fused langQuality kernel matches the langId/qualityScore columns") {
    import graft.text.TextOps
    // driver-table text plus adversarial shapes: trailing/leading
    // whitespace (split keeps empty tokens), CJK, ties between language
    // stopword counts, sub-5-token docs, empty string
    val tricky = Seq(
      null, "", " ", "  leading and trailing  ", "the of and to in is that it was",
      "le la les de des et en un une du", "der die das und in den von zu",
      "一二三四五六七八九十",
      "the le el der", "one two three", "a b", english,
      // the widened table: non-ASCII stopwords (Cyrillic, ogonki, cedilla),
      // cross-language collisions ("de" nl/fr/es, "da" tr/da, "i" pl/da),
      // and an all-collision tie that must break by list order in BOTH forms
      "il gatto non è del tutto contento anche come gli altri", "o que não era",
      "de kat is niet in het huis", "och att det som är för oss",
      "og i at det ikke er som på", "ja on ei että oli se mutta",
      "i w nie na się z do to że", "и в не на что он с как это",
      "bir ve bu da için ile ne ki", "și de la cu un în este pe",
      "a se na je že v to s z", "yang dan di itu dengan untuk",
      "de da i o a en un in is on",
      // script calls: hangul, kana-with-kanji (ja beats zh), pure han,
      // and threshold edges (kana just under 10%, hangul just under 25%)
      "이것은 한국어 문장입니다", "これは日本語の文です", "汉字汉字汉字汉字",
      "latin text with one か char and padding words", "한글 two three four five six"
    ).zipWithIndex.map { case (t, i) => (i.toLong, t) }
    val fromTable = graft.Tables(spark, "/root/testdata/sf0.001", "documents")
      .select($"doc_id", $"text").as[(Long, String)].collect().toSeq
    val df = (tricky ++ fromTable.map { case (i, t) => (i + 1000L, t) })
      .toDF("doc_id", "text")
    val cmp = df.select(
      TextOps.langQuality($"text").as("f"),
      TextOps.langId($"text").as("lang"),
      TextOps.qualityScore($"text").as("quality"))
      .filter($"f._1" =!= $"lang" || $"f._2" =!= $"quality")
    assert(cmp.count() == 0, s"divergent rows:\n${cmp.take(5).mkString("\n")}")
  }

  test("frontier: resolve+normalize identity, self-drop, robots gate, host cap") {
    import graft.pipeline.CrawlPipeline
    val pages = Seq(
      ("https://a.com/idx.html",
        "<a href=\"p1.html\">1</a><a href=\"p2.html\">2</a>" +
          "<a href=\"/idx.html\">self</a>" +
          "<a href=\"http://b.com/x?utm_source=t\">b</a>"),
      ("https://a.com/two.html",
        "<a href=\"p1.html\">again</a><a href=\"http://b.com/x\">b2</a>" +
          "<a href=\"https://blocked.com/private/z\">no</a>" +
          "<a href=\"https://blocked.com/ok\">yes</a>")
    ).toDF("url", "html")
    val robots = Seq(("blocked.com",
      "User-agent: *\nDisallow: /private\nCrawl-delay: 4")).toDF("host", "robots_txt")
    val out = CrawlPipeline.frontier(pages, "url", "html",
      robotsByHost = Some(robots))
      .collect().map(r => (r.getString(0), (r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) null else Double.box(r.getDouble(3))))).toMap
    // tracking variant and clean twin are ONE entry with two citations;
    // the robots-disallowed path is gone; the allowed path of the same
    // host carries the crawl-delay evidence; the self link is dropped
    assert(out == Map(
      "a.com/p1.html" -> (("a.com", 2L, null)),
      "a.com/p2.html" -> (("a.com", 1L, null)),
      "b.com/x" -> (("b.com", 2L, null)),
      "blocked.com/ok" -> (("blocked.com", 1L, Double.box(4.0)))), out.toString)
  }

  test("frontier: cross-run seen registry schedules each URL once; host cap bounds") {
    import graft.pipeline.CrawlPipeline
    import graft.dedup.Dedup
    graft.sources.Warehouse.dropTableAndLocation(spark, "frontier_seen")
    Dedup.createRegistry(spark, "frontier_seen", buckets = 4)
    val run1 = Seq(("https://a.com/idx.html",
      "<a href=\"p1.html\">1</a><a href=\"p2.html\">2</a>")).toDF("url", "html")
    val got1 = CrawlPipeline.frontier(run1, "url", "html",
      seenRegistryTable = Some("frontier_seen"))
      .select("url").as[String].collect().sorted.toSeq
    assert(got1 == Seq("a.com/p1.html", "a.com/p2.html"))
    // run 2 re-cites p1 (already scheduled -> dropped) and adds q
    val run2 = Seq(("https://a.com/other.html",
      "<a href=\"p1.html\">old</a><a href=\"q.html\">new</a>")).toDF("url", "html")
    val got2 = CrawlPipeline.frontier(run2, "url", "html",
      seenRegistryTable = Some("frontier_seen"))
      .select("url").as[String].collect().toSeq
    assert(got2 == Seq("a.com/q.html"), got2.toString)
    // host cap: five distinct links into one host keep the 2 smallest
    val fan = Seq(("https://hub.com/h.html",
      (1 to 5).map(i => s"<a href=\"/p$i.html\">$i</a>").mkString)).toDF("url", "html")
    val capped = CrawlPipeline.frontier(fan, "url", "html", maxPerHost = 2)
      .select("url").as[String].collect().sorted.toSeq
    assert(capped == Seq("hub.com/p1.html", "hub.com/p2.html"), capped.toString)
  }

  test("frontierPrioritized: citations accumulate, lane losers stay pending, lanes serialize") {
    import graft.pipeline.CrawlPipeline
    import graft.dedup.Dedup
    for (t <- Seq("fp_cit", "fp_seen"))
      graft.sources.Warehouse.dropTableAndLocation(spark, t)
    CrawlPipeline.createCitationRegistry(spark, "fp_cit", buckets = 4)
    Dedup.createRegistry(spark, "fp_seen", buckets = 4)
    val delays = Seq(("hub.com", 2.0)).toDF("host", "crawl_delay")
    def sched(pages: org.apache.spark.sql.DataFrame) =
      CrawlPipeline.frontierPrioritized(pages, "url", "html",
        citationRegistryTable = Some("fp_cit"),
        crawlDelayByHost = Some(delays),
        seenRegistryTable = Some("fp_seen"), maxPerHost = 2)
        .collect().map(r => r.getString(0) ->
          ((r.getLong(2), r.getLong(3), r.getDouble(4), r.getInt(5),
            r.getDouble(6)))).toMap
    // run 1 citations: a×3, b×2, c×2 — the 2-slot lane admits a then b
    // (tie c loses on url order); c stays PENDING, not "seen"
    val run1 = Seq(
      ("https://s1.com/p.html",
        "<a href=\"http://hub.com/a\">1</a><a href=\"http://hub.com/b\">2</a>" +
          "<a href=\"http://hub.com/c\">3</a>"),
      ("https://s2.com/p.html",
        "<a href=\"http://hub.com/a\">1</a><a href=\"http://hub.com/c\">2</a>"),
      ("https://s3.com/p.html",
        "<a href=\"http://hub.com/a\">1</a><a href=\"http://hub.com/b\">2</a>")
    ).toDF("url", "html")
    val got1 = sched(run1)
    assert(got1 == Map(
      "hub.com/a" -> ((3L, 3L, 2.0, 1, 0.0)),
      "hub.com/b" -> ((2L, 2L, 2.0, 2, 2.0))), got1.toString)
    // run 2 citations: c×1, d×2, a×1. Batch-only priority would admit d
    // first (2 > 1); the ACCUMULATED total (c: 2 prior + 1 = 3) must
    // outrank d — and a, already fetched, is dropped despite the re-cite.
    // The lane serializes under hub.com's 2 s crawl delay.
    val run2 = Seq(
      ("https://s4.com/p.html",
        "<a href=\"http://hub.com/c\">1</a><a href=\"http://hub.com/d\">2</a>"),
      ("https://s5.com/p.html",
        "<a href=\"http://hub.com/d\">1</a><a href=\"http://hub.com/a\">2</a>")
    ).toDF("url", "html")
    val got2 = sched(run2)
    assert(got2 == Map(
      "hub.com/c" -> ((1L, 3L, 2.0, 1, 0.0)),
      "hub.com/d" -> ((2L, 2L, 2.0, 2, 2.0))), got2.toString)
  }

  test("frontierPrioritized: page-rank weight breaks citation ties; absent delay schedules now") {
    import graft.pipeline.CrawlPipeline
    val pages = Seq(("https://s.com/p.html",
      "<a href=\"http://h.com/x\">1</a><a href=\"http://h.com/y\">2</a>"))
      .toDF("url", "html")
    val pr = Seq(("h.com/y", 0.9), ("h.com/x", 0.1)).toDF("url", "rank")
    val out = CrawlPipeline.frontierPrioritized(pages, "url", "html",
      pageRank = Some(pr), maxPerHost = 2)
      .collect().map(r => (r.getString(0), r.getInt(5),
        if (r.isNullAt(4)) null else Double.box(r.getDouble(4)),
        r.getDouble(6))).sortBy(_._2).toSeq
    // equal citations: the higher-authority y leads the lane; no delay
    // entry for h.com → every slot schedules immediately
    assert(out == Seq(("h.com/y", 1, null, 0.0), ("h.com/x", 2, null, 0.0)),
      out.toString)
  }

  test("frontierPrioritized: Reliable schedule matches Local; snapshot still pre-append") {
    import graft.pipeline.{CrawlPipeline, Materialize}
    import graft.dedup.Dedup
    val pages = Seq(("https://s.com/p.html",
      "<a href=\"http://h.com/x\">1</a><a href=\"http://h.com/y\">2</a>"))
      .toDF("url", "html")
    def run(m: Materialize, seen: String) = {
      graft.sources.Warehouse.dropTableAndLocation(spark, seen)
      Dedup.createRegistry(spark, seen, buckets = 2)
      CrawlPipeline.frontierPrioritized(pages, "url", "html",
        seenRegistryTable = Some(seen), maxPerHost = 2, materialize = m)
        .collect().map(_.toString).sorted.toSeq
    }
    val dir = java.nio.file.Files.createTempDirectory("graft-fp").toString
    val local = run(Materialize.Local, "fp_m_l")
    assert(local.nonEmpty)
    // Reliable: identical rows, file-backed; Off upgrades to eager Local
    // (a lazy schedule would re-read the seen registry AFTER its own
    // append and return zero rows) — identical too
    assert(run(Materialize.Reliable(dir), "fp_m_r") == local)
    assert(new java.io.File(dir).listFiles()
      .exists(_.getName.startsWith("frontier-schedule-")))
    assert(run(Materialize.Off, "fp_m_o") == local)
  }

  test("frontierStream admits each URL once in-horizon, registry- and robots-gated") {
    import graft.pipeline.CrawlPipeline
    import graft.dedup.Dedup
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import java.sql.Timestamp
    def ts(min: Int) = Timestamp.valueOf(f"2024-01-01 00:$min%02d:00")
    graft.sources.Warehouse.dropTableAndLocation(spark, "fs_seen")
    Dedup.createRegistry(spark, "fs_seen", buckets = 4)
    // a.com/r.html was fetched by an earlier run and registered
    graft.sources.Warehouse.appendBucketedWithDelta(
      Seq("a.com/r.html").toDF("url")
        .select(sha2(col("url").cast("binary"), 256).as("content_hash")),
      "fs_seen", "content_hash")
    val robots = Seq(("blocked.com",
      "User-agent: *\nDisallow: /private\nCrawl-delay: 2")).toDF("host", "robots_txt")
    val input = MemoryStream[(Timestamp, String, String)]
    val pagesDf = input.toDF().toDF("ts", "url", "html")
    val query = CrawlPipeline.frontierStream(pagesDf, "url", "html", "ts",
      watermark = "10 minutes", robotsByHost = Some(robots),
      seenRegistryTable = Some("fs_seen"))
      .writeStream.format("memory").queryName("frontier_stream_out")
      .outputMode("append").start()
    try {
      input.addData((ts(0), "https://a.com/idx.html",
        "<a href=\"p1.html\">1</a><a href=\"/idx.html\">self</a>" +
          "<a href=\"r.html\">seen</a>" +
          "<a href=\"https://blocked.com/private/z\">no</a>" +
          "<a href=\"https://blocked.com/ok\">yes</a>"))
      query.processAllAvailable()
      val b1 = spark.table("frontier_stream_out")
        .select("url", "crawl_delay").collect()
        .map(r => (r.getString(0),
          if (r.isNullAt(1)) null else Double.box(r.getDouble(1)))).toMap
      assert(b1 == Map("a.com/p1.html" -> null,
        "blocked.com/ok" -> Double.box(2.0)), b1.toString)
      // batch 2: p1 re-cited (in-horizon duplicate drops), q is fresh
      input.addData((ts(1), "https://a.com/two.html",
        "<a href=\"p1.html\">again</a><a href=\"q.html\">new</a>"))
      query.processAllAvailable()
      val all = spark.table("frontier_stream_out")
        .select("url").as[String].collect().sorted.toSeq
      assert(all == Seq("a.com/p1.html", "a.com/q.html", "blocked.com/ok"),
        all.toString)
    } finally query.stop()
  }

  test("frontierStream caps per-host admission across batches") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import java.sql.Timestamp
    def ts(min: Int) = Timestamp.valueOf(f"2024-01-01 00:$min%02d:00")
    val input = MemoryStream[(Timestamp, String, String)]
    val df = input.toDF().toDF("ts", "url", "html")
    val q = graft.pipeline.CrawlPipeline.frontierStream(df, "url", "html", "ts",
      watermark = "10 minutes", maxPerHost = 2)
      .writeStream.format("memory").queryName("cap_out").outputMode("append").start()
    try {
      input.addData((ts(0), "https://h.com/x.html",
        "<a href=\"/p1.html\">1</a><a href=\"/p2.html\">2</a><a href=\"/p3.html\">3</a>"))
      q.processAllAvailable()
      input.addData((ts(1), "https://h.com/y.html", "<a href=\"/p4.html\">4</a>"))
      q.processAllAvailable()
      val urls = spark.table("cap_out").select("url").as[String].collect().sorted.toSeq
      assert(urls.size == 2 && urls.forall(_.startsWith("h.com/")), urls.toString)
    } finally q.stop()
  }

  test("prepareTraining: curate → chunk → shuffled shards → atomic publish") {
    val root = "target/tmp/prep_root"
    val rootDir = new java.io.File(root)
    if (rootDir.exists()) {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(rootDir.toPath).iterator().asScala.toSeq
        .reverse.foreach(java.nio.file.Files.delete)
    }
    val longDoc = (1 to 120).map(i => s"tok$i").mkString(" ")
    val docs = Seq(
      (1L, english + "one"),   // keeper
      (2L, english + "one"),   // exact dup → dropped
      (5L, "x"),               // junk → dropped
      (9L, longDoc + " " + english)) // long keeper → chunks
      .toDF("doc_id", "text")
    val v = CorpusPipeline.prepareTraining(docs, "text", "doc_id", root,
      CorpusPipeline.Config(minQuality = 0.1, nearDupThreshold = 1.5,
        trainPct = 100, valPct = 0),
      chunkTokens = 50, chunkOverlap = 5, shardTokens = 100L)
    assert(v.endsWith("v1"), v)
    // committed snapshot: manifest + shard dirs; read back through the
    // published layout
    assert(new java.io.File(v, "_MANIFEST.json").exists())
    val shards = spark.read.parquet(v + "/shard=*")
    val units = shards.select("unit_id", "unit_text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    // dup and junk never shipped; both keepers present; every unit is a
    // ≤50-token window; doc 9's chunks carry provenance ids
    assert(units.forall(_._2.split("\\s+").length <= 50))
    val ids = units.map(_._1.split("#").head.toLong).toSet
    assert(ids == Set(1L, 9L), ids.toString)
    assert(units.count(_._1.startsWith("9#")) >= 3, units.map(_._1).toSeq)
    // chunks of doc 9 stitch back to its exact text (overlap 5, stride 45)
    val nine = units.filter(_._1.startsWith("9#"))
      .sortBy(_._1.split("#")(1).toInt).map(_._2.split(" ").toSeq)
    val stitched = nine.head ++ nine.tail.flatMap(_.drop(5))
    val orig = (longDoc + " " + english).trim.split("\\s+").toSeq
    assert(stitched == orig)
    // a second publish versions, never overwrites
    val v2 = CorpusPipeline.prepareTraining(docs, "text", "doc_id", root,
      CorpusPipeline.Config(minQuality = 0.1, nearDupThreshold = 1.5,
        trainPct = 100, valPct = 0), shardTokens = 100L)
    assert(v2.endsWith("v2") &&
      graft.sources.Warehouse.latestShards(spark, root).get.endsWith("v2"))
  }

  test("curate blocklist gates: domain, word, and phrase lists drop their docs") {
    val docs = Seq(
      (1L, english + "one", "https://ok.example.org/a"),       // keeper
      (2L, english + "two", "http://bad.example.com/x"),       // blocked domain
      (3L, english + "sub", "https://cdn.bad.example.com/y"),  // blocked subdomain
      (4L, english + "forbiddenword tail", "https://ok2.example.org/b"), // word list
      (5L, english + "the secret handshake spans tokens", "https://ok3.example.org/c"), // phrase
      (6L, english + "three", null.asInstanceOf[String])       // null URL keeps
    ).toDF("doc_id", "text", "url")
    val out = CorpusPipeline.curate(docs, "text", "doc_id",
      CorpusPipeline.Config(nearDupThreshold = 1.5, minQuality = 0.1,
        blockedDomains = Seq("bad.example.com"),
        blockedWords = Seq("forbiddenword"),
        blockedPhrases = Seq("secret handshake spans")))
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(out === Seq(1L, 6L), s"survivors: $out")
  }

  test("stripLinesAgainstRegistry strips registered boilerplate from a stream") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import java.sql.Timestamp
    import graft.dedup.Dedup
    implicit val sqlCtx = spark.sqlContext
    def ts(min: Int) = Timestamp.valueOf(f"2024-01-01 00:$min%02d:00")
    graft.sources.Warehouse.dropTableAndLocation(spark, "slr_reg")
    Dedup.createLineRegistry(spark, "slr_reg", buckets = 4)
    // an earlier batch run registered the site boilerplate
    Dedup.dedupLinesAgainstRegistry(
      Seq((0L, "nav menu\nfooter")).toDF("doc_id", "text"),
      "text", "doc_id", "slr_reg").count()
    val day2 = Seq(
      // registered lines + fresh content + a within-doc dup + a blank
      (10L, "nav menu\nfresh line\n\nfresh line\nfooter\nother"),
      (11L, "nav menu\nfooter")) // all registered → vanishes
    val in = MemoryStream[(Timestamp, Long, String)]
    val q = graft.streaming.EventStreams.stripLinesAgainstRegistry(
        in.toDF().toDF("ts", "doc_id", "text"), "text", "doc_id", "ts",
        "slr_reg")
      .writeStream.format("memory").queryName("slr_out")
      .outputMode("append").start()
    try {
      in.addData(day2.map { case (id, t) => (ts(0), id, t) })
      q.processAllAvailable()
      in.addData((ts(30), 99L, "watermark push")) // closes the 00:00 window
      q.processAllAvailable()
      val got = spark.table("slr_out").filter(col("doc_id") < 99)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq
      // day2's only cross-doc shared lines are registered ones, so the
      // streamed report row-equals the batch report-only pass
      val want = Dedup.dedupLinesAgainstRegistry(
          day2.toDF("doc_id", "text"), "text", "doc_id", "slr_reg",
          update = false)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq
      assert(got.sortBy(_._1) == want.sortBy(_._1), s"$got vs $want")
      assert(got.map(_._1).toSet == Set(10L)) // doc 11 vanished
      assert(got.head._3 == "fresh line\n\nother")
      // the stream registered nothing (probe-only): row count unchanged
      assert(spark.table("slr_reg").count() == 2)
    } finally q.stop()
  }
}
