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

  test("curate without a benchmark skips the contamination stage") {
    val docs = Seq(
      (1L, english + "one"),
      (2L, english + "completely different tail of words here")
    ).toDF("doc_id", "text")
    val out = CorpusPipeline.curate(docs, "text", "doc_id",
      CorpusPipeline.Config(nearDupThreshold = 0.9))
    assert(out.count() == 2)
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

  test("persistSurvivors=false produces the same output as the default") {
    val benchmark = Seq((100L, "benchmark question text that is the held out eval set for this run"))
      .toDF("doc_id", "text")
    val docs = Seq(
      (1L, english + "one"),
      (2L, english + "one"),
      (3L, english + "two"),
      (7L, "an entirely different english document about the history of the spark engine " +
        "that is long enough to pass the quality gate and it was written for this test " * 2)
    ).toDF("doc_id", "text")
    def run(persist: Boolean) = CorpusPipeline.curate(docs, "text", "doc_id",
      CorpusPipeline.Config(nearDupThreshold = 0.6, persistSurvivors = persist),
      benchmark = Some(benchmark))
      .select("doc_id", "lang", "quality", "split")
      .collect().map(_.toString).sorted.toSeq
    assert(run(true) == run(false))
  }
}
