package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class JaroWinklerSpec extends SparkSpec {
  import spark.implicits._

  // reference doubles are DuckDB jaro_winkler_similarity outputs —
  // BIT-IDENTICAL parity is the contract (the d32 oracle hashes them)
  private val RefPairs = Seq(
    ("DWAYNE", "DUANE", 0.8400000000000001),
    ("MARTHA", "MARHTA", 0.9611111111111111), // transpositions
    ("DIXON", "DICKSONX", 0.8133333333333332),
    ("abcdef", "abcxyz", 0.6666666666666666), // prefix boost WITHHELD at j <= 0.7
    ("aaaaaa", "aaabbb", 0.6666666666666666),
    ("CRATE", "TRACE", 0.7333333333333334), // no shared prefix, no boost
    ("ab", "ba", 0.0), // window 0: no matches
    ("", "a", 0.0),
    ("x", "x", 1.0),
    ("", "", 0.0)) // DuckDB: empty -> 0, even both-empty

  test("kernel matches DuckDB bit-for-bit on the reference pairs") {
    for ((a, b, want) <- RefPairs) {
      val got = JaroWinklerFn.jw(
        org.apache.spark.unsafe.types.UTF8String.fromString(a),
        org.apache.spark.unsafe.types.UTF8String.fromString(b))
      assert(got == want, s"jw($a, $b) = $got, want $want")
      // symmetric
      val rev = JaroWinklerFn.jw(
        org.apache.spark.unsafe.types.UTF8String.fromString(b),
        org.apache.spark.unsafe.types.UTF8String.fromString(a))
      assert(rev == got, s"jw($b, $a) = $rev != $got")
    }
  }

  test("expression evaluates under codegen and handles nulls") {
    val df = RefPairs.map { case (a, b, w) => (a, b, w) }
      .toDF("a", "b", "want")
    val out = df.select(JaroWinkler(col("a"), col("b")).as("jw"),
      col("want")).collect()
    for (r <- out) assert(r.getDouble(0) == r.getDouble(1), r.toString)
    val withNull = Seq(("x", Option("x")), ("x", Option.empty[String]))
      .toDF("a", "b")
      .select(JaroWinkler(col("a"), col("b")).as("jw")).collect()
    assert(withNull(0).getDouble(0) == 1.0 && withNull(1).isNullAt(0))
  }

  test("jaroWinklerPairs: blocked + scored; threshold filters; " +
    "scores ride the blocked pair set") {
    val rows = Seq((1L, "MARTHA"), (2L, "MARHTA"), (3L, "DWAYNE"),
      (4L, "DUANE"), (5L, "zzzzzz")).toDF("id", "s")
    val got = graft.dedup.FuzzyJoin.jaroWinklerPairs(rows, "id", "s",
        maxDist = 6, minJw = 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
      .toMap
    assert(got == Map((1L, 2L) -> 0.9611111111111111,
      (3L, 4L) -> 0.8400000000000001), got.toString)
    intercept[IllegalArgumentException] {
      graft.dedup.FuzzyJoin.jaroWinklerPairs(rows, "id", "s", 2, 0.0)
    }
  }
}
