package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class GlobalRankSpec extends SparkSpec {
  import spark.implicits._

  // deterministic pseudo-random values with DUPLICATES (ties broken by id)
  private def fixture(n: Int) =
    spark.range(n).select(col("id"),
      pmod(col("id") * 2654435761L, lit(97)).as("v"))

  test("withGlobalRank equals the single-window row_number at every " +
    "size, including ties and empty") {
    for (n <- Seq(0, 1, 5, 97, 1000)) {
      val df = fixture(n)
      val got = GlobalRank.withGlobalRank(df,
          Seq(col("v"), col("id")), "rank")
        .select(col("id"), col("rank")).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val want = df.withColumn("rank",
          row_number().over(Window.orderBy(col("v"), col("id")))
            .cast("long"))
        .select(col("id"), col("rank")).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == want, s"n=$n")
    }
  }

  test("withNtile equals SQL NTILE bit-for-bit, incl. n < k and the " +
    "uneven-bucket split") {
    for (n <- Seq(0, 1, 3, 5, 12, 97, 1000); k <- Seq(1, 5, 7)) {
      val df = fixture(n)
      val got = GlobalRank.withNtile(df, Seq(col("v"), col("id")), k, "s")
        .select(col("id"), col("s")).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val want = df.withColumn("s",
          ntile(k).over(Window.orderBy(col("v"), col("id"))).cast("long"))
        .select(col("id"), col("s")).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == want, s"n=$n k=$k")
    }
  }

  test("no single-partition exchange anywhere in the plan (the bare " +
    "Window.orderBy funnel this operator exists to avoid)") {
    val out = GlobalRank.withNtile(fixture(1000),
      Seq(col("v"), col("id")), 5, "s")
    out.count()
    val plan = out.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val single = plan.collect {
      case s: ShuffleExchangeExec
          if s.outputPartitioning.numPartitions == 1 => s
    }
    assert(single.isEmpty, s"single-partition exchange found:\n$plan")
  }

  test("guards: empty sort columns and bad k throw") {
    intercept[IllegalArgumentException] {
      GlobalRank.withGlobalRank(fixture(3), Seq.empty, "r")
    }
    intercept[IllegalArgumentException] {
      GlobalRank.withNtile(fixture(3), Seq(col("id")), 0, "s")
    }
  }
}
