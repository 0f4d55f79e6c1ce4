package graft

import graft.plans.GraftExtensions

class GraftExtensionsSpec extends SparkSpec {

  test("float_dot works from SQL and matches the Column API") {
    GraftExtensions.register(spark)
    val got = spark.sql(
      "SELECT float_dot(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)), " +
        "array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS d").head().getDouble(0)
    assert(got == 11.0)
  }

  test("float_dot casts double-array literals instead of reinterpreting bytes") {
    GraftExtensions.register(spark)
    // SQL array literals default to array<double>; before FloatDot declared
    // inputTypes this reinterpreted half of each double via getFloat and
    // returned garbage — now Catalyst inserts a cast to array<float>
    val got = spark.sql("SELECT float_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d")
      .head().getDouble(0)
    assert(got == 11.0)
  }

  test("float_dot with wrong arity fails at registration, not with IOOBE") {
    GraftExtensions.register(spark)
    val e = intercept[Exception] {
      spark.sql("SELECT float_dot(array(CAST(1.0 AS FLOAT)))").collect()
    }
    assert(e.getMessage.contains("exactly 2 arguments"),
      s"unexpected error: ${e.getMessage}")
  }

  test("jaro_winkler and damerau_levenshtein are SQL-callable and " +
    "match the kernels (incl. wrong arity)") {
    GraftExtensions.register(spark)
    val jw = spark.sql("SELECT jaro_winkler('DWAYNE', 'DUANE') AS s")
      .head().getDouble(0)
    assert(jw == 0.8400000000000001)
    val dl = spark.sql("SELECT damerau_levenshtein('CA', 'ABC') AS d")
      .head().getInt(0)
    assert(dl == 2)
    val e = intercept[Exception] {
      spark.sql("SELECT jaro_winkler('a')").collect()
    }
    assert(e.getMessage.contains("exactly 2 arguments"), e.getMessage)
  }

  test("wiki functions are SQL-callable") {
    GraftExtensions.register(spark)
    val cleaned = spark.sql("SELECT wiki_clean(\"{{tpl}}Hello [[Target|world]]\") AS c")
      .head().getString(0)
    assert(cleaned == "Hello world")
    val title = spark.sql("SELECT normalize_title('foo_bar_baz') AS t").head().getString(0)
    assert(title == "Foo bar baz")
  }

  test("extensions class injects float_dot at session build") {
    val ext = new GraftExtensions()
    // smoke: applying to a fresh SparkSessionExtensions object registers
    // without error (full build-time injection is a cluster-config path)
    ext.apply(new org.apache.spark.sql.SparkSessionExtensions())
  }

  test("RangeJoinRewrite: interval joins plan binned, rows unchanged") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val facts = Seq((1L, -150.0), (2L, 0.0), (3L, 50.0), (4L, 99.99),
      (5L, 250.5)).toDF("fact_id", "v")
    val dims = Seq((1L, -200.0, -100.0), (2L, 0.0, 100.0), (3L, 50.0, 50.0),
      (4L, 300.0, 200.0)).toDF("band_id", "lo", "hi") // incl. inverted
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("fact_id", "band_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    def cases = Seq(
      facts.join(dims, col("v") >= col("lo") && col("v") <= col("hi")),
      facts.join(dims, col("v") > col("lo") && col("v") < col("hi")),
      dims.join(facts, col("v") >= col("lo") && col("v") <= col("hi")))
    val naive = cases.map(pairs)
    spark.experimental.extraOptimizations = Seq(graft.plans.RangeJoinRewrite)
    spark.conf.set("spark.graft.rangeJoin.binWidth", "75.0")
    try {
      cases.zip(naive).foreach { case (df, want) =>
        assert(pairs(df) == want)
        val plan = df.queryExecution.executedPlan.toString
        assert(!plan.contains("BroadcastNestedLoopJoin") &&
          !plan.contains("CartesianProduct"), s"not rewritten:\n$plan")
        assert(plan.contains("__graft_bin"), s"rule did not fire:\n$plan")
      }
      // SQL BETWEEN takes the same path
      facts.createOrReplaceTempView("rjf"); dims.createOrReplaceTempView("rjd")
      val sqlDf = spark.sql(
        "SELECT fact_id, band_id FROM rjf JOIN rjd ON v BETWEEN lo AND hi")
      assert(pairs(sqlDf) == naive.head)
      assert(!sqlDf.queryExecution.executedPlan.toString
        .contains("BroadcastNestedLoopJoin"))
      // an equi conjunct means Catalyst already hash-joins: rule stays out
      val equi = facts.join(dims,
        col("fact_id") === col("band_id") && col("v") <= col("hi"))
      assert(!equi.queryExecution.executedPlan.toString.contains("__graft_bin"))
      // conf off (default) leaves plans untouched even with the rule in
      spark.conf.unset("spark.graft.rangeJoin.binWidth")
      assert(!cases.head.queryExecution.executedPlan.toString
        .contains("__graft_bin"))
    } finally {
      spark.conf.unset("spark.graft.rangeJoin.binWidth")
      spark.experimental.extraOptimizations = Nil
    }
  }
}
