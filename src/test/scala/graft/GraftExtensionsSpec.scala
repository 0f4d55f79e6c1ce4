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
}
