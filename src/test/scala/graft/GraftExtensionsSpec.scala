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
