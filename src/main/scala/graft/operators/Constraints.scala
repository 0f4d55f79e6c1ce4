package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative DATA-QUALITY constraint checking (the Deequ-family
  * pipeline gate): a publisher declares what must hold — non-null
  * columns, unique keys, value ranges, enum domains, referential
  * integrity against a dimension — and gets one report row per rule
  * with the exact violation count, to gate a publish or alert on
  * drift. Counts, not booleans: "0 vs 3 vs 3 million violations" is
  * the difference between a bug and a bad upstream day, and exact
  * integers are engine-replayable where sampled profiles are not.
  *
  * Scale shape: every ROW-LOCAL rule (not-null, range, set) folds into
  * ONE conditional-count aggregate pass over the table — adding rules
  * adds expressions, not scans. Uniqueness is one key group-by
  * (partial-aggregated counts; violations = Σ cnt over groups with
  * cnt > 1). Referential integrity is one anti-join, dim broadcast
  * when small. No rule ever collects rows to the driver.
  */
object Constraints {

  sealed trait Rule { def name: String }
  /** `col` must never be null. */
  final case class NotNull(colName: String) extends Rule {
    val name = s"not_null:$colName"
  }
  /** `cols` must identify rows uniquely; violations = rows in any
    * duplicated key group.
    */
  final case class Unique(cols: Seq[String]) extends Rule {
    require(cols.nonEmpty, "Unique: no columns")
    val name = s"unique:${cols.mkString(",")}"
  }
  /** `lo <= col <= hi` (nulls count as violations — range implies
    * presence; pair with NotNull for the distinct signal).
    */
  final case class InRange(colName: String, lo: Double, hi: Double)
      extends Rule {
    require(lo <= hi, s"InRange: $lo > $hi")
    val name = s"in_range:$colName"
  }
  /** `col` must be one of `values` (nulls violate). */
  final case class InSet(colName: String, values: Seq[String])
      extends Rule {
    require(values.nonEmpty, "InSet: no values")
    val name = s"in_set:$colName"
  }
  /** Every non-null `col` must exist in `dim.dimCol` (the FK check).
    * Null FKs are NotNull's business, not this rule's.
    */
  final case class RefIntegrity(colName: String, dim: DataFrame,
                                dimCol: String) extends Rule {
    val name = s"ref:$colName"
  }

  /** One report row per rule: (rule, violations, n_rows, pass). */
  def check(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "Constraints.check: no rules")
    require(rules.map(_.name).distinct.size == rules.size,
      s"duplicate rule names: ${rules.map(_.name)}")
    val spark = df.sparkSession
    import spark.implicits._
    val rowLocal: Seq[(String, Column)] = rules.collect {
      case r: NotNull =>
        r.name -> sum(when(col(r.colName).isNull, 1L).otherwise(0L))
      case r: InRange =>
        r.name -> sum(when(col(r.colName).isNull ||
          col(r.colName) < r.lo || col(r.colName) > r.hi, 1L)
          .otherwise(0L))
      case r: InSet =>
        r.name -> sum(when(col(r.colName).isNull ||
          !col(r.colName).isin(r.values: _*), 1L).otherwise(0L))
    }
    // one pass: total + every row-local violation count
    val aggs = (count(lit(1)).as("__n") +:
      rowLocal.map { case (n, c) => c.as(s"v:$n") })
    val head = df.agg(aggs.head, aggs.tail: _*).head()
    val nRows = head.getLong(0)
    val rowLocalCounts = rowLocal.zipWithIndex.map { case ((n, _), i) =>
      n -> head.getLong(i + 1)
    }
    val heavy: Seq[(String, Long)] = rules.collect {
      case r: Unique =>
        val v = df.groupBy(r.cols.map(col): _*)
          .agg(count(lit(1)).as("__c"))
          .filter(col("__c") > 1)
          .agg(coalesce(sum(col("__c")), lit(0L)))
          .head().getLong(0)
        r.name -> v
      case r: RefIntegrity =>
        val v = df.select(col(r.colName)).filter(col(r.colName).isNotNull)
          .join(r.dim.select(col(r.dimCol).as(r.colName)),
            Seq(r.colName), "left_anti")
          .count()
        r.name -> v
    }
    val byName = (rowLocalCounts ++ heavy).toMap
    // report in DECLARATION order — a stable, caller-chosen order
    rules.map(r => (r.name, byName(r.name), nRows, byName(r.name) == 0L))
      .toDF("rule", "violations", "n_rows", "pass")
      .withColumn("pass", col("pass").cast("int"))
  }
}
