package graft.ext

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Declarative data-quality expectations over a frame — the
  * validation gate a production pipeline runs before publishing a
  * commit (the Deequ/dbt-test idea, reduced to its Spark-native core:
  * a rule is just a boolean `Column`).
  *
  * Cost model: [[check]] evaluates ALL rules in ONE aggregation over
  * ONE scan — per-rule violation counts are conditional sums inside a
  * single map-side-combined aggregate, so adding a rule never adds a
  * pass over the data. A NULL predicate result counts as a violation
  * (an expectation that cannot be established is not met).
  * [[orphans]] is the referential-integrity check: a broadcast-or-
  * shuffled anti-join on the key, counting child rows with no parent.
  */
object Expectations {

  /** Violation flag: 1 unless the predicate is definitely true. */
  private def viol(pred: Column): Column =
    when(pred, 0L).otherwise(1L)

  /** One summary row per rule: `(rule, n_rows, n_violations, pass)`,
    * computed in a single aggregate over a single scan.
    */
  def check(df: DataFrame, rules: Seq[(String, Column)]): DataFrame = {
    require(rules.nonEmpty, "at least one rule")
    val aggs = count(lit(1)).as("n_rows") +:
      rules.map { case (name, pred) => sum(viol(pred)).as(s"v_$name") }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val stacked = explode(array(rules.map { case (name, _) =>
      struct(lit(name).as("rule"), col(s"v_$name").as("n_violations"))
    }: _*)).as("r")
    wide.select(col("n_rows"), stacked)
      .select(col("r.rule").as("rule"), col("n_rows"),
        col("r.n_violations").as("n_violations"),
        (col("r.n_violations") === 0L).as("pass"))
  }

  /** Rows violating at least one rule, annotated with the violated
    * rule names — the quarantine output (route to a dead-letter table,
    * keep the clean rows flowing).
    */
  def violations(df: DataFrame, rules: Seq[(String, Column)]): DataFrame = {
    require(rules.nonEmpty, "at least one rule")
    val names = array_compact(array(rules.map { case (name, pred) =>
      when(viol(pred) === 1L, lit(name)).otherwise(lit(null))
    }: _*))
    df.withColumn("violated_rules", names)
      .filter(size(col("violated_rules")) > 0)
  }

  /** Single-scan column profile: `(column, n_rows, n_nulls,
    * n_distinct, min_value, max_value)` per requested column —
    * min/max rendered as strings so heterogeneous column types share
    * one result schema. Like [[check]], ALL columns profile in ONE
    * aggregation over ONE scan. Caveat: multiple EXACT distinct
    * aggregates plan through an Expand that replicates every input
    * row once per distinct column — still one scan, but shuffled
    * bytes grow with the column count, so at extreme scale flip
    * `exactDistinct` off to use HLL `approx_count_distinct` (plain
    * partial aggregates, no Expand, same single pass).
    */
  def profile(df: DataFrame, columns: Seq[String],
      exactDistinct: Boolean = true): DataFrame = {
    require(columns.nonEmpty, "at least one column")
    val aggs = count(lit(1)).as("n_rows") +: columns.flatMap { c =>
      Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"nn_$c"),
        (if (exactDistinct) countDistinct(col(c))
         else approx_count_distinct(col(c))).as(s"nd_$c"),
        min(col(c)).cast("string").as(s"mn_$c"),
        max(col(c)).cast("string").as(s"mx_$c"))
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val stacked = explode(array(columns.map { c =>
      struct(lit(c).as("column"), col(s"nn_$c").as("n_nulls"),
        col(s"nd_$c").as("n_distinct"), col(s"mn_$c").as("min_value"),
        col(s"mx_$c").as("max_value"))
    }: _*)).as("p")
    wide.select(col("n_rows"), stacked)
      .select(col("p.column").as("column"), col("n_rows"),
        col("p.n_nulls").as("n_nulls"), col("p.n_distinct").as("n_distinct"),
        col("p.min_value").as("min_value"), col("p.max_value").as("max_value"))
  }

  /** Referential integrity: `(rule, n_rows, n_violations, pass)` for
    * child keys with no matching parent key (NULL child keys are
    * orphans — a null FK fails the expectation; relax with an
    * upstream filter if nullable FKs are legal).
    */
  def orphans(child: DataFrame, childKey: String, parent: DataFrame,
      parentKey: String, rule: String = "referential_integrity"): DataFrame = {
    val orphanCount = child
      .join(parent.select(col(parentKey).as(childKey)).distinct(),
        Seq(childKey), "left_anti")
      .agg(count(lit(1)).as("n_violations"))
    child.agg(count(lit(1)).as("n_rows"))
      .crossJoin(orphanCount)
      .select(lit(rule).as("rule"), col("n_rows"), col("n_violations"),
        (col("n_violations") === 0L).as("pass"))
  }
}
