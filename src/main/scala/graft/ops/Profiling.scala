package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dataset profiling (the `ANALYZE TABLE` / data-quality summary of a
  * curation pipeline): per-column row/null/distinct counts and numeric
  * extremes, emitted as a tall (column_name, stats...) table — the shape
  * quality dashboards and schema-drift monitors consume.
  *
  * Shape at 100 TB: ONE full-scan aggregate computes every column's
  * stats in a single pass (Spark evaluates the 4×5 aggregate expressions
  * in one codegen'd partial+final hash agg with no grouping key — a
  * 1-row result, so the "shuffle" is 32 partial rows); the tall pivot is
  * a plan-time `explode` of a 4-element literal array on that 1-row
  * output, not a second scan. `countDistinct` is exact here (it
  * re-shuffles per column internally); the at-scale variant swaps in
  * `approx_count_distinct` — same plan shape, sketch-sized state —
  * which is why the distinct column sits last in the struct.
  */
object Profiling {
  import Relational.t

  private val NumericCols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")

  /** The 5 stats for one column, as a struct-typed aggregate bundle. */
  private def statsOf(c: String): Seq[Column] = Seq(
    count(col(c)).as(s"${c}_nn"),
    min(col(c)).as(s"${c}_min"),
    max(col(c)).as(s"${c}_max"),
    round(sum(col(c).cast("decimal(28,6)")).cast("double") / count(col(c)), 4)
      .as(s"${c}_mean"),
    countDistinct(col(c)).as(s"${c}_nd"))

  /** Numeric profile of `lineitem`. Oracle-checked. */
  def profNumeric(spark: SparkSession, dir: String): DataFrame = {
    val aggs = statsOf(NumericCols.head) ++ NumericCols.tail.flatMap(statsOf)
    val one = t(spark, dir, "lineitem")
      .agg(count(lit(1)).as("n_rows"), aggs: _*)
    val entries = NumericCols.map { c =>
      struct(lit(c).as("col_name"), col("n_rows"),
        (col("n_rows") - col(s"${c}_nn")).as("n_null"),
        col(s"${c}_min").as("min_v"), col(s"${c}_max").as("max_v"),
        col(s"${c}_mean").as("mean_v"), col(s"${c}_nd").as("n_distinct"))
    }
    one.select(explode(array(entries: _*)).as("s"))
      .select(col("s.*"))
      .orderBy(col("col_name"))
  }

  def profNumericOracle: String =
    NumericCols.map { c =>
      s"""SELECT '$c' AS col_name, count(*) AS n_rows,
         |  count(*) - count($c) AS n_null,
         |  min($c) AS min_v, max($c) AS max_v,
         |  round(CAST(sum(CAST($c AS DECIMAL(28,6))) AS DOUBLE) / count($c), 4) AS mean_v,
         |  count(DISTINCT $c) AS n_distinct
         |FROM lineitem""".stripMargin
    }.mkString("\n", "\nUNION ALL\n", "\nORDER BY col_name")

  /** Declarative data-quality constraints over lineitem: each rule is a
    * boolean SQL predicate; violations are counted in the SAME single
    * aggregate pass as [[profNumeric]]'s stats (a rule is just one more
    * conditional-count expression), so N rules cost one scan, zero extra
    * shuffles. This is the quality-gate shape (Deequ-style) a pipeline
    * runs before promoting a layer: the output is rule → violation
    * count → pass/fail, and a scheduler fails the run on any `fail`.
    * Oracle-checked. */
  private val Constraints: Seq[(String, String)] = Seq(
    ("quantity_in_range", "l_quantity >= 1 AND l_quantity <= 50"),
    ("discount_in_range", "l_discount >= 0.0 AND l_discount <= 0.10"),
    ("price_positive", "l_extendedprice > 0"),
    ("tax_below_discount_plus_10pct", "l_tax <= l_discount + 0.10"),
    ("keys_not_null", "l_orderkey IS NOT NULL AND l_partkey IS NOT NULL"),
    // deliberately tighter than the data (quantity reaches 50): exercises
    // the violation-counting / fail branch, not just vacuous passes
    ("quantity_below_50_strict", "l_quantity < 50"))

  def profConstraints(spark: SparkSession, dir: String): DataFrame = {
    val aggs = Constraints.map { case (name, pred) =>
      sum(when(expr(pred), 0L).otherwise(1L)).as(name)
    }
    val one = t(spark, dir, "lineitem")
      .agg(count(lit(1)).as("n_rows"), aggs: _*)
    val entries = Constraints.map { case (name, _) =>
      struct(lit(name).as("rule"), col("n_rows"),
        col(name).as("n_violations"),
        when(col(name) === 0, lit("pass")).otherwise(lit("fail")).as("status"))
    }
    one.select(explode(array(entries: _*)).as("s"))
      .select(col("s.*"))
      .orderBy(col("rule"))
  }

  def profConstraintsOracle: String =
    Constraints.map { case (name, pred) =>
      s"""SELECT '$name' AS rule, count(*) AS n_rows,
         |  CAST(sum(CASE WHEN $pred THEN 0 ELSE 1 END) AS BIGINT) AS n_violations,
         |  CASE WHEN sum(CASE WHEN $pred THEN 0 ELSE 1 END) = 0
         |       THEN 'pass' ELSE 'fail' END AS status
         |FROM lineitem""".stripMargin
    }.mkString("\n", "\nUNION ALL\n", "\nORDER BY rule")
}
