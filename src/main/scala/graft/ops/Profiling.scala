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
}
