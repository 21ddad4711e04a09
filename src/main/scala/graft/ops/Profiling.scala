package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
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

  /** Histogram bin count / width for [[profDrift]]'s o_totalprice bins
    * (data spans ~1k..500k → 10 equi-width 50k bins). */
  private val DriftBins = 10
  private val DriftBinWidth = 50000.0

  /** Cross-run distribution drift — the Population Stability Index per
    * histogram bin, the "did this run's data shift under me?" gate a
    * production pipeline evaluates between the accumulated corpus
    * (baseline) and a newly-landed run (current) before promoting. Here
    * the two populations are orders before/after 1998-01-01 (a real
    * drift: late TPC-H order years skew price mix); production swaps the
    * date predicate for the run-id partition column and compares a new
    * ETL_PART_KEY slice against the rest — same plan, and partition
    * pruning serves the "current" side for free.
    *
    * Emitted per-bin (not just the scalar Σ) so the gate's verdict is
    * auditable — WHICH price band moved is the actionable part. A bin
    * spine (`spark.range`) left-joins the counts so empty bins still
    * contribute their smoothed term; Laplace +1 smoothing bounds every
    * ln argument away from 0.
    *
    * Cross-engine float discipline (same as tx_bigram_lm): per-bin
    * probabilities quantize to integer micro-probs BEFORE the PSI-term
    * float math, so all engine-order-sensitive arithmetic is exact
    * integer; each psi_term is then one deterministic chain of IEEE ops
    * on integer-valued inputs, rounded at 6 dp.
    *
    * Scale shape: ONE scan computes both populations' histograms (the
    * side tag is a per-row predicate feeding conditional partial aggs —
    * no second pass, no self-join); everything after the groupBy is
    * bin-count-sized (10 rows). Shuffle = 32 partial histogram rows.
    * Oracle-checked. */
  def profDrift(spark: SparkSession, dir: String): DataFrame = {
    val binned = t(spark, dir, "orders").select(
      least(floor(col("o_totalprice") / lit(DriftBinWidth)),
        lit(DriftBins - 1L)).as("bin"),
      (col("o_orderdate") < lit("1998-01-01").cast("timestamp")).as("is_base"))
    val counts = binned.groupBy(col("bin")).agg(
      sum(when(col("is_base"), 1L).otherwise(0L)).as("c_base"),
      sum(when(!col("is_base"), 1L).otherwise(0L)).as("c_cur"))
    val spine = spark.range(DriftBins).select(col("id").as("bin"))
    val wAll = Window.partitionBy() // bin-count-sized frame (10 rows)
    spine.join(counts, Seq("bin"), "left")
      .select(col("bin"),
        coalesce(col("c_base"), lit(0L)).as("n_base"),
        coalesce(col("c_cur"), lit(0L)).as("n_cur"))
      .withColumn("mp_base",
        round(lit(1000000.0) * (col("n_base") + 1) /
          (sum(col("n_base")).over(wAll) + DriftBins)).cast("long"))
      .withColumn("mp_cur",
        round(lit(1000000.0) * (col("n_cur") + 1) /
          (sum(col("n_cur")).over(wAll) + DriftBins)).cast("long"))
      .withColumn("psi_term",
        round(((col("mp_base") - col("mp_cur")).cast("double") / lit(1000000.0)) *
          log(col("mp_base").cast("double") / col("mp_cur").cast("double")), 6))
      .orderBy(col("bin"))
  }

  def profDriftOracle: String =
    s"""WITH binned AS (
       |  SELECT CAST(least(floor(o_totalprice / $DriftBinWidth),
       |                    ${DriftBins - 1}) AS BIGINT) AS bin,
       |         o_orderdate < TIMESTAMP '1998-01-01' AS is_base
       |  FROM orders
       |), counts AS (
       |  SELECT bin,
       |    CAST(sum(CASE WHEN is_base THEN 1 ELSE 0 END) AS BIGINT) AS c_base,
       |    CAST(sum(CASE WHEN NOT is_base THEN 1 ELSE 0 END) AS BIGINT) AS c_cur
       |  FROM binned GROUP BY bin
       |), spine AS (
       |  SELECT unnest(generate_series(0, ${DriftBins - 1})) AS bin
       |), filled AS (
       |  SELECT s.bin, coalesce(c.c_base, 0) AS n_base,
       |         coalesce(c.c_cur, 0) AS n_cur
       |  FROM spine s LEFT JOIN counts c USING (bin)
       |), probs AS (
       |  SELECT bin, n_base, n_cur,
       |    CAST(round(1000000.0 * (n_base + 1) /
       |         (sum(n_base) OVER () + $DriftBins)) AS BIGINT) AS mp_base,
       |    CAST(round(1000000.0 * (n_cur + 1) /
       |         (sum(n_cur) OVER () + $DriftBins)) AS BIGINT) AS mp_cur
       |  FROM filled)
       |SELECT bin, CAST(n_base AS BIGINT) AS n_base,
       |  CAST(n_cur AS BIGINT) AS n_cur, mp_base, mp_cur,
       |  round((CAST(mp_base - mp_cur AS DOUBLE) / 1000000.0) *
       |        ln(CAST(mp_base AS DOUBLE) / mp_cur), 6) AS psi_term
       |FROM probs ORDER BY bin""".stripMargin
}
