package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Embedding-column operators beyond similarity search (SURVEY §7.3-4
  * north star): per-group centroid statistics and int8 scalar
  * quantization — the storage/efficiency half of an embedding pipeline
  * (the retrieval half lives in [[Similarity]]).
  *
  * Cross-engine determinism: element means and quantization codes are
  * computed on `floor`-quantized integer grids rather than raw float
  * accumulation. Summing doubles is partition-order-dependent (Spark's
  * partial aggregates visit rows in shuffle order, DuckDB sequentially),
  * so a "same numbers, different order" run can differ in the last ulp;
  * flooring each element onto an integer grid first makes every sum an
  * exact BIGINT and the whole result bit-stable on BOTH engines. The
  * float→double widening cast is exact, and the shared double expression
  * trees evaluate identically.
  */
object Embeddings {
  import Relational.t

  /** Per-label element-wise centroid of the embeddings, on a 1e-6 grid:
    * the "what does each class center look like" aggregate (and the
    * batch shape of k-means' assignment-update step — the production
    * path with typed state is [[graft.functions.VectorCentroid]], which
    * DedupSpec exercises; this query is its oracle-checkable twin).
    *
    * Shape at 100 TB: posexplode fans each vector into (label, pos, x)
    * rows — all codegen'd — and ONE hash aggregate keyed (label, pos)
    * with map-side partial sums carries k·dim rows per partition into
    * the shuffle, never the vectors. Oracle-checked. */
  def embLabelCentroids(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "embeddings")
      .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "x")))
      .select(col("label"), col("pos"),
        floor(col("x").cast("double") * lit(1000000.0)).cast("long").as("q"))
      .groupBy(col("label"), col("pos"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("q")).cast("double") / count(lit(1)) / 1000000.0, 4)
          .as("centroid_q"))
      .orderBy(col("label"), col("pos"))

  def embLabelCentroidsOracle: String =
    """WITH e AS (
      |  SELECT label,
      |         generate_subscripts(embedding, 1) - 1 AS pos,
      |         CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000000.0) AS BIGINT) AS q
      |  FROM embeddings
      |)
      |SELECT label, pos, count(*) AS n,
      |       round(CAST(sum(q) AS DOUBLE) / count(*) / 1000000.0, 4) AS centroid_q
      |FROM e GROUP BY label, pos
      |ORDER BY label, pos""".stripMargin

  /** Int8 scalar quantization summary per vector: min/max calibration
    * range and the exact sum of the 0..255 codes — the compression step
    * that shrinks a float32 embedding store 4× before ANN probing (codes
    * verify the whole quantization arithmetic; a real pipeline would
    * materialize the code array itself alongside).
    *
    * Shape at 100 TB: one posexplode, ONE shuffle on vec_id; min/max
    * come from a window over the same partitioning the aggregate uses,
    * so Spark reuses the exchange. Per-vector state is 3 scalars.
    * `floor` (not `round`) for the grid: floor has no tie-breaking
    * semantics to disagree on across engines. Oracle-checked. */
  def embQuantize(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("vec_id"))
    t(spark, dir, "embeddings")
      .select(col("vec_id"), posexplode(col("embedding")).as(Seq("pos", "xf")))
      .select(col("vec_id"), col("xf").cast("double").as("x"))
      .withColumn("mn", min(col("x")).over(w))
      .withColumn("mx", max(col("x")).over(w))
      // degenerate (constant) vector: mx==mn would be 0/0 — Spark NULL vs
      // DuckDB NaN, engine-divergent. All codes collapse to 0 by definition.
      .withColumn("code",
        when(col("mx") === col("mn"), lit(0L))
          .otherwise(floor((col("x") - col("mn")) * lit(255.0) / (col("mx") - col("mn")))
            .cast("long")))
      .groupBy(col("vec_id"))
      .agg(round(min(col("mn")), 6).as("cal_min"),
        round(min(col("mx")), 6).as("cal_max"),
        sum(col("code")).as("code_sum"))
      .orderBy(col("vec_id"))
  }

  def embQuantizeOracle: String =
    """WITH e AS (
      |  SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS x FROM embeddings
      |), s AS (
      |  SELECT vec_id, x,
      |         min(x) OVER (PARTITION BY vec_id) AS mn,
      |         max(x) OVER (PARTITION BY vec_id) AS mx
      |  FROM e
      |)
      |SELECT vec_id, round(min(mn), 6) AS cal_min, round(min(mx), 6) AS cal_max,
      |       CAST(sum(CASE WHEN mx = mn THEN 0
      |                     ELSE CAST(floor((x - mn) * 255.0 / (mx - mn)) AS BIGINT)
      |                END) AS BIGINT) AS code_sum
      |FROM s GROUP BY vec_id
      |ORDER BY vec_id""".stripMargin

  /** Output dimensionality of [[embProject]] and the two mixing primes
    * behind its deterministic ±1 sign matrix. */
  private val ProjDims = 16
  private val SignP1 = 7919L
  private val SignP2 = 104729L

  /** Sign of projection-matrix cell (pos, j): a balanced deterministic
    * pseudo-random ±1 from `(pos·7919 + j·104729) mod 97 < 48`. Products
    * stay below ~7M — ANSI-safe, and evaluable bit-identically as BIGINT
    * arithmetic on both engines (the production matrix would hash with
    * xxhash64, Spark-only). */
  private def signedQ(j: Int) =
    when(pmod(col("pos") * lit(SignP1) + lit(j * SignP2), lit(97L)) < 48,
      col("q")).otherwise(-col("q"))

  /** Johnson–Lindenstrauss random projection 64→16 dims with a ±1
    * (Achlioptas) sign matrix: the dimensionality-reduction step that
    * makes downstream ANN/clustering 4× cheaper while approximately
    * preserving pairwise distances (JL lemma; ±1 entries per Achlioptas
    * 2003, "Database-friendly random projections"). The matrix is never
    * materialized — each cell's sign is a pure function of (pos, j), so
    * the projection is embarrassingly parallel and reproducible
    * run-over-run.
    *
    * Cross-engine float discipline (the module's floor-grid trick):
    * elements quantize to 1e-6-grid BIGINTs first, each output dim is an
    * exact ±integer sum (order-independent), and the single float op per
    * cell is the final `/(1e6·√16)` + round.
    *
    * Shape at 100 TB: one codegen'd posexplode and ONE hash aggregate
    * keyed vec_id whose 16 conditional-sum columns partial-aggregate
    * map-side — the shuffle carries 16 longs per vector per partition,
    * 4× less than the input vectors; no window, no join, no second pass.
    * Oracle-checked. */
  def embProject(spark: SparkSession, dir: String): DataFrame = {
    val aggs = (0 until ProjDims).map { j =>
      round(sum(signedQ(j)).cast("double") / lit(1000000.0 * math.sqrt(ProjDims)), 4)
        .as(f"y$j%02d")
    }
    t(spark, dir, "embeddings")
      .select(col("vec_id"), posexplode(col("embedding")).as(Seq("pos", "x")))
      .select(col("vec_id"), col("pos"),
        floor(col("x").cast("double") * lit(1000000.0)).cast("long").as("q"))
      .groupBy(col("vec_id"))
      .agg(aggs.head, aggs.tail: _*)
      .orderBy(col("vec_id"))
  }

  /** Upper-triangle Gram matrix of the embedding corpus: G(i,j) =
    * Σ_vec v[i]·v[j] — the one aggregate PCA whitening, covariance
    * estimation, and low-rank analysis all start from (center with the
    * [[embLabelCentroids]]-style mean vector to get covariance). dim=64
    * → 2080 output cells regardless of corpus size.
    *
    * Cross-engine float discipline: elements quantize to the 1e-6 grid,
    * each cell sums exact BIGINT products (|q|≤1e6 ⇒ |q·q|≤1e12 — a
    * corpus of ~10⁶ vectors stays inside BIGINT; past that, scale the
    * grid or sum DECIMAL(38,0)), one final /1e12 + round.
    *
    * Shape at 100 TB: the dim² fan-out happens INSIDE the scan stage
    * (two chained codegen'd generators + a pushed j≥i filter — CPU
    * amplification, zero I/O amplification), and the ONE hash aggregate
    * keyed (i,j) partial-aggregates map-side, so the shuffle carries at
    * most 2080 rows per partition — corpus size never crosses the
    * exchange. The typed-Aggregator alternative (a dim×dim buffer per
    * partition, à la [[graft.functions.VectorCentroid]]) trades the
    * fan-out for kryo buffers; the explode form stays whole-stage
    * codegen'd end to end. Oracle-checked. */
  def embGram(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "embeddings")
      .select(col("vec_id"), posexplode(col("embedding")).as(Seq("i", "xi")),
        col("embedding"))
      .select(col("vec_id"), col("i"),
        floor(col("xi").cast("double") * lit(1000000.0)).cast("long").as("qi"),
        posexplode(col("embedding")).as(Seq("j", "xj")))
      .where(col("j") >= col("i"))
      .select(col("i"), col("j"),
        (col("qi") * floor(col("xj").cast("double") * lit(1000000.0)).cast("long"))
          .as("p"))
      .groupBy(col("i"), col("j"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("p")).cast("double") / lit(1.0e12), 6).as("gram"))
      .orderBy(col("i"), col("j"))

  def embGramOracle: String =
    """WITH e AS (
      |  SELECT vec_id,
      |         generate_subscripts(embedding, 1) - 1 AS i,
      |         CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000000.0) AS BIGINT) AS q
      |  FROM embeddings
      |)
      |SELECT a.i AS i, b.i AS j, count(*) AS n,
      |       round(CAST(sum(a.q * b.q) AS DOUBLE) / 1e12, 6) AS gram
      |FROM e a JOIN e b ON a.vec_id = b.vec_id AND b.i >= a.i
      |GROUP BY 1, 2
      |ORDER BY i, j""".stripMargin

  def embProjectOracle: String = {
    val dims = (0 until ProjDims).map { j =>
      s"""  round(CAST(sum(CASE WHEN (pos * $SignP1 + ${j * SignP2}) % 97 < 48
         |    THEN q ELSE -q END) AS DOUBLE) / ${1000000.0 * math.sqrt(ProjDims)}, 4)
         |    AS y${"%02d".format(j)}""".stripMargin
    }.mkString(",\n")
    s"""WITH e AS (
       |  SELECT vec_id,
       |         generate_subscripts(embedding, 1) - 1 AS pos,
       |         CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000000.0) AS BIGINT) AS q
       |  FROM embeddings
       |)
       |SELECT vec_id,
       |$dims
       |FROM e GROUP BY vec_id
       |ORDER BY vec_id""".stripMargin
  }
}
