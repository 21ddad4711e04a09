package graft.ops

import graft.functions.GraftFunctions.{cosine_similarity, text_fingerprint}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication family over the `documents` table (SURVEY §7.3-4).
  *
  * Scale design (the 100 TB contract for each):
  *  - exact: group on an 8-byte fingerprint, never on the document text —
  *    the shuffle moves (fingerprint, doc_id), not documents.
  *  - minhash/LSH: candidate generation is a bucket join (band hash →
  *    shuffle on band key), never an all-pairs product. All-pairs appears
  *    nowhere in this file except inside LSH buckets / shared-shingle
  *    groups, whose sizes are bounded by the banding parameters.
  *  - simhash: 4×16-bit chunk banding (pigeonhole: hamming ≤ 3 ⇒ some
  *    chunk equal), so near-dup search is again a bucket join.
  *  - n-gram jaccard: shingle-inverted-index join (explode → join on
  *    shingle → per-pair intersection counts); hot shingles are the skew
  *    risk — bounded here by distinct-per-doc + the fixed shingle alphabet.
  *  - embedding cosine: brute-force pair join is the *correctness* path;
  *    [[Similarity.simAnnLsh]] is the scale path.
  */
object Dedup {
  import Relational.t

  /** Exact dedup: one representative (min doc_id) per distinct text.
    * Groups on the codegen'd 64-bit [[graft.functions.TextFingerprint]] —
    * at 100 TB the shuffle key is 8 bytes/doc. The full text rides along
    * only to pick the representative; a production variant would shuffle
    * (fingerprint, doc_id) alone and re-join. Oracle groups by text —
    * equivalent unless fingerprints collide (2^-64·n² chance). */
  def ddExact(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .groupBy(text_fingerprint(col("text")).as("fp"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
      .select(col("keep_id"), col("n_copies"))
      .orderBy(col("keep_id"))

  def ddExactOracle: String =
    """SELECT min(doc_id) AS keep_id, count(*) AS n_copies
      |FROM documents GROUP BY text ORDER BY keep_id""".stripMargin

  /** The deduplicated corpus itself (keep lowest doc_id per text) —
    * window row_number formulation. */
  def ddExactDocs(spark: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("fp")).orderBy(col("doc_id").asc)
    t(spark, dir, "documents")
      .withColumn("fp", text_fingerprint(col("text")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
      .orderBy(col("doc_id"))
  }

  def ddExactDocsOracle: String =
    """SELECT doc_id, lang, source, n_chars FROM (
      |  SELECT doc_id, lang, source, n_chars,
      |         row_number() OVER (PARTITION BY text ORDER BY doc_id ASC) AS rn
      |  FROM documents) x
      |WHERE rn = 1 ORDER BY doc_id""".stripMargin

  /** Character 5-gram shingle set per document, distinct, exploded.
    * Shared shingle-generation for jaccard + minhash. */
  private def shingled(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .select(col("doc_id"),
        explode(array_distinct(transform(
          sequence(lit(1), greatest(length(col("text")) - 4, lit(0))),
          i => col("text").substr(i, lit(5))))).as("g"))

  /** Exact n-gram Jaccard near-dup pairs (threshold 0.8) via the
    * inverted-index join: explode distinct shingles, self-join on the
    * shingle, count per-pair intersections, |A∪B| = |A|+|B|−|A∩B|.
    * The only shuffles are on shingle (join) and pair (count) keys. */
  def ddNgramJaccard(spark: SparkSession, dir: String): DataFrame = {
    val sh = shingled(spark, dir).cache()
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("sz"))
    val inter = sh.as("a")
      .join(sh.as("b"), col("a.g") === col("b.g") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .agg(count(lit(1)).as("inter"))
    val pairs = inter
      .join(sizes.as("sa"), col("id_a") === col("sa.doc_id"))
      .join(sizes.as("sb"), col("id_b") === col("sb.doc_id"))
      .withColumn("jaccard",
        round(col("inter").cast("double") /
          (col("sa.sz") + col("sb.sz") - col("inter")), 4))
      .filter(col("jaccard") >= 0.8)
      .select(col("id_a"), col("id_b"), col("jaccard"))
      .orderBy(col("id_a"), col("id_b"))
    pairs
  }

  def ddNgramJaccardOracle: String =
    """WITH sh AS (
      |  SELECT DISTINCT doc_id, substr(text, CAST(i AS INTEGER), 5) AS g
      |  FROM documents, generate_series(1, greatest(len(text) - 4, 0)) AS t(i)
      |), sizes AS (
      |  SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id
      |), inter AS (
      |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
      |  FROM sh a JOIN sh b ON a.g = b.g AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2
      |)
      |SELECT id_a, id_b,
      |       round(CAST(inter AS DOUBLE) / (sa.sz + sb.sz - inter), 4) AS jaccard
      |FROM inter
      |JOIN sizes sa ON sa.doc_id = id_a
      |JOIN sizes sb ON sb.doc_id = id_b
      |WHERE round(CAST(inter AS DOUBLE) / (sa.sz + sb.sz - inter), 4) >= 0.8
      |ORDER BY id_a, id_b""".stripMargin

  /** MinHash signature params: 64 hash functions, 16 bands × 4 rows.
    * With jaccard threshold ~0.8 the S-curve gives hit probability
    * 1-(1-s^4)^16 ≈ 0.9998 at s=0.8. Hash family: h_p(x) =
    * (A_p·xxhash64(g) + p) mod (2^61-1), A_p odd-multiplier-derived —
    * deterministic across runs (no Math.random, SURVEY §7.5). */
  private val NumHashes = 64
  private val Bands = 16
  private val RowsPerBand = NumHashes / Bands
  private val Prime = (1L << 61) - 1

  /** doc_id → minhash signature (array<bigint> of length 64), computed
    * entirely with codegen'd higher-order functions (no UDF): one
    * aggregate() min-fold per hash function over the shingle-hash array. */
  private def signatures(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .select(col("doc_id"),
        array_distinct(transform(
          sequence(lit(1), greatest(length(col("text")) - 4, lit(0))),
          i => xxhash64(col("text").substr(i, lit(5))))).as("hs"))
      .select(col("doc_id"),
        transform(sequence(lit(0), lit(NumHashes - 1)), p => {
          val mult = p.cast("long") * lit(-7046029254386353131L) + lit(1L)
          aggregate(col("hs"), lit(Long.MaxValue),
            (m, h) => least(m, pmod(mult * h + p.cast("long"), lit(Prime))))
        }).as("sig"))

  /** MinHash + LSH candidate near-dup pairs with signature-estimated
    * jaccard ≥ 0.5. Bands explode to (band, bandHash) bucket keys; the
    * self-join is on buckets, so cost is Σ bucket² not n². Rows-only
    * graded (hash family isn't SQL-portable). */
  def ddMinhashLsh(spark: SparkSession, dir: String): DataFrame = {
    val sig = signatures(spark, dir).cache()
    val buckets = sig.select(col("doc_id"),
      explode(transform(sequence(lit(0), lit(Bands - 1)),
        b => struct(b.as("band"),
          xxhash64(concat_ws("_",
            slice(col("sig"), b * RowsPerBand + lit(1), lit(RowsPerBand))).cast("string")).as("bh")))).as("bb"))
      .select(col("doc_id"), col("bb.band"), col("bb.bh"))
    val cand = buckets.as("a")
      .join(buckets.as("b"),
        col("a.band") === col("b.band") && col("a.bh") === col("b.bh") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .distinct()
    cand
      .join(sig.select(col("doc_id").as("id_a"), col("sig").as("sig_a")), "id_a")
      .join(sig.select(col("doc_id").as("id_b"), col("sig").as("sig_b")), "id_b")
      .withColumn("est_jaccard",
        round(aggregate(zip_with(col("sig_a"), col("sig_b"),
          (x, y) => when(x === y, 1).otherwise(0)),
          lit(0), (acc, v) => acc + v).cast("double") / NumHashes, 4))
      .filter(col("est_jaccard") >= 0.5)
      .select(col("id_a"), col("id_b"), col("est_jaccard"))
      .orderBy(col("id_a"), col("id_b"))
  }

  /** 64-bit SimHash per document over whitespace tokens: per-bit ±1 votes
    * weighted by token hash bits, folded with zip_with — all codegen'd
    * builtins (SQL lambda form because shiftright needs a dynamic shift).
    */
  private def simhashed(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents").select(col("doc_id"),
      expr(
        """aggregate(
          |  sequence(0, 63),
          |  cast(0 as bigint),
          |  (fp, i) -> fp | (cast(
          |      case when aggregate(split(text, ' '),
          |                 0,
          |                 (acc, t) -> acc + case when (shiftright(xxhash64(t), i) & 1) = 1
          |                                   then 1 else -1 end) > 0
          |      then 1 else 0 end as bigint) << i))""".stripMargin).as("simhash"))

  /** SimHash near-dup pairs (hamming distance ≤ 3) via 4×16-bit chunk
    * banding: dist ≤ 3 over 4 chunks ⇒ at least one chunk identical, so
    * candidates come from a bucket join on (chunk index, chunk value);
    * hamming is then bit_count(xor). Rows-only graded. */
  def ddSimhash(spark: SparkSession, dir: String): DataFrame = {
    val sh = simhashed(spark, dir).cache()
    // dynamic shift amounts need the SQL lambda form:
    val banded = sh.selectExpr("doc_id", "simhash",
      "explode(transform(sequence(0, 3), c -> struct(c as c, (shiftright(simhash, c * 16) & 65535) as chunk))) as x")
      .select(col("doc_id"), col("simhash"), col("x.c"), col("x.chunk"))
    banded.as("a")
      .join(banded.as("b"),
        col("a.c") === col("b.c") && col("a.chunk") === col("b.chunk") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"),
        bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= 3)
      .orderBy(col("id_a"), col("id_b"))
  }

  /** Embedding near-dup pairs: cosine ≥ 0.4 (calibrated to the fixture
    * distribution — max pair cosine ≈ 0.51). Brute-force pair join through
    * the codegen'd [[graft.functions.CosineSimilarity]]; this is the
    * correctness baseline, the LSH-bucketed scale path is
    * [[Similarity.simAnnLsh]]. Oracle: DuckDB list_cosine_similarity on
    * double-cast lists (both engines then do sequential double math). */
  def ddEmbedCosine(spark: SparkSession, dir: String): DataFrame = {
    val e = t(spark, dir, "embeddings").select(col("vec_id"), col("embedding"))
    e.as("a").join(e.as("b"), col("a.vec_id") < col("b.vec_id"))
      .withColumn("cos",
        round(cosine_similarity(col("a.embedding"), col("b.embedding")), 6))
      .filter(col("cos") >= 0.4)
      .select(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"), col("cos"))
      .orderBy(col("id_a"), col("id_b"))
  }

  def ddEmbedCosineOracle: String =
    """SELECT a.vec_id AS id_a, b.vec_id AS id_b,
      |  round(list_cosine_similarity(
      |    list_transform(a.embedding, x -> CAST(x AS DOUBLE)),
      |    list_transform(b.embedding, x -> CAST(x AS DOUBLE))), 6) AS cos
      |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
      |WHERE round(list_cosine_similarity(
      |    list_transform(a.embedding, x -> CAST(x AS DOUBLE)),
      |    list_transform(b.embedding, x -> CAST(x AS DOUBLE))), 6) >= 0.4
      |ORDER BY id_a, id_b""".stripMargin
}
