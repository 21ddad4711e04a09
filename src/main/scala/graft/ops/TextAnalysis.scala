package graft.ops

import graft.functions.GraftFunctions.text_fingerprint
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-analysis operators over the `documents` table (SURVEY §7.3-4):
  * token counting, quality scoring, language ID, fingerprinting. All
  * per-row, embarrassingly parallel — no shuffle except the final
  * presentation sort — so they scale linearly with input splits.
  * Everything is codegen'd builtins/HOFs except the fingerprint, which is
  * the custom codegen expression [[graft.functions.TextFingerprint]].
  */
object TextAnalysis {
  import Relational.t

  private def toks = split(col("text"), " ")

  /** Token counts + character stats (whitespace tokenization; the BPE-ish
    * regex variant is in [[txQuality]]'s word classes). Oracle-checked. */
  def txTokens(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .select(col("doc_id"),
        size(toks).as("n_tokens"),
        length(col("text")).as("len_chars"),
        round(length(regexp_replace(col("text"), " ", "")).cast("double") /
          size(toks), 4).as("avg_token_len"))
      .orderBy(col("doc_id"))

  def txTokensOracle: String =
    """SELECT doc_id,
      |  len(string_split(text, ' ')) AS n_tokens,
      |  len(text) AS len_chars,
      |  round(CAST(len(replace(text, ' ', '')) AS DOUBLE) /
      |        len(string_split(text, ' ')), 4) AS avg_token_len
      |FROM documents ORDER BY doc_id""".stripMargin

  /** BPE-ish subword-boundary pattern: letter runs, digit runs, or single
    * non-alphanumeric marks — the pre-tokenizer split a byte-pair encoder
    * sees (north-star "whitespace + a BPE-ish regex" token counting). */
  private val BpeIshPattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"

  /** Regex token counting (the BPE-ish twin of [[txTokens]]): counts
    * pre-tokenizer units rather than whitespace words. Codegen'd
    * regexp_count per row, no shuffle. Oracle-checked (the pattern has
    * identical semantics in Spark's and DuckDB's regex engines). */
  def txTokensBpe(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .select(col("doc_id"),
        regexp_count(col("text"), lit(BpeIshPattern)).as("n_bpe_tokens"),
        size(toks).as("n_ws_tokens"),
        round(regexp_count(col("text"), lit(BpeIshPattern)).cast("double") /
          size(toks), 4).as("bpe_per_word"))
      .orderBy(col("doc_id"))

  def txTokensBpeOracle: String =
    s"""SELECT doc_id,
       |  len(regexp_extract_all(text, '$BpeIshPattern')) AS n_bpe_tokens,
       |  len(string_split(text, ' ')) AS n_ws_tokens,
       |  round(CAST(len(regexp_extract_all(text, '$BpeIshPattern')) AS DOUBLE) /
       |        len(string_split(text, ' ')), 4) AS bpe_per_word
       |FROM documents ORDER BY doc_id""".stripMargin

  private val Stopwords = Seq("the", "a", "of", "and", "to", "in", "is", "it")

  /** Quality scoring: stopword ratio, short/long token ratios, length
    * score — the length/punct/stopword-ratio heuristics of a pretraining
    * quality filter. Oracle-checked (all ratios are exact integer
    * divisions rounded at 4 decimals). */
  def txQuality(spark: SparkSession, dir: String): DataFrame = {
    val nTok = size(toks).cast("double")
    val stopHits = size(filter(toks, t => t.isin(Stopwords: _*)))
    val shortToks = size(filter(toks, t => length(t) <= 2))
    t(spark, dir, "documents")
      .select(col("doc_id"), col("lang"),
        round(stopHits / nTok, 4).as("stopword_ratio"),
        round(shortToks / nTok, 4).as("short_token_ratio"),
        least(round(nTok / 100.0, 4), lit(1.0)).as("length_score"))
      .withColumn("quality_score",
        round((lit(1.0) - col("short_token_ratio")) * col("length_score"), 4))
      .orderBy(col("doc_id"))
  }

  def txQualityOracle: String = {
    val stopList = Stopwords.map(s => s"'$s'").mkString(", ")
    s"""SELECT doc_id, lang, stopword_ratio, short_token_ratio, length_score,
       |  round((1.0 - short_token_ratio) * length_score, 4) AS quality_score
       |FROM (
       |  SELECT doc_id, lang,
       |    round(CAST(len(list_filter(string_split(text, ' '),
       |      t -> t IN ($stopList))) AS DOUBLE) /
       |      len(string_split(text, ' ')), 4) AS stopword_ratio,
       |    round(CAST(len(list_filter(string_split(text, ' '),
       |      t -> len(t) <= 2)) AS DOUBLE) /
       |      len(string_split(text, ' ')), 4) AS short_token_ratio,
       |    least(round(CAST(len(string_split(text, ' ')) AS DOUBLE) / 100.0, 4), 1.0) AS length_score
       |  FROM documents) x
       |ORDER BY doc_id""".stripMargin
  }

  /** Marker-word dict for [[txLangId]] — shared with the oracle so both
    * sides score identically. */
  private val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "und", "das", "ist"),
    "en" -> Seq("the", "a", "is", "and", "of"),
    "es" -> Seq("el", "la", "de", "que", "y"),
    "fr" -> Seq("le", "la", "et", "les", "des"),
    "zh" -> Seq("de", "shi", "le", "zai", "he"))

  /** Language-ID heuristic: score each candidate language by hits against
    * a tiny per-language marker-word dict (n-gram heuristic per the north
    * star; the fixture text is synthetic word soup, so this demonstrates
    * the mechanics, not linguistics). Deterministic argmax — max (hits,
    * lang) pair, ties to the lexicographically greatest lang — which is
    * ANSI-expressible, so this is oracle-graded. */
  def txLangId(spark: SparkSession, dir: String): DataFrame = {
    val scores = LangMarkers.map { case (lang, words) =>
      struct(
        size(filter(toks, t => t.isin(words: _*))).as("hits"),
        lit(lang).as("lang"))
    }
    t(spark, dir, "documents")
      .select(col("doc_id"), col("lang").as("labeled_lang"),
        greatest(scores: _*).getField("lang").as("predicted_lang"),
        greatest(scores: _*).getField("hits").as("marker_hits"))
      .orderBy(col("doc_id"))
  }

  def txLangIdOracle: String = {
    val perLang = LangMarkers.map { case (lang, words) =>
      val list = words.map(w => s"'$w'").mkString(", ")
      s"""SELECT doc_id, '$lang' AS cand,
         |    len(list_filter(string_split(text, ' '), t -> t IN ($list))) AS hits
         |  FROM documents""".stripMargin
    }.mkString("\n  UNION ALL\n  ")
    s"""WITH per_lang AS (
       |  $perLang
       |), ranked AS (
       |  SELECT doc_id, cand, hits,
       |    row_number() OVER (PARTITION BY doc_id
       |                       ORDER BY hits DESC, cand DESC) AS rk
       |  FROM per_lang
       |)
       |SELECT d.doc_id, d.lang AS labeled_lang,
       |       r.cand AS predicted_lang,
       |       CAST(r.hits AS INTEGER) AS marker_hits
       |FROM documents d JOIN ranked r ON d.doc_id = r.doc_id AND r.rk = 1
       |ORDER BY d.doc_id""".stripMargin
  }

  /** 64-bit rolling-hash fingerprint of the normalized text (lowercase,
    * collapsed whitespace) via the custom codegen expression — the
    * scale-path dedup key (8-byte shuffle key instead of full documents).
    * Rows-only graded (hash not SQL-portable); its dedup *semantics* are
    * oracle-checked through dd_exact. */
  def txFingerprint(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .select(col("doc_id"),
        text_fingerprint(
          regexp_replace(lower(col("text")), "\\s+", " ")).as("fingerprint"),
        col("n_chars"))
      .orderBy(col("doc_id"))
}
