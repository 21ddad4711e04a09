package graft

import graft.ops.TextAnalysis
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** BPE tokenizer training (round 8): the learned merge table is checked
  * against an INDEPENDENT pure-Scala reference implementation (the
  * PackingSpec pattern — rows-only queries get a from-scratch
  * reproduction instead of a DuckDB oracle), plus a hand-checkable toy
  * corpus pinning the greedy-overlap and tie-break semantics. */
class TokenizerSpec extends AnyFunSuite {

  private val WordEnd = "</w>"

  /** From-scratch reference BPE trainer (no shared code with the Spark
    * implementation beyond the algorithm's definition). */
  private def refBpe(words: Map[String, Long], k: Int): Seq[(Int, String, String, Long)] = {
    var vocab: Seq[(Vector[String], Long)] =
      words.toSeq.map { case (w, c) => (w.map(_.toString).toVector :+ WordEnd, c) }
    val learned = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var rank = 0
    var done = k <= 0
    while (!done) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      vocab.foreach { case (syms, c) =>
        syms.sliding(2).filter(_.size == 2).foreach { p =>
          val key = (p(0), p(1))
          counts(key) = counts.getOrElse(key, 0L) + c
        }
      }
      if (counts.isEmpty) done = true
      else {
        // max freq, ties lexicographic on (left, right) — the pinned order
        val ((l, r), f) = counts.toSeq
          .sortBy { case ((a, b), n) => (-n, a, b) }.head
        if (f < 2L) done = true
        else {
          learned += ((rank, l, r, f))
          vocab = vocab.map { case (syms, c) =>
            val out = Vector.newBuilder[String]
            var i = 0
            while (i < syms.length) {
              if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
                out += l + r; i += 2
              } else { out += syms(i); i += 1 }
            }
            (out.result(), c)
          }
          rank += 1
          if (rank >= k) done = true
        }
      }
    }
    learned.toSeq
  }

  test("toy corpus: first merges are the hand-computed ones; greedy overlap") {
    val spark = TestSpark.spark
    import spark.implicits._
    // "aaaa" x3 pins greedy left-to-right: pair (a,a) counts 3 per word
    // (positions 0-1, 1-2, 2-3), merging gives "aa aa" not "aa a a"
    val docs = Seq("aaaa aaaa aaaa", "banana banana", "bandana").toDF("text")
    val got = TextAnalysis.bpeTrain(spark, docs, 3)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    // pair counts round 0: (a,a): 3 per "aaaa" x3 = 9;
    // (a,n): 2 per "banana" x2 + 2 in "bandana" = 6
    assert(got.length == 3)
    assert((got(0)._2, got(0)._3) == ("a", "a"), s"first merge should be (a,a): ${got(0)}")
    assert(got(0)._4 == 9L, s"greedy overlap counts 3 per 'aaaa': ${got(0)}")
    // round 1: "aaaa" is now [aa, aa, </w>] so (aa,aa): 3; (a,n) still 6 → (a,n) wins
    assert((got(1)._2, got(1)._3) == ("a", "n") && got(1)._4 == 6L,
      s"second merge should be (a,n) freq 6: ${got(1)}")
  }

  test("sf0.001 corpus: Spark-trained merge table equals the pure-Scala reference") {
    val spark = TestSpark.spark
    val docs = graft.ops.Relational.t(spark, TestSpark.Sf0001, "documents")
    val got = TextAnalysis.bpeTrain(spark, docs, 20)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    val hist = docs.select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = refBpe(hist, 20)
    assert(got == want,
      s"merge tables diverge: got ${got.take(5)}... want ${want.take(5)}...")
    assert(got.length == 20, s"fixture corpus supports 20 merges, got ${got.length}")
  }

  /** From-scratch tokenizer: apply `merges` to one word, greedy
    * left-to-right per merge, merges in rank order. */
  private def refTokenize(w: String, merges: Seq[(String, String)]): Int = {
    var syms: Vector[String] = w.map(_.toString).toVector :+ WordEnd
    merges.foreach { case (l, r) =>
      val out = Vector.newBuilder[String]
      var i = 0
      while (i < syms.length) {
        if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
          out += (l + r); i += 2
        } else { out += syms(i); i += 1 }
      }
      syms = out.result()
    }
    syms.length
  }

  test("learned-merge tokenization: per-doc subword counts equal the reference corpus-wide") {
    val spark = TestSpark.spark
    val docs = graft.ops.Relational.t(spark, TestSpark.Sf0001, "documents")
    // independent path: reference-train the merge table on the word
    // histogram, then reference-tokenize every document driver-side
    val hist = docs.select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val merges = refBpe(hist, TextAnalysis.BpeTrainMerges).map(m => (m._2, m._3))
    val expected = docs.select(col("doc_id"), col("text")).collect().map { r =>
      val words = r.getString(1).split(" ").filter(_.nonEmpty)
      r.getLong(0) -> ((words.map(refTokenize(_, merges)).map(_.toLong).sum,
        words.length.toLong))
    }.toMap
    // distributed path: the graded op
    val got = TextAnalysis.txTokenizeBpeLearned(spark, TestSpark.Sf0001)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got.keySet == expected.keySet, "per-doc coverage must be total")
    assert(got == expected,
      "distributed learned-merge tokenization must equal the pure-Scala reference")
    // the merges actually compress: fewer subwords than characters
    val anyDoc = docs.select(col("doc_id"), col("text")).head()
    assert(got(anyDoc.getLong(0))._1 <
      anyDoc.getString(1).replace(" ", "").length + anyDoc.getString(1).split(" ").count(_.nonEmpty))
  }
}
