package graft

import graft.ops.{Dedup, Similarity}
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Dedup semantics on a crafted corpus with planted duplicates —
  * separate from the DuckDB-oracle checks, this pins the *set* of pairs
  * each family must find. */
class DedupSpec extends AnyFunSuite {

  /** Crafted documents table: 1/2 exact dupes, 3/4 near-dupes (one word
    * changed), 5 unrelated, 6 short unrelated. */
  private lazy val dir: String = {
    val spark = TestSpark.spark
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft-dedup-")
    val base = "the quick brown fox jumps over the lazy dog while the cat watches " * 8
    val docs = Seq(
      (1L, base, "en", "crafted", base.length.toLong),
      (2L, base, "en", "crafted", base.length.toLong),
      (3L, base + "ending one two three", "en", "crafted", (base + "ending one two three").length.toLong),
      (4L, base + "ending one two four", "en", "crafted", (base + "ending one two four").length.toLong),
      (5L, "completely different text about spark catalyst optimizer internals and shuffle exchanges in query plans", "en", "crafted", 100L),
      (6L, "unrelated short snippet", "en", "crafted", 23L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    docs.coalesce(1).write.parquet(s"$tmp/documents.parquet")
    tmp.toString
  }

  test("incremental dedup: a later run's exact dupe dies at the fp index") {
    val spark = TestSpark.spark
    val out = Dedup.ddIncremental(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // doc 2 (run 2 = 2%3) repeats doc 1's text (run 1) — only the
    // cross-run fingerprint index can drop it, the in-run window can't
    assert(out.map(_._2).toSet == Set(1L, 3L, 4L, 5L, 6L))
    // every survivor is admitted at its ORIGINAL run, never a re-crawl
    assert(out.forall { case (run, id) => run == id % 3 })
  }

  test("incremental NEAR-dup: cross-run near copies die at the signature index") {
    val spark = TestSpark.spark
    val out = Dedup.ddIncrementalNear(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    // runs by doc_id % 3 — run 0: {3, 6}, run 1: {1, 4}, run 2: {2, 5}.
    // Run 0 admits 3 and 6 (unrelated). Run 1: doc 1 is a near-dup of
    // ADMITTED doc 3 (same base text, doc 3 adds a short suffix) → the
    // index kills it, which the EXACT fingerprint index never could;
    // doc 4 likewise (near 3, and in-batch near 1). Run 2: doc 2 ==
    // doc 1's text — doc 1 was KILLED, but doc 2 is still near admitted
    // doc 3 → dies at the index, not in-batch. Doc 5 is unrelated text
    // and must survive. No re-crawl feeds exist here (no doc_id % 5 == 0
    // in a non-final run), so this pins pure natural-near-dup behavior.
    assert(out.map(_._2).toSet == Set(3L, 5L, 6L),
      s"expected survivors {3,5,6}, got $out")
    // survivors sit at their own run
    assert(out.forall { case (run, id) => run == id % 3 })
  }

  test("exact dedup groups identical texts, keeps min doc_id") {
    val spark = TestSpark.spark
    val rows = Dedup.ddExact(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(rows(1L) == 2L, "docs 1+2 are identical → one group of 2 kept at doc 1")
    assert(rows.values.count(_ == 1L) == 4)
    val kept = Dedup.ddExactDocs(spark, dir).collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 3L, 4L, 5L, 6L))
  }

  test("minhash LSH finds exact and near pairs, never unrelated ones") {
    val spark = TestSpark.spark
    val pairs = Dedup.ddMinhashLsh(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)), "exact dupes must bucket together")
    assert(pairs.contains((3L, 4L)), "one-word-changed docs must bucket together")
    assert(!pairs.exists(p => p._1 == 5L || p._2 == 5L))
    assert(!pairs.exists(p => p._1 == 6L || p._2 == 6L))
  }

  test("simhash finds near pairs within hamming 3") {
    val spark = TestSpark.spark
    val pairs = Dedup.ddSimhash(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists(p => p._1 == 6L || p._2 == 6L))
  }

  test("ngram jaccard: exact dupes score 1.0, near dupes ≥ 0.8") {
    val spark = TestSpark.spark
    val rows = Dedup.ddNgramJaccard(spark, dir).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(rows((1L, 2L)) == 1.0)
    assert(rows.get((3L, 4L)).exists(_ >= 0.8))
    assert(!rows.keySet.exists(p => p._1 == 5L || p._2 == 5L))
  }

  test("near-dup clusters: connected components collapse the pair graph") {
    val spark = TestSpark.spark
    val rep = Dedup.ddClusters(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(rep(1L) == rep(2L), "exact dupes must share a cluster")
    assert(rep(3L) == rep(4L), "near dupes must share a cluster")
    assert(rep(1L) == 1L, "representative is the component's min doc_id")
    assert(!rep.contains(5L) && !rep.contains(6L),
      "docs with no near-dup pairs are not cluster members")
  }

  test("collapse-best: argmax quality per cluster, ties to min id, singletons kept") {
    val spark = TestSpark.spark
    import spark.implicits._
    // planted labels: {1,2,3} one cluster, {4,5} another; 6 unlabeled
    val docs = Seq(1L, 2L, 3L, 4L, 5L, 6L).toDF("doc_id")
    val labels = Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 4L), (5L, 4L))
      .toDF("doc_id", "cluster_rep")
    val quality = Seq((1L, 0.2), (2L, 0.9), (3L, 0.9), (4L, 0.5), (5L, 0.5),
      (6L, 0.1)).toDF("doc_id", "quality_score")
    val out = Dedup.collapseBestFromLabels(docs, labels, quality).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getLong(3))))
      .toMap
    // cluster 1: 2 and 3 tie on quality 0.9 → min id 2 wins over the
    // min-id representative 1 (quality 0.2) — "keep best", not "keep first"
    assert(out(1L) == ((2L, 0.9, 3L)))
    assert(out(4L) == ((4L, 0.5, 2L)), "tie at equal quality → min doc_id")
    assert(out(6L) == ((6L, 0.1, 1L)), "unlabeled doc is its own singleton")
  }

  test("collapse-best end-to-end: near-dup families collapse to their best member") {
    val spark = TestSpark.spark
    val out = Dedup.ddCollapseBest(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // every cluster keeps exactly one member; crafted docs 1/2 and 3/4
    // form two families, 5 and 6 are singletons → 4 clusters
    assert(out.size == 4)
    assert(out.contains(5L) && out.contains(6L))
    val kept = out.values.toSet
    assert(kept.intersect(Set(1L, 2L)).size == 1)
    assert(kept.intersect(Set(3L, 4L)).size == 1)
  }

  test("IVF ANN: scores are exact cosines; recall overlaps brute force") {
    val spark = TestSpark.spark
    val exact = Similarity.simTopKBruteForce(spark, TestSpark.Sf0001)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val ivf = Similarity.simAnnIvf(spark, TestSpark.Sf0001).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2)))
    assert(ivf.nonEmpty)
    // per-query cap of 10 holds
    assert(ivf.groupBy(_._1._1).forall(_._2.size <= 10))
    // rescoring is exact: wherever IVF and brute force share a pair, the
    // cosine is identical
    val shared = ivf.filter(p => exact.contains(p._1))
    assert(shared.nonEmpty, "IVF found none of the true top-10 neighbors")
    assert(shared.forall { case (k, c) => math.abs(exact(k) - c) < 1e-9 })
    // recall floor vs the exact top-10: farthest-point seeding + 4 Lloyd
    // rounds keeps the 3-of-32-cell probe at 0.8+; a degraded quantizer
    // (bad init, broken assignment) cannot stay above this
    val recall = shared.size.toDouble / exact.size
    assert(recall >= 0.8,
      f"IVF recall $recall%.2f fell below the 0.8 floor (${shared.size}/${exact.size})")
  }

  test("IVF-PQ ANN: exact rescoring, per-query cap, recall floor over the refine set") {
    val spark = TestSpark.spark
    val exact = Similarity.simTopKBruteForce(spark, TestSpark.Sf0001)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val pq = Similarity.simAnnIvfPq(spark, TestSpark.Sf0001).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2)))
    assert(pq.nonEmpty)
    assert(pq.groupBy(_._1._1).forall(_._2.size <= 10))
    // the refine stage rescores with TRUE embeddings: shared pairs carry
    // identical cosines (approximate scores must never leak to output)
    val shared = pq.filter(p => exact.contains(p._1))
    assert(shared.nonEmpty, "IVF-PQ found none of the true top-10 neighbors")
    assert(shared.forall { case (k, c) => math.abs(exact(k) - c) < 1e-9 })
    // recall floor: 12-of-32-cell probe (0.8+ candidate recall, pinned by
    // the IVF test) stacked with 4-bit ADC ranking into a 100-row refine
    // set. Random 64-d fixtures are PQ's worst case — quantization noise
    // is largest relative to the near-chance neighbor gaps — so the floor
    // sits below IVF's 0.8; a broken encoder/LUT lands near 10/100 chance.
    val recall = shared.size.toDouble / exact.size
    assert(recall >= 0.5,
      f"IVF-PQ recall $recall%.2f fell below the 0.5 floor (${shared.size}/${exact.size})")
  }

  test("ANN LSH recall ≥ 0.5 of brute-force top-10 (multi-probe floor)") {
    val spark = TestSpark.spark
    val exact = Similarity.simTopKBruteForce(spark, TestSpark.Sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Similarity.simAnnLsh(spark, TestSpark.Sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty)
    // scores are exact cosines wherever LSH surfaces a true neighbor,
    // so recall of the exact top-10 pairs is the one number that matters:
    // a broken hyperplane/banding change cannot keep this above the floor
    val recall = (lsh & exact).size.toDouble / exact.size
    assert(recall >= 0.5, f"LSH recall $recall%.2f fell below the 0.5 floor " +
      s"(${(lsh & exact).size}/${exact.size} of brute-force top-10 pairs found)")
  }

  test("embedding LSH near-dup: subset of exact pairs, exact scores, recall floor") {
    val spark = TestSpark.spark
    val exact = Dedup.ddEmbedCosine(spark, TestSpark.Sf0001).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val lsh = Dedup.ddEmbedLsh(spark, TestSpark.Sf0001).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2)))
    assert(exact.nonEmpty, "fixture must contain near-dup pairs above the threshold")
    // precision 1 by construction: every emitted pair is rescored with the
    // exact cosine and the same threshold, so it must appear in the brute
    // twin with an identical score
    lsh.foreach { case (k, c) =>
      assert(exact.contains(k), s"LSH emitted a pair the exact twin lacks: $k")
      assert(math.abs(exact(k) - c) < 1e-9, s"rescored cosine differs for $k")
    }
    // recall floor: 8-bit sigs + hamming-1 probe over 8 tables ≈ 0.7+ at
    // the fixture's cos 0.4–0.5 pairs; a broken hyperplane/probe change
    // cannot stay above this
    val recall = lsh.size.toDouble / exact.size
    assert(recall >= 0.5, f"embed-LSH recall $recall%.2f fell below the 0.5 floor " +
      s"(${lsh.size}/${exact.size} exact pairs found)")
  }

  test("semantic dedup: planted duplicates collapse, kills are true pairs, deterministic") {
    val spark = TestSpark.spark
    import spark.implicits._
    // planted corpus: three exact copies of one vector, two distinct
    // orthogonal-ish vectors — copies MUST co-cluster (identical input,
    // deterministic assignment) and collapse to the lowest id
    val base = (0 until 64).map(i => if (i == 0) 1f else 0f)
    val other = (0 until 64).map(i => if (i == 1) 1f else 0f)
    val third = (0 until 64).map(i => if (i == 2) 1f else 0f)
    val planted = Seq(
      (10L, base), (11L, base), (12L, base), (20L, other), (30L, third)
    ).toDF("vec_id", "embedding")
    val survivors = Dedup.semanticSurvivors(planted).collect()
      .map(_.getLong(0)).toSet
    assert(survivors.contains(10L) && !survivors.contains(11L) &&
      !survivors.contains(12L),
      s"exact copies must collapse to the lowest id: $survivors")
    assert(survivors.contains(20L) && survivors.contains(30L),
      s"orthogonal vectors must survive: $survivors")

    // fixture corpus: every kill must be justified by a true >= 0.4 pair
    // in the brute twin (precision 1 — the quantizer only LIMITS which
    // pairs are compared, never invents similarity)
    val exactKilled = Dedup.ddEmbedCosine(spark, TestSpark.Sf0001).collect()
      .map(_.getLong(1)).toSet // id_b of every true pair
    val all = spark.read.parquet(s"${TestSpark.Sf0001}/embeddings.parquet")
      .select("vec_id").as[Long].collect().toSet
    val sem1 = Dedup.ddSemantic(spark, TestSpark.Sf0001).collect()
      .map(_.getLong(0)).toSet
    val killed = all -- sem1
    assert(killed.subsetOf(exactKilled),
      s"semantic kills must be true pairs; extra: ${killed -- exactKilled}")
    // determinism: seeding, Lloyd rounds and assignment are all
    // deterministic — a second run reproduces the survivor set exactly
    val sem2 = Dedup.ddSemantic(spark, TestSpark.Sf0001).collect()
      .map(_.getLong(0)).toSet
    assert(sem1 == sem2, "semantic dedup must be run-to-run deterministic")
  }

  test("bloom-prefiltered contamination is row-identical to the exact gate") {
    // the bloom can only err toward false POSITIVES, and the exact-confirm
    // join removes those — so the two formulations must agree exactly
    // (the oracle pins this at sf0.01; this pins it in-suite at sf0.001)
    val spark = TestSpark.spark
    val exact = Dedup.ddContamination(spark, TestSpark.Sf0001)
      .collect().map(_.toSeq).toSeq
    val bloomed = Dedup.ddContaminationBloom(spark, TestSpark.Sf0001)
      .collect().map(_.toSeq).toSeq
    assert(exact.nonEmpty, "fixture must contain contaminated documents")
    assert(bloomed == exact)
  }

  test("boilerplate strip: cross-doc repeated chunks removed, unique text intact") {
    val spark = TestSpark.spark
    import spark.implicits._
    // exactly one 10-word chunk shared by docs 1, 2 and 4 (the planted
    // "navigation bar"); everything else is unique per doc
    val boiler = (1 to 10).map(i => s"nav$i").mkString(" ")
    val docs = Seq(
      (1L, s"$boiler alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (2L, s"$boiler one two three"),
      (3L, "totally unique words that repeat nowhere else at all"),
      (4L, boiler) // all boilerplate: must survive as an empty doc, not vanish
    ).toDF("doc_id", "text")
    val out = Dedup.boilerplateOf(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(out.keySet == Set(1L, 2L, 3L, 4L), "every doc must be accounted for")
    assert(out(1L) == ((2L, 1L,
      "alpha beta gamma delta epsilon zeta eta theta iota kappa")))
    assert(out(2L) == ((2L, 1L, "one two three")),
      "tail chunk shorter than 10 words must be kept verbatim")
    assert(out(3L) == ((1L, 0L, "totally unique words that repeat nowhere else at all")),
      "a doc with no boilerplate reconstructs exactly")
    assert(out(4L) == ((1L, 1L, "")),
      "an all-boilerplate doc keeps its accounting with empty text")
  }
}
