package graft

import graft.ops.{Dedup, Profiling, Relational, Sampling}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Sampling / curation / profiling operators (round 5): determinism,
  * rate, and invariant checks the DuckDB oracle can't express (e.g.
  * "re-running produces the identical sample"). */
class CurationSpec extends AnyFunSuite {

  private val Sf001 = "/root/testdata/sf0.01"

  test("hash sample: ~10% rate, deterministic, a subset of the corpus") {
    val spark = TestSpark.spark
    val s1 = Sampling.sampHash(spark, Sf001).collect().map(_.getLong(0)).toSeq
    val s2 = Sampling.sampHash(spark, Sf001).collect().map(_.getLong(0)).toSeq
    assert(s1 == s2, "sample must be reproducible")
    val total = Relational.t(spark, Sf001, "documents").count()
    assert(s1.nonEmpty && math.abs(s1.size.toDouble / total - 0.10) < 0.05,
      s"rate ${s1.size.toDouble / total} far from 10%")
  }

  test("domain cap: no source exceeds 15 docs; capped sources keep exactly 15") {
    val spark = TestSpark.spark
    val perSource = Sampling.sampDomainCap(spark, Sf001)
      .groupBy(col("source")).agg(count(lit(1)).as("n"), max(col("rk")).as("mx"))
      .collect()
    assert(perSource.nonEmpty)
    perSource.foreach { r =>
      assert(r.getLong(1) <= 15 && r.getInt(2) <= 15, s"cap violated: $r")
    }
    // the sf0.01 fixture has 25 docs per source — every source saturates
    assert(perSource.forall(_.getLong(1) == 15))
  }

  test("stratified sample: exactly ceil(n_s/5) per stratum, deterministic") {
    val spark = TestSpark.spark
    val strata = Relational.t(spark, Sf001, "documents")
      .groupBy(col("lang"), col("source")).agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val got = Sampling.sampStratified(spark, Sf001)
      .groupBy(col("lang"), col("source")).agg(count(lit(1)).as("k"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got.keySet == strata.keySet, "every stratum must be represented")
    got.foreach { case (k, n) =>
      assert(n == (strata(k) + 4) / 5,
        s"stratum $k: got $n, want exact ceil(${strata(k)}/5)")
    }
    // determinism: the sampled ids, not just the counts, reproduce
    val ids1 = Sampling.sampStratified(spark, Sf001).collect().map(_.getLong(4)).toSeq
    val ids2 = Sampling.sampStratified(spark, Sf001).collect().map(_.getLong(4)).toSeq
    assert(ids1 == ids2)
  }

  test("shard shuffle: every shard is a decorrelated mix with dense positions") {
    val spark = TestSpark.spark
    val rows = Sampling.sampShardShuffle(spark, Sf001).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getString(3)))
    val byShard = rows.groupBy(_._1)
    assert(byShard.keySet == (0L until 8L).toSet, "all shards must be populated")
    byShard.foreach { case (s, rs) =>
      assert(rs.map(_._2).sorted.toSeq == (1 to rs.length),
        s"shard $s positions must be dense 1..n")
      assert(rs.map(_._4).distinct.length >= 3,
        s"shard $s must mix languages, not mirror an input stratum")
    }
    val again = Sampling.sampShardShuffle(spark, Sf001).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(rows.map(t => (t._1, t._2, t._3)).toSeq == again.toSeq,
      "a re-run must reproduce the identical shard layout")
  }

  test("mixture rebalance: realized mix tracks the target weights") {
    val spark = TestSpark.spark
    val mix = Sampling.sampMixture(spark, Sf001)
      .groupBy(col("lang")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = mix.values.sum.toDouble
    val targets = Map("en" -> 0.40, "de" -> 0.15, "es" -> 0.15, "fr" -> 0.15, "zh" -> 0.15)
    targets.foreach { case (lang, w) =>
      val realized = mix.getOrElse(lang, 0L) / total
      assert(math.abs(realized - w) < 0.06,
        s"$lang realized $realized vs target $w")
    }
  }

  test("SCD upsert: merged snapshot keeps one row per key, updates win") {
    val spark = TestSpark.spark
    val merged = Relational.q24ScdUpsert(spark, Sf001).collect()
    val orders = Relational.t(spark, Sf001, "orders")
    val nOrders = orders.count()
    assert(merged.map(_.getLong(1)).sum == nOrders,
      "latest-wins merge must keep exactly one row per key")
    val nUpdated = orders.filter(pmod(col("o_orderkey"), lit(7L)) === 0).count()
    val uRow = merged.find(_.getString(0) == "U").get
    assert(uRow.getLong(1) == nUpdated, "every update row must win its key")
  }

  test("range join: bands partition the full orders table") {
    val spark = TestSpark.spark
    val bands = Relational.q25RangeJoin(spark, Sf001).collect()
    val nOrders = Relational.t(spark, Sf001, "orders").count()
    assert(bands.map(_.getLong(1)).sum == nOrders,
      "half-open bands must cover each order exactly once")
  }

  test("profiling: one row per column, counts consistent") {
    val spark = TestSpark.spark
    val prof = Profiling.profNumeric(spark, Sf001).collect()
    assert(prof.length == 4)
    prof.foreach { r =>
      assert(r.getLong(1) > 0 && r.getLong(2) == 0) // n_rows > 0, no nulls in TPC-H
      assert(r.getDouble(3) <= r.getDouble(5) && r.getDouble(5) <= r.getDouble(4),
        s"min <= mean <= max violated: $r")
    }
  }

  test("WAV codec: container header round-trips duration exactly") {
    import graft.ops.Multimodal.AudioCodecWav
    Seq(1L, 501L, 1999L, 4001L).foreach { id =>
      val durMs = (500 + id % 2000).toInt
      val wav = AudioCodecWav.encodeWav(durMs * AudioCodecWav.SampleRate / 1000, id)
      assert(wav.length == 44 + durMs * 16, "RIFF container size")
      assert(AudioCodecWav.decodeDurationMs(wav) == durMs,
        s"decoded duration mismatch for id=$id")
    }
  }

  test("media features: decoded audio durations match the planted formula") {
    val spark = TestSpark.spark
    val bad = graft.ops.Multimodal.mmFeatures(spark, TestSpark.Sf0001)
      .filter(col("modality") === "audio")
      .filter(col("duration_ms") =!= (lit(500) + pmod(col("media_id"), lit(2000L))))
      .count()
    assert(bad == 0)
  }

  test("funnel: ordered stages shrink monotonically") {
    val spark = TestSpark.spark
    val stages = graft.ops.Events.evFunnel(spark, Sf001)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(stages.size == 3)
    assert(stages("1_signup") >= stages("2_view_after_signup"))
    assert(stages("2_view_after_signup") >= stages("3_click_after_view"))
    assert(stages("1_signup") > 0)
  }

  test("quantization: codes stay on the 0..255 grid (sum bound per vector)") {
    val spark = TestSpark.spark
    val rows = graft.ops.Embeddings.embQuantize(spark, Sf001).collect()
    assert(rows.length > 0)
    rows.foreach { r =>
      val sum = r.getLong(3)
      assert(sum >= 0 && sum <= 255L * 64,
        s"code_sum out of the int8 range for ${r.getLong(0)}: $sum")
      assert(r.getDouble(1) < r.getDouble(2), "calibration range must be non-degenerate")
    }
  }

  test("quantization: a constant (degenerate) vector codes to all-zeros, not NULL/NaN") {
    val spark = TestSpark.spark
    import spark.implicits._
    // real data has flat vectors (zero-padded, dead dims) — mx==mn must
    // not hit 0/0 (Spark NULL vs DuckDB NaN, engine-divergent)
    val dir = java.nio.file.Files.createTempDirectory("emb-degenerate-").toString
    Seq((1L, Array.fill(8)(0.25f)), (2L, Array.tabulate(8)(_.toFloat)))
      .toDF("vec_id", "embedding")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val byId = graft.ops.Embeddings.embQuantize(spark, dir)
      .collect().map(r => r.getLong(0) -> r).toMap
    // null check FIRST: getLong on a NULL cell would die with an opaque
    // NPE before the intended "must not produce NULL codes" message fires
    assert(!byId(1L).isNullAt(3), "degenerate range must not produce NULL codes")
    assert(byId(1L).getLong(3) == 0L, "constant vector must code to all-zeros")
    assert(byId(2L).getLong(3) > 0L)
  }

  test("contamination: flags the planted cross-source duplicates only") {
    val spark = TestSpark.spark
    val hits = Dedup.ddContamination(spark, Sf001).collect()
    assert(hits.nonEmpty, "fixture plants cross-source near-dups — must flag them")
    hits.foreach { r =>
      val frac = r.getDouble(3)
      assert(frac > 0.5 && frac <= 1.0,
        s"planted dupes share most 8-grams; got $r")
    }
    // word-soup corpus: unrelated docs share no 8-grams, so hit count is small
    assert(hits.length < 10, s"only planted dupes should hit, got ${hits.length}")
  }

  test("leakage-safe split: no near-dup cluster straddles splits; ~80/10/10") {
    val spark = TestSpark.spark
    val split = Sampling.sampSplitLeakage(spark, Sf001)
    val labels = Dedup.ddClusters(spark, Sf001) // (doc_id, cluster_rep)
    // THE guarantee: every cluster maps to exactly one split
    val straddling = split.join(labels, "doc_id")
      .groupBy(col("cluster_rep"))
      .agg(countDistinct(col("split")).as("n_splits"))
      .filter(col("n_splits") > 1)
      .count()
    assert(straddling == 0, s"$straddling clusters straddle splits — leakage")
    // every document is assigned, and the realized mix tracks 80/10/10
    val mix = split.groupBy(col("split")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = mix.values.sum
    assert(total == Relational.t(spark, Sf001, "documents").count())
    assert(math.abs(mix("train").toDouble / total - 0.8) < 0.08, s"mix $mix")
    assert(mix.getOrElse("valid", 0L) > 0 && mix.getOrElse("test", 0L) > 0,
      s"all three splits must be non-empty, got $mix")
  }

  test("drift gate: histograms cover all orders; planted late-year drift detected") {
    val spark = TestSpark.spark
    val rows = Profiling.profDrift(spark, Sf001).collect()
    assert(rows.length == 10, "one row per bin, empty bins included")
    val covered = rows.map(r => r.getLong(1) + r.getLong(2)).sum
    assert(covered == Relational.t(spark, Sf001, "orders").count(),
      "histogram sides must partition the table exactly")
    val psi = rows.map(_.getDouble(5)).sum
    assert(psi >= 0.0 && rows.forall(r => !r.getDouble(5).isNaN),
      s"PSI terms must be finite, total $psi")
  }

  test("JL projection: squared norms preserved in expectation (±1/sqrt(k) scaling)") {
    val spark = TestSpark.spark
    import spark.implicits._
    val proj = graft.ops.Embeddings.embProject(spark, Sf001)
    val yNormSq = proj.select(col("vec_id"),
        (1 until 17).map(i => col(proj.columns(i)) * col(proj.columns(i)))
          .reduce(_ + _).as("ny"))
    val xNormSq = Relational.t(spark, Sf001, "embeddings")
      .select(col("vec_id"), explode(col("embedding")).as("x"))
      .groupBy(col("vec_id"))
      .agg(sum(col("x").cast("double") * col("x").cast("double")).as("nx"))
    val ratio = yNormSq.join(xNormSq, "vec_id")
      .agg(avg(col("ny") / col("nx"))).as[Double].collect()(0)
    // E[||Px||^2] = ||x||^2 for a +/-1/sqrt(k) JL matrix; the corpus
    // average concentrates hard around 1 (deterministic fixture → exact)
    assert(math.abs(ratio - 1.0) < 0.25, s"norm ratio $ratio far from 1")
  }
}
