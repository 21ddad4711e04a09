package graft

import graft.table.{AggCol, DerivedAggregate, SnapshotLog}
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Incrementally-maintained rollup contract: derived state equals a
  * full recompute after every fold, refresh is exactly-once under
  * replay, physical rewrites contribute nothing, row-removing base
  * commits refuse with fullRefresh as the resync. */
class DerivedAggregateSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def fresh(): (SnapshotLog, SnapshotLog, DerivedAggregate) = {
    val tmp = Files.createTempDirectory("graft-mv-")
    val base = SnapshotLog(spark, tmp.resolve("base").toString)
    val derived = SnapshotLog(spark, tmp.resolve("mv").toString)
    val mv = new DerivedAggregate(base, derived, "k", Seq(
      AggCol("n", "count"),
      AggCol("total", "sum", "v"),
      AggCol("lo", "min", "v"),
      AggCol("hi", "max", "v")))
    (base, derived, mv)
  }

  private def stateOf(derived: SnapshotLog): Seq[(String, Long, Long, Long, Long)] =
    derived.read().select("k", "n", "total", "lo", "hi")
      .as[(String, Long, Long, Long, Long)].collect().toSeq.sorted

  private def recompute(base: SnapshotLog): Seq[(String, Long, Long, Long, Long)] = {
    import org.apache.spark.sql.functions._
    base.read().groupBy("k")
      .agg(count(lit(1)).as("n"), sum("v").as("total"),
        min("v").as("lo"), max("v").as("hi"))
      .as[(String, Long, Long, Long, Long)].collect().toSeq.sorted
  }

  test("each refresh folds only the delta, state always equals a full recompute") {
    val (base, derived, mv) = fresh()
    base.append(Seq(("a", 1L), ("a", 3L), ("b", 10L)).toDF("k", "v"))
    assert(mv.refresh().isDefined)
    assert(stateOf(derived) == recompute(base))
    assert(mv.appliedVersion() == 1)

    // second fold: existing keys update, a new key inserts
    base.append(Seq(("a", 5L), ("c", -2L)).toDF("k", "v"))
    val s2 = mv.refresh()
    assert(s2.isDefined && s2.get.op == "merge")
    assert(stateOf(derived) == recompute(base))
    assert(stateOf(derived) ==
      Seq(("a", 3L, 9L, 1L, 5L), ("b", 1L, 10L, 10L, 10L), ("c", 1L, -2L, -2L, -2L)))

    // already current: nothing to apply
    assert(mv.refresh().isEmpty)
  }

  test("refresh is exactly-once: the watermark rides the merge commit itself") {
    val (base, derived, mv) = fresh()
    base.append(Seq(("a", 1L)).toDF("k", "v"))
    mv.refresh()
    base.append(Seq(("a", 2L)).toDF("k", "v"))
    mv.refresh()
    // a crashed-and-rerun refresher (or a second racing one) replays the
    // same base version: detected inside the commit path, applies nothing
    val twin = new DerivedAggregate(base, derived, "k",
      Seq(AggCol("n", "count"), AggCol("total", "sum", "v"),
        AggCol("lo", "min", "v"), AggCol("hi", "max", "v")))
    assert(twin.refresh().isEmpty, "replayed fold must be skipped")
    assert(stateOf(derived) == Seq(("a", 2L, 3L, 1L, 2L)),
      "a double-applied fold would double the count")
  }

  test("physical rewrites contribute nothing; a rewrite-only tail is a no-op") {
    val (base, derived, mv) = fresh()
    base.append(Seq(("a", 1L), ("b", 2L)).toDF("k", "v").repartition(2))
    mv.refresh()
    base.rewrite("compact")(_.coalesce(1))
    assert(mv.refresh().isEmpty, "compaction must not look like new data")
    assert(stateOf(derived) == recompute(base))
    // appends past the compaction still fold
    base.append(Seq(("b", 8L)).toDF("k", "v"))
    assert(mv.refresh().isDefined)
    assert(stateOf(derived) == recompute(base))
  }

  test("row-removing base commit refuses refresh; fullRefresh resyncs exactly") {
    val (base, derived, mv) = fresh()
    base.append(Seq(("a", 1L), ("a", 3L), ("b", 10L)).toDF("k", "v"))
    mv.refresh()
    base.deleteBetween("v", 10L, 10L) // drops every 'b' row
    val ex = intercept[IllegalStateException] { mv.refresh() }
    assert(ex.getMessage.contains("fullRefresh"))
    val s = mv.fullRefresh()
    assert(stateOf(derived) == recompute(base),
      "resync must rebuild the exact aggregate")
    assert(stateOf(derived) == Seq(("a", 2L, 4L, 1L, 3L)),
      "the vanished key must leave the derived table")
    assert(mv.appliedVersion() == base.currentVersion())
    // and incremental refresh resumes from the resync point
    base.append(Seq(("a", 10L)).toDF("k", "v"))
    assert(mv.refresh().isDefined)
    assert(stateOf(derived) == recompute(base))
    val _ = s
  }

  // ---- row-level CDC folds (changeFeed-enabled base) -----------------

  private def freshCdc(aggs: Seq[AggCol])
      : (SnapshotLog, SnapshotLog, DerivedAggregate) = {
    val tmp = Files.createTempDirectory("graft-mv-cdc-")
    val base = SnapshotLog.withChangeFeed(spark, tmp.resolve("base").toString,
      statsColumns = Seq("k", "v"))
    val derived = SnapshotLog(spark, tmp.resolve("mv").toString)
    (base, derived, new DerivedAggregate(base, derived, "k", aggs))
  }

  test("algebraic CDC fold: count/sum subtract deletes, zero-count keys vanish, no base read") {
    val (base, derived, mv) = freshCdc(Seq(
      AggCol("n", "count"), AggCol("total", "sum", "v")))
    base.append(Seq(("a", 1L), ("a", 3L), ("b", 10L), ("b", 20L)).toDF("k", "v"))
    mv.refresh()
    // one span mixing an append, a CoW delete and a MoR key delete
    base.append(Seq(("a", 5L), ("c", 7L)).toDF("k", "v"))
    base.deleteBetween("v", 10L, 20L)          // kills BOTH 'b' rows
    base.deleteKeys("v", Seq(3L).toDF("v"))    // kills one 'a' row
    assert(mv.refresh().isDefined)
    def st = derived.read().select("k", "n", "total")
      .as[(String, Long, Long)].collect().toSeq.sorted
    assert(st == Seq(("a", 2L, 6L), ("c", 1L, 7L)),
      "deletes must subtract and the vanished key must drop")
    assert(st == base.read().groupBy("k")
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("n"),
        org.apache.spark.sql.functions.sum("v").as("total"))
      .as[(String, Long, Long)].collect().toSeq.sorted)
    // replay the same fold: watermark makes it a no-op
    assert(mv.refresh().isEmpty && st == Seq(("a", 2L, 6L), ("c", 1L, 7L)))
  }

  test("min/max CDC fold recomputes only touched keys; untouched keys keep stored state") {
    val (base, derived, mv) = freshCdc(Seq(
      AggCol("n", "count"), AggCol("lo", "min", "v"), AggCol("hi", "max", "v")))
    base.append(Seq(("a", 1L), ("a", 9L), ("b", 5L), ("keep", 42L))
      .toDF("k", "v"))
    mv.refresh()
    base.deleteBetween("v", 9L, 9L)  // removes 'a''s maximum
    base.deleteKeys("v", Seq(5L).toDF("v"))  // kills every 'b' row
    assert(mv.refresh().isDefined)
    val st = derived.read().select("k", "n", "lo", "hi")
      .as[(String, Long, Long, Long)].collect().toSeq.sorted
    assert(st == Seq(("a", 1L, 1L, 1L), ("keep", 1L, 42L, 42L)),
      "the deleted extremum must be replaced from a recompute of the " +
        "touched key, and the emptied key must drop")
  }

  test("approx_distinct folds by HLL union; estimate matches exact distinct at test scale") {
    val (base, derived, mv) = freshCdc(Seq(
      AggCol("n", "count"), AggCol("users", "approx_distinct", "v")))
    // three folds with overlapping value sets: union must dedup across
    // folds, not just within one
    base.append(Seq(("a", 1L), ("a", 2L), ("b", 1L)).toDF("k", "v")); mv.refresh()
    base.append(Seq(("a", 2L), ("a", 3L), ("b", 9L)).toDF("k", "v")); mv.refresh()
    base.append(Seq(("a", 1L), ("b", 9L)).toDF("k", "v")); mv.refresh()
    import org.apache.spark.sql.functions.hll_sketch_estimate
    val st = derived.read()
      .select(col("k"), col("n"), hll_sketch_estimate(col("users")).as("users"))
      .as[(String, Long, Long)].collect().toSeq.sorted
    assert(st == Seq(("a", 5L, 3L), ("b", 3L, 2L)),
      "the merged sketch must estimate the exact distinct count here")
    // and the fold equals a recompute's sketch estimate, state-for-state
    val full = base.read().groupBy("k")
      .agg(org.apache.spark.sql.functions.hll_sketch_agg(col("v")).as("users"))
      .select(col("k"), hll_sketch_estimate(col("users")).as("users"))
      .as[(String, Long)].collect().toSeq.sorted
    assert(st.map(t => (t._1, t._3)) == full)
  }

  test("approx_median folds by KLL merge; the estimate ranks at the true median") {
    val (base, derived, mv) = freshCdc(Seq(
      AggCol("n", "count"), AggCol("p50", "approx_median", "v")))
    // three folds, per-key values 1..300 interleaved across folds so
    // every graded sketch is a genuine 3-way merge
    (0 until 3).foreach { slice =>
      base.append((1 to 300).filter(_ % 3 == slice)
        .flatMap(i => Seq(("a", i.toLong), ("b", (i * 2).toLong)))
        .toDF("k", "v"))
      mv.refresh()
    }
    val est = AggCol("p50", "approx_median", "v").estimate
    val st = derived.read().select(col("k"), est)
      .as[(String, Double)].collect().toMap
    // rank pin: where does the estimate fall in the EXACT distribution?
    // KLL's merged rank error at k=200 is ~2%; ±0.06 is a hard floor
    Seq("a" -> (1 to 300).map(_.toDouble),
      "b" -> (1 to 300).map(_ * 2.0)).foreach { case (k, exact) =>
      val rank = exact.count(_ <= st(k)).toDouble / exact.size
      assert(rank > 0.44 && rank < 0.56,
        s"key $k: estimate ${st(k)} ranks at $rank, not ~0.5")
    }
  }

  test("null group keys are excluded, matching the indexable-rollup contract") {
    val (base, derived, mv) = fresh()
    base.append(Seq((Option("a"), 1L), (Option.empty[String], 9L))
      .toDF("k", "v"))
    mv.refresh()
    assert(stateOf(derived) == Seq(("a", 1L, 1L, 1L, 1L)))
  }

  test("non-decomposable aggregates are rejected at construction") {
    intercept[IllegalArgumentException] { AggCol("d", "count_distinct", "v") }
    intercept[IllegalArgumentException] { AggCol("a", "avg", "v") }
  }
}
