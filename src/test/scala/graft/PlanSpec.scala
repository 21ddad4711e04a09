package graft

import graft.ops.{Relational, Similarity}
import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan property assertions: the scale contract of each operator
  * family, pinned as regression tests. A refactor that silently drops a
  * pushed filter, loses a broadcast hint, or degrades top-k into a global
  * sort changes nothing at fixture scale but everything at 100 TB — these
  * tests make the plan shape part of the spec. */
class PlanSpec extends AnyFunSuite {

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("q02: filter and projection are pushed into the parquet scan") {
    val p = plan(Relational.q02FilterPushdown(TestSpark.spark, TestSpark.Sf0001))
    assert(p.contains("PushedFilters: ["), s"no pushed filters in:\n${p.take(1500)}")
    assert(p.contains("LessThan(l_quantity") || p.contains("LessThan(`l_quantity"),
      "the selective predicate must reach the scan")
    // column pruning: the scan reads the 4 projected columns, not the table
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!readSchema.contains("l_returnflag"),
      s"scan reads columns the query never uses: $readSchema")
  }

  test("q03: dimension joins are broadcast, not shuffled") {
    val p = plan(Relational.q03RevenueByNation(TestSpark.spark, TestSpark.Sf0001))
    // customer, nation, region carry explicit broadcast hints
    assert("BroadcastExchange".r.findAllIn(p).size >= 3,
      s"expected >=3 broadcast dims in:\n${p.take(1500)}")
  }

  test("q11: global sort+limit plans as TakeOrderedAndProject, not a full sort") {
    val p = plan(Relational.q11SortLimit(TestSpark.spark, TestSpark.Sf0001))
    assert(p.contains("TakeOrderedAndProject"), s"top-k degraded to a global sort:\n${p.take(1500)}")
  }

  test("brute-force ANN broadcasts the query side; the corpus never shuffles") {
    val p = plan(Similarity.simTopKBruteForce(TestSpark.spark, TestSpark.Sf0001))
    assert(p.contains("BroadcastNestedLoopJoin"),
      s"query side must broadcast:\n${p.take(1500)}")
    assert(!p.contains("CartesianProduct"),
      "pair generation must not fall back to a cartesian shuffle product")
  }

  test("q01: aggregation is two-phase (map-side partial before the shuffle)") {
    val p = plan(Relational.q01PricingSummary(TestSpark.spark, TestSpark.Sf0001))
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      s"expected partial+final HashAggregate pair in:\n${p.take(1500)}")
  }

  test("q25: literal band table broadcasts; orders never shuffle for the range join") {
    val p = plan(Relational.q25RangeJoin(TestSpark.spark, TestSpark.Sf0001))
    assert(p.contains("BroadcastNestedLoopJoin"),
      s"interval side must broadcast:\n${p.take(1500)}")
    assert(!p.contains("CartesianProduct"),
      "range join must not fall back to a cartesian shuffle product")
  }

  test("samp_hash: sample predicate prunes scan columns (no text column read)") {
    val p = plan(graft.ops.Sampling.sampHash(TestSpark.spark, TestSpark.Sf0001))
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!readSchema.contains("text"),
      s"sample scan reads the payload column it never returns: $readSchema")
    // the accept test is a plain filter — no hash-partitioned shuffle; the
    // only allowed Exchange is the single rangepartitioning from the
    // presentation orderBy (the old disjunct form was vacuously true
    // whenever the range exchange existed)
    assert(!p.contains("Exchange hashpartitioning"),
      s"deterministic sampling must not hash-shuffle:\n${p.take(1500)}")
    assert("Exchange rangepartitioning".r.findAllIn(p).size <= 1,
      s"more than the one presentation sort exchange:\n${p.take(1500)}")
  }

  test("tx_vocab: corpus top-k plans as TakeOrderedAndProject, not a global sort") {
    val p = plan(graft.ops.TextAnalysis.txVocab(TestSpark.spark, TestSpark.Sf0001))
    assert(p.contains("TakeOrderedAndProject"),
      s"vocabulary top-k degraded to a global sort:\n${p.take(1500)}")
  }

  test("q26: native top-k plans two heap phases around one exchange, no Sort") {
    val df = Relational.q26TopkNative(TestSpark.spark, TestSpark.Sf0001)
    val inner = graft.plans.TopKPerGroup.topK(
      graft.ops.Relational.t(TestSpark.spark, TestSpark.Sf0001, "orders"),
      group = Seq(org.apache.spark.sql.functions.col("o_orderpriority")),
      order = Seq(org.apache.spark.sql.functions.col("o_totalprice").desc,
        org.apache.spark.sql.functions.col("o_orderkey").asc),
      k = 3)
    val p = inner.queryExecution.executedPlan.toString
    assert("TopKPerGroup ".r.findAllIn(p).size == 2,
      s"expected partial+final TopKPerGroupExec pair in:\n${p.take(2000)}")
    assert(p.contains("Exchange hashpartitioning"),
      s"final phase must cluster on the group key:\n${p.take(2000)}")
    assert(!p.contains("Sort "), s"native top-k must not sort groups:\n${p.take(2000)}")
    // and the graded query's results match the window formulation exactly
    val viaWindow = {
      import org.apache.spark.sql.expressions.Window
      import org.apache.spark.sql.functions._
      graft.ops.Relational.t(TestSpark.spark, TestSpark.Sf0001, "orders")
        .withColumn("rn", row_number().over(Window.partitionBy(col("o_orderpriority"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)))
        .filter(col("rn") <= 3)
        .select(col("o_orderpriority"), col("o_orderkey"), col("o_totalprice"))
        .collect().map(_.toSeq).toSet
    }
    assert(df.collect().map(_.toSeq).toSet == viaWindow)
  }

  test("TopKPerGroup fails fast past the per-task group-count ceiling") {
    val spark = TestSpark.spark
    import org.apache.spark.sql.functions.col
    spark.conf.set(graft.plans.TopKPerGroup.MaxGroupsConfKey, "10")
    try {
      // o_orderkey is unique per row — the degenerate high-cardinality key
      // the heap formulation must refuse, not OOM on
      val df = graft.plans.TopKPerGroup.topK(
        Relational.t(spark, TestSpark.Sf0001, "orders"),
        group = Seq(col("o_orderkey")),
        order = Seq(col("o_totalprice").desc),
        k = 1)
      val ex = intercept[org.apache.spark.SparkException] { df.count() }
      def messages(t: Throwable): Iterator[String] =
        Iterator.single(Option(t.getMessage).getOrElse("")) ++
          Option(t.getCause).iterator.flatMap(messages)
      assert(messages(ex).exists(m =>
        m.contains("distinct group keys") && m.contains("row_number()")),
        s"guard error must name the bound and the window fallback, got: ${ex.getMessage}")
    } finally spark.conf.unset(graft.plans.TopKPerGroup.MaxGroupsConfKey)
    // and the default ceiling leaves the graded low-cardinality path intact
    assert(Relational.q26TopkNative(TestSpark.spark, TestSpark.Sf0001).count() > 0)
  }

  test("GraftExtensions installs the top-k strategy through spark.sql.extensions") {
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new graft.plans.GraftExtensions().apply(ext)
    val strategies = org.apache.spark.sql.GraftBridge
      .buildPlannerStrategies(ext, TestSpark.spark)
    assert(strategies.contains(graft.plans.TopKPerGroup.Strategy),
      s"extensions installer must register the strategy, got: $strategies")
  }

  test("q22: salting replicates the dimension only on the hot-key branch") {
    // production-shape pin: dim rows after conditional replication =
    // cold keys × 1 + hot keys × SaltBuckets (NOT all keys × SaltBuckets —
    // the r6 demo simplification this replaces)
    val (nDim, nHot, nReplicated) =
      Relational.q22DimReplication(TestSpark.spark, TestSpark.Sf0001)
    assert(nHot > 0, "fixture must exercise the hot-key branch")
    assert(nHot < nDim, "fixture must exercise the cold-key branch")
    assert(nReplicated == (nDim - nHot) + nHot * Relational.SaltBuckets,
      s"dim=$nDim hot=$nHot replicated=$nReplicated — replication must be hot-only")
    // the hot-set membership checks are broadcasts, never shuffled joins
    val p = plan(Relational.q22SaltedJoin(TestSpark.spark, TestSpark.Sf0001))
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2,
      s"hot-key membership must broadcast on both sides:\n${p.take(2000)}")
  }

  test("prof_numeric: all column stats come from ONE scan of the table") {
    val p = plan(graft.ops.Profiling.profNumeric(TestSpark.spark, TestSpark.Sf0001))
    assert("Scan parquet".r.findAllIn(p).size == 1,
      s"profiling must not rescan per column:\n${p.take(2000)}")
  }
}
