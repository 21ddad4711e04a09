package graft

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** Co-located joins via bucketed tables (the "partitioning & shuffle"
  * scale contract): when both join sides are bucketed on the join key
  * with the same bucket count, the sort-merge join reads matching
  * buckets directly — NO shuffle exchange at all. At 100 TB this is the
  * difference between re-shuffling the fact table on every join and
  * paying the layout cost once at write time. */
class BucketingSpec extends AnyFunSuite {

  /** Drop a table AND its warehouse directory: the in-memory catalog
    * forgets tables across JVMs but the warehouse directory persists —
    * DROP TABLE alone can't clear a stale location. */
  private def dropHard(spark: org.apache.spark.sql.SparkSession,
      tables: String*): Unit = tables.foreach { t =>
    spark.sql(s"DROP TABLE IF EXISTS $t")
    val dir = java.nio.file.Paths.get(
      spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), t)
    if (java.nio.file.Files.exists(dir)) {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(dir).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.delete)
    }
  }

  test("bucketed-by-join-key tables join without any Exchange in the plan") {
    val spark = TestSpark.spark
    import spark.implicits._
    dropHard(spark, "li_bkt", "ord_bkt")
    spark.read.parquet(s"${TestSpark.Sf0001}/lineitem.parquet")
      .select(col("l_orderkey"), col("l_quantity"))
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .format("parquet").saveAsTable("li_bkt")
    spark.read.parquet(s"${TestSpark.Sf0001}/orders.parquet")
      .select(col("o_orderkey"), col("o_orderpriority"))
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .format("parquet").saveAsTable("ord_bkt")
    // broadcast would hide the point (BroadcastExchange IS an exchange) —
    // force the SMJ path the bucketed layout is built for
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val j = spark.table("li_bkt")
        .join(spark.table("ord_bkt"), $"l_orderkey" === $"o_orderkey")
      val plan = j.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join must be shuffle-free, plan was:\n${plan.take(2000)}")
      // and it is still the same join
      val plain = spark.read.parquet(s"${TestSpark.Sf0001}/lineitem.parquet")
        .join(spark.read.parquet(s"${TestSpark.Sf0001}/orders.parquet"),
          $"l_orderkey" === $"o_orderkey")
      assert(j.count() == plain.count())
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
  }

  test("bucketed-at-rest fingerprint index: anti-join shuffles ONLY the new run") {
    // pins SCALE.md's incremental-dedup claim: with the persisted fp
    // index bucketed on fp, the corpus side of the cross-run anti-join
    // is exchange-free — at 100 TB the (huge) index never re-shuffles,
    // only the (bounded) new run does
    val spark = TestSpark.spark
    import graft.functions.GraftFunctions.text_fingerprint
    import org.apache.spark.sql.functions.{col, concat, lit, pmod}
    dropHard(spark, "fp_idx_bkt")
    val docs = spark.read.parquet(s"${TestSpark.Sf0001}/documents.parquet")
    docs.select(text_fingerprint(col("text")).as("fp"))
      .write.bucketBy(8, "fp").sortBy("fp")
      .format("parquet").saveAsTable("fp_idx_bkt")
    // new run: even doc_ids re-deliver an admitted text (must die at the
    // index), odd ones carry fresh text (must survive)
    val newRun = docs.select(col("doc_id"),
      text_fingerprint(org.apache.spark.sql.functions
        .when(pmod(col("doc_id"), lit(2L)) === 0, col("text"))
        .otherwise(concat(col("text"), lit(" fresh-v2")))).as("fp"))
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val survivors = newRun.join(spark.table("fp_idx_bkt"), Seq("fp"), "left_anti")
      val plan = survivors.queryExecution.executedPlan.toString
      assert("Exchange".r.findAllIn(plan).size == 1,
        s"only the new-run side may shuffle (index is bucketed at rest):\n${plan.take(2000)}")
      val expected = docs.filter(pmod(col("doc_id"), lit(2L)) === 1)
        .select(col("doc_id")).collect().map(_.getLong(0)).toSet
      assert(survivors.collect().map(_.getAs[Long]("doc_id")).toSet == expected,
        "bucketed anti-join must keep exactly the fresh-text docs")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
  }
}
