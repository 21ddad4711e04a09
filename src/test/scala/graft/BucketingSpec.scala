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

  test("bucketed-by-join-key tables join without any Exchange in the plan") {
    val spark = TestSpark.spark
    import spark.implicits._
    spark.sql("DROP TABLE IF EXISTS li_bkt")
    spark.sql("DROP TABLE IF EXISTS ord_bkt")
    // the in-memory catalog forgets tables across JVMs but the warehouse
    // directory persists — DROP TABLE alone can't clear a stale location
    Seq("li_bkt", "ord_bkt").foreach { t =>
      val dir = java.nio.file.Paths.get(
        spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), t)
      if (java.nio.file.Files.exists(dir)) {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(dir).iterator().asScala.toSeq.reverse
          .foreach(java.nio.file.Files.delete)
      }
    }
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
}
