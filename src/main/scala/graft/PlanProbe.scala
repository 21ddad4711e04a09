package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev harness for the r16 plan evidence (OPTIMIZATION_r16.md): the
  * graded dedup queries localCheckpoint their shingle index, so the
  * final `.explain` of the query shows `Scan ExistingRDD` where the
  * shingle pipeline ran — the Exchange this round removed is invisible
  * there. This prints the PRE-checkpoint subtree both ways (the former
  * explode+substr+distinct formulation vs the dedup'ing generator) so
  * the shuffle-removal claim is checkable from a committed plan, same
  * standing as the `*Payoff.scala` measurement harnesses.
  *
  * Usage: runMain graft.PlanProbe [sfDir]
  */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")

    // hot-shingle DF aggregate over the per-doc-distinct shingle set —
    // the corpus-sized prefix every dd_* shingle consumer shares
    println("=== BEFORE (r15 shape): explode+substr + global distinct ===")
    docs.filter(length(col("text")) >= 5)
      .select(col("doc_id"), col("text"),
        explode(sequence(lit(1), length(col("text")) - 4)).as("i"))
      .select(col("doc_id"), col("text").substr(col("i"), lit(5)).as("g"))
      .distinct()
      .groupBy(col("g")).agg(count(lit(1)).as("df"))
      .filter(col("df") > 100)
      .explain("formatted")

    println("=== AFTER (r16 shape): dedup'ing generator, no distinct Exchange ===")
    graft.ops.Relational.fanned(docs, "doc_id")
      .filter(length(col("text")) >= 5)
      .select(col("doc_id"),
        graft.functions.GraftFunctions.shingles_distinct(col("text"), 5).as("g"))
      .groupBy(col("g")).agg(count(lit(1)).as("df"))
      .filter(col("df") > 100)
      .explain("formatted")

    spark.stop()
  }
}
