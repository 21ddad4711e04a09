package graft

import graft.ops.TextAnalysis
import org.scalatest.funsuite.AnyFunSuite

/** Sequence packing: the Spark plan must reproduce an independently
  * computed (pure-Scala) contiguous-fill packing exactly — every doc's
  * shard, every bin's doc count and token sum. The DuckDB oracle pins the
  * same thing cross-engine at sf0.01; this pins it in-suite with no SQL
  * in the loop. */
class PackingSpec extends AnyFunSuite {

  test("pack_sequences matches an independent scala computation") {
    val spark = TestSpark.spark
    val docs = spark.read.parquet(s"${TestSpark.Sf0001}/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(docs.length > 100)

    val (prime, m, shards, budget) = (7368787L, 1000000007L, 8L, 512L)
    val expected = docs
      .map { case (id, text) =>
        // split(" ", -1): Spark's split keeps trailing empty tokens
        (id, text.split(" ", -1).length.toLong, (id * prime) % m % shards)
      }
      .groupBy(_._3).toSeq
      .flatMap { case (shard, rows) =>
        var off = 0L
        rows.sortBy(_._1).map { case (_, nTok, _) =>
          val bin = off / budget
          off += nTok
          (shard, bin, nTok)
        }
      }
      .groupBy { case (shard, bin, _) => (shard, bin) }.toSeq
      .map { case ((shard, bin), rows) =>
        (shard, bin, rows.size.toLong, rows.map(_._3).sum)
      }
      .sortBy { case (shard, bin, _, _) => (shard, bin) }

    val got = TextAnalysis.txPackSequences(spark, TestSpark.Sf0001)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got == expected)
    // sanity on the packing itself: bins within each shard are contiguous
    // from 0, and every bin's STARTING tokens never exceed one budget plus
    // the straddler (the writer splits those at materialization)
    got.groupBy(_._1).foreach { case (shard, bins) =>
      val ids = bins.map(_._2).sorted
      assert(ids == (0L until ids.length).toSeq, s"shard $shard bins not contiguous: $ids")
    }
  }
}
