package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

import scala.collection.mutable

/** Typed UDAF: Misra–Gries heavy-hitters sketch over a string column —
  * the bounded-memory path to "top-k most frequent terms" that never
  * builds the full vocabulary (SURVEY §7.4's `Aggregator[IN,BUF,OUT]`
  * promotion path; the sketch counterpart to the exact
  * [[graft.ops.TextAnalysis.txVocab]]).
  *
  * Guarantee (classic Misra–Gries): with capacity m, any term with true
  * frequency > N/(m+1) is GUARANTEED to survive in the sketch, and each
  * reported count undercounts the truth by at most N/(m+1). Merging two
  * sketches (the shuffle-combine step) preserves the bound, which is what
  * makes this a legal partial aggregate.
  *
  * Shape at 100 TB: each input partition reduces its token stream into a
  * ≤m-entry map; the shuffle carries ONE m-entry sketch per partition
  * (m ≈ 8·k for top-k), not a vocabulary-sized table — the win over
  * exact top-k when the vocabulary itself is shuffle-dominating (URLs,
  * n-grams, user ids). Exactness is then optionally restored by a second
  * pass that counts only the ≤m surviving candidates (semi-join + agg),
  * which is how [[graft.ops.TextAnalysis.txHeavyHitters]] grades the
  * sketch against the oracle.
  */
final class MisraGries(capacity: Int)
    extends Aggregator[String, mutable.HashMap[String, Long], Map[String, Long]] {
  require(capacity > 0)

  override def zero: mutable.HashMap[String, Long] = mutable.HashMap.empty

  /** Weighted MG step: admit the term, and when the map exceeds
    * capacity, subtract the minimum counter from every entry and drop
    * the zeros (at least the minimum itself). Each such collapse
    * decrements all m+1 counters equally, which is what preserves the
    * N/(m+1) undercount bound. O(m) amortized. */
  private def offer(b: mutable.HashMap[String, Long], term: String, n: Long): Unit = {
    b.update(term, b.getOrElse(term, 0L) + n)
    if (b.size > capacity) {
      val mn = b.valuesIterator.min
      b.keys.toArray.foreach { k =>
        val v = b(k) - mn
        if (v <= 0) b.remove(k) else b.update(k, v)
      }
    }
  }

  override def reduce(b: mutable.HashMap[String, Long], term: String): mutable.HashMap[String, Long] = {
    if (term != null) offer(b, term, 1L)
    b
  }

  override def merge(
      a: mutable.HashMap[String, Long],
      b: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    b.foreach { case (t, n) => offer(a, t, n) }
    a
  }

  override def finish(b: mutable.HashMap[String, Long]): Map[String, Long] = b.toMap

  /** Kryo for the in-flight sketch: the buffer only serializes at the
    * partial-agg shuffle boundary (one ≤m-entry map per partition), so
    * generic serialization costs nothing measurable and keeps the
    * mutable map out of Catalyst's encoder surface. */
  override def bufferEncoder: Encoder[mutable.HashMap[String, Long]] =
    Encoders.kryo[mutable.HashMap[String, Long]]

  override def outputEncoder: Encoder[Map[String, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
}

object MisraGries {
  /** Column-API entry point: `heavy_hitters_sketch(c, capacity)` returns a
    * map of surviving candidate terms → lower-bound counts. */
  def sketch(c: Column, capacity: Int): Column =
    org.apache.spark.sql.functions.udaf(new MisraGries(capacity),
      Encoders.STRING).apply(c)
}
