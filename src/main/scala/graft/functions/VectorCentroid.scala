package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF: element-wise mean of float vectors (SURVEY §7.4's
  * `Aggregator[IN,BUF,OUT]` promotion path; the coarse-quantizer build
  * step of the IVF ANN index in [[graft.ops.Similarity.simAnnIvf]]).
  *
  * Buffer is (running double sums, count) — partial aggregation works
  * map-side exactly like any built-in agg, so building k centroids over
  * 100 TB shuffles k·dim doubles per input partition, nothing more.
  * Accumulates in double for determinism; returns float (storage dtype).
  */
object VectorCentroid extends Aggregator[Seq[Float], (Array[Double], Long), Seq[Float]] {

  override def zero: (Array[Double], Long) = (Array.empty[Double], 0L)

  override def reduce(b: (Array[Double], Long), v: Seq[Float]): (Array[Double], Long) = {
    if (v == null || v.isEmpty) return b
    val sums = if (b._1.isEmpty) new Array[Double](v.length) else b._1
    var i = 0
    while (i < v.length && i < sums.length) { sums(i) += v(i); i += 1 }
    (sums, b._2 + 1)
  }

  override def merge(a: (Array[Double], Long), b: (Array[Double], Long)): (Array[Double], Long) = {
    if (a._1.isEmpty) return b
    if (b._1.isEmpty) return a
    val sums = a._1.clone()
    var i = 0
    while (i < sums.length && i < b._1.length) { sums(i) += b._1(i); i += 1 }
    (sums, a._2 + b._2)
  }

  override def finish(r: (Array[Double], Long)): Seq[Float] =
    if (r._2 == 0) Seq.empty
    else r._1.map(s => (s / r._2).toFloat).toSeq

  override def bufferEncoder: Encoder[(Array[Double], Long)] =
    Encoders.tuple(
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]](),
      Encoders.scalaLong)

  override def outputEncoder: Encoder[Seq[Float]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Float]]()

  /** Column-API entry point (`vector_centroid(col)`). */
  def centroid(c: Column): Column =
    org.apache.spark.sql.functions.udaf(this,
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Float]]()).apply(c)
}
