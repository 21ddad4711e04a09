package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Character n-gram shingle generator — the custom `Generator` (UDTF)
  * tier of SURVEY §2.2's extension ladder (alongside the codegen
  * `Expression`s and typed `Aggregator`s): one input row fans out to one
  * output row per shingle position.
  *
  * Why a Generator and not explode(sequence)+substr: the relational
  * formulation (used by the hot dedup paths in [[graft.ops.Dedup]],
  * where whole-stage codegen wins) materializes an index array per row
  * before exploding it; a Generator streams positions lazily with no
  * intermediate array, which is the right shape when n-gram windows are
  * large or when generation feeds a non-codegen consumer anyway
  * (`CodegenFallback` here — Generate nodes sit outside codegen spans
  * regardless). Both formulations are semantically identical;
  * FunctionsSpec pins their parity so the two paths can't drift.
  *
  * Scale notes: output cardinality is |text| rows per document — the
  * generator itself adds no shuffle; the consumer decides (Dedup's
  * distinct collapses map-side). Null/short inputs generate zero rows
  * (outer behavior composable via `generator_outer`). */
case class ShingleGenerator(child: Expression, n: Expression)
    extends Generator with CodegenFallback {

  override def children: Seq[Expression] = Seq(child, n)

  override def elementSchema: StructType =
    StructType(StructField("g", StringType, nullable = false) :: Nil)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType && n.dataType == IntegerType && n.foldable)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"shingles(text, n) expects (string, foldable int), got " +
        s"(${child.dataType}, ${n.dataType})")

  private lazy val width: Int = n.eval(null).asInstanceOf[Int]

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val text = child.eval(input)
    if (text == null || width <= 0) Iterator.empty
    else {
      val s = text.asInstanceOf[UTF8String]
      val len = s.numChars()
      if (len < width) Iterator.empty
      else new Iterator[InternalRow] {
        private var i = 0
        override def hasNext: Boolean = i <= len - width
        override def next(): InternalRow = {
          val row = InternalRow(s.substring(i, i + width))
          i += 1
          row
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ShingleGenerator =
    copy(child = newChildren(0), n = newChildren(1))
}
