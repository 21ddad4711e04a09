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
case class ShingleGenerator(child: Expression, n: Expression,
    dedup: Boolean = false)
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
      else if (!dedup) new Iterator[InternalRow] {
        private var i = 0
        override def hasNext: Boolean = i <= len - width
        override def next(): InternalRow = {
          val row = InternalRow(s.substring(i, i + width))
          i += 1
          row
        }
      } else new Iterator[InternalRow] {
        // `dedup = true` emits each DISTINCT shingle of the row once (first
        // occurrence order). A row's shingles never span partitions, so
        // per-row dedup here IS the global (id, shingle) distinct — done in
        // the scan stage with a per-row set instead of a full shuffle of
        // every shingle occurrence (guide §2.4: remove shuffles outright).
        // State is bounded by the row's own shingle count.
        private val seen = new java.util.HashSet[UTF8String]()
        private var i = 0
        private var nextShingle: UTF8String = null
        private def advance(): Unit = {
          nextShingle = null
          while (nextShingle == null && i <= len - width) {
            val g = s.substring(i, i + width)
            i += 1
            if (seen.add(g)) nextShingle = g
          }
        }
        advance()
        override def hasNext: Boolean = nextShingle != null
        override def next(): InternalRow = {
          val row = InternalRow(nextShingle)
          advance()
          row
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ShingleGenerator =
    copy(child = newChildren(0), n = newChildren(1))
}

/** Sliding word n-gram generator with per-row dedup: splits the input on
  * single spaces (exactly `split(text, " ")`'s keep-empty-tokens
  * semantics), emits each DISTINCT space-joined n-gram once (first
  * occurrence order). The per-row dedup equals a global
  * `(row key, gram)` distinct because one row's grams never span
  * partitions — the same shuffle-removal argument as
  * [[ShingleGenerator]]'s `dedup` mode (guide §2.4); it replaces the
  * former explode(sequence)+slice+array_join+distinct shape in
  * [[graft.ops.Dedup.ddContamination]], whose distinct shuffled every
  * multi-word gram STRING once per occurrence. */
case class WordGramGenerator(child: Expression, n: Expression)
    extends Generator with CodegenFallback {

  override def children: Seq[Expression] = Seq(child, n)

  override def elementSchema: StructType =
    StructType(StructField("g", StringType, nullable = false) :: Nil)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType && n.dataType == IntegerType && n.foldable)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"word_grams(text, n) expects (string, foldable int), got " +
        s"(${child.dataType}, ${n.dataType})")

  private lazy val width: Int = n.eval(null).asInstanceOf[Int]

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val text = child.eval(input)
    if (text == null || width <= 0) Iterator.empty
    else {
      // Tokens are split on every single space (split(text, " ")'s
      // keep-empty-tokens contract), so an n-gram re-joined with single
      // spaces is EXACTLY the contiguous byte range of the original text
      // from token i's first byte to token i+n-1's last byte — emit grams
      // as zero-copy byte-range views instead of building strings (0x20
      // never occurs inside a UTF-8 multibyte sequence, so byte scanning
      // for spaces is charset-safe).
      val s = text.asInstanceOf[UTF8String]
      val bytes = s.getBytes
      // token start offsets: 0 and every byte after a space
      var nTokens = 1
      var b = 0
      while (b < bytes.length) { if (bytes(b) == 0x20) nTokens += 1; b += 1 }
      if (nTokens < width) Iterator.empty
      else {
        val starts = new Array[Int](nTokens)
        var t = 1
        b = 0
        while (b < bytes.length) {
          if (bytes(b) == 0x20) { starts(t) = b + 1; t += 1 }
          b += 1
        }
        new Iterator[InternalRow] {
          private val seen = new java.util.HashSet[UTF8String]()
          private var i = 0
          private var nextGram: UTF8String = null
          private def advance(): Unit = {
            nextGram = null
            while (nextGram == null && i <= nTokens - width) {
              val from = starts(i)
              val until = // end of token i+width-1: next start - 1, or EOS
                if (i + width < nTokens) starts(i + width) - 1 else bytes.length
              i += 1
              val g = UTF8String.fromBytes(bytes, from, until - from)
              if (seen.add(g)) nextGram = g
            }
          }
          advance()
          override def hasNext: Boolean = nextGram != null
          override def next(): InternalRow = {
            val row = InternalRow(nextGram)
            advance()
            row
          }
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): WordGramGenerator =
    copy(child = newChildren(0), n = newChildren(1))
}
