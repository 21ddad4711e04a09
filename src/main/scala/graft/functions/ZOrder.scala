package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, DoubleType, IntegerType, LongType}

/** Equi-depth bucket id of a double value against a broadcast-as-literal
  * sorted boundary array: the number of boundaries `<=` the value, i.e.
  * `value`'s rank quantized to `boundaries.length + 1` buckets.
  *
  * This is the rank-normalization step of Z-ordering ([[InterleaveBits]]):
  * interleaving RAW value bits would let one column's wider numeric range
  * dominate the curve and would degrade under skew, so each column is
  * first mapped to its (approximate) quantile rank — equal-population
  * buckets regardless of distribution. The boundaries come from one
  * `approxQuantile` pass per column (driver-side array, ≤ 2^bits − 1
  * doubles — a plan constant like [[BloomContains]]' filter, broadcast
  * with the serialized expression, never shuffled).
  *
  * Why an Expression and not a UDF: the bucket probe runs once per row per
  * cluster column inside the layout rewrite's scan; `doGenCode` emits an
  * inline binary search over the shared double[] so the whole z-key
  * computation stays in the scan's WholeStageCodegen span with zero
  * boxing.
  */
case class RankBucket(child: Expression, boundaries: Array[Double])
    extends UnaryExpression {
  require(boundaries.nonEmpty, "RankBucket needs at least one boundary")

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == DoubleType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"rank_bucket expects a double input, got ${child.dataType}")

  override def nullSafeEval(v: Any): Any = {
    val x = v.asInstanceOf[Double]
    var lo = 0; var hi = boundaries.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (boundaries(mid) <= x) lo = mid + 1 else hi = mid
    }
    lo
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val arr = ctx.addReferenceObj("boundaries", boundaries, "double[]")
    nullSafeCodeGen(ctx, ev, v => {
      val lo = ctx.freshName("lo")
      val hi = ctx.freshName("hi")
      val mid = ctx.freshName("mid")
      s"""
         |int $lo = 0, $hi = $arr.length;
         |while ($lo < $hi) {
         |  int $mid = ($lo + $hi) >>> 1;
         |  if ($arr[$mid] <= $v) $lo = $mid + 1; else $hi = $mid;
         |}
         |${ev.value} = $lo;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** [[RankBucket]] for string columns: the number of boundaries
  * `<=` the value under UTF8String BINARY comparison — the same ordering
  * Spark's sort and parquet's min/max stats use for strings, so the
  * bucket ids this produces cluster exactly the ranges string predicates
  * skip on. Boundaries arrive as Java strings (plan-constant, like the
  * double[] of [[RankBucket]]) and are converted to UTF8String once per
  * executor; the per-row probe is an inline binary search of UTF8String
  * compares in generated code — no per-row conversion, no boxing.
  */
case class StringRankBucket(child: Expression, boundaries: Array[String])
    extends UnaryExpression {
  require(boundaries.nonEmpty, "StringRankBucket needs at least one boundary")

  import org.apache.spark.sql.types.StringType
  import org.apache.spark.unsafe.types.UTF8String

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"string rank_bucket expects a string input, got ${child.dataType}")

  @transient private lazy val utf8: Array[UTF8String] =
    boundaries.map(UTF8String.fromString)

  override def nullSafeEval(v: Any): Any = {
    val x = v.asInstanceOf[UTF8String]
    var lo = 0; var hi = utf8.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (utf8(mid).compareTo(x) <= 0) lo = mid + 1 else hi = mid
    }
    lo
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val arr = ctx.addReferenceObj("boundaries", utf8,
      "org.apache.spark.unsafe.types.UTF8String[]")
    nullSafeCodeGen(ctx, ev, v => {
      val lo = ctx.freshName("lo")
      val hi = ctx.freshName("hi")
      val mid = ctx.freshName("mid")
      s"""
         |int $lo = 0, $hi = $arr.length;
         |while ($lo < $hi) {
         |  int $mid = ($lo + $hi) >>> 1;
         |  if ($arr[$mid].compareTo($v) <= 0) $lo = $mid + 1; else $hi = $mid;
         |}
         |${ev.value} = $lo;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** Morton (Z-order) key: bit-interleave `bitsPerCol` low bits of each of
  * the child bucket ids into one long, so sorting by the result clusters
  * rows that are close in EVERY dimension — the multi-column data-skipping
  * key a lexicographic sort can't provide (a lexicographic sort on
  * (x, y) leaves y spanning its full range inside every x run, so min/max
  * stats never skip on y; the Z-curve bounds every dimension's range
  * within any key interval).
  *
  * Children are [[RankBucket]] outputs in `[0, 2^bitsPerCol)`; values are
  * clamped defensively. `bitsPerCol * children.size` must fit in 63 bits.
  * Null buckets must be coalesced upstream (the layout job maps null to
  * bucket 0 so nulls cluster together at the curve origin).
  *
  * Codegen emits the interleave loop inline (bits × n shift-or ops on
  * primitives) so the z-key computation rides the scan's codegen span.
  */
case class InterleaveBits(children: Seq[Expression], bitsPerCol: Int)
    extends Expression {
  require(children.nonEmpty, "InterleaveBits needs at least one input")
  // <= 30: inputs are Int bucket ids, and the Int mask (1 << bits) - 1
  // overflows past 30 — a wider single-column key is meaningless anyway
  require(bitsPerCol > 0 && bitsPerCol <= 30 && bitsPerCol * children.size <= 63,
    s"bitsPerCol=$bitsPerCol must be in [1, 30] and × ${children.size} cols fit in 63 bits")

  override def dataType: DataType = LongType
  override def nullable: Boolean = children.exists(_.nullable)

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.forall(_.dataType == IntegerType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"interleave_bits expects int inputs, got ${children.map(_.dataType).mkString(", ")}")

  private val n = children.size
  private val mask = (1 << bitsPerCol) - 1

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    var z = 0L
    var c = 0
    while (c < n) {
      val v = children(c).eval(input)
      if (v == null) return null
      val b = math.min(math.max(v.asInstanceOf[Int], 0), mask)
      var i = 0
      while (i < bitsPerCol) {
        z |= ((b >>> i) & 1L) << (i * n + c)
        i += 1
      }
      c += 1
    }
    java.lang.Long.valueOf(z)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val evals = children.map(_.genCode(ctx))
    val z = ctx.freshName("z")
    // children short-circuit: once null, skip the rest (each child's
    // contribution is guarded; a null anywhere nulls the whole key)
    val body = evals.zipWithIndex.map { case (e, c) =>
      val b = ctx.freshName("b")
      val i = ctx.freshName("i")
      s"""
         |if (!${ev.isNull}) {
         |  ${e.code.toString}
         |  if (${e.isNull}) { ${ev.isNull} = true; } else {
         |    int $b = java.lang.Math.min(java.lang.Math.max(${e.value}, 0), $mask);
         |    for (int $i = 0; $i < $bitsPerCol; $i++) {
         |      $z |= ((long) (($b >>> $i) & 1)) << ($i * $n + $c);
         |    }
         |  }
         |}
       """.stripMargin
    }.mkString("\n")
    ev.copy(code = code"""
      boolean ${ev.isNull} = false;
      long $z = 0L;
      $body
      long ${ev.value} = $z;""")
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression = copy(children = newChildren)
}

object ZOrderFunctions {
  import org.apache.spark.sql.GraftBridge

  def rank_bucket(c: Column, boundaries: Array[Double]): Column =
    GraftBridge.toCol(RankBucket(GraftBridge.toExpr(c), boundaries))

  def rank_bucket_str(c: Column, boundaries: Array[String]): Column =
    GraftBridge.toCol(StringRankBucket(GraftBridge.toExpr(c), boundaries))

  def interleave_bits(cols: Seq[Column], bitsPerCol: Int): Column =
    GraftBridge.toCol(InterleaveBits(cols.map(GraftBridge.toExpr), bitsPerCol))
}
