package org.apache.spark.sql.graftfns

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the vector hot path.
  *
  * Spark's `aggregate`/`zip_with` higher-order functions fall back to
  * interpreted evaluation (CodegenFallback), which dominates the
  * pairwise-similarity ops: n² pairs × 64-element dot products. This
  * BinaryExpression generates a tight primitive loop inside
  * whole-stage codegen — no lambda dispatch, no boxing.
  *
  * Lives under org.apache.spark.sql because ExpressionUtils (Column ↔
  * Expression bridge) and AbstractDataType are private[sql]; the public
  * API is graft.functions.VectorExprs.
  */
case class DotProductL(left: Expression, right: Expression)
  extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = LongType
  override def prettyName: String = "dot_product_l"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var i = 0
    var s = 0L
    while (i < n) { s += x.getLong(i) * y.getLong(i); i += 1 }
    s
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |long $s = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $x.getLong($i) * $y.getLong($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductL =
    copy(left = newLeft, right = newRight)
}

/** Parse a slice of a lowercase-hex string (md5 output) into a BIGINT:
  * value = Σ digit(c[start−1+i]) · 16^(len−1−i) for i in [0, len).
  *
  * This is the engine's deterministic-hash workhorse — minhash seeds,
  * KMV/winnowing 40-bit hashes, bloom positions, hash sampling all
  * parse md5 nibbles — and the composed-builtin form
  * (instr('0123…f', substr(h, i, 1)) − 1) · 16ᵏ costs 15 substr
  * UTF8String allocations + 15 linear scans PER ROW at len=15. This
  * expression is one pass over the bytes inside whole-stage codegen.
  *
  * Exact-parity contract with the composed form it replaces (and with
  * the oracle's strpos arithmetic): a non-hex char contributes −1
  * (instr misses → 0 − 1), an out-of-range position contributes 0
  * (substr returns '' → instr('', …) = 1 − 1); uppercase hex is
  * deliberately NOT accepted — md5() emits lowercase in both engines.
  * `start` is 1-based like substr. */
case class HexSliceToLong(child: Expression, start: Int, len: Int)
  extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "hex_slice_to_long"

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String]
    val n = s.numBytes()
    var v = 0L
    var i = 0
    while (i < len) {
      val p = start - 1 + i
      v *= 16L
      if (p < n) { // ASCII hex only — byte addressing is char addressing
        val b = s.getByte(p)
        val d =
          if (b >= '0' && b <= '9') (b - '0').toLong
          else if (b >= 'a' && b <= 'f') (b - 'a' + 10).toLong
          else -1L
        v += d
      } // out-of-range: contributes 0, matching instr('', …) − 1
      i += 1
    }
    v
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val i = ctx.freshName("i")
      val p = ctx.freshName("p")
      val b = ctx.freshName("b")
      val v = ctx.freshName("v")
      val n = ctx.freshName("n")
      s"""
         |int $n = $x.numBytes();
         |long $v = 0L;
         |for (int $i = 0; $i < $len; $i++) {
         |  int $p = ${start - 1} + $i;
         |  $v *= 16L;
         |  if ($p < $n) {
         |    byte $b = $x.getByte($p);
         |    if ($b >= '0' && $b <= '9') $v += ($b - '0');
         |    else if ($b >= 'a' && $b <= 'f') $v += ($b - 'a' + 10);
         |    else $v -= 1L;
         |  }
         |}
         |${ev.value} = $v;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): HexSliceToLong =
    copy(child = newChild)
}

object GraftFns {
  def dotL(x: Column, y: Column): Column =
    ExpressionUtils.column(DotProductL(
      ExpressionUtils.expression(x), ExpressionUtils.expression(y)))

  /** hexSlice(col, start, len): BIGINT from `len` lowercase-hex nibbles
    * of `col` starting at 1-based `start` — see HexSliceToLong. */
  def hexSlice(x: Column, start: Int, len: Int): Column =
    ExpressionUtils.column(HexSliceToLong(
      ExpressionUtils.expression(x), start, len))
}
