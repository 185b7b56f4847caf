package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodeGenerator, CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Sequential (index-order) dot product of two float/double arrays as a
  * native Catalyst expression with whole-stage codegen.
  *
  * Bit-exact drop-in for the higher-order-function composition
  * `aggregate(zip_with(a, b, (x,y) -> double(x)*double(y)), 0.0, +)`:
  * each element pair is widened to double, multiplied, and accumulated
  * LEFT TO RIGHT — the exact IEEE operation sequence of the interpreted
  * fold (see graft.util.Det.seqDot and ExpressionSpec's equivalence test),
  * so DuckDB-oracle hash parity is unaffected.
  *
  * Why: Spark's higher-order functions (ZipWith/ArrayAggregate) are
  * CodegenFallback — per-element interpreted lambda evaluation with boxed
  * intermediates, plus a materialized zipped array per call. On similarity
  * joins evaluating millions of candidate pairs × 64 dims
  * (graft.similarity.SimilarityQueries), that interpreter loop is the
  * entire verify cost. This expression is one fused primitive loop inside
  * the generated code: no allocation, no boxing, no virtual calls.
  *
  * Null contract (same as the HOF composition): null if either array is
  * null, lengths differ (zip_with pads with null), or any element is null.
  */
case class SeqDotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(lt, _), ArrayType(rt, _))
          if (lt == FloatType || lt == DoubleType) &&
            (rt == FloatType || rt == DoubleType) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_seq_dot expects two array<float|double> inputs, got $l and $r")
    }

  override def dataType: DataType = DoubleType

  // nullable beyond input nulls: length mismatch / null element → null
  override def nullable: Boolean = true

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    val lf = elemType(left) == FloatType
    val rf = elemType(right) == FloatType
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xv = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      acc += xv * yv
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val xv = CodeGenerator.getValue(a, elemType(left), i)
      val yv = CodeGenerator.getValue(b, elemType(right), i)
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += ((double) $xv) * ((double) $yv);
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SeqDotProduct =
    copy(left = newLeft, right = newRight)
}
