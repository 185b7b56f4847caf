package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, IntegerType, LongType}

/** |A ∩ B| for two ASCENDING-sorted long arrays, as a native Catalyst
  * expression with whole-stage codegen.
  *
  * Why not `size(array_intersect(a, b))`: the built-in builds a hash set,
  * boxes every element, and materializes the intersection array — per
  * call. On a 2.5M-pair similarity join (graft.dedup.DedupQueries) that is
  * the entire runtime. This expression is a two-pointer merge scan: zero
  * allocation, no boxing, O(|A|+|B|), and it stays inside the generated
  * loop.
  *
  * Contract: both inputs sorted ascending with no duplicates (produce them
  * with `sort_array(array_distinct(...))` — or any already-deduped hashed
  * token array). Null if either input is null.
  *
  * Lives under org.apache.spark.sql because the expression-authoring
  * surface (`AbstractDataType`, the Column↔Expression bridge) is
  * `private[sql]` in Spark 4 — the established packaging pattern for
  * native expression libraries.
  */
case class SortedLongIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(LongType), ArrayType(LongType))

  override def dataType: DataType = IntegerType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    var i = 0
    var j = 0
    var c = 0
    val nx = x.numElements()
    val ny = y.numElements()
    while (i < nx && j < ny) {
      val xv = x.getLong(i)
      val yv = y.getLong(j)
      if (xv == yv) { c += 1; i += 1; j += 1 }
      else if (xv < yv) i += 1
      else j += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      s"""
         |int $i = 0; int $j = 0; int $c = 0;
         |while ($i < $a.numElements() && $j < $b.numElements()) {
         |  long $xv = $a.getLong($i);
         |  long $yv = $b.getLong($j);
         |  if ($xv == $yv) { $c++; $i++; $j++; }
         |  else if ($xv < $yv) { $i++; } else { $j++; }
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedLongIntersectCount =
    copy(left = newLeft, right = newRight)
}

/** Column-API entry points for graft's native expressions. */
object GraftFunctions {
  def sortedIntersectCount(a: Column, b: Column): Column =
    ExpressionUtils.column(
      SortedLongIntersectCount(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  def seqDot(a: Column, b: Column): Column =
    ExpressionUtils.column(
      SeqDotProduct(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  def polyHash(s: Column, seed: Long): Column =
    ExpressionUtils.column(PolyHash(ExpressionUtils.expression(s), seed))

  def jaroWinkler(a: Column, b: Column): Column =
    ExpressionUtils.column(
      JaroWinkler(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  /** Runtime installation into an ALREADY-BUILT session — the path for
    * environments that construct the SparkSession themselves (the driver's
    * Verify/Bench harness). Build-time wiring via [[GraftExtensions]] is
    * preferred when you own the builder; this does the same two things
    * through public/stable surfaces: the optimizer rule goes into
    * `spark.experimental.extraOptimizations`, the SQL function into the
    * session's function registry. Idempotent.
    */
  def install(spark: org.apache.spark.sql.SparkSession): Unit = {
    val classic = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    if (!classic.experimental.extraOptimizations.contains(IntersectCountRewrite)) {
      classic.experimental.extraOptimizations =
        classic.experimental.extraOptimizations :+ IntersectCountRewrite
    }
    classic.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_intersect_count",
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        SortedLongIntersectCount(children(0), children(1)),
      "built-in")
    classic.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_seq_dot",
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        SeqDotProduct(children(0), children(1)),
      "built-in")
  }
}
