package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{AbstractDataType, DataType, LongType, StringType}
import org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes
import org.apache.spark.unsafe.types.UTF8String

/** Polynomial rolling string hash `fold(acc = seed; acc = (acc*31 + c) mod
  * 1_000_000_007)` over UTF-16 code units, as a native expression.
  *
  * Bit-exact with the HOF reference form in graft.util.Det.polyHash
  * (`aggregate(filter(split(s,"")), …)` — ExpressionSpec pins equivalence):
  * `split(s, "")` yields one element per UTF-16 code unit and `ascii`
  * returns that unit's value, so iterating `charAt` reproduces the exact
  * sequence, including lone surrogates processed individually. Same
  * ASCII/BMP oracle contract as the HOF form (see Det.polyHash docs).
  *
  * Why native: the HOF form allocates a char-array per STRING (split),
  * then runs an interpreted two-level lambda fold per element. Token
  * hashing is the front door of every dedup query (q41–q45, q81 hash
  * every token of every document), so this loop shape matters: one pass
  * over the string's chars, zero allocation, no lambda dispatch. The
  * modulus keeps acc < 2^30, so `acc*31 + c` never overflows a long.
  */
case class PolyHash(child: Expression, seed: Long)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any =
    PolyHash.hash(input.asInstanceOf[UTF8String], seed)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.PolyHash.hash($c, ${seed}L)")

  override protected def withNewChildInternal(newChild: Expression): PolyHash =
    copy(child = newChild)
}

object PolyHash {
  /** Static kernel shared by eval and generated code. */
  def hash(s: UTF8String, seed: Long): Long = {
    val str = s.toString
    var acc = seed
    var i = 0
    val n = str.length
    while (i < n) {
      acc = (acc * 31 + str.charAt(i)) % 1000000007L
      i += 1
    }
    acc
  }
}
