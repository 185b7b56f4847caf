package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.util.Det

/** The determinism toolkit is the contract every oracle rests on. */
class DetSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  test("dsum is partition-order independent and exact") {
    val xs = (1 to 10000).map(i => (i % 100 + 0.01 * (i % 7)))
    val expected = xs.map(x => BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP))
      .sum.toDouble
    // different partitionings → different partial-agg orders → same result
    val r1 = xs.toDF("x").repartition(1).agg(Det.dsum(col("x"))).as[Double].head()
    val r17 = xs.toDF("x").repartition(17).agg(Det.dsum(col("x"))).as[Double].head()
    assert(r1 == expected && r17 == expected)
    // plain double sum DOES drift across partitionings on this data — the
    // reason dsum exists. (Not asserted: it can coincide by luck.)
  }

  test("dstddev matches stddev_samp semantics (ddof=1)") {
    val xs = Seq(1.0, 2.0, 3.0, 4.0)
    val got = xs.toDF("x").agg(Det.dstddev(col("x"))).as[Double].head()
    val mean = xs.sum / xs.size
    val expected = math.sqrt(xs.map(x => (x - mean) * (x - mean)).sum / (xs.size - 1))
    assert(math.abs(got - expected) < 1e-12)
  }

  test("dstddev of a single row is null (count<=1 guard)") {
    val got = Seq(5.0).toDF("x").agg(Det.dstddev(col("x")))
      .as[Option[Double]].head()
    assert(got.isEmpty)
  }

  test("seqDot folds left-to-right (pinned value)") {
    val got = Seq((Seq(1.0f, 2.0f, 3.0f), Seq(4.0f, 5.0f, 6.0f)))
      .toDF("a", "b").select(Det.seqDot(col("a"), col("b"))).as[Double].head()
    assert(got == 32.0)
  }

  test("polyHash pinned values match the scala reference implementation") {
    def ref(s: String): Long =
      s.foldLeft(7L)((acc, c) => (acc * 31 + c.toInt) % 1000000007L)
    val inputs = Seq("a", "spark", "the quick brown fox", "")
    val got = inputs.toDF("t").select(Det.polyHash(col("t"))).as[Long].collect().toSeq
    assert(got == inputs.map(ref))
  }
}
