package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.GraftFunctions.{seqDot, sortedIntersectCount}
import org.scalatest.funsuite.AnyFunSuite

class ExpressionSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def count2(a: Seq[Long], b: Seq[Long]): Int =
    Seq((a, b)).toDF("a", "b")
      .select(sortedIntersectCount(col("a"), col("b")))
      .as[Int].head()

  test("sortedIntersectCount: two-pointer merge semantics") {
    assert(count2(Seq(1L, 3L, 5L, 7L), Seq(3L, 4L, 7L, 9L)) == 2)
    assert(count2(Seq(), Seq(1L)) == 0)
    assert(count2(Seq(1L), Seq()) == 0)
    assert(count2(Seq(1L, 2L, 3L), Seq(1L, 2L, 3L)) == 3)
    assert(count2(Seq(1L, 2L), Seq(3L, 4L)) == 0)
  }

  test("sortedIntersectCount agrees with size(array_intersect) on random sorted sets") {
    val rnd = new scala.util.Random(42)
    val rows = (1 to 200).map { _ =>
      val a = Seq.fill(rnd.nextInt(40))(rnd.nextInt(100).toLong).distinct.sorted
      val b = Seq.fill(rnd.nextInt(40))(rnd.nextInt(100).toLong).distinct.sorted
      (a, b)
    }
    val df = rows.toDF("a", "b")
    val diff = df.select(
      sortedIntersectCount(col("a"), col("b")).as("fast"),
      size(array_intersect(col("a"), col("b"))).as("ref"))
      .filter(col("fast") =!= col("ref")).count()
    assert(diff == 0)
  }

  test("sortedIntersectCount is null-safe") {
    val got = Seq((Some(Seq(1L)), Option.empty[Seq[Long]]))
      .toDF("a", "b")
      .select(sortedIntersectCount(col("a"), col("b")))
      .as[Option[Int]].head()
    assert(got.isEmpty)
  }

  test("seqDot is bit-exact with the interpreted zip_with/aggregate fold") {
    // the HOF composition is the determinism REFERENCE (what the DuckDB
    // oracle mirrors); the native expression must match it to the last ulp
    val hof = (a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =>
      aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
        lit(0.0), (acc, x) => acc + x)
    val rnd = new scala.util.Random(7)
    val rows = (1 to 300).map { _ =>
      val n = 1 + rnd.nextInt(80)
      (Seq.fill(n)(rnd.nextFloat() * 2 - 1), Seq.fill(n)((rnd.nextDouble() * 2 - 1)))
    }
    val df = rows.toDF("a", "b")
    val diff = df.select(
      seqDot(col("a"), col("b")).as("fast"), hof(col("a"), col("b")).as("ref"))
      .filter(col("fast") =!= col("ref")).count()
    assert(diff == 0)
  }

  test("seqDot null contract: null input, length mismatch, null element") {
    val gotNullInput = Seq((Some(Seq(1.0f)), Option.empty[Seq[Double]]))
      .toDF("a", "b").select(seqDot(col("a"), col("b")))
      .as[Option[Double]].head()
    assert(gotNullInput.isEmpty)
    val gotMismatch = Seq((Seq(1.0, 2.0), Seq(1.0)))
      .toDF("a", "b").select(seqDot(col("a"), col("b")))
      .as[Option[Double]].head()
    assert(gotMismatch.isEmpty)
    val gotNullElem = Seq((Seq(Some(1.0), None), Seq(Some(1.0), Some(2.0))))
      .toDF("a", "b").select(seqDot(col("a"), col("b")))
      .as[Option[Double]].head()
    assert(gotNullElem.isEmpty)
  }

  test("seqDot codegen path is exercised and sums in index order") {
    val df = spark.range(100)
      .select(col("id"),
        transform(sequence(lit(1), lit(8)), i => i.cast("double") + col("id")).as("a"),
        transform(sequence(lit(1), lit(8)), i => i.cast("double")).as("b"))
      .select(seqDot(col("a"), col("b")).as("d"), col("id"))
    val hasWsc = df.queryExecution.executedPlan.exists(
      _.isInstanceOf[org.apache.spark.sql.execution.WholeStageCodegenExec])
    assert(hasWsc, df.queryExecution.executedPlan.toString)
    // Σ i*(i+id) for i=1..8 = 204 + 36*id
    assert(df.collect().forall(r => r.getDouble(0) == 204.0 + 36.0 * r.getLong(1)))
  }

  test("native polyHash is bit-exact with the HOF reference on adversarial strings") {
    val rnd = new scala.util.Random(13)
    val pool = "abc XYZ09_.,!?\té中" // ASCII + punctuation + BMP unicode
    val strs = Seq("", " ", "a", "é中") ++
      (1 to 300).map(_ => (1 to rnd.nextInt(30)).map(_ => pool(rnd.nextInt(pool.length))).mkString)
    val df = strs.toDF("s")
    val diff = df.select(
      graft.util.Det.polyHash(col("s")).as("fast"),
      graft.util.Det.polyHashHof(col("s")).as("ref"))
      .filter(col("fast") =!= col("ref")).count()
    assert(diff == 0)
    // fixed value pin: polyHash("ab") = ((7*31+97)*31+98) % p
    val pinned = Seq("ab").toDF("s")
      .select(graft.util.Det.polyHash(col("s"))).as[Long].head()
    assert(pinned == ((7L * 31 + 'a') * 31 + 'b') % 1000000007L)
  }

  test("JaroWinkler: published Winkler vectors + DuckDB conventions") {
    def jw(a: String, b: String): Double =
      org.apache.spark.sql.graft.JaroWinkler.jw(
        org.apache.spark.unsafe.types.UTF8String.fromString(a),
        org.apache.spark.unsafe.types.UTF8String.fromString(b))
    // classic Winkler vectors (exact doubles pinned against DuckDB's
    // jaro_winkler_similarity output on 2026-08-14)
    assert(jw("MARTHA", "MARHTA") == 0.9611111111111111)
    assert(jw("DIXON", "DICKSONX") == 0.8133333333333332)
    assert(jw("JELLYFISH", "SMELLYFISH") == 0.8962962962962964)
    assert(jw("DwAyNE", "DuANE") == 0.8400000000000001)
    assert(jw("abc", "abc") == 1.0)
    // boost applies only above the 0.7 jaro threshold
    assert(jw("abcdefgh", "abzyxwvu") == 0.5) // prefix 2, no boost
    assert(jw("TRATE", "TRACE") == 0.9066666666666667) // boosted
    // transposition count halves by INTEGER division (strcmp95 heritage)
    assert(jw("abcdef", "bcadef") == 0.9444444444444445)
    // window 0 for length-2 strings -> no cross-position matches
    assert(jw("ab", "ba") == 0.0)
    // DuckDB's empty-string convention: 0.0, including both-empty
    assert(jw("", "") == 0.0)
    assert(jw("", "abc") == 0.0)
  }

  test("JaroWinkler: codegen result equals interpreted eval") {
    val rnd = new scala.util.Random(13)
    val words = Seq("goldenrod", "lavender", "spring", "chocolate", "lace",
      "misty", "tomato", "navy", "rose", "sandy")
    val rows = (1 to 20000).map { _ =>
      val a = Seq.fill(1 + rnd.nextInt(3))(words(rnd.nextInt(words.size))).mkString(" ")
      val chars = a.toCharArray.toBuffer
      (0 until rnd.nextInt(4)).foreach { _ =>
        val p = rnd.nextInt(chars.size)
        rnd.nextInt(3) match {
          case 0 => chars(p) = ('a' + rnd.nextInt(26)).toChar
          case 1 => chars.insert(p, ('a' + rnd.nextInt(26)).toChar)
          case _ => if (chars.size > 1) chars.remove(p)
        }
      }
      (a, chars.mkString)
    }
    // through a range-backed plan so WholeStageCodegen covers the call
    val df = rows.toDF("a", "b")
    val viaPlan = df.select(
      org.apache.spark.sql.graft.GraftFunctions.jaroWinkler(col("a"), col("b")))
      .as[Double].collect()
    val direct = rows.map { case (a, b) =>
      org.apache.spark.sql.graft.JaroWinkler.jw(
        org.apache.spark.unsafe.types.UTF8String.fromString(a),
        org.apache.spark.unsafe.types.UTF8String.fromString(b))
    }
    assert(viaPlan.toSeq == direct)
    // null-safety
    val n = Seq((Some("x"), Option.empty[String])).toDF("a", "b")
      .select(org.apache.spark.sql.graft.GraftFunctions.jaroWinkler(col("a"), col("b")))
      .as[Option[Double]].head()
    assert(n.isEmpty)
  }

  test("codegen path is exercised (no fallback)") {
    // a range source keeps the projection out of ConvertToLocalRelation so
    // WholeStageCodegen must actually cover the expression
    val df = spark.range(100)
      .select(sequence(col("id"), col("id") + 5).as("a"),
        sequence(col("id") + 3, col("id") + 8).as("b"))
      .select(sortedIntersectCount(col("a"), col("b")).as("c"))
    val hasWsc = df.queryExecution.executedPlan.exists(
      _.isInstanceOf[org.apache.spark.sql.execution.WholeStageCodegenExec])
    assert(hasWsc, df.queryExecution.executedPlan.toString)
    // and the values are right: [id..id+5] ∩ [id+3..id+8] = 3 elements
    assert(df.as[Int].collect().forall(_ == 3))
  }
}
