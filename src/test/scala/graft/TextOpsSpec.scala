package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.clean.TextOps
import graft.util.Det

class TextOpsSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def clean1(s: String): String =
    Seq(s).toDF("t").select(TextOps.cleanPost(col("t"))).as[String].head()

  test("cleanPost masks emails and urls, strips symbols, collapses spaces") {
    assert(clean1("Mail me at bob.smith+x@example.com  now!") ==
      "mail me at emailaddress now")
    assert(clean1("see https://example.com/a?b=1 and www.foo.org/x too") ==
      "see website and website too")
    assert(clean1("  A,B;;C   d  ") == "a b c d")
  }

  test("cleanPost is idempotent") {
    val samples = Seq("Hello, World! x@y.com", "a  b   c", "http://a.b c&d")
    samples.foreach { s =>
      val once = clean1(s)
      assert(clean1(once) == once, s"not idempotent for: $s")
    }
  }

  test("stopword removal preserves order and duplicates of kept tokens") {
    val got = Seq("the cat the cat sat on a mat")
      .toDF("t")
      .select(array_join(TextOps.removeStopwords(TextOps.tokens(col("t"))), " "))
      .as[String].head()
    assert(got == "cat cat sat mat")
  }

  test("polyHash pins the documented polynomial (cross-engine contract)") {
    // 'ab': ((7*31+97)*31+98) % 1000000007 = 9832 — same value DuckDB's
    // list_reduce mirror produces; a silent change here breaks every
    // fingerprint/minhash oracle.
    val got = Seq("ab").toDF("t").select(Det.polyHash(col("t"))).as[Long].head()
    assert(got == 9832L)
  }

  test("quality inputs: token math matches scala reference") {
    val row = Seq("the quick brown fox").toDF("t")
      .select(
        size(TextOps.tokens(col("t"))).as("n"),
        aggregate(transform(TextOps.tokens(col("t")), x => length(x)),
          lit(0), (a, b) => a + b).as("tot"))
      .as[(Int, Int)].head()
    assert(row == ((4, 16)))
  }
}
