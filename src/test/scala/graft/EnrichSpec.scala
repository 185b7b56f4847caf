package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.clean.TextOps
import graft.enrich.{Features, Sentiment}

class EnrichSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def polarity(text: String): Double =
    Seq(text).toDF("t")
      .select(Sentiment.polarityExpr(TextOps.tokens(col("t"))))
      .as[Double].head()

  test("sentiment: single match returns its polarity") {
    assert(polarity("the fast engine") == 0.80)
  }

  test("sentiment: average of matches, exact decimal arithmetic") {
    // (0.80 + -0.70) / 2 = 0.05 exactly (decimal cents, then one division)
    assert(polarity("fast but slow") == 0.05)
    // (0.80 - 0.90 - 0.40) / 3 = -0.5 / 3
    assert(polarity("fast fail dup") == -0.5 / 3)
  }

  test("sentiment: no lexicon match -> 0.0 (TextBlob convention)") {
    assert(polarity("completely neutral words") == 0.0)
    assert(polarity("") == 0.0)
  }

  test("timeOfDay boundary hours: 5->night, 6->day, 17->day, 18->night") {
    val rows = Seq(5, 6, 17, 18)
      .map(h => Timestamp.valueOf(f"2024-01-01 $h%02d:30:00"))
      .toDF("ts")
      .select(Features.timeOfDay(col("ts")))
      .as[String].collect().toSeq
    assert(rows == Seq("night", "day", "day", "night"))
  }

  test("popularityScore: null upvote_ratio defaults to 0 (S/proc.py .get default)") {
    val got = Seq((10.0, Option.empty[Double], 4L), (10.0, Some(0.5), 4L))
      .toDF("score", "ratio", "comments")
      .select(Features.popularityScore(col("score"), col("ratio"), col("comments")))
      .as[Double].collect().toSeq
    assert(got == Seq(2.0, 7.0)) // 10*0+0.5*4 ; 10*0.5+0.5*4
  }

  test("postType: media iff thumbnail != 'self'") {
    val got = Seq("self", "http://img", "default")
      .toDF("th").select(Features.postType(col("th"))).as[String].collect().toSeq
    assert(got == Seq("text", "media", "media"))
  }
}
