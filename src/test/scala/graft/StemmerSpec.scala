package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.clean.Stemmer

/** Pinned values from the published Porter algorithm's own worked examples
  * (Porter 1980, §the algorithm steps).
  */
class StemmerSpec extends AnyFunSuite {

  test("step 1: plurals and -ed/-ing") {
    assert(Stemmer.stem("caresses") == "caress")
    assert(Stemmer.stem("ponies") == "poni")
    assert(Stemmer.stem("caress") == "caress")
    assert(Stemmer.stem("cats") == "cat")
    assert(Stemmer.stem("feed") == "feed")
    assert(Stemmer.stem("agreed") == "agre")
    assert(Stemmer.stem("plastered") == "plaster")
    assert(Stemmer.stem("bled") == "bled")
    assert(Stemmer.stem("motoring") == "motor")
    assert(Stemmer.stem("sing") == "sing")
    assert(Stemmer.stem("conflated") == "conflat")
    assert(Stemmer.stem("troubled") == "troubl")
    assert(Stemmer.stem("sized") == "size")
    assert(Stemmer.stem("hopping") == "hop")
    assert(Stemmer.stem("falling") == "fall")
    assert(Stemmer.stem("hissing") == "hiss")
    assert(Stemmer.stem("failing") == "fail")
  }

  test("steps 2-4: derivational suffixes") {
    assert(Stemmer.stem("relational") == "relat")
    assert(Stemmer.stem("conditional") == "condit")
    assert(Stemmer.stem("valenci") == "valenc")
    assert(Stemmer.stem("digitizer") == "digit")
    assert(Stemmer.stem("operator") == "oper")
    assert(Stemmer.stem("triplicate") == "triplic")
    assert(Stemmer.stem("hopeful") == "hope")
    assert(Stemmer.stem("goodness") == "good")
    assert(Stemmer.stem("revival") == "reviv")
    assert(Stemmer.stem("adjustment") == "adjust")
    assert(Stemmer.stem("dependent") == "depend")
    assert(Stemmer.stem("adoption") == "adopt")
    assert(Stemmer.stem("activate") == "activ")
  }

  test("step 5 and short-word guard") {
    assert(Stemmer.stem("probate") == "probat")
    assert(Stemmer.stem("rate") == "rate")
    assert(Stemmer.stem("controll") == "control")
    assert(Stemmer.stem("roll") == "roll")
    assert(Stemmer.stem("to") == "to")
    assert(Stemmer.stem("a") == "a")
  }

  test("stemTokens UDF maps over arrays and keeps nulls") {
    import TestSpark.spark
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val got = Seq(Seq("running", "flies", "cats"))
      .toDF("toks").select(Stemmer.stemTokens(col("toks")))
      .as[Seq[String]].head()
    assert(got == Seq("run", "fli", "cat"))
  }
}
