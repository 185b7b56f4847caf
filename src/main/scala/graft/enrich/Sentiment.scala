package graft.enrich

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Lexicon-based sentiment polarity — the Spark-native re-expression of the
  * reference's TextBlob call (S/kinesis_processing_2.py:82-83, SURVEY
  * F9/U4). TextBlob's polarity IS a published lexicon average (the
  * pattern-en lexicon: mean polarity of matched words, 0.0 when none
  * match); we implement the same algorithm over our own pinned lexicon —
  * exact-value parity with TextBlob is impossible without its lexicon data,
  * which is documented divergence (SURVEY §7.3).
  *
  * Two forms:
  *  - [[polarityExpr]]: pure column expression (map lookup via a literal
  *    map + higher-order fold) — codegen-friendly, no shuffle, preferred on
  *    the 100 TB path.
  *  - The SQL-oracle form in EnrichQueries uses an explode→join→agg shape
  *    to prove the semantics relationally.
  *
  * Polarities are decimal(4,2) literals summed exactly, divided as doubles
  * only at the end (determinism toolkit — see graft.util.Det).
  */
object Sentiment {

  /** Pinned polarity lexicon (word → polarity in [-1, 1], 2 decimals). */
  val lexicon: Seq[(String, Double)] = Seq(
    "fast" -> 0.80, "slow" -> -0.70, "big" -> 0.30, "small" -> -0.20,
    "good" -> 0.90, "bad" -> -0.90, "great" -> 1.00, "terrible" -> -1.00,
    "dup" -> -0.40, "merge" -> 0.20, "error" -> -0.80, "fail" -> -0.90,
    "clean" -> 0.60, "dirty" -> -0.60, "best" -> 1.00, "worst" -> -1.00,
    "happy" -> 0.85, "sad" -> -0.75, "spark" -> 0.50, "value" -> 0.40)

  /** Lexicon as a DuckDB VALUES list: `('fast', 0.80), ...`. */
  def lexiconSqlValues: String =
    lexicon.map { case (w, p) =>
      f"('$w', CAST($p%.2f AS DECIMAL(4,2)))"
    }.mkString(", ")

  /** Average polarity of matched tokens as a single column expression.
    * Sums decimal(4,2) polarities via a sequential fold (exact integer
    * cents under the hood), divides as double at the end; 0.0 when no
    * token matches — TextBlob's convention for empty matches.
    */
  def polarityExpr(tokens: Column): Column = {
    val lexMap = map(lexicon.flatMap { case (w, p) =>
      Seq(lit(w), lit(p).cast("decimal(4,2)"))
    }: _*)
    val matched = filter(transform(tokens, t => element_at(lexMap, t)),
      p => p.isNotNull)
    val n = size(matched)
    // re-cast the accumulator each step: decimal + decimal widens the type
    // (12,2)+(4,2)→(13,2) and `aggregate` requires a stable accumulator type
    val total = aggregate(matched, lit(0).cast("decimal(12,2)"),
      (a, x) => (a + x).cast("decimal(12,2)"))
    when(n > 0, total.cast("double") / n).otherwise(lit(0.0))
  }
}
