package graft.enrich

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The hot-path enrichment block — `preprocess_record`
  * (S/kinesis_processing_2.py:48-102, SURVEY U3) as a single `withColumns`
  * expression set: post age (D5), popularity score (M1), media/text
  * classification (M4), day/night bucket (D6), title length (F12). All
  * row-local arithmetic — embarrassingly parallel, no shuffle, whole-stage
  * codegen'd. The one stateful feature (author activity count, W2/ST5) is a
  * window function in batch and a stateful streaming agg in
  * streaming/Pipeline.scala.
  */
object Features {

  /** Post age in minutes relative to a supplied "now" (the reference uses
    * wall-clock `datetime.utcnow()` — S/proc.py:86-87; a fixed literal
    * keeps the operator deterministic for the oracle).
    */
  def ageMinutes(ts: Column, nowEpochSec: Long): Column =
    (lit(nowEpochSec) - unix_timestamp(ts)).cast("double") / 60.0

  /** popularity_score = score×upvote_ratio + 0.5×num_comments
    * (S/kinesis_processing_2.py:90), with the `.get('upvote_ratio', 0)`
    * default as coalesce (SURVEY §7.4 sharp edge).
    */
  def popularityScore(score: Column, upvoteRatio: Column, numComments: Column): Column =
    score * coalesce(upvoteRatio, lit(0.0)) + lit(0.5) * numComments.cast("double")

  /** 'media' if thumbnail != 'self' else 'text' (S/kinesis_processing_2.py:93). */
  def postType(thumbnail: Column): Column =
    when(thumbnail =!= "self", "media").otherwise("text")

  /** 'day' iff 6 <= hour < 18 else 'night' (S/kinesis_processing_2.py:96). */
  def timeOfDay(ts: Column): Column =
    when(hour(ts).between(6, 17), "day").otherwise("night")
}
