package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A named engine query plus its DuckDB oracle (None → driver does a
  * rows-only check; used for probabilistic / streaming-stateful /
  * binary-payload operators whose outputs aren't ANSI-SQL-expressible).
  *
  * `planFn`: for queries whose runtime form eagerly checkpoints interior
  * frames (the ADVICE r5/r6 cache-release pattern — the checkpoint
  * collapses everything behind it to a LogicalRDD leaf), the SAME
  * composition built lazily with no checkpoint/cache-release, so plan
  * audits (PlanAuditSpec, PlanSpec) can still inspect the full physical
  * plan. Semantically identical to `fn`; never run for results.
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    doc: String,
    planFn: Option[(SparkSession, String) => DataFrame] = None)

/** Aggregates every module's queries into the driver contract maps. */
object Registry {
  def all: Seq[QueryDef] =
    analyze.Eda.defs ++
      ingest.SourceQueries.defs ++
      clean.TextQueries.defs ++
      enrich.EnrichQueries.defs ++
      serve.ServeQueries.defs ++
      dedup.DedupQueries.defs ++
      similarity.SimilarityQueries.defs ++
      multimodal.MultimodalQueries.defs ++
      streaming.StreamingQueries.defs ++
      relational.OperatorQueries.defs ++
      pipeline.PipelineQueries.defs ++
      ml.MlPrepQueries.defs ++
      ml.MlTrainQueries.defs ++
      curation.CurationQueries.defs

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.fn).toMap

  def oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(q.name -> _)).toMap

  /** Plan-audit form: the lazy un-checkpointed composition where one
    * exists, the runtime form otherwise.
    */
  def planForms: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.planFn.getOrElse(q.fn)).toMap
}
