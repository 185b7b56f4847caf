package graft.ml

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}

/** ML data-preparation operators — the relational prep stages behind the
  * reference's ML path (PPTX slides 13-16: class rebalancing to equal
  * sizes, feature engineering, then an SGD classifier; the classifier
  * itself is out of a query engine's scope, the data prep is squarely in
  * it). Everything is deterministic hash/order arithmetic → fully oracled.
  */
object MlPrepQueries {

  /** Deterministic 80/10/10 train/val/test split: the split is a pure
    * function of the row key (hash-mod bucketing), so it is stable across
    * runs, cluster sizes, and re-partitioning — the property that makes a
    * split reproducible at 100 TB (a random() split is none of those).
    * Emits per-split per-label counts — the audit every training run logs.
    */
  private def q104(s: SparkSession, d: String): DataFrame = {
    val bucket = pmod(col("doc_id") * 2654435761L, lit(100L))
    Tables.documents(s, d)
      .select(col("doc_id"), col("lang"),
        when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test").as("split"))
      .groupBy("split", "lang")
      .agg(count(lit(1)).as("n"), min("doc_id").as("first_doc"))
      .orderBy("split", "lang")
  }

  private val q104Sql =
    """WITH assigned AS (
      |  SELECT doc_id, lang,
      |    CASE WHEN (doc_id * 2654435761) % 100 < 80 THEN 'train'
      |         WHEN (doc_id * 2654435761) % 100 < 90 THEN 'val'
      |         ELSE 'test' END AS split
      |  FROM documents)
      |SELECT split, lang, count(*) AS n, min(doc_id) AS first_doc
      |FROM assigned GROUP BY 1, 2 ORDER BY split, lang""".stripMargin

  /** Class rebalancing by downsampling (the relational side of the
    * reference's SMOTE step — equal samples per class, PPTX slide 13):
    * every label keeps exactly min-class-size rows, selected by hash rank
    * so the choice is deterministic and unbiased by storage order. The
    * per-label window ranks only within classes (parallel across labels);
    * the cap is a broadcast scalar.
    */
  private def q105(s: SparkSession, d: String): DataFrame = {
    val e = Tables.embeddings(s, d)
    val minClass = e.groupBy("label").agg(count(lit(1)).as("n"))
      .agg(min("n").as("cap"))
    val w = Window.partitionBy("label")
      .orderBy(pmod(col("vec_id") * 2654435761L, lit(1000000007L)), col("vec_id"))
    e.select(col("vec_id"), col("label"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .crossJoin(broadcast(minClass))
      .filter(col("rk") <= col("cap"))
      .groupBy("label")
      .agg(count(lit(1)).as("n_kept"), min("vec_id").as("first_kept"))
      .orderBy("label")
  }

  private val q105Sql =
    """WITH cap AS (
      |  SELECT min(n) AS cap FROM (SELECT count(*) AS n FROM embeddings GROUP BY label)),
      |ranked AS (
      |  SELECT vec_id, label,
      |    row_number() OVER (PARTITION BY label
      |      ORDER BY (vec_id * 2654435761) % 1000000007, vec_id) AS rk
      |  FROM embeddings)
      |SELECT label, count(*) AS n_kept, min(vec_id) AS first_kept
      |FROM ranked, cap WHERE rk <= cap
      |GROUP BY label ORDER BY label""".stripMargin

  /** Min-max feature scaling (fit + transform in one plan): per-feature
    * min/max are exact order-insensitive aggregates, broadcast back, and
    * each value maps to (x − min)/(max − min) — deterministic double
    * arithmetic on exact inputs. The fit is one narrow aggregate over the
    * (feature, value) stream; the transform is shuffle-free against the
    * broadcast params — the standard distributed scaler shape.
    */
  private def q106(s: SparkSession, d: String): DataFrame = {
    val dims = Tables.embeddings(s, d)
      .select(col("vec_id"), posexplode(col("embedding")).as(Seq("dim", "v")))
      .filter(col("dim") < 4)
      .select(col("vec_id"), col("dim").cast("long").as("dim"),
        col("v").cast("double").as("v"))
    val params = dims.groupBy("dim")
      .agg(min("v").as("lo"), max("v").as("hi"))
    dims.join(broadcast(params), "dim")
      .filter(col("vec_id") < 50)
      .select(col("vec_id"), col("dim"),
        when(col("hi") > col("lo"), (col("v") - col("lo")) / (col("hi") - col("lo")))
          .otherwise(0.0).as("scaled"))
      .orderBy("vec_id", "dim")
  }

  private val q106Sql =
    """WITH expl AS (
      |  SELECT vec_id, CAST(i - 1 AS BIGINT) AS dim, CAST(embedding[i] AS DOUBLE) AS v
      |  FROM embeddings, LATERAL (SELECT unnest(range(1, len(embedding) + 1)) AS i) t
      |  WHERE i - 1 < 4),
      |params AS (SELECT dim, min(v) AS lo, max(v) AS hi FROM expl GROUP BY dim)
      |SELECT e.vec_id, e.dim,
      |  CASE WHEN p.hi > p.lo THEN (e.v - p.lo) / (p.hi - p.lo) ELSE 0.0 END AS scaled
      |FROM expl e JOIN params p ON e.dim = p.dim
      |WHERE e.vec_id < 50
      |ORDER BY e.vec_id, e.dim""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q104_dataset_split", q104, Some(q104Sql), "deterministic hash train/val/test split"),
    QueryDef("q105_class_balance", q105, Some(q105Sql), "equal-size class downsampling (SMOTE prep)"),
    QueryDef("q106_minmax_scale", q106, Some(q106Sql), "min-max feature scaling fit+transform"))
}
