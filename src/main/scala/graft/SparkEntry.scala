package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` / `oracleSql` are assembled from the per-module registries in
  * [[Registry]]; each entry is one operator from SURVEY.md §2 (or a
  * beyond-reference LLM-pipeline operator) with, where ANSI-SQL-expressible,
  * a DuckDB oracle the driver hash-compares against.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The star join: orders ⋈ broadcast(customer ⋈ nation ⋈ region) →
    * revenue per region (SURVEY.md §2.3).
    */
  def entry(spark: SparkSession): DataFrame =
    Registry.queries("q08_star_join")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Registry.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] = Registry.oracleSql
}
