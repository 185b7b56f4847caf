package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** INCREMENTAL VIEW MAINTENANCE over the store changelog (VERDICT r13
  * task 2 — the last mile of the CDC work): a materialized aggregate
  * view is REFRESHED by consuming only the net row-level changes since
  * the version it was built at, never by rescanning the base table.
  * This is the table-format answer to the reference's serving refresh
  * loop (`S/reddit_lambda.py:71-108` recomputes `latest-data.csv` from
  * scratch on every run — the exact pattern IVM exists to kill).
  *
  * Supported view shape: the distributive aggregates — per-group
  * COUNT(*) plus any number of SUM(col) — which are exactly the ones
  * maintainable from signed deltas without re-aggregation state:
  *
  *   view(vB) = view(vA) ⊎ Σ over net changes (vA, vB] of
  *              (+1/-1 per row for COUNT, ±value per row for each SUM)
  *
  * (MIN/MAX are NOT maintainable this way — a delete of the current
  * minimum needs the base data to find the runner-up — and are refused
  * by construction: they simply aren't in the view contract.)
  *
  * The algebra was spec-proven against append / COW-delete / MOR-update
  * commits in round 13; this wires it as an OPERATOR:
  *
  *  1. the caller hands the raw changelog slice — either the reader-
  *     options form ([[GraftCDC.changes]]) or the pure-SQL metadata
  *     table (`SELECT * FROM cat.db.t.changes WHERE _commit_version >
  *     v`, VERDICT r13 task 3) — both shapes carry `_change_type` +
  *     `_commit_version`;
  *  2. [[GraftCDC.netChangesOf]] cancels same-version COW rewrite noise
  *     relationally (a distributed aggregate, not a driver loop);
  *  3. the signed per-group deltas are ONE aggregate over the net
  *     changes — O(changed rows), never O(table);
  *  4. a full-outer join against the current view applies the deltas:
  *     groups the DML created appear, groups whose count reaches zero
  *     disappear, everything else adjusts in place;
  *  5. `INSERT OVERWRITE` republishes the view table (itself a
  *     versioned graft-store table, so the refresh is atomic and the
  *     previous view state stays time-travelable).
  *
  * Scale: the refresh's INPUT is the changelog (planned as manifest
  * diffs, O(changed files)) and its STATE is the view (group-count
  * sized). The one full-table scan in a view's lifetime is its initial
  * materialization. The view overwrite rewrites the whole view — view
  * tables are aggregate-sized. A deployment with a very large group
  * space would PARTITION the view on a group column and refresh with
  * `writeTo(view).overwritePartitions()` (the store supports dynamic
  * partition overwrite) so only touched partitions republish — with
  * the one extra step that partitions whose groups all vanished need a
  * partition DELETE (dynamic overwrite cannot express "replace with
  * nothing"); the full-overwrite form here needs no such case.
  *
  * Null contract: COUNT(*) is exact; maintained SUMs treat an all-null
  * group as 0 where SQL reports NULL (nulls contribute nothing to the
  * deltas, so a group whose measure values are all null keeps sum 0) —
  * the standard distributive-IVM divergence, acceptable because the
  * view's own schema declares the sums.
  */
object GraftIVM {

  /** Refresh `viewTable` (catalog-qualified name) from a raw changelog
    * slice of its base table. `countCol` is the view's COUNT(*) column;
    * `sums` maps each view SUM column to the BASE column it sums.
    * Returns the number of net change rows consumed (the refresh's
    * entire data input — SourcesSpec pins that it equals the changelog
    * size, not the base table size).
    *
    * RANGE OWNERSHIP: the caller owns the version bookkeeping, exactly
    * like any changelog consumer — each refresh must cover the half-open
    * range since the previous one (apply a slice twice and the deltas
    * double-apply). Deployments that want managed offsets run the
    * STREAMING changelog (`readStream` + `changesFrom`, checkpointed)
    * into `foreachBatch(refreshAggregate(...))` — the checkpoint then
    * carries the exactly-once range the batch form leaves to the caller.
    */
  def refreshAggregate(spark: SparkSession, changelog: DataFrame,
      viewTable: String, groupCols: Seq[String], countCol: String,
      sums: Seq[(String, String)]): Long = {
    require(groupCols.nonEmpty, "graft-ivm: at least one group column")
    val net = GraftCDC.netChangesOf(changelog)
      // cache: the net changes feed the row-count return AND the delta
      // aggregate; recomputing would read the changed files twice
      .cache()
    val consumed = net.count()

    val sign = when(col(GraftChanges.ChangeTypeColumn) === "insert", 1L)
      .otherwise(-1L)
    val deltaAggs =
      (sum(sign).as(s"_d_$countCol") +:
        sums.map { case (viewCol, baseCol) =>
          sum(sign * col(baseCol)).as(s"_d_$viewCol")
        }).toList
    val delta = net.groupBy(groupCols.map(col): _*)
      .agg(deltaAggs.head, deltaAggs.tail: _*)

    val view = spark.table(viewTable)
    // using-columns full outer join coalesces the group keys: groups new
    // to the view arrive from the delta side, vanished groups filter out
    val refreshed = view.join(delta, groupCols, "full_outer")
      .withColumn(countCol,
        coalesce(col(countCol), lit(0L)) + coalesce(col(s"_d_$countCol"), lit(0L)))
      .filter(col(countCol) > 0L)
    val applied = sums.foldLeft(refreshed) { case (df, (viewCol, _)) =>
      df.withColumn(viewCol,
        coalesce(col(viewCol), lit(0L)) + coalesce(col(s"_d_$viewCol"), lit(0L)))
    }.select(view.columns.map(col): _*)

    val tmp = s"graft_ivm_refresh_${java.util.UUID.randomUUID().toString.take(8)}"
    applied.createOrReplaceTempView(tmp)
    try spark.sql(
      s"INSERT OVERWRITE TABLE $viewTable SELECT * FROM $tmp").collect()
    finally spark.catalog.dropTempView(tmp)
    net.unpersist()
    consumed
  }
}
