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
  *  2. the refresh is ONE union-aggregate (r15): the current view rows
  *     and the signed changelog rows union into a single per-group SUM
  *     — no [[GraftCDC.netChangesOf]] pass and no join, because for
  *     distributive aggregates the net cancellation is arithmetically
  *     redundant (a COW rewrite's same-version delete+insert pair of
  *     identical content contributes +x−x = 0 to every signed sum).
  *     One shuffle over O(changed rows), never O(table);
  *  3. groups the DML created appear (delta rows only), groups whose
  *     count reaches zero are filtered out, everything else adjusts;
  *  4. `INSERT OVERWRITE` republishes the view table (itself a
  *     versioned graft-store table, so the refresh is atomic and the
  *     previous view state stays time-travelable).
  *
  * Scale: the refresh's INPUT is the changelog (planned as manifest
  * diffs, O(changed files)) and its STATE is the view (group-count
  * sized). The one full-table scan in a view's lifetime is its initial
  * materialization. The view overwrite rewrites the whole view — view
  * tables are aggregate-sized. A view with a very large group space
  * PARTITIONS on a group column and refreshes with
  * [[refreshAggregatePartitioned]] (VERDICT r15 task 5): only touched
  * partitions republish (dynamic partition overwrite), vanished
  * partitions get the explicit DELETE dynamic overwrite cannot
  * express, untouched partitions keep their exact files.
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
    * Returns the number of changelog rows consumed (the refresh's
    * entire data input — SourcesSpec pins that it equals the changelog
    * size, not the base table size; observed on the refresh action
    * itself, zero extra jobs).
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
      sums: Seq[(String, String)]): Long =
    refreshFrom(spark, changelog.sparkSession.table(viewTable), changelog,
      viewTable, groupCols, countCol, sums)

  private def refreshFrom(spark: SparkSession, view: DataFrame,
      changelog: DataFrame, viewTable: String, groupCols: Seq[String],
      countCol: String, sums: Seq[(String, String)]): Long = {
    require(groupCols.nonEmpty, "graft-ivm: at least one group column")
    // every frame of the refresh must live on the CHANGELOG's session:
    // inside foreachBatch the batch frame belongs to the stream's cloned
    // session, and an action run through a different session fires its
    // execution events on that session's listener bus — the Observation
    // (registered where .observe ran) would wait forever
    require(view.sparkSession eq changelog.sparkSession,
      "graft-ivm: the view and changelog frames must share one SparkSession")
    // the consumed-row metric rides the refresh action itself
    // (Observation = zero extra job; r15: a separate count() forced a
    // second full changelog read — with the row-index seek reads that
    // second pass was HALF the refresh's remaining wall clock)
    val obs = org.apache.spark.sql.Observation(
      s"graft_ivm_${java.util.UUID.randomUUID().toString.take(8)}")
    val sign = when(col(GraftChanges.ChangeTypeColumn) === "insert", 1L)
      .otherwise(-1L)
    // signed changelog rows in the VIEW's shape: +row/-row for COUNT,
    // ±value per SUM (null measures contribute nothing, like SQL SUM)
    val deltas = changelog
      .observe(obs, count(lit(1)).as("consumed"))
      .select((groupCols.map(col) :+ sign.as(countCol)) ++
        sums.map { case (viewCol, baseCol) =>
          (sign * col(baseCol)).as(viewCol)
        }: _*)
    // ONE union-aggregate applies the deltas to the current view state
    // — a single shuffle; the coalesce keeps the documented "all-null
    // group sums to 0" contract where SQL SUM would say NULL
    val applied = view
      .unionByName(deltas)
      .groupBy(groupCols.map(col): _*)
      .agg(sum(col(countCol)).as(countCol),
        sums.map { case (viewCol, _) =>
          coalesce(sum(col(viewCol)), lit(0L)).as(viewCol) }: _*)
      .filter(col(countCol) > 0L)
      .select(view.columns.map(col): _*)

    // direct v2 overwrite — no temp-view/SQL indirection, so the
    // refresh runs entirely on ONE session (inside foreachBatch that is
    // the stream's clone; a temp view would register on one session's
    // catalog and resolve — or hang the Observation — on another's)
    applied.writeTo(viewTable).overwrite(lit(true))
    observed(obs, changelog)
  }

  /** The observed consumed-row metric, with a BOUNDED wait (the
    * listener fires asynchronously after the action) and a defensive
    * count fallback — a refresh must never hang on a lost metric.
    */
  private def observed(obs: org.apache.spark.sql.Observation,
      changelog: DataFrame): Long =
    try {
      import scala.concurrent.duration._
      scala.concurrent.Await.result(obs.future, 30.seconds)
        .getAs[Long]("consumed")
    } catch {
      case _: java.util.concurrent.TimeoutException => changelog.count()
    }

  /** PARTITIONED-VIEW refresh (VERDICT r15 task 5): for a view
    * PARTITIONED ON one of its group columns, republish ONLY the
    * partitions the changelog touches — dynamic partition overwrite for
    * partitions with surviving groups, plus the partition DELETE that
    * dynamic overwrite cannot express (a touched partition whose groups
    * all vanished would otherwise keep its stale files: overwrite
    * replaces only partitions present in the written data). Untouched
    * view partitions keep their exact files across a refresh
    * (SourcesSpec pins names + mtimes + bytes), so a view with a large
    * group space pays O(touched partitions), not O(view).
    *
    * The refresh is the same union-aggregate, with the view side PRUNED
    * to the touched partitions (a store partition-pruned scan). The
    * touched-partition values are collected to the driver — view
    * partition columns are low-cardinality by design (that is what
    * makes them partition columns). The republish is two commits
    * (overwrite, then the vanished-partition delete); a reader between
    * them sees refreshed survivors and a stale vanished partition —
    * the same visibility class as any multi-statement maintenance.
    * Same range-ownership contract as [[refreshAggregate]].
    */
  def refreshAggregatePartitioned(spark: SparkSession, changelog: DataFrame,
      viewTable: String, partitionCol: String, groupCols: Seq[String],
      countCol: String, sums: Seq[(String, String)]): Long = {
    require(groupCols.contains(partitionCol),
      s"graft-ivm: view partition column '$partitionCol' must be a group column")
    val obs = org.apache.spark.sql.Observation(
      s"graft_ivm_${java.util.UUID.randomUUID().toString.take(8)}")
    val sign = when(col(GraftChanges.ChangeTypeColumn) === "insert", 1L)
      .otherwise(-1L)
    val session = changelog.sparkSession // see refreshFrom: one session
    val touched: Seq[Any] = changelog.select(col(partitionCol)).distinct()
      .collect().map(_.get(0)).toSeq
    if (touched.isEmpty) return 0L
    val view = session.table(viewTable)
    val deltas = changelog
      .observe(obs, count(lit(1)).as("consumed"))
      .select((groupCols.map(col) :+ sign.as(countCol)) ++
        sums.map { case (viewCol, baseCol) =>
          (sign * col(baseCol)).as(viewCol)
        }: _*)
    val applied = view
      .filter(col(partitionCol).isInCollection(touched)) // pruned scan
      .unionByName(deltas)
      .groupBy(groupCols.map(col): _*)
      .agg(sum(col(countCol)).as(countCol),
        sums.map { case (viewCol, _) =>
          coalesce(sum(col(viewCol)), lit(0L)).as(viewCol) }: _*)
      .filter(col(countCol) > 0L)
      .select(view.columns.map(col): _*)
      .cache()
    try {
      val survived: Set[Any] = applied.select(col(partitionCol)).distinct()
        .collect().map(_.get(0)).toSet
      if (survived.nonEmpty)
        applied.writeTo(viewTable).overwritePartitions()
      // vanished partitions: dynamic overwrite cannot "replace with
      // nothing" — an explicit partition DELETE finishes the refresh
      val vanished = touched.filterNot(survived)
      if (vanished.nonEmpty) {
        val pred = vanished.map {
          case s: String => s"$partitionCol = '${s.replace("'", "''")}'"
          case other     => s"$partitionCol = $other"
        }.mkString(" OR ")
        session.sql(s"DELETE FROM $viewTable WHERE $pred")
      }
      // the survived-collect executed the observed subtree either way
      observed(obs, changelog)
    } finally { applied.unpersist(); () }
  }

  // ------------------------------------------------- streaming (r15)

  /** The APPLIED-WATERMARK binding: `_IVM_APPLIED` in the VIEW table's
    * directory records `(applied base version, view version at that
    * point)`. It is what removes the batch form's sharp edge for the
    * streaming refresh: foreachBatch is at-least-once, so a replayed
    * batch must either be SKIPPED (its range is at or below the
    * watermark) or recomputed FROM THE PINNED view version — the view
    * state the watermark named — so a crash between the view overwrite
    * and the watermark write replays to the identical result instead of
    * double-applying the deltas.
    */
  private val AppliedMarker = "_IVM_APPLIED"

  /** Declare that `viewPath`'s current contents reflect the base table
    * AS OF `appliedVersion` — call ONCE, right after materializing the
    * view. [[streamRefresh]] refuses to run without it (an unbound view
    * cannot be replay-protected: a crashed first batch would otherwise
    * re-apply onto its own output).
    */
  def bind(viewPath: String, appliedVersion: Long): Unit = {
    val root = new java.io.File(viewPath)
    val viewV = GraftCommit.currentManifestVersion(root).getOrElse(
      throw new IllegalStateException(
        s"graft-ivm: $viewPath is not a versioned table — materialize the " +
          "view through the catalog first"))
    GraftCommit.writeAtomic(root, AppliedMarker, s"$appliedVersion\t$viewV\n")
  }

  /** The current binding: (applied base version, view version). */
  def binding(viewPath: String): Option[(Long, Long)] = {
    val f = new java.io.File(viewPath, AppliedMarker)
    if (!f.isFile) None
    else {
      val t = new String(java.nio.file.Files.readAllBytes(f.toPath),
        java.nio.charset.StandardCharsets.UTF_8).trim.split("\t")
      require(t.length == 2,
        s"graft-ivm: malformed $AppliedMarker under $viewPath")
      Some((t(0).toLong, t(1).toLong))
    }
  }

  /** Apply ONE changelog batch exactly-once (the foreachBatch body of
    * [[streamRefresh]], public so the replay contract is directly
    * testable). Returns the changelog rows consumed; 0 for an empty or
    * already-applied (replayed) batch.
    */
  def applyBatchExactlyOnce(spark: SparkSession, batch: DataFrame,
      viewTable: String, viewPath: String, groupCols: Seq[String],
      countCol: String, sums: Seq[(String, String)]): Long = {
    val (applied, viewV) = binding(viewPath).getOrElse(
      throw new IllegalStateException(
        s"graft-ivm: no $AppliedMarker under $viewPath — call " +
          "GraftIVM.bind(viewPath, baseVersion) after materializing the view"))
    val hiRow = batch.agg(max(col(GraftChanges.CommitVersionColumn))).head()
    if (hiRow.isNullAt(0)) return 0L // empty batch
    val hi = hiRow.getLong(0)
    // full replay of an applied batch: skip (the checkpoint will move on)
    if (hi <= applied) return 0L
    // a batch may STRADDLE the watermark (e.g. a restart whose
    // checkpoint predates versions applied through the batch API):
    // consume strictly beyond it — the pinned view version below IS the
    // state at `applied`, so anything at or below would double-apply
    val live = batch.filter(col(GraftChanges.CommitVersionColumn) > applied)
    // recompute from the PINNED view state — identical on a partial
    // replay (view already overwritten, watermark not yet advanced)
    val base = batch.sparkSession.read
      .format("graft.sources.GraftStoreProvider")
      .option("path", viewPath)
      .option(GraftStore.VersionAsOfOption, viewV.toString).load()
    val consumed = refreshFrom(spark, base, live, viewTable,
      groupCols, countCol, sums)
    val newViewV = GraftCommit.currentManifestVersion(new java.io.File(viewPath))
      .getOrElse(throw new IllegalStateException(
        s"graft-ivm: view $viewPath lost its manifest mid-refresh"))
    GraftCommit.writeAtomic(new java.io.File(viewPath), AppliedMarker,
      s"$hi\t$newViewV\n")
    consumed
  }

  /** The CHECKPOINTED streaming refresh (VERDICT r15 task 3): the
    * streaming changelog (`readStream` + `changesFrom` at the bound
    * version) drives [[applyBatchExactlyOnce]] through foreachBatch.
    * The CHECKPOINT owns the version ranges (each micro-batch covers
    * the commits since the last), the APPLIED WATERMARK owns replay
    * protection — together they give exactly-once view maintenance
    * with stop/restart, the managed form of the batch API's
    * caller-owned ranges. Call with `Trigger.AvailableNow` for a
    * catch-up-and-stop refresh job, or a processing-time trigger for a
    * continuous one.
    */
  def streamRefresh(spark: SparkSession, basePath: String, viewTable: String,
      viewPath: String, groupCols: Seq[String], countCol: String,
      sums: Seq[(String, String)], checkpoint: String,
      trigger: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.AvailableNow())
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val (applied, _) = binding(viewPath).getOrElse(
      throw new IllegalStateException(
        s"graft-ivm: no $AppliedMarker under $viewPath — call " +
          "GraftIVM.bind(viewPath, baseVersion) after materializing the view"))
    spark.readStream.format("graft.sources.GraftStoreProvider")
      .option("path", basePath)
      .option(GraftChanges.ChangesFromOption, applied.toString).load()
      .writeStream
      .foreachBatch { (df: DataFrame, _: Long) =>
        applyBatchExactlyOnce(spark, df, viewTable, viewPath,
          groupCols, countCol, sums)
        ()
      }
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .start()
  }
}
