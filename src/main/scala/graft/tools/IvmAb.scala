package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only A/B for [[graft.sources.GraftIVM]] (VERDICT r13 task 2's
  * payoff, quantified): maintain a per-key COUNT/SUM view over an
  * N-row store table through a small mixed DML batch (append + COW
  * delete + merge-on-read update), then time
  *
  *   (a) the INCREMENTAL refresh — net changelog in, signed deltas,
  *       view republish; input is O(changed rows);
  *   (b) the reference pattern — full recompute of the view from the
  *       base table (`S/reddit_lambda.py:71-108`'s shape), which costs
  *       a full scan EVERY cycle.
  *
  * Both paths end in the same view-table overwrite, so the delta is
  * the read side: changelog vs table. The gap widens linearly with
  * base size at fixed churn — the 100 TB argument in one number.
  * Usage: runMain graft.tools.IvmAb [rows]
  */
object IvmAb {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toLong else 8000000L
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("spark.sql.catalog.graft", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graft.warehouse",
      graft.util.TempDirs.create("graft_ivmab_wh_"))
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.ab")
    spark.sql("DROP TABLE IF EXISTS graft.ab.base")
    spark.sql("DROP TABLE IF EXISTS graft.ab.view")
    spark.sql("CREATE TABLE graft.ab.base (id BIGINT, k BIGINT, v BIGINT)")
    spark.range(0, n).selectExpr("id", "id % 64 AS k", "id AS v")
      .createOrReplaceTempView("ivmab_src")
    // RANGE-clustered base: the time-ordered layout an append-mostly
    // table has, where churn (old-range deletes, recent-range updates)
    // is FILE-LOCALIZED. With hash placement instead, every file holds
    // some churn, changed-files = all-files, and the changelog read
    // degenerates to a table scan — measured: 10.5 s vs 1.7 s at 32M.
    // Localization is the property that makes IVM (and MOR DML) pay.
    spark.sql("INSERT INTO graft.ab.base SELECT /*+ REPARTITION_BY_RANGE(32, id) */ * FROM ivmab_src")
    spark.sql("CREATE TABLE graft.ab.view (k BIGINT, n BIGINT, sv BIGINT)")
    spark.sql("""INSERT INTO graft.ab.view
                |SELECT k, count(*), sum(v) FROM graft.ab.base GROUP BY k""".stripMargin)
    val wh = spark.conf.get("spark.sql.catalog.graft.warehouse")
    val tpath = s"$wh/ab/base"
    val v0 = graft.sources.GraftMaintenance.currentVersion(tpath).get

    // the churn: ~0.1% of the table (append + delete + update), run in
    // AUTO DML mode — sparse hits take deletion vectors, so the
    // changelog stays PROPORTIONAL TO CHURN. (Measured first with a COW
    // delete: the rewrite republishes its file's 250k kept rows, the
    // changelog reads them all just to cancel them relationally, and
    // the "incremental" refresh LOSES to the full recompute 9.1 s vs
    // 1.3 s — write-path choice and changelog economics are the same
    // decision; auto makes it per file.)
    val churn = math.max(1000L, n / 1000)
    spark.range(n, n + churn).selectExpr("id", "id % 64 AS k", "id AS v")
      .createOrReplaceTempView("ivmab_add")
    spark.sql("INSERT INTO graft.ab.base SELECT /*+ REPARTITION(1) */ * FROM ivmab_add")
    spark.conf.set("spark.graft.store.delete.mode", "auto")
    spark.conf.set("spark.graft.store.update.mode", "auto")
    try {
      spark.sql(s"DELETE FROM graft.ab.base WHERE id < ${churn / 2}")
      spark.sql(
        s"UPDATE graft.ab.base SET v = v + 1 WHERE id >= ${n - churn / 2} AND id < $n")
    } finally {
      spark.conf.unset("spark.graft.store.delete.mode")
      spark.conf.unset("spark.graft.store.update.mode")
    }

    def timed(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    // (a) incremental: consume only the changelog
    val changelog = spark.sql(
      s"SELECT * FROM graft.ab.base.changes WHERE _commit_version > $v0")
    var consumed = 0L
    val tInc = timed {
      consumed = graft.sources.GraftIVM.refreshAggregate(spark, changelog,
        "graft.ab.view", Seq("k"), "n", Seq("sv" -> "v"))
    }
    // (b) the reference pattern: recompute from the whole base
    val tFull = timed {
      spark.sql("""INSERT OVERWRITE TABLE graft.ab.view
                  |SELECT k, count(*), sum(v) FROM graft.ab.base GROUP BY k""".stripMargin)
        .collect()
    }
    // both must land on the same state
    val a = spark.table("graft.ab.view").orderBy("k").collect().map(_.toString)
    // the quantity that governs at scale: files READ by each side. The
    // refresh plans only the commits' changed files (manifest diffs);
    // the recompute plans the whole table. Wall-clock at second-scale is
    // dominated by per-job fixed costs — the file ratio is what a
    // minutes-scale (100 TB) cycle inherits.
    val changedFiles = spark.sql(
      s"SELECT * FROM graft.ab.base.changes WHERE _commit_version > $v0")
      .rdd.getNumPartitions
    val tableFiles = spark.table("graft.ab.base").rdd.getNumPartitions
    println(f"[ivmab] rows=$n%d churn=$churn%d changelog=$consumed%d rows: " +
      f"incremental ${tInc}%.2f s vs full recompute ${tFull}%.2f s; " +
      f"files read: changelog $changedFiles%d vs table $tableFiles%d " +
      f"(${tableFiles.toDouble / changedFiles}%.1fx) — groups=${a.length}%d")

    // ---- COW-churn cycle (VERDICT r15 task 4's done-bar): the same
    // refresh economics with a PINNED copy-on-write delete. Pre-pairing
    // this was IVM's designed loss: the rewrite republished its file's
    // ~250k kept rows and the changelog read them all just to cancel
    // them relationally (9.1 s at 8M). With `#rw` pairing the reader
    // merge-diffs old vs new, so the refresh INPUT is ∝ deleted rows.
    val vCow = graft.sources.GraftMaintenance.currentVersion(tpath).get
    spark.conf.set("spark.graft.store.delete.mode", "copy-on-write")
    try spark.sql(
      s"DELETE FROM graft.ab.base WHERE id >= ${churn / 2} AND id < $churn")
    finally spark.conf.unset("spark.graft.store.delete.mode")
    val cowLog = spark.sql(
      s"SELECT * FROM graft.ab.base.changes WHERE _commit_version > $vCow")
    var cowConsumed = 0L
    val tCow = timed {
      cowConsumed = graft.sources.GraftIVM.refreshAggregate(spark, cowLog,
        "graft.ab.view", Seq("k"), "n", Seq("sv" -> "v"))
    }
    val tFull2 = timed {
      spark.sql("""INSERT OVERWRITE TABLE graft.ab.view
                  |SELECT k, count(*), sum(v) FROM graft.ab.base GROUP BY k""".stripMargin)
        .collect()
    }
    println(f"[ivmab-cow] cow-delete churn=${churn / 2}%d: refresh input " +
      f"$cowConsumed%d rows (paired diff; pre-r15 this was the rewrite's " +
      f"whole kept set), incremental ${tCow}%.2f s vs full recompute " +
      f"${tFull2}%.2f s")

    // ---- MERGE-churn cycle (VERDICT r16 task 1's done-bar): the CDC
    // upsert shape under PINNED copy-on-write. The matched window sits
    // inside one range file, so runtime group filtering scans exactly
    // one file, the commit records the directory-level pairing, and the
    // reader hash-diffs old vs new — refresh input ∝ updated rows
    // (pre-r16 a cow-merge paid the full old+new diff of the rewritten
    // file: r14 economics).
    val vMrg = graft.sources.GraftMaintenance.currentVersion(tpath).get
    spark.range(n - churn, n - churn / 2)
      .selectExpr("id", "id % 64 AS k", "-1L AS v")
      .createOrReplaceTempView("ivmab_upsert")
    spark.conf.set("spark.graft.store.merge.mode", "copy-on-write")
    try spark.sql(
      """MERGE INTO graft.ab.base t USING ivmab_upsert s ON t.id = s.id
        |WHEN MATCHED THEN UPDATE SET v = s.v""".stripMargin)
    finally spark.conf.unset("spark.graft.store.merge.mode")
    val vMrg2 = graft.sources.GraftMaintenance.currentVersion(tpath).get
    val paired = scala.jdk.CollectionConverters.ListHasAsScala(
      java.nio.file.Files.readAllLines(
        java.nio.file.Paths.get(tpath, s"_MANIFEST.v$vMrg2"))).asScala
      .count(_.startsWith("#rw="))
    val mrgLog = spark.sql(
      s"SELECT * FROM graft.ab.base.changes WHERE _commit_version > $vMrg")
    var mrgConsumed = 0L
    val tMrg = timed {
      mrgConsumed = graft.sources.GraftIVM.refreshAggregate(spark, mrgLog,
        "graft.ab.view", Seq("k"), "n", Seq("sv" -> "v"))
    }
    val tFull3 = timed {
      spark.sql("""INSERT OVERWRITE TABLE graft.ab.view
                  |SELECT k, count(*), sum(v) FROM graft.ab.base GROUP BY k""".stripMargin)
        .collect()
    }
    println(f"[ivmab-merge] cow-merge churn=${churn / 2}%d (paired files: " +
      f"$paired%d): refresh input $mrgConsumed%d rows (dir-level pairing " +
      f"+ hash diff; unpaired this is the whole old+new set), incremental " +
      f"${tMrg}%.2f s vs full recompute ${tFull3}%.2f s")
    // pairing vs the r14 fallback, same version: read + cancel cost of
    // the paired in-reader diff against the plain diff + relational
    // netChanges (what an unpaired cow-merge consumer must run). Both
    // read the same old+new bytes; the paired form EMITS only churn.
    var pairedRows = 0L
    val tPairedRead = timed {
      pairedRows = spark.sql(
        s"SELECT * FROM graft.ab.base.changes WHERE _commit_version > $vMrg")
        .count()
    }
    val hist = new java.io.File(tpath, s"_MANIFEST.v$vMrg2")
    val body = new String(java.nio.file.Files.readAllBytes(hist.toPath),
      java.nio.charset.StandardCharsets.UTF_8)
    java.nio.file.Files.write(hist.toPath, body.linesIterator
      .filterNot(_.startsWith("#rw=")).mkString("", "\n", "\n")
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    var unpairedRows = 0L
    val tUnpairedRead = timed {
      unpairedRows = graft.sources.GraftCDC.netChangesOf(spark.sql(
        s"SELECT * FROM graft.ab.base.changes WHERE _commit_version > $vMrg"))
        .count()
    }
    java.nio.file.Files.write(hist.toPath,
      body.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    println(f"[ivmab-merge] paired read+cancel: $pairedRows%d rows out in " +
      f"${tPairedRead}%.2f s; unpaired plain diff + relational netChanges: " +
      f"$unpairedRows%d rows through the shuffle in ${tUnpairedRead}%.2f s")
    spark.stop()
  }
}
