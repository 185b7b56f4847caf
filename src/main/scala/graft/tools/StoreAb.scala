package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only A/B of the graft-store ZONE-MAP effects (paired with
  * ColumnarAb's reader A/B): one N-row store range-clustered on `id`
  * into 32 files, then the same probes timed WITH the `_STATS` sidecar
  * and with it renamed away (skipping/stats-aggregates silently
  * degrade to full scans — the designed fallback), warm-up + min-of-3:
  *   1. a 1%-selective id-window aggregate (file skipping),
  *   2. MIN/MAX/COUNT over a data column (sidecar-answered aggregate),
  *   3. LIMIT 1000 (stats-capped file planning).
  * Usage: runMain graft.tools.StoreAb [rows]
  */
object StoreAb {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toLong else 4000000L
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // 256 files over 32 cores: an unskipped scan needs 8 task waves, a
    // skipped one a fraction of a wave — with files == cores the skip
    // saves CPU but not wall, which is not what the A/B should show
    val dir = graft.util.TempDirs.create("graft_storeab_") + "/t"
    spark.range(0, n, 1, 256)
      .select(col("id"), (col("id") * 7 % 1001).as("v"),
        concat(lit("w"), (col("id") % 1000).cast("string")).as("s"))
      .repartitionByRange(256, col("id"))
      .write.format("graft.sources.GraftStoreProvider")
      .option("path", dir).mode("overwrite").save()

    def t(label: String)(mk: => org.apache.spark.sql.DataFrame): Double = {
      mk.collect()
      val best = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); mk.collect(); (System.nanoTime() - t0) / 1e9
      }.min
      best
    }
    def read() = spark.read.format("graft.sources.GraftStoreProvider")
      .option("path", dir).load()
    val lo = n / 2
    val hi = lo + n / 100
    def probe() = read().filter(col("id") >= lo && col("id") < hi)
      .agg(sum("v"), count(lit(1)))
    def statsAgg() = read().agg(min("v"), max("v"), count(col("s")))
    def lim() = read().limit(1000).agg(count(lit(1)))

    def run(tag: String): (Double, Double, Double) =
      (t(s"$tag probe")(probe()), t(s"$tag agg")(statsAgg()), t(s"$tag limit")(lim()))

    val (p1, a1, l1) = run("with-stats")
    Files.move(Paths.get(dir, "_STATS"), Paths.get(dir, "_STATS_OFF"))
    val (p0, a0, l0) = run("no-stats")
    Files.move(Paths.get(dir, "_STATS_OFF"), Paths.get(dir, "_STATS"))
    println(f"[storeab] rows=$n%d files=256 " +
      f"probe(1%%): ${p0}%.3f -> ${p1}%.3f s (${p0 / p1}%.1fx) " +
      f"minmaxcount: ${a0}%.3f -> ${a1}%.3f s (${a0 / a1}%.1fx) " +
      f"limit1000: ${l0}%.3f -> ${l1}%.3f s (${l0 / l1}%.1fx)")

    // ---- DELETION-VECTOR A/B (VERDICT r12 task 3): the same sparse
    // DELETE (~n/100001 rows spread across files) as a COW rewrite vs a
    // merge-on-read DV commit, on two catalog copies of the store; then
    // the full-scan read-path cost with the DVs applied vs clean.
    spark.conf.set("spark.sql.catalog.graft", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graft.warehouse",
      graft.util.TempDirs.create("graft_storeab_wh_"))
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.ab")
    def mkCopy(name: String): String = {
      spark.sql(s"DROP TABLE IF EXISTS graft.ab.$name")
      spark.sql(s"CREATE TABLE graft.ab.$name (id BIGINT, v BIGINT, s STRING)")
      read().createOrReplaceTempView("storeab_src")
      spark.sql(
        s"INSERT INTO graft.ab.$name SELECT /*+ REPARTITION_BY_RANGE(64, id) */ id, v, s FROM storeab_src")
      name
    }
    def timed(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    val cow = mkCopy("cow")
    val dvt = mkCopy("dv")
    // both modes pinned explicitly: the session default is `auto`
    spark.conf.set("spark.graft.store.delete.mode", "copy-on-write")
    val dCow = try timed(spark.sql(
      s"DELETE FROM graft.ab.$cow WHERE id % 100001 = 0"))
    finally spark.conf.unset("spark.graft.store.delete.mode")
    spark.conf.set("spark.graft.store.delete.mode", "merge-on-read")
    val dDv = try timed(spark.sql(
      s"DELETE FROM graft.ab.$dvt WHERE id % 100001 = 0"))
    finally spark.conf.unset("spark.graft.store.delete.mode")
    def scanAgg(name: String) = spark.sql(
      s"SELECT sum(v), count(*) FROM graft.ab.$name WHERE id % 3 = 0")
    scanAgg(cow).collect(); scanAgg(dvt).collect()
    val sCow = (1 to 3).map(_ => timed(scanAgg(cow).collect())).min
    val sDv = (1 to 3).map(_ => timed(scanAgg(dvt).collect())).min
    println(f"[storeab-dv] rows=$n%d sparse-delete: cow ${dCow}%.3f s vs " +
      f"dv ${dDv}%.3f s (${dCow / dDv}%.1fx less write); " +
      f"full-scan read: clean(cow) ${sCow}%.3f s vs dv-applied ${sDv}%.3f s " +
      f"(${sDv / sCow}%.2fx read overhead)")

    // ---- AUTO COW/MOR A/B (VERDICT r13 task 4): a MIXED delete — all
    // of the low 10% of the id range (the low files die ~whole) plus a
    // sparse ~n/100001 sprinkle across the rest — under the three modes.
    // Records: commit wall, NEW data bytes published (write amp; the
    // retired originals stay on disk either way), and the post-delete
    // full-scan cost (the DV read tax auto avoids on mostly-dead files).
    val wh = spark.conf.get("spark.sql.catalog.graft.warehouse")
    val mixedPred = s"(id % 100001 = 1) OR (id < ${n / 10})"
    val autoRes = Seq("copy-on-write", "merge-on-read", "auto").map { m =>
      val name = mkCopy("mix_" + m.replace("-", ""))
      val before = GraftCommit0.allBytes(s"$wh/ab/$name")
      spark.conf.set("spark.graft.store.delete.mode", m)
      val d = try timed(spark.sql(
        s"DELETE FROM graft.ab.$name WHERE $mixedPred"))
      finally spark.conf.unset("spark.graft.store.delete.mode")
      // lock-hold of the delta commit (VERDICT r14 task 1 done-bar: with
      // executor-side rewrites the metadata-lock window must stay FLAT
      // in rewrite bytes — auto publishes MBs of kept rows yet holds the
      // lock about as long as pure-DV mor, which publishes none)
      val lockMs =
        if (m == "copy-on-write") Double.NaN
        else graft.sources.GraftStore.LastDvCommitLockNanos.get() / 1e6
      val written = GraftCommit0.allBytes(s"$wh/ab/$name") - before
      scanAgg(name).collect()
      val s = (1 to 3).map(_ => timed(scanAgg(name).collect())).min
      (m, d, written, s, lockMs)
    }
    autoRes.foreach { case (m, d, w, s, lockMs) =>
      println(f"[storeab-auto] mode=$m%-14s mixed-delete ${d}%.3f s, " +
        f"new-bytes ${w / 1024}%d KiB, post-delete scan ${s}%.3f s, " +
        f"commit-lock ${lockMs}%.1f ms")
    }

    // ---- LOCK-FLATNESS check (VERDICT r15 task 1's done-bar): a 60%
    // delete of EVERY file under auto rewrites ~40% of the table's
    // bytes — on executors, OUTSIDE the metadata lock. The lock window
    // must stay at DV-write + manifest-swap scale (the sparse case
    // above), NOT grow with rewrite bytes.
    val big = mkCopy("mix_bigauto")
    val beforeBig = GraftCommit0.allBytes(s"$wh/ab/$big")
    spark.conf.set("spark.graft.store.delete.mode", "auto")
    val dBig = try timed(spark.sql(
      s"DELETE FROM graft.ab.$big WHERE id % 10 < 6"))
    finally spark.conf.unset("spark.graft.store.delete.mode")
    val bigLockMs = graft.sources.GraftStore.LastDvCommitLockNanos.get() / 1e6
    val bigBytes = GraftCommit0.allBytes(s"$wh/ab/$big") - beforeBig
    println(f"[storeab-lock] auto 60%%-of-every-file delete: rewrite bytes " +
      f"${bigBytes / 1024}%d KiB (executor-side), commit ${dBig}%.3f s, " +
      f"commit-lock ${bigLockMs}%.1f ms — flat vs the sparse case's " +
      f"${autoRes.last._5}%.1f ms despite ~${bigBytes / math.max(1, autoRes.last._3)}%dx the bytes")
    spark.stop()
  }
}
