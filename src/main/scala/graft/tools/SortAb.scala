package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only A/B of round-12 maintenance/pushdown effects (companion to
  * StoreAb/ColumnarAb):
  *
  *   1. ZONE-MAP DECAY → SORTED COMPACT: a store built from K
  *      interleaved appends (every file spans the full id range, so no
  *      probe is refutable) is probed with a 1%-selective id window,
  *      then re-clustered with `compactSorted(sortBy = id)` and probed
  *      again — the restored skipping is the measured win (VERDICT r11
  *      task 3's done-bar).
  *   2. SUM PUSHDOWN: a grouped SUM/AVG answered from `_STATS` per-file
  *      sums vs the same query with the sidecar renamed away (the
  *      designed silent fallback to a full scan).
  *
  * Warm-up + min-of-3 per cell. Usage: runMain graft.tools.SortAb [rows]
  */
object GraftCommit0 {
  /** Sum of data-file (and DV sidecar) bytes under a store dir — every
    * publishable artifact class, so write-amp deltas (StoreAb's auto
    * COW/MOR A/B) see rewrite files and deletion vectors too.
    */
  def allBytes(path: String): Long = {
    def go(d: java.io.File): Long =
      Option(d.listFiles()).getOrElse(Array.empty).map {
        case f if f.isFile && (f.getName.startsWith("part-") ||
          f.getName.startsWith("merged-") || f.getName.startsWith("rewrite-") ||
          f.getName.startsWith("dv-")) => f.length()
        case d2 if d2.isDirectory && d2.getName.contains("=") => go(d2)
        case _ => 0L
      }.sum
    go(new java.io.File(path))
  }
}

object SortAb {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toLong else 4000000L
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val waves = 8 // interleaved appends: 8 task waves of 32 files at 32 cores
    val dir = graft.util.TempDirs.create("graft_sortab_") + "/t"
    (0 until waves).foreach { g =>
      // every append covers the FULL id range -> every file's zone map
      // overlaps every probe; this is a streaming table after months of
      // unordered epochs
      spark.range(0, n, 1, 32).filter(col("id") % waves === g)
        .select(col("id"), (col("id") % 1000).as("k"),
          (col("id") * 3 % 7919).as("v"))
        .write.format("graft.sources.GraftStoreProvider")
        .option("path", dir).mode(if (g == 0) "overwrite" else "append").save()
    }
    def read() = spark.read.format("graft.sources.GraftStoreProvider")
      .option("path", dir).load()
    val lo = n / 2
    val hi = lo + n / 100 // 1%-selective window
    def probe(): Long = read()
      .filter(col("id") >= lo && col("id") < hi)
      .agg(sum("v")).head().getLong(0)
    def sumQ(): Double = read()
      .agg(sum("v"), avg("v"), count(lit(1))).head().getDouble(1)

    def time[T](what: String)(body: => T): Double = {
      body // warm-up
      val t = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
      }.min
      println(f"[sortab] $what%-34s ${t}%8.3f s")
      t
    }

    println(s"[sortab] rows=$n files=${waves * 32} (fully overlapped ranges)")
    val probeDecayed = time("probe 1% window, DECAYED layout")(probe())
    val sumStats = time("grouped SUM/AVG from _STATS")(sumQ())

    // sum fallback: rename the sidecar away (advisory by design)
    val stats = new java.io.File(dir, "_STATS")
    val hidden = new java.io.File(dir, "_STATS.hidden")
    stats.renameTo(hidden)
    val sumScan = time("grouped SUM/AVG, sidecar hidden")(sumQ())
    hidden.renameTo(stats)

    // keep the POST-compact file count equal to the pre-compact one, so
    // the A/B isolates LAYOUT (overlapped vs disjoint ranges) — merging
    // 256 files into 8 would also trade away scan parallelism and bury
    // the skipping signal under single-task parse time
    val totalBytes = GraftCommit0.allBytes(dir)
    val t0 = System.nanoTime()
    val res = graft.sources.GraftMaintenance.compactSorted(
      dir, Seq("id"), spark,
      targetBytes = math.max(1L, totalBytes / (waves * 32)))
    val tSort = (System.nanoTime() - t0) / 1e9
    println(f"[sortab] compactSorted: ${res.filesBefore} -> ${res.filesAfter} files in ${tSort}%.3f s (executor-parallel)")
    graft.sources.GraftMaintenance.expireSnapshots(dir, olderThanMs = 0L)

    val probeSorted = time("probe 1% window, SORTED layout")(probe())
    println(f"[sortab] sorted-compact probe speedup: ${probeDecayed / probeSorted}%.2fx")
    println(f"[sortab] SUM pushdown speedup:         ${sumScan / sumStats}%.2fx")

    // ---- 3. Z-ORDER vs LEXICOGRAPHIC layout (VERDICT r12 task 5): two
    // uniform dimensions, a 2-D probe selecting 1/16 of EACH. Under
    // lexicographic (x, y) clustering only the leading column's zone map
    // is tight — the y predicate prunes nothing; under the Morton layout
    // every file spans a narrow range of BOTH, so the probe plans the
    // intersection. Reported as PLANNED-FILE counts (the verdict's ask).
    val dir2 = graft.util.TempDirs.create("graft_zorderab_") + "/t"
    spark.range(0, n, 1, 64)
      .select((col("id") % 65536).as("x"),
        ((col("id") * 2654435761L) % 65536).as("y"),
        col("id").as("v"))
      .write.format("graft.sources.GraftStoreProvider")
      .option("path", dir2).mode("overwrite").save()
    val bytes2 = GraftCommit0.allBytes(dir2)
    def read2() = spark.read.format("graft.sources.GraftStoreProvider")
      .option("path", dir2).load()
    def sel2() = read2().filter(
      col("x") >= 30000L && col("x") < 34096L &&
        col("y") >= 30000L && col("y") < 34096L)
    def probe2() = sel2().agg(sum("v"), count(lit(1)))
    // one task per planned (post-zone-map) file: the scan RDD's partition
    // count IS the planned-file count
    def plannedFiles(): Int = sel2().rdd.getNumPartitions
    val target2 = math.max(1L, bytes2 / 256)
    graft.sources.GraftMaintenance.compactSorted(dir2, Seq("x", "y"), spark,
      targetBytes = target2)
    graft.sources.GraftMaintenance.expireSnapshots(dir2, olderThanMs = 0L,
      strayGraceMs = 0L)
    val lexFiles = plannedFiles()
    val lexTime = time("2-D probe, LEXICOGRAPHIC (x,y)")(probe2().collect())
    graft.sources.GraftMaintenance.compactSorted(dir2, Seq("x", "y"), spark,
      targetBytes = target2, zOrder = true)
    graft.sources.GraftMaintenance.expireSnapshots(dir2, olderThanMs = 0L,
      strayGraceMs = 0L)
    val zFiles = plannedFiles()
    val zTime = time("2-D probe, Z-ORDER (x,y)")(probe2().collect())
    println(f"[sortab] z-order 2-D probe: planned files $lexFiles -> $zFiles " +
      f"(${lexFiles.toDouble / math.max(1, zFiles)}%.1fx fewer), " +
      f"time ${lexTime / zTime}%.2fx")
    spark.stop()
  }
}
