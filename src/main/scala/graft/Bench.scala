package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // WIDTH GUARD (VERDICT r13 task 1): both committed r13 artifacts were
    // silently recorded at local[4] because this default was "4" and the
    // recording shell didn't export SPARK_GRAFT_CPUS — producing two
    // incomparable points in the official trend series. The default is now
    // the HOST width (capped at the baseline's 32), the artifact stamps
    // both the requested width and the host width, and a run whose width
    // differs from the baseline series' 32 refuses to pass silently: it
    // stamps "width_ok":false and prints a loud stderr banner.
    val BaselineWidth = 32
    val hostCpus = Runtime.getRuntime.availableProcessors
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.min(hostCpus, BaselineWidth).toString)
    val widthOk = cpus.toInt == BaselineWidth && hostCpus >= BaselineWidth
    if (!widthOk) System.err.println(
      s"[bench] WIDTH MISMATCH: requested local[$cpus] on a $hostCpus-CPU " +
        s"host; the baseline series is local[$BaselineWidth]. This record " +
        "is NOT comparable to the official series — do not commit it as " +
        "BENCH_SF01_r*/BENCH_SF1.")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Contention sentinel (VERDICT r8 task 1): a fixed trivial scan-filter
    // (q39 shape, ~0.1 s warm) timed every SENTINEL_EVERY queries.  Its
    // floor is its own min over the run; any window where the sentinel
    // exceeds ~3x that floor is machine noise, not a regression — the
    // record becomes self-diagnosing instead of needing a human to
    // cross-read two rounds' tails (BENCH_r06 3.13 s for a 0.6 s query,
    // BENCH_r08 3.26 s for q39 were both such windows).
    val SentinelEvery = 10
    def sentinelOnce(): Double = {
      val t0 = System.nanoTime()
      spark.read.parquet(s"$sfDir/events.parquet")
        .filter(col("value") > 100.0 && col("event_type") === "purchase")
        .agg(count(lit(1))).collect()
      (System.nanoTime() - t0) / 1e9
    }
    sentinelOnce(); sentinelOnce() // untimed warm-ups (codegen + JIT + FS)
    val sentinels = scala.collection.mutable.ListBuffer[(String, Double)]()
    sentinels += (("<start>", sentinelOnce()))

    val failed = scala.collection.mutable.ListBuffer[String]()
    var i = 0
    val results = SparkEntry.queries.map { case (name, fn) =>
      // isolate queries: drop caches/temp state a previous query pinned so
      // later queries aren't timed under accumulated memory pressure
      def once(): (Boolean, Double) = {
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        val ok =
          try { fn(spark, sfDir).count(); true }
          catch { case e: Throwable =>
            failed += name
            System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
            false
          }
        (ok, (System.nanoTime() - t0) / 1e9)
      }
      // One untimed warm-up pays plan analysis + whole-stage-codegen
      // compilation (per-plan one-offs, not per-dataset costs), then the
      // min of two timed runs estimates steady state.  min-of-2 alone is
      // not enough on this host: its documented 2-10x contention spikes
      // (PERF.md) last long enough that two back-to-back runs both land
      // inside one, which is exactly how BENCH_r06 recorded 3.13 s for a
      // 0.6 s query.  The warm-up separates the timed pair from codegen
      // AND spaces the samples out, so a spike must span three runs to
      // contaminate the record.
      val (ok, tWarm) = once()
      val t = if (ok) math.min(once()._2, once()._2) else tWarm
      i += 1
      if (i % SentinelEvery == 0) sentinels += ((name, sentinelOnce()))
      name -> t
    }
    sentinels += (("<end>", sentinelOnce()))

    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val fl = failed.distinct.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    val sFloor = sentinels.map(_._2).min
    // sentinel entries are keyed by the query they ran AFTER, in run
    // order; contended = sentinel > 3x its own floor for this run
    val sjson = sentinels.map { case (after, t) =>
      s"""{"after":"$after","t":$t,"contended":${t > 3 * sFloor}}"""
    }.mkString("[", ",", "]")
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$fl,"sentinel_floor":$sFloor,"sentinel":$sjson,"cpus":$cpus,"host_cpus":$hostCpus,"width_ok":$widthOk,"sf":"$sfDir"}"""
    println(json)
    // VERDICT r10 task 4: the driver's captured stdout tail truncates, so
    // round-over-round per-query comparison kept losing the record. Every
    // run ALSO writes the full JSON to a stable file (committed per round)
    // so the complete per-query table survives independent of tail luck.
    val out = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH.json")
    java.nio.file.Files.write(java.nio.file.Paths.get(out),
      (json + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    spark.stop()
  }
}
