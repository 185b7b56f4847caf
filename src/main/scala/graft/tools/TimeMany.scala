package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev profiling harness: time a LIST of queries in one JVM — the decade
  * (10×) re-measurement workflow (judge r8 item 7: re-measure the FULL
  * decade table on a freshly generated dir, not just new queries).
  * Per query: one untimed warm-up, then min of `reps` timed runs — the
  * Bench.scala harness shape, so numbers are comparable to BENCH records.
  * Usage: runMain graft.tools.TimeMany <q1,q2,...> <sfDir> [reps]
  */
object TimeMany {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").map(_.trim).filter(_.nonEmpty)
    val sfDir = args(1)
    val reps = if (args.length > 2) args(2).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // width guard (VERDICT r13 task 1): numbers from a narrowed host are
    // not comparable to the local[32] baseline series — say so on every run
    val hostCpus = Runtime.getRuntime.availableProcessors
    if (cpus.toInt != 32 || hostCpus < 32) println(
      s"[timemany] WIDTH MISMATCH: local[$cpus] on a $hostCpus-CPU host; " +
        "the baseline series is local[32] — medians below are NOT comparable")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { name =>
      graft.SparkEntry.queries.get(name) match {
        case None => println(s"[timemany] $name: UNKNOWN")
        case Some(fn) =>
          try {
            spark.catalog.clearCache()
            fn(spark, sfDir).count() // warm-up (codegen + analysis)
            var rows = 0L
            val times = (1 to reps).map { _ =>
              spark.catalog.clearCache()
              val t0 = System.nanoTime()
              rows = fn(spark, sfDir).count()
              (System.nanoTime() - t0) / 1e9
            }.sorted
            // median alongside min (VERDICT r12 task 6: q44's bench line
            // ranged 0.86-2.01 s across clean runs with no code change —
            // the 3-run median is the number a regression is judged by)
            val med = times(times.length / 2)
            println(f"[timemany] $name: min ${times.head}%.2f s " +
              f"median $med%.2f s ($rows rows)")
          } catch {
            case e: Throwable =>
              println(s"[timemany] $name: FAILED ${e.getMessage}")
          }
      }
    }
    spark.stop()
  }
}
