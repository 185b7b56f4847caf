package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only: split a query's per-run cost into (a) DataFrame construction,
  * (b) analysis+optimization+physical planning (forced via executedPlan,
  * no jobs), and (c) execution. Localizes driver-side planning overhead
  * that job-timeline profiling cannot see.
  * Usage: runMain graft.tools.PlanCost <queryName> [sfDir] [reps]
  */
object PlanCost {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 3
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    (1 to reps).foreach { i =>
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      val df =
        if (name == "q161_lazy") graft.dedup.DedupQueries.q161Lazy(spark, sfDir)
        else graft.Registry.queries(name)(spark, sfDir)
      val t1 = System.nanoTime()
      df.queryExecution.executedPlan // forces analyze + optimize + plan
      val t2 = System.nanoTime()
      val n = df.count()
      val t3 = System.nanoTime()
      println(f"[plancost] $name rep $i: build ${(t1 - t0) / 1e9}%.3f  " +
        f"plan ${(t2 - t1) / 1e9}%.3f  exec ${(t3 - t2) / 1e9}%.3f  ($n rows)")
    }
    spark.stop()
  }
}
