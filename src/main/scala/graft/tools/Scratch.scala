package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only timing harness: time one named query repeatedly.
  * Usage: runMain graft.tools.Scratch <queryName> <sfDir> [reps]
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 2
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    (1 to reps).foreach { i =>
      val t0 = System.nanoTime()
      val n = graft.Registry.queries(name)(spark, sfDir).count()
      println(f"[scratch] $name rep $i: ${(System.nanoTime() - t0) / 1e9}%.2f s, $n rows")
    }
    graft.Registry.queries(name)(spark, sfDir).explain("formatted")
    spark.stop()
  }
}
