package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only cost-attribution probe for q129: time the streaming dedup
  * at different micro-batch slicings to split per-batch fixed cost from
  * data-linear cost. Usage: runMain graft.tools.Probe <sfDir>
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Seq(1, 3).foreach { slices =>
      (1 to 2).foreach { rep =>
        val t0 = System.nanoTime()
        val n = graft.dedup.DedupQueries.q129WithSlices(spark, sfDir, slices).count()
        println(f"[probe] q129 slices=$slices rep $rep: ${(System.nanoTime() - t0) / 1e9}%.2f s, $n rows")
      }
    }
    spark.stop()
  }
}
