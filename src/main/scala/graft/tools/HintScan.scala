package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only: force-plan every registry plan form and flag queries whose
  * broadcast hints Catalyst drops (HintErrorLogger warnings).
  */
object HintScan {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.001"
    graft.Registry.planForms.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      System.err.println(s"[hintscan] >>> $name")
      try {
        val df = fn(spark, d)
        df.queryExecution.executedPlan
        ()
      } catch { case e: Throwable =>
        System.err.println(s"[hintscan] $name build failed: ${e.getMessage}")
      }
      spark.catalog.clearCache()
    }
    System.err.println("[hintscan] done")
    spark.stop()
  }
}
