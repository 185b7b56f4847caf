package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only A/B of the graft-store read paths (VERDICT r10 task 5's
  * "measured speedup" line): writes one N-row store, then times the
  * same scan-bound aggregate through the row reader and the columnar
  * reader (option `columnar=true`), warm-up + min-of-3 each.
  * Usage: runMain graft.tools.ColumnarAb [rows]
  */
object ColumnarAb {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toLong else 4000000L
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = graft.util.TempDirs.create("graft_colab_") + "/t"
    spark.range(0, n, 1, 32)
      .select(col("id"), (col("id") * 7 % 1001).as("v"),
        (col("id") % 97).cast("double").as("d"),
        concat(lit("w"), (col("id") % 1000).cast("string")).as("s"))
      .write.format("graft.sources.GraftStoreProvider")
      .option("path", dir).mode("overwrite").save()

    def scan(columnar: Boolean) = spark.read
      .format("graft.sources.GraftStoreProvider")
      .option("path", dir).option("columnar", columnar.toString).load()
      // residual filter => no aggregate pushdown; the scan parses rows
      .filter(col("v") =!= -1L)
      .agg(sum("v"), sum("d"), count(col("s")), min("id"), max("id"))

    def time(columnar: Boolean): Double = {
      scan(columnar).collect() // warm-up (codegen + page cache)
      (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        scan(columnar).collect()
        (System.nanoTime() - t0) / 1e9
      }.min
    }
    val row = time(columnar = false)
    val colr = time(columnar = true)
    println(f"[colab] rows=$n%d row=$row%.3f s columnar=$colr%.3f s speedup=${row / colr}%.2fx")
    spark.stop()
  }
}
