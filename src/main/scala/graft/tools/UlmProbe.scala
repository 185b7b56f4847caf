package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only: stage-by-stage Catalyst tree sizes for the q224 trainer. */
object UlmProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.001"
    def sz(df: org.apache.spark.sql.DataFrame, label: String): Unit = {
      val t0 = System.nanoTime()
      val n = df.queryExecution.analyzed.map(_ => 1).sum +
        df.queryExecution.analyzed.expressions.map(_.map(_ => 1).sum).sum
      val t1 = System.nanoTime()
      println(f"[ulmprobe] $label: treeNodes=$n analyzed in ${(t1 - t0) / 1e9}%.2f s")
    }
    val m = graft.curation.CurationQueries.getClass
    // use the public registry entry and probe intermediate forms via q224Lazy
    val q = graft.Registry.planForms("q224_unigram_lm_train")
    val t0 = System.nanoTime()
    val df = q(spark, d)
    println(f"[ulmprobe] build: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    sz(df, "q224Lazy-final")
    var t = System.nanoTime()
    val opt = df.queryExecution.optimizedPlan
    println(f"[ulmprobe] optimize: ${(System.nanoTime() - t) / 1e9}%.2f s, nodes=" +
      (opt.map(_ => 1).sum + opt.expressions.map(_.map(_ => 1).sum).sum))
    t = System.nanoTime()
    df.queryExecution.executedPlan
    println(f"[ulmprobe] physical: ${(System.nanoTime() - t) / 1e9}%.2f s")
    t = System.nanoTime()
    val n = df.count()
    println(f"[ulmprobe] exec: ${(System.nanoTime() - t) / 1e9}%.2f s ($n rows)")
    spark.stop()
  }
}
