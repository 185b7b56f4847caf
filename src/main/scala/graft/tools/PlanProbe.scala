package graft.tools
import org.apache.spark.sql.SparkSession
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = graft.SparkEntry.queries(args(0))(spark, args(1))
    df.count()
    val p = df.queryExecution.executedPlan.toString
    println("[planprobe] ReusedExchange count: " +
      "ReusedExchange".r.findAllIn(p).length)
    println("[planprobe] Exchange count: " + "Exchange".r.findAllIn(p).length)
    println("[planprobe] Scan count: " + " Scan ".r.findAllIn(p).length)
    spark.stop()
  }
}
