package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Dev-only: run q129 standalone with a job-timeline listener, to split
  * its per-micro-batch fixed cost into the actual Spark jobs (probe /
  * store write / broadcast / feed) vs dead time between jobs (driver-side
  * planning, codegen compile, checkpoint commits — anything that is NOT a
  * job). VERDICT r6 "What's wrong" 2 asks for exactly this breakdown.
  * Usage: runMain graft.tools.ProfileQ129 [sfDir]
  */
object ProfileQ129 {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t00 = System.nanoTime()
    @volatile var jobSecs = 0.0
    val starts = scala.collection.concurrent.TrieMap.empty[Int, (Long, String)]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        val desc = Option(j.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .orElse(Option(j.properties)
            .flatMap(p => Option(p.getProperty("callSite.short"))))
          .getOrElse("?")
        starts.put(j.jobId, (System.nanoTime(), desc))
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit =
        starts.remove(j.jobId).foreach { case (t0, desc) =>
          val dt = (System.nanoTime() - t0) / 1e9
          jobSecs += dt
          println(f"[job] id=${j.jobId}%3d  +${(t0 - t00) / 1e9}%6.2fs  ${dt}%6.3fs  $desc")
        }
    })
    val t0 = System.nanoTime()
    val n = graft.Registry.queries("q129_stream_dedup_lsh")(spark, sfDir).count()
    val wall = (System.nanoTime() - t0) / 1e9
    println(f"[profile] q129 wall ${wall}%.2f s, jobs ${jobSecs}%.2f s, " +
      f"non-job ${wall - jobSecs}%.2f s, $n rows")
    spark.stop()
  }
}
