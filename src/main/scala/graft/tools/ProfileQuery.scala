package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Dev-only: run any registered query with a job/stage timeline listener —
  * the generic form of [[ProfileQ129]] (kept: its scaladoc documents the
  * round-7 q129 adjudication). Prints per-job wall time plus the top
  * stages by task time, which is what actually localizes a hot operator
  * inside a many-stage composition.
  * Usage: runMain graft.tools.ProfileQuery <queryName> [sfDir] [warm]
  * Pass `warm` to run one untimed warm-up first (codegen + analysis paid),
  * so the profiled run matches Bench's steady state.
  */
object ProfileQuery {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val warm = args.contains("warm")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if (warm) {
      graft.Registry.queries(name)(spark, sfDir).count()
      spark.catalog.clearCache()
      println("[profile] warm-up done; profiling second run")
    }
    val t00 = System.nanoTime()
    val starts = scala.collection.concurrent.TrieMap.empty[Int, Long]
    val stages = scala.collection.mutable.ArrayBuffer.empty[(Double, String)]
    spark.sparkContext.addSparkListener(new SparkListener {
      val jobDesc = scala.collection.concurrent.TrieMap.empty[Int, String]
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        starts.put(j.jobId, System.nanoTime())
        val det = j.stageInfos.flatMap(_.details.linesIterator
            .filter(l => l.contains("graft/") || l.contains("Queries.scala")))
          .take(1).mkString
        jobDesc.put(j.jobId, det)
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit =
        starts.remove(j.jobId).foreach { t0 =>
          val det = jobDesc.getOrElse(j.jobId, "")
          println(f"[job] id=${j.jobId}%3d  +${(t0 - t00) / 1e9}%7.2fs  ${(System.nanoTime() - t0) / 1e9}%7.3fs  $det")
        }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val secs = si.taskMetrics.executorRunTime / 1e3
        // the callsite name is useless under broadcast-subquery threads;
        // details holds the user-code frames
        val det = si.details.linesIterator
          .filter(l => l.contains("graft") || l.contains("Queries.scala"))
          .take(3).mkString(" | ")
        // under AQE every stage's callsite is an anonymous materialization
        // future; the RDD scope names carry the actual operator chain
        val ops = si.rddInfos.flatMap(_.scope).map(_.name).distinct
          .mkString(" > ")
        stages.synchronized {
          stages += ((secs, s"stage ${si.stageId} (${si.numTasks} tasks): ${si.name} :: $det :: $ops"))
        }
      }
    })
    val t0 = System.nanoTime()
    val n = graft.Registry.queries(name)(spark, sfDir).count()
    println(f"[profile] $name wall ${(System.nanoTime() - t0) / 1e9}%.2f s, $n rows")
    println("[profile] top stages by executor task time:")
    stages.sortBy(-_._1).take(12).foreach { case (s, d) =>
      println(f"  ${s}%8.1fs  $d")
    }
    spark.stop()
  }
}
