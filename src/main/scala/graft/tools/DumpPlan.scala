package graft.tools

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Dev-only: write `.explain("formatted")` for a list of queries to
  * `<outDir>/<name>_<suffix>.txt` — the optimization-round evidence files
  * (plans/r16/<query>_before.txt / _after.txt). Uses the plan-audit form
  * ([[graft.Registry.planForms]]) so eagerly-checkpointed compositions show
  * their full physical plan instead of a LogicalRDD leaf; queries whose
  * runtime form is lifecycle-driven (streaming harnesses, store DDL) dump
  * whatever their plan form exposes.
  * Usage: runMain graft.tools.DumpPlan <q1,q2,...> <sfDir> <outDir> <suffix>
  */
object DumpPlan {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").map(_.trim).filter(_.nonEmpty)
    val sfDir = args(1)
    val outDir = args(2)
    val suffix = args(3)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Files.createDirectories(Paths.get(outDir))
    names.foreach { name =>
      graft.Registry.planForms.get(name) match {
        case None => System.err.println(s"[dumpplan] $name: UNKNOWN")
        case Some(fn) =>
          try {
            spark.catalog.clearCache()
            val df = fn(spark, sfDir)
            val txt = df.queryExecution.explainString(
              org.apache.spark.sql.execution.FormattedMode)
            Files.write(Paths.get(outDir, s"${name}_$suffix.txt"),
              txt.getBytes(StandardCharsets.UTF_8))
            println(s"[dumpplan] $name -> ${name}_$suffix.txt")
          } catch { case e: Throwable =>
            System.err.println(s"[dumpplan] $name failed: ${e.getMessage}")
          }
      }
    }
    spark.stop()
  }
}
