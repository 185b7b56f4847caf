package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.util.Det

/** Dev-only: isolate q43 stage costs. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.1"
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val th = transform(split(col("text"), " "), t => Det.polyHash(t))
    val bigrams = array_distinct(
      when(size(th) >= 2,
        transform(sequence(lit(1), size(th) - 1),
          i => (element_at(th, i) * 31 + element_at(th, i + 1)) % 1000000007L))
        .otherwise(array().cast("array<bigint>")))
    val docs = Tables.documents(spark, d).repartition(32)
      .select(col("doc_id"), col("lang"), bigrams.as("bg"))
    time("shingle build (count only)") { docs.count() }
    time("shingle build again") { docs.count() }
    val cached = docs.cache()
    time("cache materialize") { cached.count() }
    val postings = cached.select(col("doc_id"), col("lang"), explode(col("bg")).as("g"))
    time("postings count") { postings.count() }
    val pa = postings.select(col("doc_id").as("id_a"), col("lang"), col("g"))
    val pb = postings.select(col("doc_id").as("id_b"), col("lang"), col("g"))
    val joined = pa.join(pb, Seq("lang", "g")).filter(col("id_a") < col("id_b"))
    time("posting join count") { joined.count() }
    val agg = joined.groupBy("id_a", "id_b").agg(count(lit(1)).as("inter"))
    time("pair agg count") { agg.count() }
    spark.stop()
  }
}
