package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only scale harness: materialize an N× copy of the sf0.1
  * documents/embeddings tables (ids shifted per copy so rows stay
  * distinct) into a target dir laid out like a testdata sf dir, so
  * TimeOne can measure how the corpus-facing operators scale one decade
  * past the largest provided SF.
  *
  * Embedding labels are remapped to `label * n + copy`: the cluster COUNT
  * grows with the corpus while cluster SIZE stays constant — the IVF
  * contract (q48/q141 docs) that keeps per-cluster pairwise work bounded;
  * scaling labels any other way measures the approximation's documented
  * failure mode, not the engine.
  *
  * Usage: runMain graft.tools.ScaleGen <srcSfDir> <outDir> <copies>
  */
object ScaleGen {
  def main(args: Array[String]): Unit = {
    val Array(src, out, nStr) = args
    val n = nStr.toInt
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val copies = spark.range(n).select(col("id").as("copy"))
    val docs = spark.read.parquet(s"$src/documents.parquet")
    val maxDoc = docs.agg(max("doc_id")).head.getLong(0) + 1
    docs.crossJoin(copies)
      .select((col("doc_id") + col("copy") * maxDoc).as("doc_id"),
        col("text"), col("lang"), col("source"), col("n_chars"))
      .repartition(32)
      .write.mode("overwrite").parquet(s"$out/documents.parquet")
    val embs = spark.read.parquet(s"$src/embeddings.parquet")
    val maxVec = embs.agg(max("vec_id")).head.getLong(0) + 1
    embs.crossJoin(copies)
      .select((col("vec_id") + col("copy") * maxVec).as("vec_id"),
        col("embedding"),
        (col("label") * n + col("copy")).cast("int").as("label"))
      .repartition(32)
      .write.mode("overwrite").parquet(s"$out/embeddings.parquet")
    // the corpus-facing queries only touch documents/embeddings; link the
    // relational tables through unchanged so Tables.* resolves
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true") // events ts
    for (t <- Seq("region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events"))
      spark.read.parquet(s"$src/$t.parquet")
        .write.mode("overwrite").parquet(s"$out/$t.parquet")
    println(s"[scalegen] wrote ${n}x $src -> $out")
    spark.stop()
  }
}
