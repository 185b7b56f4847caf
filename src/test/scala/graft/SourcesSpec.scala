package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Ingestion robustness: the behaviors a 100 TB pipeline hits on day one —
  * malformed rows in the middle of a feed, and schema drift between
  * historical partitions.
  */
class SourcesSpec extends AnyFunSuite {
  import TestSpark.{spark, sf}

  test("PERMISSIVE csv read quarantines malformed rows instead of failing the job") {
    val dir = Files.createTempDirectory("graft_badcsv_").toString
    Files.writeString(Paths.get(dir, "part.csv"),
      """id,score
        |1,10.5
        |2,notanumber
        |3,7.25
        |""".stripMargin)
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("score", DoubleType),
      StructField("_corrupt", StringType)))
    val df = spark.read
      .option("header", "true")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt")
      .schema(schema)
      .csv(dir)
      .cache() // corrupt-record column requires materialization before filter
    assert(df.count() == 3)
    val bad = df.filter(col("_corrupt").isNotNull).collect()
    assert(bad.length == 1 && bad.head.getAs[Long]("id") == 2)
    val good = df.filter(col("_corrupt").isNull)
    assert(good.agg(sum("score")).head.getDouble(0) == 17.75)
    df.unpersist()
  }

  test("publishLatest: one headered CSV at a stable path, re-publish replaces it") {
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("serve_pub_").toString + "/latest-data"
    val df1 = Tables.nation(TestSpark.spark, TestSpark.sf)
      .select(col("n_name")).orderBy("n_name").limit(3)
    graft.serve.ServeQueries.publishLatest(df1, dir)
    def csvFiles = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".csv"))
    assert(csvFiles.length == 1, "serving extract must be exactly one file")
    val rows1 = TestSpark.spark.read.option("header", "true").csv(dir).count()
    assert(rows1 == 3)
    // re-publish with different content: stable path keeps working, old run gone
    graft.serve.ServeQueries.publishLatest(df1.limit(2), dir)
    assert(csvFiles.length == 1)
    assert(TestSpark.spark.read.option("header", "true").csv(dir).count() == 2)
    assert(!new java.io.File(dir + ".tmp").exists(), "temp dir must be swapped away")
  }

  test("FAILFAST csv read raises on the malformed row") {
    val dir = Files.createTempDirectory("graft_badcsv2_").toString
    Files.writeString(Paths.get(dir, "part.csv"), "id,score\n1,ok_not_num\n")
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("score", DoubleType)))
    val e = intercept[org.apache.spark.SparkException] {
      spark.read.option("header", "true").option("mode", "FAILFAST")
        .schema(schema).csv(dir).collect()
    }
    // Spark 4 wraps the malformed-record error in FAILED_READ_FILE; the
    // root cause chain carries the malformed-CSV detail
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: messages(x.getCause))
    assert(messages(e).exists(m =>
      m != null && (m.contains("MALFORMED") || m.contains("Malformed") ||
        m.contains("FAILED_READ_FILE"))))
  }

  test("mergeSchema unifies drifted parquet partitions") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_drift_").toString
    Seq((1L, "a")).toDF("id", "name").write.parquet(s"$dir/day=1")
    Seq((2L, "b", 9.5)).toDF("id", "name", "score").write.parquet(s"$dir/day=2")
    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.columns.toSet == Set("id", "name", "score", "day"))
    val row1 = merged.filter(col("id") === 1).collect().head
    assert(row1.isNullAt(row1.fieldIndex("score"))) // old partition: null-filled
    assert(merged.count() == 2)
  }

  test("graft-seq DSv2 source: split planning + column pruning reach the scan") {
    import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
    val df = spark.read.format("graft.sources.SeqSourceProvider")
      .option("rows", "1000").option("slices", "5").load()
    // split planning: 5 input partitions → 5 scan tasks
    assert(df.rdd.getNumPartitions == 5)
    // column pruning: a label-only projection must reach the reader as a
    // 1-column read schema (val/id never generated)
    val pruned = df.select("label").distinct()
    val scan = pruned.queryExecution.sparkPlan.collectFirst {
      case b: BatchScanExec => b
    }.getOrElse(fail("no BatchScanExec in plan"))
    assert(scan.scan.readSchema().fieldNames.toSeq == Seq("label"))
    assert(pruned.count() == 7)
    // row contract spot check
    val r = df.filter(col("id") === 123L).collect().head
    assert(r.getLong(1) == (123L * 2654435761L) % 1000000007L)
    assert(r.getString(2) == "r" + (123 % 7))
    // uneven split: rows not divisible by slices still covers every row
    val odd = spark.read.format("graft.sources.SeqSourceProvider")
      .option("rows", "97").option("slices", "8").load()
    assert(odd.count() == 97)
    assert(odd.agg(countDistinct(col("id"))).collect().head.getLong(0) == 97)
  }

  test("Tables.events instants are session-timezone independent (ADVICE r7)") {
    // The Spark 4.1 NTZ read path must recover epoch instants with pure
    // field arithmetic: a session in any tz sees the same unix_micros. A
    // cast("timestamp") regression would shift Tokyo by +9h here.
    def minMicros(): Long = Tables.events(spark, TestSpark.sf)
      .selectExpr("min(unix_micros(ts))").head().getLong(0)
    val utc = minMicros()
    val prev = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "Asia/Tokyo")
    try assert(minMicros() == utc)
    finally spark.conf.set("spark.sql.session.timeZone", prev)
  }

  test("q167 mergeSchema read unions writer generations with null fill") {
    val out = Registry.queries("q167_schema_merge")(spark, TestSpark.sf).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out.keySet == Set("v1", "v2"))
    val nDocs = Tables.documents(spark, TestSpark.sf).count()
    // each generation contributes every doc once; nulls sit exactly in the
    // columns that generation never wrote
    assert(out("v1").getLong(1) == nDocs && out("v2").getLong(1) == nDocs)
    assert(out("v1").getLong(2) == 0 && out("v1").getLong(3) == nDocs)
    assert(out("v2").getLong(2) == nDocs && out("v2").getLong(3) == 0)
    assert(out("v1").getDouble(4) == 0.0)
    assert(out("v2").getDouble(4) > 0.0)
  }

  test("graft-store commit publishes a complete table: parts + _SCHEMA, _SUCCESS last, no temp residue") {
    import org.apache.spark.sql.functions._
    val dir = graft.util.TempDirs.create("graft_store_spec_") + "/t1"
    val df = spark.range(100).select(col("id"),
      (col("id") * 3).as("v"),
      concat(lit("s"), (col("id") % 3).cast("string")).as("tag"))
    df.write.format("graft.sources.GraftStoreProvider")
      .option("path", dir).mode("overwrite").save()
    val files = new java.io.File(dir).listFiles().map(_.getName).toSet
    assert(files.contains("_SUCCESS") && files.contains("_SCHEMA"))
    assert(files.exists(_.startsWith("part-")))
    assert(!files.contains("_temporary"), s"temp residue: $files")
    // read back through the provider (schema from _SCHEMA)
    val back = spark.read.format("graft.sources.GraftStoreProvider")
      .option("path", dir).load()
    assert(back.schema.fieldNames.toSeq == Seq("id", "v", "tag"))
    assert(back.count() == 100)
    assert(back.agg(sum("v")).head().getLong(0) == (0L until 100).map(_ * 3).sum)
    // overwrite truncates the previous generation
    df.limit(10).write.format("graft.sources.GraftStoreProvider")
      .option("path", dir).mode("overwrite").save()
    assert(spark.read.format("graft.sources.GraftStoreProvider")
      .option("path", dir).load().count() == 10)
    // append keeps it
    df.limit(5).write.format("graft.sources.GraftStoreProvider")
      .option("path", dir).mode("append").save()
    assert(spark.read.format("graft.sources.GraftStoreProvider")
      .option("path", dir).load().count() == 15)
  }

  test("graft-store round-trips embedded newlines, quotes, CR and non-ASCII (ADVICE r9)") {
    import spark.implicits._
    val dir = graft.util.TempDirs.create("graft_store_nl_") + "/t"
    val rows = Seq(
      (1L, "plain"),
      (2L, "embedded\nnewline"),
      (3L, "crlf\r\nboth"),
      (4L, "lone\rcr"),
      (5L, "quote\"and,comma"),
      (6L, ""),
      (7L, null),
      (8L, "café 中文 😀")) // é, CJK, surrogate-pair emoji
    rows.toDF("id", "s").coalesce(2)
      .write.format("graft.sources.GraftStoreProvider")
      .option("path", dir).mode("overwrite").save()
    val back = spark.read.format("graft.sources.GraftStoreProvider")
      .option("path", dir).load().collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getString(1))).toMap
    assert(back.size == rows.size, s"row count drifted: $back")
    rows.foreach { case (id, s) =>
      assert(back(id) == s, s"id=$id: ${Option(back(id))} != ${Option(s)}")
    }
  }

  test("graft-store column pruning: unselected columns are never type-converted") {
    import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
    // hand-crafted committed table whose THIRD column cannot parse as a
    // long — a narrow select that avoids it must succeed (conversion is
    // bound per REQUIRED slot), and touching it must throw
    val dir = Files.createTempDirectory("graft_store_prune_").toString
    Files.writeString(Paths.get(dir, "_SCHEMA"), "id BIGINT,good BIGINT,poison BIGINT")
    Files.writeString(Paths.get(dir, "part-x-00000.csv"), "1,10,notanumber\n2,20,alsobad\n")
    Files.writeString(Paths.get(dir, "_SUCCESS"), "")
    val t = spark.read.format("graft.sources.GraftStoreProvider")
      .option("path", dir).load()
    val narrow = t.select("id", "good")
    assert(narrow.agg(sum("good")).head().getLong(0) == 30L)
    // the pruned ReadSchema reaches the DSv2 scan node
    val scan = narrow.queryExecution.sparkPlan.collectFirst {
      case b: BatchScanExec => b
    }.getOrElse(fail("no BatchScanExec in plan"))
    assert(scan.scan.readSchema().fieldNames.toSeq == Seq("id", "good"))
    intercept[Throwable] { t.select("poison").collect() }
  }

  test("graft-store identity partitioning: hive layout, null/escaped values, pruning skips a poisoned subtree") {
    import spark.implicits._
    val dir = graft.util.TempDirs.create("graft_store_part_") + "/t"
    val rows = Seq(
      (1L, "day", 10L), (2L, "day", 20L),
      (3L, "night", 30L), (4L, "night", 40L),
      (5L, null, 50L), (6L, "a/b=c", 60L))
    rows.toDF("id", "tag", "v")
      .write.format("graft.sources.GraftStoreProvider")
      .option("path", dir).option("partitionBy", "tag")
      .mode("overwrite").save()
    // Hive-style directory names: values live in the path, not the files
    val dirs = new java.io.File(dir).listFiles().filter(_.isDirectory)
      .map(_.getName).toSet
    assert(dirs == Set("tag=day", "tag=night", "tag=__GRAFT_NULL__", "tag=a%2Fb%3Dc"),
      s"unexpected layout: $dirs")
    val back = spark.read.format("graft.sources.GraftStoreProvider")
      .option("path", dir).load()
    assert(back.count() == 6)
    // null and escaped values round-trip through the directory name
    assert(back.filter(col("tag").isNull).select("id").head().getLong(0) == 5L)
    assert(back.filter(col("tag") === "a/b=c").select("v").head().getLong(0) == 60L)
    // PRUNING proof: corrupt every data file under tag=night; a day-side
    // probe must still succeed because the night subtree is never read
    new java.io.File(dir, "tag=night").listFiles()
      .filter(_.getName.startsWith("part-"))
      .foreach(f => Files.writeString(f.toPath, "zz\n"))
    assert(back.filter(col("tag") === "day").agg(sum("v")).head().getLong(0) == 30L)
    assert(back.filter(col("tag").isin("day", "a/b=c")).count() == 3)
    intercept[Throwable] { back.collect() } // unpruned read does hit the poison
  }

  test("graft-seq filter pushdown: accepted predicates enforced in-source, id bounds narrow planning") {
    import org.apache.spark.sql.execution.FilterExec
    import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
    val df = spark.read.format("graft.sources.SeqSourceProvider")
      .option("rows", "20000").option("slices", "8").load()
    val filtered = df.filter(col("id") >= 2500L && col("id") < 17500L &&
      col("val") > 500000000L)
    val expected = (2500L until 17500L)
      .count(i => graft.sources.SeqSource.valOf(i) > 500000000L)
    assert(filtered.count() == expected)
    filtered.collect()
    val plan = filtered.queryExecution.executedPlan
    // every predicate was ACCEPTED: no residual FilterExec above the scan
    assert(plan.collectFirst { case f: FilterExec => f }.isEmpty,
      s"residual filter left in plan:\n$plan")
    assert(plan.toString.contains("PushedFilters: ["), plan.toString)
    // the scan emits the FILTERED row count (enforced in-reader)
    val scan = plan.collectFirst { case b: BatchScanExec => b }
      .getOrElse(fail("no BatchScanExec"))
    assert(scan.metrics("numOutputRows").value == expected)
    // split-planning narrowing: a tight id window over an astronomically
    // large source is instant — the 10^10 rows outside the bounds are
    // never generated (without narrowing this would iterate for hours)
    val huge = spark.read.format("graft.sources.SeqSourceProvider")
      .option("rows", "10000000000").option("slices", "8").load()
      .filter(col("id") >= 9999998000L && col("id") < 9999999000L)
    assert(huge.count() == 1000)
  }

  test("graft-seq limit pushdown: caps generation at split planning, declines when a row-wise filter is pushed") {
    // a limit over a 10^10-row source plans ~1000 candidate rows — if the
    // limit were not pushed this count() would generate 10^10 rows
    val huge = spark.read.format("graft.sources.SeqSourceProvider")
      .option("rows", "10000000000").option("slices", "8").load()
    val limited = huge.limit(1000)
    assert(limited.count() == 1000)
    assert(limited.queryExecution.executedPlan.toString.contains("PushedLimit: 1000"),
      limited.queryExecution.executedPlan.toString)
    // id bounds compose with the limit (both exact-pruning)
    val bounded = huge.filter(col("id") >= 5000000000L).limit(500)
    assert(bounded.count() == 500)
    assert(bounded.queryExecution.executedPlan.toString.contains("PushedLimit: 500"))
    // a row-wise predicate makes the limit post-filter: the source must
    // DECLINE the pushdown (capping candidates would under-produce), and
    // the result must still be exactly `limit` surviving rows
    val small = spark.read.format("graft.sources.SeqSourceProvider")
      .option("rows", "20000").option("slices", "8").load()
    val filteredLimit = small.filter(col("val") > 500000000L).limit(100)
    assert(filteredLimit.count() == 100)
    assert(!filteredLimit.queryExecution.executedPlan.toString.contains("PushedLimit"),
      "limit must not be pushed past a row-wise filter")
  }

  test("DSv2 statistics: post-pushdown estimates reach the optimizer and drive auto-broadcast") {
    // seq source: the size estimate tracks the pushed id bounds, so a
    // narrow probe over an astronomically large table is broadcast-sized
    val wide = spark.read.format("graft.sources.SeqSourceProvider")
      .option("rows", "50000000").option("slices", "8").load()
    val narrow = wide.filter(col("id") >= 100L && col("id") < 300L)
    val wideB = wide.queryExecution.optimizedPlan.stats.sizeInBytes
    val narrowB = narrow.queryExecution.optimizedPlan.stats.sizeInBytes
    assert(narrowB * 10000 < wideB, s"narrow=$narrowB wide=$wideB")
    // without SupportsReportStatistics this is defaultSizeInBytes (~2^63)
    assert(wideB < BigInt(Long.MaxValue) / 4, s"stats not reported: $wideB")

    // and the planner USES it: the filtered seq side auto-broadcasts
    // against a large frame with NO broadcast hint anywhere
    val fact = spark.range(0, 4000000).toDF("id") // 32 MB estimate > 10 MB bar
    val joined = fact.join(narrow, "id")
    assert(joined.count() == 200)
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected auto-broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"unexpected shuffle join:\n$plan")

    // graft-store: the estimate is the byte sum of the SURVIVING
    // partition directories, scaled by the pruned column width
    import spark.implicits._
    val dir = graft.util.TempDirs.create("graft_store_stats_") + "/t"
    (0L until 1000L).map(i => (i, if (i % 100 == 0) "rare" else "bulk", "x" * 50))
      .toDF("id", "tag", "pad")
      .write.format("graft.sources.GraftStoreProvider")
      .option("path", dir).option("partitionBy", "tag")
      .mode("overwrite").save()
    val all = spark.read.format("graft.sources.GraftStoreProvider")
      .option("path", dir).load()
    val allB = all.queryExecution.optimizedPlan.stats.sizeInBytes
    val rareB = all.filter(col("tag") === "rare")
      .queryExecution.optimizedPlan.stats.sizeInBytes
    assert(rareB * 10 < allB, s"partition-pruned stats not reflected: rare=$rareB all=$allB")
  }

  test("graft-store dynamic partition pruning: a dim-driven probe never opens unselected partitions") {
    // Partitioned fact store; the selected partitions are only knowable
    // at RUNTIME (they come out of a join against a filtered dim), so
    // static pushdown cannot help — this is SupportsRuntimeFiltering.
    val dir = graft.util.TempDirs.create("graft_store_dpp_") + "/fact"
    val fact0 = Tables.events(spark, sf)
      .select(col("event_id"), col("user_id"), col("value"), col("event_type"))
    fact0.write.format("graft.sources.GraftStoreProvider")
      .option("path", dir).option("partitionBy", "event_type")
      .mode("overwrite").save()
    val fact = spark.read.format("graft.sources.GraftStoreProvider")
      .option("path", dir).load()
    val dim = Tables.events(spark, sf)
      .select("event_type").distinct()
      .filter(col("event_type").isin("view", "purchase"))
    val expected = fact0.filter(col("event_type").isin("view", "purchase")).count()

    // poison every NON-selected partition's data files: if runtime
    // pruning fails to fire, the scan parses a poisoned file and throws
    new java.io.File(dir).listFiles()
      .filter(d => d.isDirectory && d.getName.startsWith("event_type=") &&
        !Set("event_type=view", "event_type=purchase").contains(d.getName))
      .flatMap(d => d.listFiles().filter(_.getName.startsWith("part-")))
      .foreach(f => Files.writeString(f.toPath, "zz\n"))

    val joined = fact.join(dim, "event_type")
    assert(joined.count() == expected) // succeeds ONLY if pruned at runtime
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"), s"no runtime filter on the scan:\n$plan")
  }

  test("graft-store aggregate pushdown: COUNT/MIN/MAX answered without converting a data cell") {
    import spark.implicits._
    val dir = graft.util.TempDirs.create("graft_store_agg_") + "/t"
    val rows = (0L until 900L).map(i => (i, s"d${i % 3}", i * 7 % 101, s"pad$i"))
    rows.toDF("id", "day", "v", "pad")
      .write.format("graft.sources.GraftStoreProvider")
      .option("path", dir).option("partitionBy", "day")
      .mode("overwrite").save()
    val t = spark.read.format("graft.sources.GraftStoreProvider")
      .option("path", dir).load()

    // global COUNT(*): pushed — and correct
    val cnt = t.agg(count(lit(1)).as("n"))
    assert(cnt.head().getLong(0) == 900L)
    val cntPlan = cnt.queryExecution.executedPlan.toString
    assert(cntPlan.contains("PushedAggregates: [COUNT(*)]"), cntPlan)

    // group-by partition column + min/max of it: every value from
    // directory names + record-boundary counts; zero cells converted
    val byDay = t.groupBy("day")
      .agg(count(lit(1)).as("n"), min("day").as("lo"), max("day").as("hi"))
      .orderBy("day")
    val got = byDay.collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == Seq(("d0", 300L), ("d1", 300L), ("d2", 300L)), got.toString)
    val gPlan = byDay.queryExecution.executedPlan.toString
    assert(gPlan.contains("PushedAggregates: [COUNT(*), MIN(day), MAX(day)]") &&
      gPlan.contains("PushedGroupBy: [day]"), gPlan)

    // ZERO-CONVERSION proof: poison every data file's field contents
    // (keep record boundaries); the pushed count must still answer
    new java.io.File(dir).listFiles().filter(_.isDirectory)
      .flatMap(d => d.listFiles().filter(_.getName.startsWith("part-")))
      .foreach { f =>
        val lines = Files.readAllLines(f.toPath).size()
        Files.writeString(f.toPath, "zz,zz,zz\n" * lines)
      }
    assert(t.agg(count(lit(1)).as("n")).head().getLong(0) == 900L)

    // composition with partition-filter pushdown: pruned dirs don't count
    assert(t.filter(col("day") === "d1").agg(count(lit(1))).head().getLong(0) == 300L)

    // an aggregate over a DATA column is declined (the store can't
    // answer it without conversion — Spark must read real rows, which
    // are poisoned, so the fallback path visibly executes and fails)
    val dataAgg = t.agg(max("v"))
    assert(!dataAgg.queryExecution.executedPlan.toString.contains("PushedAggregates"))
    intercept[Throwable] { dataAgg.collect() }

    // empty store: pushdown declines, Spark's global count stays 0
    val empty = graft.util.TempDirs.create("graft_store_agg_empty_") + "/e"
    val e = spark.read.format("graft.sources.GraftStoreProvider")
      .schema("id bigint, day string").option("path", empty).load()
    assert(e.agg(count(lit(1))).head().getLong(0) == 0L)
  }

  test("graft-store failed job publishes nothing: no _SUCCESS, no parts, reader sees empty") {
    import org.apache.spark.sql.functions._
    val dir = graft.util.TempDirs.create("graft_store_spec_") + "/t2"
    // one task throws mid-write; other tasks may have completed their temps
    val poisoned = spark.range(0, 1000, 1, 8).select(col("id"),
      when(assert_true(col("id") =!= 777).isNull, col("id") * 2)
        .otherwise(col("id")).as("v"))
    val failed =
      try {
        poisoned.write.format("graft.sources.GraftStoreProvider")
          .option("path", dir).mode("overwrite").save()
        false
      } catch { case _: Throwable => true }
    assert(failed, "write was expected to fail")
    val d = new java.io.File(dir)
    val files = if (d.isDirectory) d.listFiles().map(_.getName).toSet else Set.empty[String]
    assert(!files.contains("_SUCCESS"), s"failed job published a marker: $files")
    assert(!files.exists(_.startsWith("part-")), s"failed job left parts: $files")
    // the _SUCCESS gate: an explicit-schema read of the aborted dir is empty
    val back = spark.read.format("graft.sources.GraftStoreProvider")
      .schema("id bigint, v bigint")
      .option("path", dir).load()
    assert(back.count() == 0)
  }
}
