package graft.sources

import java.io.File
import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** VERDICT r15 task 4: COW rewrite pairing. A cow-delete/update commit
  * records which replacement files hold each rewritten file's kept rows
  * (`#rw=` manifest headers); the changelog reader then pair-diffs old
  * against new IN the reader, so a COW version's raw changelog is
  * exactly the churn — not the whole old file as deletes plus the whole
  * new file as inserts shuffled away relationally. Pinned here:
  *
  *  1. DELETE: raw changelog rows == deleted rows (input ∝ churn);
  *  2. UPDATE: raw changelog rows == delete+insert per changed row;
  *  3. fallback: with the `#rw` headers stripped from the manifest
  *     history, the plain-diff path still nets to the identical change
  *     set (pairing is an accelerator, never a correctness dependency);
  *  4. a fully-deleted file pairs to an EMPTY replacement set and emits
  *     all its live rows as deletes.
  */
class CowPairSpec extends AnyFunSuite {
  import graft.TestSpark.spark

  private def ensureCatalog(): Unit =
    if (spark.conf.getOption("spark.sql.catalog.graft").isEmpty) {
      spark.conf.set("spark.sql.catalog.graft", "graft.sources.GraftCatalog")
      spark.conf.set("spark.sql.catalog.graft.warehouse",
        graft.util.TempDirs.create("graft_cowpair_wh_"))
    }

  private def withMode[A](command: String, mode: String)(body: => A): A = {
    val conf = s"spark.graft.store.$command.mode"
    val prev = spark.conf.getOption(conf)
    spark.conf.set(conf, mode)
    try body
    finally prev.fold(spark.conf.unset(conf))(spark.conf.set(conf, _))
  }

  test("cow pair-diff: DELETE's raw changelog is exactly the deleted rows; fallback nets identical") {
    ensureCatalog()
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.pairdb")
    spark.sql("DROP TABLE IF EXISTS graft.pairdb.t")
    spark.sql("CREATE TABLE graft.pairdb.t (id BIGINT, v BIGINT)")
    spark.range(0, 10000, 1, 1).selectExpr("id", "id * 2 AS v")
      .writeTo("graft.pairdb.t").append() // v2: one file
    val wh = spark.conf.get("spark.sql.catalog.graft.warehouse")
    val tpath = s"$wh/pairdb/t"
    withMode("delete", "copy-on-write")(
      spark.sql("DELETE FROM graft.pairdb.t WHERE id % 100 = 7")) // v3
    val v = GraftMaintenance.currentVersion(tpath).get

    // the commit recorded the pairing
    val mf = GraftCommit.readManifestFullAt(new File(tpath), v)
    assert(mf.op == "cow-delete" && mf.rewrites.size == 1 &&
      mf.rewrites.values.head.size == 1, mf.rewrites.toString)

    // 1. raw changelog = exactly the 100 deleted rows
    val raw = GraftCDC.changes(spark, tpath, v - 1, Some(v)).collect()
    assert(raw.length == 100,
      s"paired cow-delete raw changelog must be the churn, got ${raw.length}")
    assert(raw.forall(_.getAs[String]("_change_type") == "delete"))
    assert(raw.map(_.getAs[Long]("id")).sorted.toSeq ==
      (0L until 10000L).filter(_ % 100 == 7))

    // 3. fallback equality: strip the #rw headers from the HISTORY copy
    // -> the plain file diff (old deletes + new inserts) nets to the
    // same change set
    val hist = new File(tpath, s"_MANIFEST.v$v")
    val body = Files.readString(hist.toPath)
    Files.writeString(hist.toPath,
      body.linesIterator.filterNot(_.startsWith("#rw="))
        .mkString("", "\n", "\n"))
    val rawNoPair = GraftCDC.changes(spark, tpath, v - 1, Some(v))
    assert(rawNoPair.count() == 10000L + 9900L,
      "without pairing the plain diff emits old deletes + kept inserts")
    val netNoPair = GraftCDC.netChangesOf(rawNoPair).collect()
    assert(netNoPair.map(r =>
      (r.getAs[String]("_change_type"), r.getAs[Long]("id"))).sorted.toSeq ==
      raw.map(r => (r.getAs[String]("_change_type"), r.getAs[Long]("id")))
        .sorted.toSeq)
    Files.writeString(hist.toPath, body) // restore
    spark.sql("DROP TABLE graft.pairdb.t")
  }

  test("cow pair-diff: UPDATE emits one delete+insert per changed row, in place") {
    ensureCatalog()
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.pairdb")
    spark.sql("DROP TABLE IF EXISTS graft.pairdb.u")
    spark.sql("CREATE TABLE graft.pairdb.u (id BIGINT, v BIGINT)")
    spark.range(0, 5000, 1, 1).selectExpr("id", "id AS v")
      .writeTo("graft.pairdb.u").append()
    val wh = spark.conf.get("spark.sql.catalog.graft.warehouse")
    val tpath = s"$wh/pairdb/u"
    withMode("update", "copy-on-write")(
      spark.sql("UPDATE graft.pairdb.u SET v = v + 1000000 WHERE id % 50 = 3"))
    val v = GraftMaintenance.currentVersion(tpath).get
    assert(GraftCommit.readManifestFullAt(new File(tpath), v)
      .rewrites.nonEmpty)
    val raw = GraftCDC.changes(spark, tpath, v - 1, Some(v)).collect()
    assert(raw.length == 200,
      s"100 updated rows -> 100 delete + 100 insert, got ${raw.length}")
    val byType = raw.groupBy(_.getAs[String]("_change_type"))
    val expect = (0L until 5000L).filter(_ % 50 == 3)
    assert(byType("delete").map(r =>
      (r.getAs[Long]("id"), r.getAs[Long]("v"))).sorted.toSeq ==
      expect.map(i => (i, i)))
    assert(byType("insert").map(r =>
      (r.getAs[Long]("id"), r.getAs[Long]("v"))).sorted.toSeq ==
      expect.map(i => (i, i + 1000000L)))
    spark.sql("DROP TABLE graft.pairdb.u")
  }

  test("cow pair-diff: a fully-deleted file pairs to an empty replacement and emits all live rows") {
    ensureCatalog()
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.pairdb")
    spark.sql("DROP TABLE IF EXISTS graft.pairdb.w")
    spark.sql("CREATE TABLE graft.pairdb.w (id BIGINT, v BIGINT)")
    spark.range(0, 1000, 1, 1).selectExpr("id", "id AS v")
      .writeTo("graft.pairdb.w").append() // file A: [0, 1000)
    spark.range(1000, 2000, 1, 1).selectExpr("id", "id AS v")
      .writeTo("graft.pairdb.w").append() // file B: [1000, 2000)
    val wh = spark.conf.get("spark.sql.catalog.graft.warehouse")
    val tpath = s"$wh/pairdb/w"
    // kills ALL of file B and 10 rows of file A — one COW commit, two
    // pairs: A -> [rewrite], B -> []
    withMode("delete", "copy-on-write")(
      spark.sql("DELETE FROM graft.pairdb.w WHERE id >= 1000 OR id < 10"))
    val v = GraftMaintenance.currentVersion(tpath).get
    val mf = GraftCommit.readManifestFullAt(new File(tpath), v)
    assert(mf.rewrites.size == 2, mf.rewrites.toString)
    assert(mf.rewrites.values.count(_.isEmpty) == 1,
      s"the fully-deleted file must pair to NO replacements: ${mf.rewrites}")
    val raw = GraftCDC.changes(spark, tpath, v - 1, Some(v)).collect()
    assert(raw.length == 1010 &&
      raw.forall(_.getAs[String]("_change_type") == "delete"))
    assert(raw.map(_.getAs[Long]("id")).sorted.toSeq ==
      ((0L until 10L) ++ (1000L until 2000L)))
    spark.sql("DROP TABLE graft.pairdb.w")
  }
}
