package graft.sources

import java.io.File
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption, StandardOpenOption}

import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Small-file COMPACTION for graft-store tables (VERDICT r10 task 2):
  * a long-running streaming sink (q251's shape) publishes one file per
  * epoch per task and accumulates thousands of tiny parts — the classic
  * table-format failure at scale (every scan pays per-file open cost;
  * the driver pays per-file planning). `compact` rewrites each
  * partition directory's many small files into few large ones,
  * committed so a CONCURRENT READER never sees duplicates or a torn
  * table:
  *
  *  1. merged files are byte-concatenations of their inputs (records
  *     are self-delimiting: every write ends each record with '\n' and
  *     the parser is quote-aware, so concatenation is exact), staged in
  *     `_temporary/compact-<id>/` and moved into the table under
  *     `merged-<id>-<n>.csv` — names the default `part-*` glob IGNORES,
  *     so they are invisible while the old files are still live;
  *  2. `_STATS` entries for the merged files are derived by MERGING the
  *     inputs' zone maps (sum rows/nulls, min of mins, max of maxes —
  *     no re-parse; a column missing from any input is dropped, an
  *     input missing stats entirely falls back to a record-boundary
  *     walk for the row count);
  *  3. the `_MANIFEST` swap is the COMMIT POINT: one atomic rename
  *     makes the reader's visible set exactly {merged + untouched}
  *     (GraftStoreScan plans the manifest verbatim when present);
  *  4. only after the manifest lands are the replaced files deleted.
  *
  * Kill-safety (SourcesSpec kills at each boundary): before step 3 the
  * store still reads its OLD file set (stray `merged-` files are
  * invisible and swept by the next compact); after step 3 it reads the
  * new set; step 4 is pure garbage collection. A reader that PLANNED
  * before step 3 and executes after step 4 can hit a deleted file —
  * the standard snapshot-expiry caveat of every manifest table format;
  * production would defer step 4 by a retention window.
  *
  * CONTRACT with the streaming sink: compaction must not run while a
  * stream whose epochs may still REPLAY is writing the table (quiesce
  * first, or compact only epochs older than the checkpoint's committed
  * watermark). A replayed epoch deletes/replaces its `part-e<n>-*`
  * files by NAME; rows already merged away can no longer be matched, so
  * the replay would duplicate them.
  *
  * Scale note: this driver-side loop moves O(bytes) through one
  * machine; at 100 TB each partition directory's merge is an
  * independent task (the byte-concat parallelizes trivially) and only
  * the manifest swap is coordinated. The PROTOCOL — stage invisible,
  * swap one pointer, GC after — is the part that carries.
  */
object GraftMaintenance {

  /** Result: file counts before/after and the number of merge groups. */
  final case class CompactResult(filesBefore: Int, filesAfter: Int, merged: Int)

  /** Compact every partition directory whose file count exceeds 1,
    * packing inputs (in name order) into merged files of up to
    * `targetBytes`. Idempotent: a second run over an already-compact
    * table rewrites nothing and leaves the manifest unchanged.
    */
  def compact(path: String, targetBytes: Long = 64L << 20): CompactResult = {
    val root = new File(path)
    require(new File(root, GraftStore.SuccessFile).isFile,
      s"graft-store: no committed table at $path")
    val schema = StructType.fromDDL(new String(Files.readAllBytes(
      new File(root, GraftStore.SchemaFile).toPath), StandardCharsets.UTF_8))
    val partCols = GraftStore.readPartitionCols(path)
    val dataFields = schema.fields.filterNot(f => partCols.contains(f.name))

    val rootPath = root.getAbsolutePath
    def relOf(f: File): String =
      f.getAbsolutePath.substring(rootPath.length + 1)
        .replace(File.separatorChar, '/')

    // the CURRENT visible set: manifest if present, else the glob
    val visible: Seq[String] = GraftCommit.readManifest(root).getOrElse(
      GraftCommit.allPartFiles(root).filter(_.getName.startsWith("part-"))
        .map(relOf).sorted)
    val visibleSet = visible.toSet

    // sweep strays: merged files a previous kill-before-commit never
    // adopted, and — on a manifest-bearing table — part files published
    // by an append that died before its manifest update (both are
    // invisible garbage; without the sweep they leak forever and would
    // reappear as phantom rows if the manifest were ever removed).
    // Safe under compact's no-concurrent-writer contract.
    val manifested = GraftCommit.readManifest(root).isDefined
    GraftCommit.allPartFiles(root)
      .filter(f => !visibleSet(relOf(f)) &&
        (f.getName.startsWith("merged-") || manifested))
      .foreach(f => Files.delete(f.toPath))

    val statsBook = GraftCommit.readStats(root)
    val byDir: Map[String, Seq[String]] = visible.groupBy { rel =>
      val i = rel.lastIndexOf('/')
      if (i < 0) "" else rel.substring(0, i)
    }

    val compactId = java.util.UUID.randomUUID().toString.take(8)
    val stage = new File(new File(root, "_temporary"), s"compact-$compactId")
    var groupNo = 0
    val mergedRels = Seq.newBuilder[String]
    val mergedStats = scala.collection.mutable.Map.empty[String, GraftFileStats]
    val replaced = Seq.newBuilder[String]

    byDir.toSeq.sortBy(_._1).foreach { case (relDir, files) =>
      if (files.size <= 1) ()
      else {
        // bin-pack in name order (epoch/job order) up to targetBytes
        val sized = files.sorted.map(rel => rel -> new File(root, rel).length())
        val groups = Seq.newBuilder[Seq[String]]
        var cur = Seq.newBuilder[String]; var curN = 0; var curBytes = 0L
        sized.foreach { case (rel, len) =>
          if (curN > 0 && curBytes + len > targetBytes) {
            groups += cur.result(); cur = Seq.newBuilder[String]; curN = 0; curBytes = 0L
          }
          cur += rel; curN += 1; curBytes += len
        }
        if (curN > 0) groups += cur.result()
        groups.result().foreach { group =>
          if (group.size <= 1) ()
          else {
            val name = f"merged-$compactId-$groupNo%05d.csv"
            groupNo += 1
            val rel = if (relDir.isEmpty) name else s"$relDir/$name"
            // stage: byte-concat (records are '\n'-terminated by the writer)
            stage.mkdirs()
            val tmp = new File(stage, name)
            group.foreach { in =>
              Files.write(tmp.toPath, Files.readAllBytes(new File(root, in).toPath),
                StandardOpenOption.CREATE, StandardOpenOption.APPEND)
            }
            val destDir = if (relDir.isEmpty) root else new File(root, relDir)
            Files.move(tmp.toPath, new File(destDir, name).toPath,
              StandardCopyOption.ATOMIC_MOVE)
            mergedRels += rel
            mergeStats(group.map(statsBook.get), dataFields,
              new File(destDir, name)).foreach(mergedStats(rel) = _)
            replaced ++= group
          }
        }
      }
    }

    val replacedList = replaced.result()
    val merged = mergedRels.result()
    if (replacedList.isEmpty) {
      GraftCommit.deleteTemp(path, s"compact-$compactId")
      return CompactResult(visible.size, visible.size, 0)
    }
    val replacedSet = replacedList.toSet
    // COMMIT under the metadata lock, rebuilt from the CURRENT state —
    // not the pre-merge snapshot: a concurrent append's files must
    // survive the swap, and a concurrent DELETE that removed any of our
    // INPUTS aborts the whole compaction (publishing the merged file
    // would resurrect the deleted rows).
    GraftCommit.withMetaLock(root) {
      val current: Seq[String] = GraftCommit.readManifest(root).getOrElse(
        GraftCommit.allPartFiles(root)
          .filter(_.getName.startsWith("part-")).map(relOf).sorted)
      if (!replacedList.forall(current.toSet)) {
        merged.foreach(rel => Files.deleteIfExists(new File(root, rel).toPath))
        GraftCommit.deleteTemp(path, s"compact-$compactId")
        throw new IllegalStateException(
          "graft-store: a concurrent writer removed compaction inputs " +
            s"under $path — nothing was swapped; rerun compact")
      }
      val statsNow = GraftCommit.readStats(root)
      GraftCommit.writeStats(root,
        (statsNow.filterNot(e => replacedSet(e._1)) ++ mergedStats)
          .toSeq.sortBy(_._1))
      GraftCommit.writeManifest(root,
        current.filterNot(replacedSet) ++ merged)
    }
    // GC: only after the manifest no longer references the inputs
    replacedList.foreach(rel =>
      Files.deleteIfExists(new File(root, rel).toPath))
    GraftCommit.deleteTemp(path, s"compact-$compactId")
    val after = visible.size - replacedList.size + groupNo
    CompactResult(visible.size, after, groupNo)
  }

  /** Merge the inputs' zone maps; None when row counts must be walked
    * and the walk finds nothing to describe beyond rows (an input
    * without stats drops per-column bounds but the row count is
    * recovered with a record-boundary walk of the merged file).
    */
  private def mergeStats(inputs: Seq[Option[GraftFileStats]],
      dataFields: Array[StructField], mergedFile: File): Option[GraftFileStats] = {
    if (inputs.exists(_.isEmpty)) {
      val parser = new GraftRecordParser(Files.newBufferedReader(
        mergedFile.toPath, StandardCharsets.UTF_8))
      var n = 0L
      try { while (parser.next() != null) n += 1 } finally parser.close()
      Some(GraftFileStats(n, Map.empty))
    } else {
      val sts = inputs.map(_.get)
      val cols = dataFields.iterator.filter(f => sts.forall(_.cols.contains(f.name)))
        .map { f =>
          val cs = sts.map(_.cols(f.name))
          def bound(pick: GraftColStatsTxt => Option[String], dir: Int): Option[String] = {
            val defined = cs.flatMap(pick)
            if (defined.isEmpty) None
            else Some(defined.reduce((a, b) =>
              if (textCmp(f.dataType, a, b) * dir <= 0) a else b))
          }
          f.name -> GraftColStatsTxt(cs.map(_.nulls).sum,
            bound(_.min, 1), bound(_.max, -1))
        }.toMap
      Some(GraftFileStats(sts.map(_.rows).sum, cols))
    }
  }

  /** Text-form stat comparison under the same total order the scan's
    * refutation uses (UTF-8 binary strings, NaN-greatest doubles).
    */
  private def textCmp(dt: DataType, a: String, b: String): Int = dt match {
    case LongType | IntegerType => java.lang.Long.compare(a.toLong, b.toLong)
    case DoubleType  => java.lang.Double.compare(a.toDouble, b.toDouble)
    case BooleanType => java.lang.Boolean.compare(a.toBoolean, b.toBoolean)
    case StringType  =>
      UTF8String.fromString(a).compareTo(UTF8String.fromString(b))
    case other => throw new IllegalArgumentException(
      s"graft-store: no stats for column type $other")
  }
}
