package graft.sources

import java.io.{BufferedWriter, File, FileWriter}
import java.nio.file.{Files, Paths, StandardCopyOption}
import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, SupportsTruncate, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** `graft-store`: a native DataSource V2 TABLE FORMAT with a real commit
  * protocol — the WRITE path VERDICT r8 task 6 asked for (SeqSource
  * demonstrates the V2 read contract; this completes the pair).
  *
  * Layout of a committed table directory:
  *   part-<jobId>-<n>.csv   data files (one per write task)
  *   _SCHEMA                the schema as DDL (written at job commit)
  *   _SUCCESS               commit marker, written LAST
  *
  * Commit protocol (the Hadoop FileOutputCommitter v1 shape, the same
  * `_SUCCESS` semantics streaming/Pipeline relies on):
  *  - each task writes to `_temporary/<jobId>/task-<partition>-<taskId>`
  *    (taskId is attempt-unique, so retried/speculative attempts never
  *    collide) and hands the path back in its commit message;
  *  - task abort deletes the task file; job abort deletes the whole
  *    `_temporary/<jobId>` dir — a failed job leaves NOTHING visible
  *    (SourcesSpec proves it);
  *  - job commit renames the task files to `part-<jobId>-<n>.csv`
  *    (numbered in partition order — deterministic layout), truncates
  *    prior parts if the write was an overwrite, writes `_SCHEMA`, and
  *    writes `_SUCCESS` last, so a reader either sees the marker and a
  *    complete table or no marker at all;
  *  - the READER plans zero partitions unless `_SUCCESS` exists — the
  *    gate that makes half-written directories invisible.
  *
  * Scale notes: file renames are atomic on a real filesystem (HDFS);
  * object stores need a manifest committer instead — the protocol shape
  * (task temp → single job-level publish point) is the part that
  * carries. Reads parallelize one InputPartition per part file. Values
  * are CSV with quote-doubling escapes; supported column types are the
  * scalar core (long/int/double/boolean/string) — enough for every
  * serving-sink shape in SURVEY §2 (S6/S14).
  */
class GraftStoreProvider extends TableProvider {
  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val path = GraftStore.pathOf(options)
    val f = new File(path, GraftStore.SchemaFile)
    require(f.isFile,
      s"graft-store: no committed table at $path (missing ${GraftStore.SchemaFile}); " +
        "pass an explicit schema to read an uncommitted location")
    StructType.fromDDL(new String(
      Files.readAllBytes(f.toPath), java.nio.charset.StandardCharsets.UTF_8))
  }

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new GraftStoreTable(properties.get("path"), schema)
}

object GraftStore {
  val SchemaFile = "_SCHEMA"
  val SuccessFile = "_SUCCESS"

  def pathOf(options: CaseInsensitiveStringMap): String = {
    val p = options.get("path")
    require(p != null && p.nonEmpty, "graft-store requires a 'path' option")
    p
  }

  /** CSV field escape: quote + double inner quotes when needed; null →
    * bare empty, empty string → quoted empty (so the parser can tell
    * them apart).
    */
  def escape(s: String): String =
    if (s.isEmpty || s.exists(c => c == ',' || c == '"' || c == '\n' || c == '\r'))
      "\"" + s.replace("\"", "\"\"") + "\""
    else s

  /** Minimal quote-aware CSV line parser; bare empty field → null. */
  def parseLine(line: String): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val sb = new StringBuilder
    var i = 0
    var quoted = false
    var wasQuoted = false
    def flush(): Unit = {
      out += (if (!wasQuoted && sb.isEmpty) null else sb.toString)
      sb.clear(); wasQuoted = false
    }
    while (i < line.length) {
      val c = line.charAt(i)
      if (quoted) {
        if (c == '"') {
          if (i + 1 < line.length && line.charAt(i + 1) == '"') { sb += '"'; i += 1 }
          else quoted = false
        } else sb += c
      } else c match {
        case '"' => quoted = true; wasQuoted = true
        case ',' => flush()
        case _   => sb += c
      }
      i += 1
    }
    flush()
    out.toArray
  }

  def serialize(row: InternalRow, schema: StructType): String =
    schema.fields.zipWithIndex.map { case (f, i) =>
      if (row.isNullAt(i)) ""
      else f.dataType match {
        case LongType    => row.getLong(i).toString
        case IntegerType => row.getInt(i).toString
        case DoubleType  => row.getDouble(i).toString
        case BooleanType => row.getBoolean(i).toString
        case StringType  => escape(row.getString(i))
        case dt => throw new IllegalArgumentException(
          s"graft-store: unsupported column type $dt")
      }
    }.mkString(",")

  def deserialize(line: String, schema: StructType): InternalRow = {
    val parts = parseLine(line)
    InternalRow.fromSeq(schema.fields.zipWithIndex.map { case (f, i) =>
      val v = if (i < parts.length) parts(i) else null
      if (v == null) null
      else f.dataType match {
        case LongType    => v.toLong
        case IntegerType => v.toInt
        case DoubleType  => v.toDouble
        case BooleanType => v.toBoolean
        case StringType  => UTF8String.fromString(v)
        case dt => throw new IllegalArgumentException(
          s"graft-store: unsupported column type $dt")
      }
    }.toSeq)
  }
}

private[sources] class GraftStoreTable(path: String, tschema: StructType)
    extends Table with SupportsRead with SupportsWrite {
  override def name(): String = s"graft-store($path)"
  override def schema(): StructType = tschema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.TRUNCATE)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new GraftStoreScan(path, tschema)
    }

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new GraftStoreWriteBuilder(path, info.schema())
}

// ------------------------------------------------------------------ read

private[sources] case class GraftFilePartition(file: String)
    extends InputPartition

private[sources] class GraftStoreScan(path: String, schema: StructType)
    extends Scan with Batch {
  override def readSchema(): StructType = schema
  override def toBatch: Batch = this

  /** The `_SUCCESS` gate: an uncommitted directory reads as empty. */
  override def planInputPartitions(): Array[InputPartition] = {
    val dir = new File(path)
    if (!new File(dir, GraftStore.SuccessFile).isFile) Array.empty
    else dir.listFiles()
      .filter(f => f.isFile && f.getName.startsWith("part-"))
      .sortBy(_.getName)
      .map(f => GraftFilePartition(f.getAbsolutePath): InputPartition)
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new GraftReaderFactory(schema)
}

private[sources] class GraftReaderFactory(schema: StructType)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val lines = Files.readAllLines(
      Paths.get(p.asInstanceOf[GraftFilePartition].file)).iterator()
    new PartitionReader[InternalRow] {
      private var row: InternalRow = _
      override def next(): Boolean =
        if (lines.hasNext) { row = GraftStore.deserialize(lines.next(), schema); true }
        else false
      override def get(): InternalRow = row
      override def close(): Unit = ()
    }
  }
}

// ----------------------------------------------------------------- write

private[sources] class GraftStoreWriteBuilder(path: String, schema: StructType)
    extends WriteBuilder with SupportsTruncate {
  private var doTruncate = false
  override def truncate(): WriteBuilder = { doTruncate = true; this }
  override def build(): Write = new Write {
    override def toBatch: BatchWrite =
      new GraftBatchWrite(path, schema, doTruncate,
        java.util.UUID.randomUUID().toString.take(8))
  }
}

private[sources] case class GraftCommitMessage(tempPath: String, partitionId: Int)
    extends WriterCommitMessage

private[sources] class GraftBatchWrite(
    path: String, schema: StructType, truncate: Boolean, jobId: String)
    extends BatchWrite {

  private def tempDir = new File(new File(path, "_temporary"), jobId)

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new GraftWriterFactory(tempDir.getAbsolutePath, schema)

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val dir = new File(path)
    dir.mkdirs()
    if (truncate)
      dir.listFiles().filter(f => f.getName.startsWith("part-") ||
        f.getName == GraftStore.SuccessFile || f.getName == GraftStore.SchemaFile)
        .foreach(f => Files.delete(f.toPath))
    messages.map(_.asInstanceOf[GraftCommitMessage]).sortBy(_.partitionId)
      .zipWithIndex.foreach { case (m, i) =>
        Files.move(Paths.get(m.tempPath),
          new File(dir, f"part-$jobId-$i%05d.csv").toPath,
          StandardCopyOption.ATOMIC_MOVE)
      }
    Files.write(new File(dir, GraftStore.SchemaFile).toPath,
      schema.toDDL.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    deleteTemp()
    // the publish point: written last, so the marker implies completeness
    Files.write(new File(dir, GraftStore.SuccessFile).toPath, Array.empty[Byte])
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = deleteTemp()

  private def deleteTemp(): Unit = {
    def rm(f: File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      Files.deleteIfExists(f.toPath); ()
    }
    if (tempDir.exists()) rm(tempDir)
    val tparent = new File(path, "_temporary")
    if (tparent.isDirectory && tparent.list().isEmpty)
      Files.deleteIfExists(tparent.toPath)
    ()
  }
}

private[sources] class GraftWriterFactory(tempDir: String, schema: StructType)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new GraftDataWriter(tempDir, schema, partitionId, taskId)
}

private[sources] class GraftDataWriter(
    tempDir: String, schema: StructType, partitionId: Int, taskId: Long)
    extends DataWriter[InternalRow] {
  private val file = {
    val d = new File(tempDir)
    d.mkdirs()
    new File(d, s"task-$partitionId-$taskId")
  }
  private var out: BufferedWriter = new BufferedWriter(new FileWriter(file))

  override def write(row: InternalRow): Unit = {
    out.write(GraftStore.serialize(row, schema))
    out.write("\n")
  }

  override def commit(): WriterCommitMessage = {
    out.close(); out = null
    GraftCommitMessage(file.getAbsolutePath, partitionId)
  }

  override def abort(): Unit = {
    if (out != null) out.close()
    Files.deleteIfExists(file.toPath)
    ()
  }

  override def close(): Unit = if (out != null) { out.close(); out = null }
}
