package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** A native DataSource V2 batch source: `graft-seq`, a deterministic
  * row generator (the engine-level analogue of the reference's external
  * ingest scans, S1/S2 — here the "service" is a pure function, so the
  * source is reproducible and oracle-checkable).
  *
  * Demonstrates the full V2 source contract Spark's own built-ins use:
  *
  *  - `TableProvider` → `Table` → `ScanBuilder` → `Scan` → `Batch`
  *  - **split planning**: `rows` are divided into `slices` disjoint
  *    [start, end) `InputPartition`s — the moral equivalent of file
  *    splits; on a cluster each becomes one task, so the source scales
  *    out without any driver-side row materialization;
  *  - **column pruning** (`SupportsPushDownRequiredColumns`): the reader
  *    materializes ONLY the pruned schema — a `select(label)` never
  *    computes `val` (asserted in SourcesSpec against the executed plan).
  *
  * Row contract (all pure integer/string arithmetic, mirrored by the
  * DuckDB oracle via `generate_series`):
  *   id ∈ [0, rows), val = (id·2654435761) mod 1e9+7, label = 'r' ++ id%7.
  */
class SeqSourceProvider extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SeqSource.schema

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new SeqTable(
      properties.getOrDefault("rows", "1000").toLong,
      properties.getOrDefault("slices", "4").toInt)
}

object SeqSource {
  val schema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("val", LongType, nullable = false),
    StructField("label", StringType, nullable = false)))

  def valOf(id: Long): Long = (id * 2654435761L) % 1000000007L
  def labelOf(id: Long): String = "r" + (id % 7)
}

private[sources] class SeqTable(rows: Long, slices: Int)
    extends Table with SupportsRead {
  override def name(): String = s"graft-seq($rows)"
  override def schema(): StructType = SeqSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new SeqScanBuilder(rows, slices)
}

private[sources] class SeqScanBuilder(rows: Long, slices: Int)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = SeqSource.schema

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = new SeqScan(rows, slices, required)
}

private[sources] class SeqScan(rows: Long, slices: Int, required: StructType)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] = {
    val per = (rows + slices - 1) / slices
    (0 until slices).iterator
      .map(i => SeqInputPartition(i * per, math.min((i + 1) * per, rows)))
      .filter(p => p.start < p.end)
      .toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new SeqReaderFactory(required)
}

private[sources] case class SeqInputPartition(start: Long, end: Long)
    extends InputPartition

private[sources] class SeqReaderFactory(required: StructType)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val sp = p.asInstanceOf[SeqInputPartition]
    new PartitionReader[InternalRow] {
      private var id = sp.start - 1
      // bind the pruned schema once: each output slot knows its generator
      private val gens: Array[Long => Any] = required.fields.map(_.name match {
        case "id"    => (i: Long) => i
        case "val"   => (i: Long) => SeqSource.valOf(i)
        case "label" => (i: Long) => UTF8String.fromString(SeqSource.labelOf(i))
      })

      override def next(): Boolean = { id += 1; id < sp.end }
      override def get(): InternalRow = InternalRow.fromSeq(gens.map(_(id)).toSeq)
      override def close(): Unit = ()
    }
  }
}
