package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources._
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
  *    computes `val` (asserted in SourcesSpec against the executed plan);
  *  - **filter pushdown** (`SupportsPushDownFilters`, VERDICT r9 task 4
  *    — the reference's S11 shape, a comparison filter immediately after
  *    the scan): supported predicates are ACCEPTED (not re-evaluated by
  *    Spark) and enforced inside the source at two levels: conjunctive
  *    `id` bounds narrow the generated [start, end) ranges at SPLIT
  *    PLANNING (entire slices vanish before any row exists — the
  *    DSv2 analogue of partition pruning), and every accepted predicate
  *    is evaluated per candidate row in the reader, so the scan's
  *    `numOutputRows` is the filtered count, not the table count.
  *    `Scan.description()` advertises the pushed set, which is what
  *    PlanSpec pins in the executed plan.
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

  /** Predicates this source can enforce exactly (columns are all
    * non-null, so IsNull/IsNotNull fold to constants).
    */
  def supported(f: Filter): Boolean = f match {
    case EqualTo(a, _)            => schema.fieldNames.contains(a)
    case GreaterThan(a, _)        => schema.fieldNames.contains(a)
    case GreaterThanOrEqual(a, _) => schema.fieldNames.contains(a)
    case LessThan(a, _)           => schema.fieldNames.contains(a)
    case LessThanOrEqual(a, _)    => schema.fieldNames.contains(a)
    case In(a, _)                 => schema.fieldNames.contains(a)
    case IsNotNull(a)             => schema.fieldNames.contains(a)
    case IsNull(a)                => schema.fieldNames.contains(a)
    case StringStartsWith(a, _)   => a == "label"
    case And(l, r)                => supported(l) && supported(r)
    case Or(l, r)                 => supported(l) && supported(r)
    case Not(c)                   => supported(c)
    case _                        => false
  }

  private def cmp(a: Any, b: Any): Int = (a, b) match {
    case (x: Long, y: Number) => java.lang.Long.compare(x, y.longValue)
    case (x: String, y)       => x.compareTo(String.valueOf(y))
    case _ => throw new IllegalArgumentException(s"seq-source: cannot compare $a to $b")
  }

  /** Exact per-row evaluation of an accepted predicate. */
  def eval(f: Filter, id: Long): Boolean = {
    def v(a: String): Any = a match {
      case "id" => id
      case "val" => valOf(id)
      case "label" => labelOf(id)
    }
    f match {
      case EqualTo(a, x)            => cmp(v(a), x) == 0
      case GreaterThan(a, x)        => cmp(v(a), x) > 0
      case GreaterThanOrEqual(a, x) => cmp(v(a), x) >= 0
      case LessThan(a, x)           => cmp(v(a), x) < 0
      case LessThanOrEqual(a, x)    => cmp(v(a), x) <= 0
      case In(a, xs)                => xs.exists(x => x != null && cmp(v(a), x) == 0)
      case IsNotNull(_)             => true
      case IsNull(_)                => false
      case StringStartsWith(a, p)   => v(a).toString.startsWith(p)
      case And(l, r)                => eval(l, id) && eval(r, id)
      case Or(l, r)                 => eval(l, id) || eval(r, id)
      case Not(c)                   => !eval(c, id)
      case _                        => true
    }
  }

  /** Narrow [lo, hi) by the conjunctive top-level `id` bounds among the
    * pushed filters — split-planning-time pruning; everything else is
    * enforced row-wise.
    */
  def idBounds(filters: Array[Filter], lo0: Long, hi0: Long): (Long, Long) = {
    var lo = lo0; var hi = hi0
    filters.foreach {
      case GreaterThan("id", x: Number)        => lo = math.max(lo, x.longValue + 1)
      case GreaterThanOrEqual("id", x: Number) => lo = math.max(lo, x.longValue)
      case LessThan("id", x: Number)           => hi = math.min(hi, x.longValue)
      case LessThanOrEqual("id", x: Number)    => hi = math.min(hi, x.longValue + 1)
      case EqualTo("id", x: Number)            =>
        lo = math.max(lo, x.longValue); hi = math.min(hi, x.longValue + 1)
      case _                                   => ()
    }
    (lo, hi)
  }
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
    extends ScanBuilder
    with SupportsPushDownRequiredColumns with SupportsPushDownFilters
    with SupportsPushDownLimit {
  private var required: StructType = SeqSource.schema
  private var pushed: Array[Filter] = Array.empty
  private var limit: Long = -1L

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (acc, residual) = filters.partition(SeqSource.supported)
    pushed = acc
    residual
  }

  override def pushedFilters(): Array[Filter] = pushed

  /** LIMIT pushdown — sound ONLY when every accepted filter prunes
    * exactly at split planning (conjunctive id bounds / IsNotNull over
    * non-null columns), because then every generated candidate row IS an
    * output row and capping the id range under-produces nothing. Any
    * row-wise predicate (val/label comparisons, Or, Not, …) makes the
    * limit post-filter, so we decline and Spark keeps its Limit operator
    * over the full scan. A `limit 1000` over a 10^10-row source plans
    * one 1000-row slice instead of 10^10 generated rows.
    */
  override def pushLimit(l: Int): Boolean = {
    def exactPruning(f: Filter): Boolean = f match {
      case GreaterThan("id", _) | GreaterThanOrEqual("id", _) |
           LessThan("id", _) | LessThanOrEqual("id", _) | EqualTo("id", _) => true
      case IsNotNull(_) => true // all columns non-null
      case And(a, b)    => exactPruning(a) && exactPruning(b)
      case _            => false
    }
    if (pushed.forall(exactPruning)) { limit = l.toLong; true }
    else false
  }

  override def build(): Scan = new SeqScan(rows, slices, required, pushed, limit)
}

private[sources] class SeqScan(
    rows: Long, slices: Int, required: StructType, pushed: Array[Filter],
    limit: Long = -1L)
    extends Scan with Batch with SupportsReportStatistics {

  /** [lo, hi) after id-bound narrowing AND the pushed limit (the builder
    * only accepts a limit when every pushed filter prunes exactly, so
    * capping the range is output-equivalent).
    */
  private def bounds: (Long, Long) = {
    val (lo, hi) = SeqSource.idBounds(pushed, 0L, rows)
    if (limit >= 0) (lo, math.min(hi, lo + limit)) else (lo, hi)
  }
  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  /** Post-pushdown size/row estimate (`SupportsReportStatistics`).
    * Without it a DSv2 relation falls back to
    * `spark.sql.defaultSizeInBytes` (effectively infinite), so a
    * filtered seq scan could NEVER be auto-broadcast and every join
    * against it would shuffle — the single biggest planner lever at
    * 100 TB. The id bounds are exact (pruned slices never exist);
    * row-wise predicates are not discounted (a conservative
    * over-estimate only costs a missed broadcast, never an OOM).
    */
  override def estimateStatistics(): Statistics = {
    val (lo, hi) = bounds
    val n = math.max(hi - lo, 0L)
    val width = required.fields.map(_.dataType.defaultSize).sum.max(1)
    new Statistics {
      override def sizeInBytes(): util.OptionalLong = util.OptionalLong.of(n * width)
      override def numRows(): util.OptionalLong = util.OptionalLong.of(n)
    }
  }

  /** Shown in `.explain`, so pushdown is pinnable from the plan text. */
  override def description(): String =
    s"graft-seq(rows=$rows, slices=$slices) " +
      s"PushedFilters: [${pushed.mkString(", ")}], " +
      (if (limit >= 0) s"PushedLimit: $limit, " else "") +
      s"ReadSchema: ${required.catalogString}"

  override def planInputPartitions(): Array[InputPartition] = {
    // id-bound (and pushed-limit) narrowing first: pruned slices never
    // become tasks
    val (lo, hi) = bounds
    if (lo >= hi) return Array.empty
    val span = hi - lo
    val per = (span + slices - 1) / slices
    (0 until slices).iterator
      .map(i => SeqInputPartition(lo + i * per, math.min(lo + (i + 1) * per, hi)))
      .filter(p => p.start < p.end)
      .toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new SeqReaderFactory(required, pushed)
}

private[sources] case class SeqInputPartition(start: Long, end: Long)
    extends InputPartition

private[sources] class SeqReaderFactory(required: StructType, pushed: Array[Filter])
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

      // accepted filters are ENFORCED here (Spark does not re-check them)
      override def next(): Boolean = {
        id += 1
        while (id < sp.end && !pushed.forall(SeqSource.eval(_, id))) id += 1
        id < sp.end
      }
      override def get(): InternalRow = InternalRow.fromSeq(gens.map(_(id)).toSeq)
      override def close(): Unit = ()
    }
  }
}
