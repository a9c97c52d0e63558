package graft.sources.v2

import java.util.{Collections, Set => JSet}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.core.Hashing

/** Custom DataSource V2 source (the SOURCE rung of the extension
  * surface, SURVEY.md §2): a deterministic synthetic-events generator —
  *
  *   spark.read.format("graft.sources.v2.SynthEventsSource")
  *     .option("rows", n).option("parts", p).option("seed", s).load()
  *
  * Every column derives from ONE splitmix64 application per row
  * (`h = splitmix64(event_id + seed)`, then unsigned modular
  * arithmetic), so the whole table has a closed-form DuckDB value
  * oracle over `range(n)` — the source is verified row-for-row, not
  * just structurally (`q_source_v2`).
  *
  * What it demonstrates about the seam, spec-asserted:
  *   - PARTITION PLANNING by the source: `parts` row-range splits
  *     planned server-side — the parallelism a file source gets from
  *     file splits, with no repartition shuffle anywhere;
  *   - COLUMN PRUNING via `SupportsPushDownRequiredColumns`: a
  *     projection reaches the reader, which materializes only the
  *     requested fields (the `ReadSchema` the 100 TB rule "don't read
  *     columns you don't need" is about, now honored by our own source);
  *   - zero driver state: readers generate rows executor-side from
  *     (start, end, seed) alone.
  *
  * Generators like this are how engine benchmarks feed themselves at
  * scale (TPC-DS dsdgen-as-a-source): no materialization pass, no
  * external data, any size.
  */
final class SynthEventsSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SynthEvents.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: java.util.Map[String, String]): Table =
    new SynthEventsTable
}

object SynthEvents {
  val schema: StructType = StructType(Seq(
    StructField("event_id", LongType, nullable = false),
    StructField("user_id", LongType, nullable = false),
    StructField("event_type", StringType, nullable = false),
    StructField("ts", TimestampNTZType, nullable = false),
    StructField("value", DoubleType, nullable = false)))

  val types: Array[String] = Array("click", "view", "purchase", "refund")

  /** Epoch seconds of 2024-01-01 00:00:00 UTC — the ts base. */
  val baseEpoch: Long = 1704067200L

  /** Column generators over (event_id, h); all arithmetic UNSIGNED so
    * the DuckDB mirror is plain HUGEINT % and //. */
  def userId(h: Long): Long = java.lang.Long.remainderUnsigned(h, 1000L)
  def etype(h: Long): String =
    types(java.lang.Long.remainderUnsigned(java.lang.Long.divideUnsigned(h, 1000L), 4L).toInt)
  def tsMicros(h: Long): Long =
    (baseEpoch + java.lang.Long.remainderUnsigned(
      java.lang.Long.divideUnsigned(h, 4000L), 2592000L)) * 1000000L
  def value(h: Long): Double =
    java.lang.Long.remainderUnsigned(h, 1000000L) / 100.0
}

final class SynthEventsTable extends Table with SupportsRead {
  override def name(): String = "graft_synth_events"
  override def schema(): StructType = SynthEvents.schema
  override def capabilities(): JSet[TableCapability] =
    Collections.singleton(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new SynthScanBuilder(
      options.getLong("rows", 10000L),
      options.getInt("parts", 8),
      options.getLong("seed", 42L))
}

final class SynthScanBuilder(rows: Long, parts: Int, seed: Long)
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters {
  private var required: StructType = SynthEvents.schema
  private var lo: Long = 0L
  private var hi: Long = rows // exclusive

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** Range predicates on `event_id` narrow the generated [lo, hi)
    * window — PARTITION PRUNING for a generator source: pruned ids are
    * never produced, so whole input partitions disappear from the
    * plan. Conservatively, NOTHING is reported as source-evaluated
    * (pushedFilters = empty ⇒ Spark re-applies every predicate after
    * the scan), so correctness never depends on the pruning math —
    * pushdown here only removes work, exactly like parquet row-group
    * pruning under a retained filter. */
  // saturating successor: v+1 on Long.MaxValue must clamp, not wrap —
  // a wrapped bound would prune EVERYTHING for `<= Long.MaxValue`,
  // and no post-scan filter can resurrect rows never generated
  private def succ(v: Long): Long =
    if (v == Long.MaxValue) Long.MaxValue else v + 1

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    filters.foreach {
      case EqualTo("event_id", v: Long) =>
        lo = math.max(lo, v); hi = math.min(hi, succ(v))
      case GreaterThan("event_id", v: Long) => lo = math.max(lo, succ(v))
      case GreaterThanOrEqual("event_id", v: Long) => lo = math.max(lo, v)
      case LessThan("event_id", v: Long) => hi = math.min(hi, v)
      case LessThanOrEqual("event_id", v: Long) => hi = math.min(hi, succ(v))
      case _ => // not range-expressible: generate, let Spark filter
    }
    filters // all residual: Spark re-evaluates everything post-scan
  }
  override def pushedFilters(): Array[Filter] = Array.empty

  override def build(): Scan =
    SynthScan(rows, parts, seed, required, lo, math.max(lo, hi))
}

final case class SynthRange(start: Long, end: Long, seed: Long)
    extends InputPartition

final case class SynthScan(rows: Long, parts: Int, seed: Long,
                           required: StructType,
                           lo: Long = 0L, hi: Long = -1L) extends Scan with Batch {
  require(rows >= 0 && parts >= 1, "rows >= 0, parts >= 1")
  private val hiEff = if (hi < 0) rows else hi
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-synth-events rows=$rows parts=$parts range=[$lo,$hiEff) " +
      s"ReadSchema: ${required.simpleString}"

  /** `parts` splits over the FULL [0, rows) id space, then clipped to
    * the pushed [lo, hi) window — empty splits are dropped, so a
    * selective event_id range plans fewer partitions (spec-asserted). */
  override def planInputPartitions(): Array[InputPartition] = {
    val per = math.max(1L, (rows + parts - 1) / parts)
    (0L until rows by per)
      .map(s => SynthRange(math.max(s, lo), math.min(math.min(s + per, rows), hiEff), seed))
      .filter(r => r.start < r.end)
      .map(r => r: InputPartition)
      .toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new SynthReaderFactory(required.fieldNames)
}

final class SynthReaderFactory(fields: Array[String])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val SynthRange(start, end, seed) = partition.asInstanceOf[SynthRange]
    // resolve the projection ONCE per partition — a per-row string
    // match on the generator's hot path would tax exactly the
    // benchmarks this source exists to feed
    val gens: Array[(Long, Long) => Any] = fields.map {
      case "event_id"   => (id: Long, _: Long) => id
      case "user_id"    => (_: Long, h: Long) => SynthEvents.userId(h)
      case "event_type" => (_: Long, h: Long) => UTF8String.fromString(SynthEvents.etype(h))
      case "ts"         => (_: Long, h: Long) => SynthEvents.tsMicros(h)
      case "value"      => (_: Long, h: Long) => SynthEvents.value(h)
      case other => throw new IllegalArgumentException(s"unknown column $other")
    }
    new PartitionReader[InternalRow] {
      private var id = start - 1
      override def next(): Boolean = { id += 1; id < end }
      override def get(): InternalRow = {
        val h = Hashing.splitmix64(id + seed)
        val vals = new Array[Any](gens.length)
        var i = 0
        while (i < gens.length) { vals(i) = gens(i)(id, h); i += 1 }
        new GenericInternalRow(vals)
      }
      override def close(): Unit = ()
    }
  }
}
