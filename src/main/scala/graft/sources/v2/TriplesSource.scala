package graft.sources.v2

import java.util.{Collections, Set => JSet}

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{Path => HPath}
import org.apache.parquet.example.data.Group
import org.apache.parquet.hadoop.example.GroupReadSupport
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.hadoop.{ParquetFileReader, ParquetReader}
import org.apache.parquet.schema.MessageType
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{GenericInternalRow, Literal, XxHash64}
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.sources.{EqualTo, Filter, In}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.sources.TripleSink

/** DataSource V2 READ integration for the [[graft.sources.TripleSink]]
  * snapshot table — the surface that makes the KG table a first-class
  * Spark relation instead of a library call:
  *
  *   spark.read.format("graft.sources.v2.TriplesSource")
  *     .option("path", table)
  *     .option("asOf", runId | "tag", name | "branch", name).load()
  *
  *   CREATE TEMPORARY VIEW kg USING graft.sources.v2.TriplesSource
  *     OPTIONS (path '...', asOf 'r1')        -- plain SQL from here on
  *
  * Semantics match [[TripleSink.read]]/readAsOf/readTag exactly
  * (TriplesV2Spec asserts value equality on evolved, merged, and
  * MOR-deleted tables); what the seam adds, spec-asserted:
  *
  *  - SNAPSHOT-PINNED PLANNING: the manifest resolves once at table
  *    load; commits racing the query do not shift what it reads —
  *    the isolation a catalog gives Iceberg reads.
  *  - PARTITION PRUNING from pushed `subj` predicates: EqualTo/In
  *    prune to the subjects' hash partitions at PLAN time (the same
  *    pmod(xxhash64) the writers stamp, evaluated through Spark's own
  *    expression), so `WHERE subj = X` on a 10^12-row table plans
  *    1/nParts of the files. Conservatively reported as residual —
  *    Spark re-applies every predicate post-scan, so correctness
  *    never depends on the pruning math.
  *  - COLUMN PRUNING to the parquet reader: the requested projection
  *    becomes the parquet read schema (real I/O reduction, same as
  *    the file source's ReadSchema) — except when MOR deletes are
  *    outstanding, where the full data schema is read because the
  *    equality-delete match needs every column (Iceberg pays the
  *    same read-time tax until compaction).
  *  - SCHEMA EVOLUTION: files predating an added column null-fill it,
  *    per the snapshot's recorded schema.
  *  - MOR equality deletes: the (small, compaction-bounded) delete
  *    set loads once at planning and broadcasts inside the reader
  *    factory; readers drop matching rows run-scope-aware.
  *
  * One split per visible data FILE (parallelism == file count, the
  * same granularity as Spark's file source at these file sizes).
  */
final class TriplesSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    TriplesTable.resolve(options).schema()
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: java.util.Map[String, String]): Table =
    TriplesTable.resolve(new CaseInsensitiveStringMap(properties))
}

object TriplesTable {
  def resolve(options: CaseInsensitiveStringMap): TriplesTable = {
    val path = Option(options.get("path")).getOrElse(
      throw new IllegalArgumentException("option 'path' is required"))
    new TriplesTable(path, TripleSink.resolveSnapshot(path,
      Option(options.get("asOf")), Option(options.get("tag")),
      Option(options.get("branch"))))
  }

  private[v2] def toDataType(ddl: String): DataType = DataType.fromDDL(ddl)
}

final class TriplesTable(path: String, m: TripleSink.Manifest)
    extends Table with SupportsRead {
  override def name(): String = s"graft_triples($path)@${m.runId}"
  override def schema(): StructType = StructType(
    m.schema.map { case (n, t) =>
      StructField(n, TriplesTable.toDataType(t)) } ++ Seq(
      StructField("run_id", StringType), StructField("part_id", IntegerType)))
  override def capabilities(): JSet[TableCapability] =
    Collections.singleton(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new TriplesScanBuilder(path, m, schema())
}

final class TriplesScanBuilder(path: String, m: TripleSink.Manifest,
                               full: StructType)
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters {
  private var required: StructType = full
  /** Conjunction of pushed subj constraints: None = unconstrained;
    * Some(s) = subj must be in s (EqualTo/In narrow by intersection —
    * they arrive as separate conjuncts of one WHERE clause). */
  private var subjSet: Option[Set[String]] = None

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    def narrow(s: Set[String]): Unit =
      subjSet = Some(subjSet.fold(s)(_ intersect s))
    filters.foreach {
      case EqualTo("subj", v: String) => narrow(Set(v))
      case In("subj", vs) if vs.forall(_.isInstanceOf[String]) =>
        narrow(vs.map(_.asInstanceOf[String]).toSet)
      case _ => // not prunable: scan all partitions, Spark filters
    }
    filters // all residual: correctness never depends on pruning
  }
  override def pushedFilters(): Array[Filter] = Array.empty

  override def build(): Scan = {
    // the writers' partition spec, evaluated through Spark's own
    // expression so planner and writer cannot disagree on the hash
    val partFilter = subjSet.map(_.map { s =>
      val h = XxHash64(Seq(Literal.create(UTF8String.fromString(s), StringType)),
        42L).eval(null).asInstanceOf[Long]
      (((h % m.nParts) + m.nParts) % m.nParts).toInt
    })
    new TriplesScan(path, m, required, partFilter)
  }
}

final case class TripleFileSplit(file: String, run: String, partId: Int)
    extends InputPartition

/** One delete row: values in data-schema order (plain JVM values,
  * null-safe List equality) + the runs it applies to. */
final case class DeleteEntry(values: List[Any], scope: Set[String])

final class TriplesScan(path: String, m: TripleSink.Manifest,
                        required: StructType, partFilter: Option[Set[Int]])
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-triples $path snapshot=${m.runId} " +
      s"parts=${partFilter.map(_.toSeq.sorted.mkString("[", ",", "]")).getOrElse("all")} " +
      s"ReadSchema: ${required.simpleString}"

  override def planInputPartitions(): Array[InputPartition] = {
    import scala.jdk.CollectionConverters._
    val dirs = TripleSink.visiblePartDirs(path, m)
      .filter { case (_, p) => partFilter.forall(_.contains(p)) }
    dirs.flatMap { case (run, pid) =>
      val dir = java.nio.file.Paths.get(
        path.stripPrefix("file:"), "data", s"run=$run", s"part_id=$pid")
      if (!java.nio.file.Files.isDirectory(dir)) Nil
      else scala.util.Using.resource(java.nio.file.Files.list(dir)) { s =>
        s.iterator().asScala
          .filter(_.getFileName.toString.endsWith(".parquet"))
          .map(f => TripleFileSplit(f.toString, run, pid): InputPartition)
          .toList.sortBy(_.asInstanceOf[TripleFileSplit].file)
      }
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    val dataCols = m.schema.map { case (n, t) =>
      (n, TriplesTable.toDataType(t)) }.toArray
    new TriplesReaderFactory(dataCols, required.fieldNames,
      TriplesScan.loadDeletes(path, m, dataCols))
  }
}

object TriplesScan {
  /** Driver-side load of a snapshot's equality-delete rows — small by
    * the MOR contract (bounded by outstanding deletes, reclaimed at
    * each compact), shipped to readers inside the factory. */
  private[v2] def loadDeletes(path: String, m: TripleSink.Manifest,
                              dataCols: Array[(String, DataType)]): Array[DeleteEntry] =
    m.deletes.flatMap { d =>
      import scala.jdk.CollectionConverters._
      val dir = java.nio.file.Paths.get(
        path.stripPrefix("file:"), "_deletes", s"run=${d.run}")
      if (!java.nio.file.Files.isDirectory(dir)) Nil
      else {
        val files = scala.util.Using.resource(java.nio.file.Files.list(dir)) {
          s => s.iterator().asScala
            .filter(_.getFileName.toString.endsWith(".parquet"))
            .map(_.toString).toList.sorted
        }
        files.flatMap { f =>
          val rdr = new ParquetGroups(f, dataCols, dataCols.map(_._1).toSet)
          try Iterator.continually(rdr.next()).takeWhile(_ != null)
            .map(vals => DeleteEntry(vals.toList, d.scope.toSet)).toList
          finally rdr.close()
        }
      }
    }.toArray
}

final class TriplesReaderFactory(dataCols: Array[(String, DataType)],
                                 outFields: Array[String],
                                 deletes: Array[DeleteEntry])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val TripleFileSplit(file, run, partId) = partition.asInstanceOf[TripleFileSplit]
    val requestedData = outFields.filter(f => dataCols.exists(_._1 == f)).toSet
    // equality-delete matching needs EVERY data column — read them all
    // while deletes are outstanding, project afterwards
    val needed = if (deletes.nonEmpty) dataCols.map(_._1).toSet else requestedData
    val groups = new ParquetGroups(file, dataCols, needed)
    // index output fields once: Left(data col idx) | Right(constant)
    val plan: Array[Either[Int, Any]] = outFields.map {
      case "run_id" => Right(UTF8String.fromString(run))
      case "part_id" => Right(Int.box(partId))
      case f => Left(dataCols.indexWhere(_._1 == f))
    }
    val delIndex: Map[List[Any], Set[String]] =
      deletes.groupBy(_.values).map { case (k, es) =>
        k -> es.flatMap(_.scope).toSet }
    new PartitionReader[InternalRow] {
      private var cur: Array[Any] = _
      override def next(): Boolean = {
        cur = groups.next()
        while (cur != null && deletes.nonEmpty &&
               delIndex.get(cur.toList).exists(_.contains(run))) {
          cur = groups.next()
        }
        cur != null
      }
      override def get(): InternalRow = {
        val vals = new Array[Any](plan.length)
        var i = 0
        while (i < plan.length) {
          vals(i) = plan(i) match {
            case Right(c) => c
            case Left(j) => cur(j) match {
              case s: String => UTF8String.fromString(s)
              case v => v
            }
          }
          i += 1
        }
        new GenericInternalRow(vals)
      }
      override def close(): Unit = groups.close()
    }
  }
}

/** Thin parquet-example reader: yields one Array[Any] per row in
  * data-schema order — plain JVM values (String/Long/Int/Double/
  * Boolean/null), with columns outside `needed` or missing from the
  * file (schema evolution) left null. The parquet read schema is the
  * intersection of `needed` with the file's own schema, so projection
  * reaches the column reader (I/O pruning, not post-hoc dropping). */
private[v2] final class ParquetGroups(file: String,
                                      dataCols: Array[(String, DataType)],
                                      needed: Set[String]) {
  private val conf = new Configuration()
  private val hPath = new HPath(file)
  private val fileSchema: MessageType =
    scala.util.Using.resource(
      ParquetFileReader.open(HadoopInputFile.fromPath(hPath, conf)))(
      _.getFooter.getFileMetaData.getSchema)
  private val present: Set[String] = {
    import scala.jdk.CollectionConverters._
    fileSchema.getFields.asScala.map(_.getName).toSet
  }
  private val readCols: Array[(String, DataType)] =
    dataCols.filter { case (n, _) => needed(n) && present(n) }
  private val reader: ParquetReader[Group] = {
    val fields: Array[org.apache.parquet.schema.Type] =
      readCols.map { case (n, _) => fileSchema.getType(Seq(n): _*) }
    val requested = new MessageType("spark_schema", fields: _*)
    conf.set(org.apache.parquet.hadoop.api.ReadSupport.PARQUET_READ_SCHEMA,
      requested.toString)
    ParquetReader.builder(new GroupReadSupport(), hPath).withConf(conf).build()
  }

  /** Next row in data-schema order, or null at end. */
  def next(): Array[Any] = {
    val g = reader.read()
    if (g == null) return null
    val out = new Array[Any](dataCols.length)
    var j = 0
    dataCols.indices.foreach { i =>
      val (n, t) = dataCols(i)
      if (j < readCols.length && readCols(j)._1 == n) {
        out(i) =
          if (g.getFieldRepetitionCount(n) == 0) null
          else t match {
            case StringType => g.getString(n, 0)
            case LongType => Long.box(g.getLong(n, 0))
            case IntegerType => Int.box(g.getInteger(n, 0))
            case DoubleType => Double.box(g.getDouble(n, 0))
            case BooleanType => Boolean.box(g.getBoolean(n, 0))
            case other => throw new IllegalArgumentException(
              s"column $n: unsupported type $other (the triple table " +
                "writes string/bigint/int/double/boolean)")
          }
        j += 1
      } // else: pruned or evolved-in later than this file -> null
    }
    out
  }

  def close(): Unit = reader.close()
}
