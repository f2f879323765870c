package graft.sources.v2

import java.util

import graft.model.Star
import graft.sources.DatFile
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{EqualTo, Filter, In, StringStartsWith}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import scala.jdk.CollectionConverters._

/** DataSource V2 for `.dat` light-curve directories — the pushdown seam
  * SURVEY §2.1 designs (`TapClient`/`VizierTapBase` predicate pushdown),
  * implemented for real on the local file layout where pruning is
  * physical: the star id IS the file name, so `starId = 'x'` /
  * `starId IN (...)` / `starId LIKE 'p%'` predicates are consumed by the
  * scan and prune to the matching FILES at planning time (one
  * InputPartition per surviving file — a query for one star opens one
  * file no matter how many the directory holds). Column pruning is
  * honored too: a projection without `lightCurves` skips the curve
  * parsing and cleaning kernel entirely.
  *
  * Usage: `spark.read.format("graft.sources.v2.DatDataSource").load(dir)`.
  */
class DatDataSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = Star.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new DatTable(properties.asScala.get("path"))
}

class DatTable(pathProp: Option[String]) extends Table with SupportsRead {
  override def name(): String = s"dat(${pathProp.getOrElse("?")})"
  override def schema(): StructType = Star.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new DatScanBuilder(
      pathProp.orElse(Option(options.get("path"))).getOrElse(
        throw new IllegalArgumentException("dat source needs a path")),
      Option(options.get("files_limit")).flatMap(_.toIntOption),
      Option(options.get("sample_fraction")).flatMap(_.toDoubleOption))
}

class DatScanBuilder(path: String, filesLimit: Option[Int] = None,
                     sampleFraction: Option[Double] = None)
    extends ScanBuilder with SupportsPushDownFilters with SupportsPushDownRequiredColumns {

  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = Star.schema

  /** starId predicates prune files (name == id is exact, so equality/IN/
    * prefix are FULLY consumed — no residual re-evaluation needed); other
    * predicates stay with Spark.
    */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (prunable, rest) = filters.partition {
      case EqualTo("starId", _: String)         => true
      case In("starId", _)                      => true
      case StringStartsWith("starId", _)        => true
      case _                                    => false
    }
    pushed = prunable
    rest
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = new DatScan(path, pushed, required, filesLimit, sampleFraction)
}

class DatScan(path: String, pushed: Array[Filter], required: StructType,
              filesLimit: Option[Int] = None, sampleFraction: Option[Double] = None)
    extends Scan with Batch {

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"DatScan(path=$path, pushedFilters=${pushed.mkString("[", ", ", "]")}, " +
      s"readSchema=${required.fieldNames.mkString(",")})"

  private def keep(starId: String): Boolean =
    pushed.forall {
      case EqualTo("starId", v: String)  => starId == v
      case In("starId", vs)              => vs.exists(v => v != null && v.toString == starId)
      case StringStartsWith("starId", p) => starId.startsWith(p)
      case _                             => true
    }

  override def planInputPartitions(): Array[InputPartition] = {
    // local-FS listing matches the fixture layout; a remote deployment
    // swaps in Hadoop FileSystem.listStatus here (the pruning logic —
    // name-derived starId — is storage-agnostic)
    val dir = new java.io.File(path)
    val files = Option(dir.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isFile && f.getName.endsWith(".dat"))
      .filter(f => keep(DatFile.starName(f.getName)))
      .sortBy(_.getName)
    // sample pushdown: "files_limit" keeps the first N stars by id,
    // "sample_fraction" keeps floor(n·f) — consumed HERE so a sampled read
    // plans only the surviving files (one job, no count pass; stars are
    // files, so star sampling IS file sampling)
    val sampled = filesLimit match {
      case Some(n) => files.take(n)
      case None => sampleFraction match {
        case Some(f) => files.take((files.length * f).toInt)
        case None    => files
      }
    }
    sampled.map(f => DatPartition(f.getAbsolutePath): InputPartition)
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new DatReaderFactory(required)
}

final case class DatPartition(file: String) extends InputPartition

class DatReaderFactory(required: StructType) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new DatPartitionReader(partition.asInstanceOf[DatPartition].file, required)
}

/** One star row per file; column pruning short-circuits curve parsing. */
class DatPartitionReader(file: String, required: StructType)
    extends PartitionReader[InternalRow] {

  private var done = false
  private var current: InternalRow = _

  override def next(): Boolean = {
    if (done) return false
    done = true
    val needCurves = required.fieldNames.contains("lightCurves")
    val star =
      if (needCurves)
        // lossy UTF-8 like the FileManager path (String replaces malformed
        // bytes with U+FFFD; strict Files.readString would throw where the
        // equivalent per-query scan succeeds)
        DatFile.parse(file, new String(
          java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(file)),
          java.nio.charset.StandardCharsets.UTF_8), None, None)
      else // pruned projection: never parse or clean the curve data
        Star(DatFile.starName(file), None, Map.empty, Map.empty, Map.empty, None, Nil)
    val full = DatPartitionReader.serializer(star)
    // project the full row down to the required columns, by field ordinal
    val idx = required.fieldNames.map(Star.schema.fieldIndex)
    current = InternalRow.fromSeq(idx.zip(required.fields).map {
      case (i, f) => full.get(i, f.dataType)
    }.toSeq)
    true
  }

  override def get(): InternalRow = current
  override def close(): Unit = ()
}

object DatPartitionReader {
  import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
  import org.apache.spark.sql.Encoders

  /** Star → InternalRow serializer. The generated serializer reuses its
    * row buffer and is NOT thread-safe, so it is per-thread (tasks run one
    * per thread) and the produced row is copied out.
    */
  private val serializerTl =
    ThreadLocal.withInitial[Star => InternalRow](() => {
      val ser = ExpressionEncoder(Encoders.product[Star]
        .asInstanceOf[org.apache.spark.sql.catalyst.encoders.AgnosticEncoder[Star]])
        .createSerializer()
      (s: Star) => ser(s).copy()
    })

  private[v2] def serializer: Star => InternalRow = serializerTl.get()
}
