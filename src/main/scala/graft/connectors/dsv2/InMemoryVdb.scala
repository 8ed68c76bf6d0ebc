package graft.connectors.dsv2

import java.util

import org.apache.spark.sql.Row
import org.apache.spark.sql.catalyst.{CatalystTypeConverters, InternalRow}
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import scala.jdk.CollectionConverters._

/** A real DataSource V2 connector over a (fake, in-memory) vector-DB
  * service — the production shape of SURVEY §2.1's connector scans.
  *
  * `InMemoryVdbServer` stands in for a remote vector DB: the only API
  * the reader uses is `fetch(index, offset, limit)` — exactly the
  * pagination contract of Chroma/Turbopuffer-style services
  * (`chroma_export.py:134-141`). The connector:
  *
  *  - plans one `InputPartition` per offset range → a 1000-executor
  *    cluster issues 1000 concurrent fetches, none through the driver;
  *  - implements `SupportsPushDownRequiredColumns`, so `select(id)`
  *    reaches the service as a projection (never ship vectors you
  *    don't need);
  *  - implements `SupportsPushDownLimit`, so `limit(n)` caps the
  *    offset ranges planned (the reference's first-batch read,
  *    `util.py:461-469`, for free at the source).
  *
  * Swapping the server object for an HTTP/gRPC client is the only
  * change needed for a real DB; the Spark side is finished.
  */
object InMemoryVdbServer {
  private val indexes =
    new java.util.concurrent.ConcurrentHashMap[String, (StructType, IndexedSeq[Row])]()

  def create(index: String, schema: StructType, rows: Seq[Row]): Unit =
    indexes.put(index, (schema, rows.toIndexedSeq))

  def schemaOf(index: String): StructType = indexes.get(index)._1

  def count(index: String): Long = indexes.get(index)._2.size.toLong

  /** The paginated fetch — the entire "network" surface. */
  def fetch(index: String, offset: Long, limit: Int,
      columns: Seq[String]): Seq[Seq[Any]] = {
    val (schema, rows) = indexes.get(index)
    val idxs = columns.map(schema.fieldIndex)
    rows.slice(offset.toInt, offset.toInt + limit)
      .map(r => idxs.map(r.get))
  }

  def drop(index: String): Unit = indexes.remove(index)
}

class InMemoryVdbProvider extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    InMemoryVdbServer.schemaOf(options.get("index"))
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new VdbTable(properties.get("index"), schema)
  override def supportsExternalMetadata(): Boolean = true
}

final class VdbTable(index: String, schema: StructType)
    extends Table with SupportsRead {
  override def name(): String = s"inmemvdb:$index"
  override def schema(): StructType = schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new VdbScanBuilder(index, schema,
      options.getInt("batchSize", 1000))
}

final class VdbScanBuilder(index: String, fullSchema: StructType, batchSize: Int)
    extends ScanBuilder
    with SupportsPushDownRequiredColumns with SupportsPushDownLimit {
  private var required: StructType = fullSchema
  private var limit: Option[Int] = None

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def pushLimit(n: Int): Boolean = { limit = Some(n); true }
  override def isPartiallyPushed: Boolean = false

  override def build(): Scan =
    new VdbScan(index, required, batchSize, limit)
}

final case class VdbInputPartition(offset: Long, limit: Int) extends InputPartition

final class VdbScan(index: String, required: StructType, batchSize: Int,
    limit: Option[Int]) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"InMemoryVdbScan(index=$index, columns=${required.fieldNames.mkString(",")}," +
      s" limit=${limit.getOrElse(-1)})"

  override def planInputPartitions(): Array[InputPartition] = {
    val total = limit.map(l => math.min(l.toLong, InMemoryVdbServer.count(index)))
      .getOrElse(InMemoryVdbServer.count(index))
    if (total == 0) return Array.empty
    (0L until total by batchSize.toLong).map { off =>
      VdbInputPartition(off, math.min(batchSize.toLong, total - off).toInt)
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    val cols = required.fieldNames.toSeq
    val schema = required
    val idx = index
    (partition: InputPartition) => {
      val p = partition.asInstanceOf[VdbInputPartition]
      new PartitionReader[InternalRow] {
        private val converter = CatalystTypeConverters.createToCatalystConverter(schema)
        private val it = InMemoryVdbServer.fetch(idx, p.offset, p.limit, cols).iterator
        private var current: InternalRow = _
        override def next(): Boolean = {
          if (!it.hasNext) return false
          current = converter(Row.fromSeq(it.next()))
            .asInstanceOf[InternalRow]
          true
        }
        override def get(): InternalRow = current
        override def close(): Unit = ()
      }
    }
  }
}
