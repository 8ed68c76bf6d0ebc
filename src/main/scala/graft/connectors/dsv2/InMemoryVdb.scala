package graft.connectors.dsv2

import java.util

import org.apache.spark.sql.Row
import org.apache.spark.sql.catalyst.{CatalystTypeConverters, InternalRow}
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types.{StructField, StructType}
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

  // The DDL the service received at index-creation time — for the
  // adapter-wired write path (AdapterVdb) this is the per-DB translated
  // create-collection struct (QdrantCollectionSpec, MilvusIndexSpec, …),
  // recorded so tests can assert the translation AT the write boundary.
  private val specs =
    new java.util.concurrent.ConcurrentHashMap[String, Any]()

  def create(index: String, schema: StructType, rows: Seq[Row]): Unit =
    indexes.put(index, (schema, rows.toIndexedSeq))

  /** Create empty if absent (idempotent — the DSv2 write path's DDL). */
  def ensure(index: String, schema: StructType): Unit =
    indexes.putIfAbsent(index, (schema, IndexedSeq.empty))

  def exists(index: String): Boolean = indexes.containsKey(index)

  def recordSpec(index: String, spec: Any): Unit = specs.put(index, spec)

  def specOf(index: String): Option[Any] = Option(specs.get(index))

  /** LanceDB-style schema drift (`lancedb_import.py:117-128`): add the
    * given columns to the stored schema and backfill EXISTING rows with
    * the type-keyed defaults. Incoming batches then write the wider
    * schema. */
  def extendSchema(index: String,
      added: Seq[(StructField, Any)]): Unit = synchronized {
    val (schema, rows) = indexes.get(index)
    val fresh = added.filterNot { case (f, _) => schema.fieldNames.contains(f.name) }
    if (fresh.nonEmpty) {
      val widened = StructType(schema.fields ++ fresh.map(_._1))
      val defaults = fresh.map(_._2)
      indexes.put(index,
        (widened, rows.map(r => Row.fromSeq(r.toSeq ++ defaults))))
    }
  }

  def schemaOf(index: String): StructType = indexes.get(index)._1

  def indexNamesSnapshot: Set[String] = indexes.keySet.asScala.toSet

  def count(index: String): Long = indexes.get(index)._2.size.toLong

  /** The paginated fetch — the read half of the "network" surface. */
  def fetch(index: String, offset: Long, limit: Int,
      columns: Seq[String]): Seq[Seq[Any]] = {
    val (schema, rows) = indexes.get(index)
    val idxs = columns.map(schema.fieldIndex)
    rows.slice(offset.toInt, offset.toInt + limit)
      .map(r => idxs.map(r.get))
  }

  /** Batched upsert — the write half. Last-wins on the id column,
    * like every reference import connector. The id column name is
    * per-DB (e.g. Vertex datapoints key on `datapoint_id`). */
  def upsert(index: String, batch: Seq[Row], idCol: String = "id"): Unit = synchronized {
    val (schema, existing) = indexes.get(index)
    val idIdx = schema.fieldIndex(idCol)
    val incoming = batch.map(r => r.get(idIdx) -> r).toMap
    val merged = existing.filterNot(r => incoming.contains(r.get(idIdx))) ++
      batch.distinctBy(_.get(idIdx)).map(r => incoming(r.get(idIdx)))
    indexes.put(index, (schema, merged))
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
    extends Table with SupportsRead with SupportsWrite {
  override def name(): String = s"inmemvdb:$index"
  override def schema(): StructType = schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new VdbScanBuilder(index, schema,
      options.getInt("batchSize", 1000))
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    // A real vector DB rejects an upsert whose shape doesn't match the
    // collection DDL; mirror that at the boundary so a mis-shaped frame
    // fails at plan time, not as silent column misalignment. (The
    // adapter path — AdapterVdb — creates the collection with the
    // translated schema first, so this check IS the per-DB contract.)
    val have = InMemoryVdbServer.schemaOf(index)
    val incoming = info.schema()
    // nullability-insensitive compare: the analyzer may tighten or
    // loosen nullable flags between the DDL-time schema and the write
    // plan; a service DDL check cares about names and types only
    require(
      incoming.fields.map(f => (f.name, f.dataType.catalogString)).toSeq ==
        have.fields.map(f => (f.name, f.dataType.catalogString)).toSeq,
      s"upsert schema ${incoming.simpleString} does not match " +
        s"collection $index DDL ${have.simpleString}")
    new VdbWriteBuilder(index, incoming,
      info.options().getInt("batchSize", 1000),
      info.options().getOrDefault("idCol", "id"))
  }
}

/** DSv2 write path: each task buffers up to batchSize rows and flushes
  * through the same upsert API a real connector would call — the
  * executor-parallel replacement for the reference's driver-side
  * thread pools (`qdrant_import.py:316-343`). Commit is idempotent on
  * the service side (last-wins by id), so Spark task retries are safe. */
final class VdbWriteBuilder(index: String, schema: StructType, batchSize: Int,
    idCol: String = "id") extends WriteBuilder {
  override def build(): Write = new Write {
    override def toBatch: BatchWrite = new BatchWrite {
      override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
        new VdbDataWriterFactory(index, schema, batchSize, idCol)
      override def commit(messages: Array[WriterCommitMessage]): Unit = ()
      override def abort(messages: Array[WriterCommitMessage]): Unit = ()
    }
  }
}

final class VdbDataWriterFactory(index: String, schema: StructType, batchSize: Int,
    idCol: String = "id") extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      private val toScala = CatalystTypeConverters.createToScalaConverter(schema)
      private val buf = scala.collection.mutable.ArrayBuffer[Row]()
      private def flush(): Unit = if (buf.nonEmpty) {
        InMemoryVdbServer.upsert(index, buf.toSeq, idCol)
        buf.clear()
      }
      override def write(record: InternalRow): Unit = {
        buf += toScala(record.copy()).asInstanceOf[Row]
        if (buf.size >= batchSize) flush()
      }
      override def commit(): WriterCommitMessage = {
        flush()
        new WriterCommitMessage {}
      }
      override def abort(): Unit = buf.clear()
      override def close(): Unit = ()
    }
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
