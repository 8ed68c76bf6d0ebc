package graft.connectors

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{Constants, Metric}

/** Connector contracts — the Spark-first re-expression of the
  * reference's `ExportVDB` / `ImportVDB` abstract classes
  * (`export_vdf/vdb_export_cls.py:34-65`,
  * `import_vdf/vdf_import_cls.py:110-115`).
  *
  * An exporter turns a vector-DB index into a DataFrame (a partitioned
  * scan: one task per id-shard/page-token, so a 1000-executor cluster
  * fans the fetch out); an importer turns a DataFrame into batched
  * upserts against the target DB (`foreachPartition` with the
  * adaptive-batch/retry policies of SURVEY §2.9 inside the partition
  * writer — executor parallelism replaces the reference's thread
  * pools, `qdrant_import.py:316-343`).
  */
trait VdbExporter {
  /** Index names available in the source DB. */
  def indexNames: Seq[String]
  /** Distance metric of an index, normalized (`util.py:159-248`). */
  def metric(index: String): Metric
  /** Scan one index into a DataFrame of (id, vector, metadata…). */
  def scan(spark: SparkSession, index: String): DataFrame
}

trait VdbImporter {
  /** Create the target index if absent; returns the (possibly
    * suffix-renamed, A4 `vdf_import_cls.py:237-262`) index name. */
  def ensureIndex(name: String, dimensions: Int, metric: Metric,
      createNew: Boolean): String
  /** Upsert a DataFrame of points, keyed by `idColumn` (the
    * manifest's id_column — NOT always "id"). Returns rows written. */
  def upsert(index: String, df: DataFrame,
      idColumn: String = Constants.IdColumn): Long
}

/** Physical upsert policies (SURVEY §2.9 B3/B4/B5): adaptive batch
  * shrink, bounded retries, and rate limiting, applied inside a
  * partition — the executor-side half of every sink connector. */
object UpsertPolicy {

  /** Per-JVM count of batch-shrink events — the observability the
    * migration bench reports ("shrink events" per leg). Monotonic;
    * callers diff before/after. NOTE: shrinks happen where the write
    * runs — in local mode (the bench, the CLI) that is this JVM, so a
    * driver-side diff sees everything; on a real cluster the
    * increments land on EXECUTOR JVMs and a driver read stays 0 (use
    * executor logs/metrics there — a cluster-visible counter would be
    * a LongAccumulator, which a static policy object cannot own). */
  val shrinkEvents = new java.util.concurrent.atomic.AtomicLong()

  /** Iterate `rows` in batches of `batchSize`, calling `write`; on
    * failure shrink the batch ×2/3 and RE-SPLIT the failed rows at the
    * new size before retrying (the Pinecone/Milvus/KDB policy,
    * `pinecone_import.py:267-276`, `milvus_import.py:207-212`) — a
    * payload-too-large rejection is cured by the smaller next attempt,
    * not re-sent verbatim. Aborts after `maxRetries` consecutive
    * failures at the floor size `batchSize * minFraction`
    * (`pinecone_import.py:163-164`). Returns rows written. */
  def batchedWithShrink[T](rows: Iterator[T], batchSize: Int,
      minFraction: Double = 0.01, maxRetries: Int = 3)(
      write: Seq[T] => Unit): Long = {
    val minBatch = math.max(1, (batchSize * minFraction).toInt)
    var current = batchSize
    var written = 0L
    for (group <- rows.grouped(batchSize)) {
      var pending = group
      var failures = 0
      while (pending.nonEmpty) {
        val (batch, rest) = pending.splitAt(current)
        try {
          write(batch)
          written += batch.size
          pending = rest
          failures = 0
        } catch {
          case e: Exception =>
            if (current > minBatch) {
              current = math.max(minBatch, current * 2 / 3)
              shrinkEvents.incrementAndGet()
              failures = 0 // shrinking resets the retry budget
            } else {
              failures += 1
              if (failures >= maxRetries) throw e
            }
          // the failed rows stay in `pending` and are re-split at the
          // shrunk `current` on the next loop iteration
        }
      }
    }
    written
  }

  /** B5 token-bucket rate limiter (`vertexai…import.py:852-866`): at
    * most `callsPerMinute` invocations per minute within this partition.
    * Cluster-wide the budget is divided by the partition count by the
    * caller. */
  final class RateLimiter(callsPerMinute: Double) extends Serializable {
    private val intervalNanos = (60e9 / callsPerMinute).toLong
    private var nextAllowed = 0L
    def acquire(): Unit = {
      val now = System.nanoTime()
      if (now < nextAllowed)
        Thread.sleep((nextAllowed - now) / 1000000L,
          ((nextAllowed - now) % 1000000L).toInt)
      nextAllowed = math.max(now, nextAllowed) + intervalNanos
    }
  }
}

/** A4 `create_new_name` (`vdf_import_cls.py:237-262`): if `name` is
  * taken, probe `name-2`, `name-3`, … from max existing suffix. */
object Naming {
  def createNewName(name: String, existing: Set[String]): String =
    if (!existing.contains(name)) name
    else {
      val suffixed = existing.filter(_.startsWith(name + "-"))
        .flatMap(e => e.stripPrefix(name + "-").toIntOption)
      val next = if (suffixed.isEmpty) 2 else suffixed.max + 1
      s"$name-$next"
    }
}

/** In-memory mock vector DB (SURVEY §7.1 step 5): the export/import
  * contract with zero network, enabling full round-trip tests. Data
  * lives as parquet under a temp dir so scans stay genuinely
  * distributed (not driver-held rows). */
final class MockVdb(root: String) extends VdbExporter with VdbImporter {
  private val dir = java.nio.file.Paths.get(root)
  java.nio.file.Files.createDirectories(dir)
  private val metrics = scala.collection.mutable.Map[String, Metric]()
  private val dims = scala.collection.mutable.Map[String, Int]()

  override def indexNames: Seq[String] = {
    val s = java.nio.file.Files.list(dir)
    try {
      import scala.jdk.CollectionConverters._
      s.iterator().asScala.filter(java.nio.file.Files.isDirectory(_))
        .map(_.getFileName.toString).toVector.sorted
    } finally s.close()
  }

  override def metric(index: String): Metric =
    metrics.getOrElse(index, Metric.Cosine)

  override def scan(spark: SparkSession, index: String): DataFrame =
    spark.read.parquet(dir.resolve(index).toString)

  override def ensureIndex(name: String, dimensions: Int, metric: Metric,
      createNew: Boolean): String = {
    val existing = indexNames.toSet
    val finalName =
      if (createNew) Naming.createNewName(name, existing) else name
    metrics(finalName) = metric
    dims(finalName) = dimensions
    finalName
  }

  override def upsert(index: String, df: DataFrame,
      idColumn: String = Constants.IdColumn): Long = {
    // last-wins on the id column against existing data (J6 upsert
    // semantics, `pinecone_export.py:557-563`): new rows shadow old.
    val target = dir.resolve(index).toString
    val spark = df.sparkSession
    val exists = java.nio.file.Files.isDirectory(dir.resolve(index)) &&
      VdbFiles.hasParquet(target)
    val merged =
      if (!exists) df
      else {
        val old = spark.read.parquet(target)
          .unionByName(df.limit(0), allowMissingColumns = true)
        val incoming = df.unionByName(old.limit(0), allowMissingColumns = true)
        old.join(incoming.select(idColumn), Seq(idColumn), "left_anti")
          .unionByName(incoming)
      }
    val tmp = s"${target}__tmp"
    val n = merged.count()
    merged.write.mode("overwrite").parquet(tmp)
    VdbFiles.swap(tmp, target)
    n
  }
}

private object VdbFiles {
  def hasParquet(path: String): Boolean = {
    val p = java.nio.file.Paths.get(path)
    if (!java.nio.file.Files.isDirectory(p)) return false
    val s = java.nio.file.Files.list(p)
    try {
      import scala.jdk.CollectionConverters._
      s.iterator().asScala.exists(_.toString.endsWith(".parquet"))
    } finally s.close()
  }
  def swap(tmp: String, target: String): Unit = {
    val t = java.nio.file.Paths.get(target)
    delete(t)
    java.nio.file.Files.move(java.nio.file.Paths.get(tmp), t)
  }
  private def delete(p: java.nio.file.Path): Unit = {
    if (java.nio.file.Files.isDirectory(p)) {
      val s = java.nio.file.Files.list(p)
      try {
        import scala.jdk.CollectionConverters._
        s.iterator().asScala.foreach(delete)
      } finally s.close()
    }
    java.nio.file.Files.deleteIfExists(p)
  }
}
