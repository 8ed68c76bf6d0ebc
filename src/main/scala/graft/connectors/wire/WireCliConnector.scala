package graft.connectors.wire

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}

import graft.connectors.{VdbExporter, VdbImporter}
import graft.core.{Constants, Metric}

/** The CLI half of the wire connectors: one class implementing BOTH
  * the exporter and importer contracts over any [[WireDialect]]
  * (qdrant / pinecone / chroma REST, or the gRPC-shaped framed
  * transport), so `graft export --db qdrant --db_root http://…` and
  * `graft import --db pinecone …` run the reference's flagship
  * use case — migrate a collection between vector DBs through a VDF
  * directory — with every fetch and upsert as real wire traffic
  * through the DSv2 scan/write planning (offset partitions, pruning
  * flags on the wire, shrink-on-fault batches).
  *
  * Wire dialects don't enumerate collections on the common surface
  * (each service has its own listing call), so the CLI names them
  * (`--collections a,b`), mirroring the reference's `--namespaces` /
  * `--classes` selection flags (`turbopuffer_export.py:60-62`,
  * `weaviate_export.py:67-76`). */
final class WireCliConnector(dialectName: String, url: String,
    collections: Seq[String]) extends VdbExporter with VdbImporter {

  import WireCliConnector.CursorNames

  // offset-partitioned dialects go through the DSv2 connector; the
  // cursor-token services (Astra pageState, Turbopuffer cursor,
  // Weaviate after-id) through their continuation-chain clients
  private val dialect: Option[WireDialect] =
    if (CursorNames(dialectName)) None else Some(WireDialect(dialectName, url))

  override def indexNames: Seq[String] = collections

  /** The generic dialect surface carries no metric-read call; the
    * create path pins Cosine (QdrantWire.create), so report that. A
    * per-service client would read the collection config instead. */
  override def metric(index: String): Metric = Metric.Cosine

  override def scan(spark: SparkSession, index: String): DataFrame =
    dialectName match {
      case "astra" =>
        AstraWire(url).scan(spark, index, fetchSize = 500, wantVector = true)
      case "turbopuffer" =>
        TurbopufferWire(url).scan(spark, index, limit = 500,
          includeVectors = true)
      case "weaviate" =>
        WeaviateWire(url).scan(spark, index, limit = 500,
          includeVector = true)
      case d => WireVdb.read(spark, d, url, index)
    }

  /** Does a collection hold data? The common surface has no true
    * exists call — count > 0 where a count exists, else a 1-row page
    * probe; good enough for create_new suffixing. */
  private def occupied(c: String): Boolean =
    try {
      dialectName match {
        case "astra" => AstraWire(url).count(c) > 0
        case "turbopuffer" =>
          TurbopufferWire(url).page(c, None, 1, includeVectors = false)
            ._1.nonEmpty
        case "weaviate" =>
          WeaviateWire(url).listAfter(c, None, 1, includeVector = false)
            ._1.nonEmpty
        case _ => dialect.get.count(c) > 0
      }
    } catch { case _: Exception => false }

  override def ensureIndex(name: String, dimensions: Int, metric: Metric,
      createNew: Boolean): String = {
    val target =
      if (!createNew) name
      else {
        var i = 1
        var cand = name
        while (occupied(cand)) { cand = s"$name-$i"; i += 1 }
        cand
      }
    // cursor services create collections on first write (the Data
    // API / namespace-on-upsert model); the offset dialects create
    // explicitly
    dialect.foreach(_.create(target, dimensions))
    target
  }

  override def upsert(index: String, df: DataFrame,
      idColumn: String = Constants.IdColumn): Long = {
    val shaped = WireCliConnector.toWireShape(df, idColumn)
    val n = shaped.count()
    dialectName match {
      case "astra" => AstraWire(url).write(shaped, index, batchSize = 500)
      case "turbopuffer" =>
        TurbopufferWire(url).write(shaped, index, batchSize = 500)
      case "weaviate" =>
        WeaviateWire(url).write(shaped, index, batchSize = 500)
      case d => WireVdb.write(shaped, d, url, index)
    }
    n
  }
}

object WireCliConnector {
  /** Cursor-token transports (continuation-chain scans). */
  val CursorNames: Set[String] = Set("astra", "turbopuffer", "weaviate")
  /** CLI dialect names routed to the wire connector. */
  val DialectNames: Set[String] =
    Set("qdrant", "pinecone", "chroma", "grpc") ++ CursorNames

  /** Shape an arbitrary VDF frame into the wire row
    * (id string, vector array<double>, payload map<string,string>):
    * the id column by name, the vector from a `vector`/`embedding`
    * array column (or the first numeric-array column), and every
    * remaining scalar column stringified into the payload map with
    * nulls dropped — the same null-stripping the reference's importers
    * apply before the wire. A frame already in wire shape passes
    * through untouched. */
  def toWireShape(df: DataFrame, idColumn: String): DataFrame = {
    if (df.columns.toSeq == Seq("id", "vector", "payload"))
      return df.select(col("id").cast("string").as("id"),
        col("vector").cast("array<double>").as("vector"), col("payload"))
    def isNumArray(name: String): Boolean = df.schema(name).dataType match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    val vecCol = Seq("vector", "embedding").find(df.columns.contains)
      .filter(isNumArray)
      .orElse(df.columns.find(isNumArray))
    val rest = df.columns.filterNot(c =>
      c == idColumn || vecCol.contains(c)).toSeq
    val payload =
      if (rest.isEmpty) map().cast("map<string,string>")
      else map_filter(
        map(rest.flatMap(c => Seq(lit(c), col(c).cast("string"))): _*),
        (_, v) => v.isNotNull)
    df.select(
      col(idColumn).cast("string").as("id"),
      vecCol.map(c => col(c).cast("array<double>"))
        .getOrElse(lit(null).cast("array<double>")).as("vector"),
      payload.as("payload"))
  }
}
