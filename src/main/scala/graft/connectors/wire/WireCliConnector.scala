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

  private val dialect = WireDialect(dialectName, url)

  override def indexNames: Seq[String] = collections

  /** The generic dialect surface carries no metric-read call; the
    * create path pins Cosine (QdrantWire.create), so report that. A
    * per-service client would read the collection config instead. */
  override def metric(index: String): Metric = Metric.Cosine

  override def scan(spark: SparkSession, index: String): DataFrame =
    WireVdb.read(spark, dialectName, url, index)

  override def ensureIndex(name: String, dimensions: Int, metric: Metric,
      createNew: Boolean): String = {
    // exists ≈ count > 0: the common dialect surface has no true
    // exists call (count of a missing collection is 0 or an error
    // depending on the service); good enough for create_new suffixing
    def occupied(c: String): Boolean =
      try dialect.count(c) > 0 catch { case _: Exception => false }
    val target =
      if (!createNew) name
      else {
        var i = 1
        var cand = name
        while (occupied(cand)) { cand = s"$name-$i"; i += 1 }
        cand
      }
    dialect.create(target, dimensions)
    target
  }

  override def upsert(index: String, df: DataFrame,
      idColumn: String = Constants.IdColumn): Long = {
    val shaped = WireCliConnector.toWireShape(df, idColumn)
    val n = shaped.count()
    WireVdb.write(shaped, dialectName, url, index)
    n
  }
}

object WireCliConnector {
  /** CLI dialect names routed to the wire connector. */
  val DialectNames: Set[String] = Set("qdrant", "pinecone", "chroma", "grpc")

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
