package graft.core

/** Normalized distance-metric enum + per-DB name bimaps.
  *
  * Mirrors the reference's `db_metric_to_standard_metric` tables
  * (vector-io `util.py:159-248`): each vector DB names metrics
  * differently; the VDF manifest stores the normalized name.
  */
sealed abstract class Metric(val name: String)
object Metric {
  case object Cosine extends Metric("Cosine")
  case object Euclid extends Metric("Euclid")
  case object Dot extends Metric("Dot")
  case object Manhattan extends Metric("Manhattan")

  val all: Seq[Metric] = Seq(Cosine, Euclid, Dot, Manhattan)

  /** Per-DB metric-name → normalized metric (forward direction of the
    * reference's bimap, `util.py:159-218`). */
  private val dbToStandard: Map[String, Map[String, Metric]] = Map(
    "pinecone" -> Map("cosine" -> Cosine, "euclidean" -> Euclid, "dotproduct" -> Dot),
    "qdrant" -> Map("Cosine" -> Cosine, "Euclid" -> Euclid, "Dot" -> Dot, "Manhattan" -> Manhattan),
    "milvus" -> Map("COSINE" -> Cosine, "L2" -> Euclid, "IP" -> Dot),
    "kdbai" -> Map("CS" -> Cosine, "L2" -> Euclid, "IP" -> Dot),
    "chroma" -> Map("cosine" -> Cosine, "l2" -> Euclid, "ip" -> Dot),
    "astradb" -> Map("cosine" -> Cosine, "euclidean" -> Euclid, "dot_product" -> Dot),
    "lancedb" -> Map("Cosine" -> Cosine, "L2" -> Euclid, "Dot" -> Dot),
    "turbopuffer" -> Map("cosine_distance" -> Cosine,
      "euclidean_distance" -> Euclid, "dot_product" -> Dot),
    "weaviate" -> Map("cosine" -> Cosine, "l2-squared" -> Euclid,
      "dot" -> Dot, "manhattan" -> Manhattan),
    "vespa" -> Map("angular" -> Cosine, "euclidean" -> Euclid,
      "dotproduct" -> Dot),
    "vertexai_vectorsearch" -> Map(
      "COSINE_DISTANCE" -> Cosine, "SQUARED_L2_DISTANCE" -> Euclid,
      "DOT_PRODUCT_DISTANCE" -> Dot, "L1_DISTANCE" -> Manhattan))

  /** Normalize a DB-specific metric name; defaults to Cosine like the
    * reference (`util.py:221-234` warns and falls back). */
  def standardize(db: String, dbMetric: String): Metric =
    dbToStandard.getOrElse(db, Map.empty).getOrElse(dbMetric, Cosine)

  /** Reverse direction (`util.py:237-248`): normalized → DB-specific. */
  def toDbName(db: String, metric: Metric): Option[String] =
    dbToStandard.get(db).flatMap(_.collectFirst {
      case (dbName, m) if m == metric => dbName
    })
}
