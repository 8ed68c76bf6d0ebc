package graft.connectors

import graft.core.{Metric, NamespaceMeta}

/** Per-connector SEMANTICS adapters: the DB-specific translation each
  * reference connector performs between the VDF manifest and the
  * target database's collection/index configuration, expressed as pure
  * functions over the manifest model — no client, no network — so the
  * behaviors are testable offline and a real client would only have to
  * forward the translated structs.
  *
  * The generic machinery (scan shapes, retry/shrink/rate-limit
  * policies, the DSv2 connector) lives in `Connector.scala` /
  * `PaginatedScan.scala`; these adapters add the per-DB decisions the
  * reference hardcodes inline in its import connectors.
  */
object Adapters {

  /** Nested `Map[String, Any]` lookup mirroring the reference's
    * `get_nested_config` helper (`import_vdf/qdrant_import.py:181-192`):
    * follows string keys through nested maps, treating any missing or
    * non-map intermediate as absent. */
  def nested(config: Option[Map[String, Any]], keys: Seq[String]): Option[Any] = {
    def step(cur: Any, ks: List[String]): Option[Any] = ks match {
      case Nil => Option(cur)
      case k :: rest => cur match {
        case m: Map[_, _] =>
          m.asInstanceOf[Map[String, Any]].get(k) match {
            case Some(v) => step(v, rest)
            case None => None
          }
        case _ => None
      }
    }
    config.flatMap(step(_, keys.toList))
  }

  // ----------------------------------------------------------- Qdrant

  /** Per-vector-column params (`VectorParams(size, distance, on_disk)`,
    * `qdrant_import.py:233-241`). */
  final case class QdrantVectorParams(size: Int, distance: String,
      onDisk: Option[Boolean])

  /** Everything `client.create_collection` receives
    * (`qdrant_import.py:242-250`): named dense vector configs keyed by
    * vector column, the sparse-vector config forwarded verbatim, and
    * the tuning sections extracted from `index_config`. */
  final case class QdrantCollectionSpec(
      collectionName: String,
      vectorsConfig: Map[String, QdrantVectorParams],
      sparseVectorsConfig: Option[Any],
      hnswConfig: Option[Any],
      optimizersConfig: Option[Any],
      walConfig: Option[Any],
      quantizationConfig: Option[Any],
      onDiskPayload: Option[Any])

  object Qdrant {
    /** Collection naming: `index` or `index_namespace`
      * (`qdrant_import.py:166-171`). */
    def collectionName(indexName: String, namespace: String): String =
      if (namespace.nonEmpty) s"${indexName}_$namespace" else indexName

    /** Dimensions: the manifest value, else the recorded collection
      * config's `params.vectors.size` (`qdrant_import.py:194-202`);
      * the reference treats a missing/-1 manifest value as unset. */
    def dims(ns: NamespaceMeta): Option[Int] =
      Some(ns.dimensions).filter(_ >= 0).orElse(
        nested(ns.index_config, Seq("params", "vectors", "size")).collect {
          case i: Int => i
          case l: Long => l.toInt
          case d: Double => d.toInt
        })

    /** The full create-collection translation
      * (`qdrant_import.py:178-250`): every named vector column gets
      * the same (size, distance, on_disk) params; the six tuning
      * sections pass through from `index_config` top-level keys;
      * metric defaults to Cosine. */
    def collectionSpec(indexName: String, ns: NamespaceMeta,
        vectorColumnNames: Seq[String]): QdrantCollectionSpec = {
      val d = dims(ns).getOrElse(
        throw new IllegalArgumentException(
          s"dimensions unresolved for index $indexName"))
      val onDisk = nested(ns.index_config,
        Seq("params", "vectors", "on_disk")).collect { case b: Boolean => b }
      val distance = ns.metric.filter(_.nonEmpty).getOrElse(Metric.Cosine.name)
      QdrantCollectionSpec(
        collectionName = collectionName(indexName, ns.namespace),
        vectorsConfig = vectorColumnNames.map(c =>
          c -> QdrantVectorParams(d, distance, onDisk)).toMap,
        sparseVectorsConfig = nested(ns.index_config, Seq("sparse_vectors_config")),
        hnswConfig = nested(ns.index_config, Seq("hnsw_config")),
        optimizersConfig = nested(ns.index_config, Seq("optimizers_config")),
        walConfig = nested(ns.index_config, Seq("wal_config")),
        quantizationConfig = nested(ns.index_config, Seq("quantization_config")),
        onDiskPayload = nested(ns.index_config, Seq("on_disk_payload")))
    }
  }

  // ----------------------------------------------------------- Milvus

  /** Milvus collection schema synthesis (`milvus_import.py:110-126`):
    * VARCHAR primary key (non-auto, max 65535), FLOAT_VECTOR field at
    * manifest dims, dynamic fields ON so unmodeled metadata still
    * lands. */
  final case class MilvusCollectionSpec(
      collectionName: String,
      pkField: String,
      pkMaxLength: Int,
      vectorField: String,
      dim: Int,
      enableDynamicField: Boolean)

  /** `create_index` params (`milvus_import.py:135-146`): AUTOINDEX
    * with the manifest metric translated back to Milvus's name. */
  final case class MilvusIndexSpec(metricType: String, indexType: String)

  object Milvus {
    /** Milvus identifiers reject '-' — the reference renames both the
      * index and the vector column (`milvus_import.py:92-96`). */
    def compliantName(name: String): String = name.replace("-", "_")

    def collectionName(indexName: String, namespace: String): String =
      compliantName(
        if (namespace.nonEmpty) s"${indexName}_$namespace" else indexName)

    def collectionSpec(indexName: String, ns: NamespaceMeta, idColumn: String,
        vectorColumn: String): MilvusCollectionSpec =
      MilvusCollectionSpec(
        collectionName = collectionName(indexName, ns.namespace),
        pkField = idColumn,
        pkMaxLength = 65535,
        vectorField = compliantName(vectorColumn),
        dim = ns.dimensions,
        enableDynamicField = true)

    /** Reverse-metric AUTOINDEX (`milvus_import.py:137-141`): the
      * normalized manifest metric maps back through the Milvus bimap
      * (Cosine→COSINE, Euclid→L2, Dot→IP); an unknown/missing metric
      * falls back to the default the forward direction would assume. */
    def indexSpec(ns: NamespaceMeta): MilvusIndexSpec = {
      // the manifest records the NORMALIZED metric name; parse it and
      // map back through the Milvus bimap, defaulting like the
      // reference's standardize fallback
      val std = ns.metric.flatMap(m => Metric.all.find(_.name == m))
        .getOrElse(Metric.Cosine)
      MilvusIndexSpec(
        metricType = Metric.toDbName("milvus", std).getOrElse("COSINE"),
        indexType = "AUTOINDEX")
    }
  }
}
