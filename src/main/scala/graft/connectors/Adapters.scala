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

  /** Shared reverse-metric helper: normalized manifest metric name →
    * this DB's name, with the reference's double fallback
    * (`util.py:235-248`: unknown metric warns and resolves as Cosine). */
  private def reverseMetric(db: String, metric: Option[String]): String = {
    val std = metric.flatMap(m => Metric.all.find(_.name == m))
      .getOrElse(Metric.Cosine)
    Metric.toDbName(db, std)
      .orElse(Metric.toDbName(db, Metric.Cosine))
      .getOrElse("cosine")
  }

  // --------------------------------------------------------- Pinecone

  /** Index placement: exactly one of serverless (cloud/region) or pod
    * (environment/pod_type) — the two `spec=` branches of
    * `pinecone_import.py:132-158`. */
  sealed trait PineconePlacement
  final case class PineconeServerless(cloud: String, region: String)
      extends PineconePlacement
  final case class PineconePod(environment: String, podType: String)
      extends PineconePlacement

  /** Everything `pc.create_index` receives
    * (`pinecone_import.py:129-158`). */
  final case class PineconeIndexSpec(
      name: String, dimension: Int, metric: String,
      placement: PineconePlacement)

  object Pinecone {
    /** Pinecone index names are lowercase-dashed
      * (`pinecone_import.py:108-110`). */
    def compliantName(name: String): String =
      name.toLowerCase.replace("_", "-")

    /** Create-index translation (`pinecone_import.py:126-158`):
      * compliant name, manifest dims, metric reversed through the
      * Pinecone bimap (cosine/euclidean/dotproduct), and the
      * serverless-vs-pod placement with the reference's defaults
      * (cloud "aws", region "us-west-2", pod_type "starter"). */
    def indexSpec(indexName: String, ns: NamespaceMeta,
        serverless: Boolean,
        cloud: Option[String] = None, region: Option[String] = None,
        environment: Option[String] = None,
        podType: Option[String] = None): PineconeIndexSpec =
      PineconeIndexSpec(
        name = compliantName(indexName),
        dimension = ns.dimensions,
        metric = reverseMetric("pinecone", ns.metric),
        placement =
          if (serverless)
            PineconeServerless(cloud.getOrElse("aws"),
              region.getOrElse("us-west-2"))
          else
            PineconePod(
              environment.getOrElse(throw new IllegalArgumentException(
                "pod placement requires an environment")),
              podType.getOrElse("starter")))

    /** Upsert row shaping (`pinecone_import.py:243-259`): ids are
      * stringified and nothing else — per-row None-valued metadata
      * entries are dropped on the DataFrame side with the same
      * map_filter the oracle-checked cleaning path uses. */
    def upsertRows(df: org.apache.spark.sql.DataFrame, idCol: String,
        vecCol: String, metaCols: Seq[String]): org.apache.spark.sql.DataFrame = {
      import org.apache.spark.sql.functions._
      // metadata as map<string,string-ish>: entries whose value is
      // null vanish (the reference's `if v is not None` dict filter)
      val metaMap = map_filter(
        map(metaCols.flatMap(c => Seq(lit(c), col(c).cast("string"))): _*),
        (_, v) => v.isNotNull)
      df.select(col(idCol).cast("string").as("id"),
        col(vecCol).as("values"), metaMap.as("metadata"))
    }
  }

  // ----------------------------------------------------------- Chroma

  /** Chroma collection distance lives in collection METADATA under
    * "hnsw:space" (`chroma_export.py:173-176` reads it with default
    * "cosine"); import creates collections with that key. */
  final case class ChromaCollectionSpec(
      name: String, metadata: Map[String, String])

  object Chroma {
    def collectionName(indexName: String, namespace: String): String =
      if (namespace.nonEmpty) s"${indexName}_$namespace" else indexName

    def collectionSpec(indexName: String, ns: NamespaceMeta): ChromaCollectionSpec =
      ChromaCollectionSpec(
        name = collectionName(indexName, ns.namespace),
        metadata = Map("hnsw:space" -> reverseMetric("chroma", ns.metric)))

    /** Chroma supports ONE vector column; the reference warns and keeps
      * the first (`chroma_import.py:141-144`). */
    def vectorColumn(vectorColumns: Seq[String]): (String, Seq[String]) =
      (vectorColumns.head, vectorColumns.tail)

    /** The `documents` column fed to upsert (`chroma_import.py:180-190`):
      * the model_map's text column when recorded for the vector column,
      * else the stringified ids. */
    def documentsColumn(ns: NamespaceMeta, vectorColumn: String): Option[String] =
      ns.model_map.flatMap(_.get(vectorColumn)).flatMap(_.text_column)

    /** Upsert row shaping (`chroma_import.py:166-213`): drop rows with
      * a null vector, stringify ids, keep only scalar-typed metadata
      * columns (str/int/float/bool — the reference's isinstance
      * filter), and emit documents from the text column or the id. */
    def upsertRows(df: org.apache.spark.sql.DataFrame, idCol: String,
        vecCol: String, ns: NamespaceMeta): org.apache.spark.sql.DataFrame = {
      import org.apache.spark.sql.functions._
      import org.apache.spark.sql.types._
      val scalarMeta = df.schema.fields.collect {
        case f if f.name != idCol && f.name != vecCol && (f.dataType match {
          case StringType | BooleanType | ByteType | ShortType |
               IntegerType | LongType | FloatType | DoubleType => true
          case _ => false
        }) => f.name
      }.toSeq
      val docCol = documentsColumn(ns, vecCol)
        .map(col).getOrElse(col(idCol).cast("string"))
      df.na.drop(Seq(vecCol))
        .select(col(idCol).cast("string").as("id") +:
          col(vecCol).as("embedding") +: docCol.as("document") +:
          scalarMeta.map(col): _*)
    }
  }

  // ---------------------------------------------------------- LanceDB

  object LanceDb {
    def tableName(indexName: String, namespace: String): String =
      if (namespace.nonEmpty) s"${indexName}_$namespace" else indexName

    /** Schema-drift reconciliation (`lancedb_import.py:117-128` +
      * `get_default_value:155-166`): batch columns missing from the
      * table are added with a type-keyed default (string "", integral
      * 0, floating 0.0, boolean false; temporal types get NULL — the
      * pandas NaT analog). Returns (column, default-value literal)
      * pairs for the columns `have` lacks. */
    def missingColumnDefaults(
        incoming: org.apache.spark.sql.types.StructType,
        have: Set[String]): Seq[(String, Any)] = {
      import org.apache.spark.sql.types._
      incoming.fields.toSeq.collect {
        case f if !have.contains(f.name) =>
          f.name -> (f.dataType match {
            case StringType => ""
            case ByteType | ShortType | IntegerType | LongType => 0L
            case FloatType | DoubleType => 0.0
            case BooleanType => false
            case _ => null // timestamps/arrays: NaT analog
          })
      }
    }
  }

  // ---------------------------------------------------------- AstraDB

  /** AstraDB has two create paths (`astradb_import.py:143-166`): the
    * JSON API's create_collection(dimension, metric) and the CQL
    * `CREATE TABLE ks.name (id text PRIMARY KEY, "$vector"
    * vector<float,N>)` DDL. Both synthesized here. */
  final case class AstraCollectionSpec(
      name: String, dimension: Int, metric: String)

  object Astra {
    def collectionName(indexName: String, namespace: String): String =
      if (namespace.nonEmpty) s"${indexName}_$namespace" else indexName

    def collectionSpec(indexName: String, ns: NamespaceMeta): AstraCollectionSpec =
      AstraCollectionSpec(
        name = collectionName(indexName, ns.namespace),
        dimension = ns.dimensions,
        metric = reverseMetric("astradb", ns.metric))

    /** The CQL DDL string of `astradb_import.py:163-166`. */
    def createTableCql(keyspace: String, spec: AstraCollectionSpec): String =
      s"""CREATE TABLE IF NOT EXISTS $keyspace.${spec.name}""" +
        s""" (id text PRIMARY KEY, "$$vector" vector<float,${spec.dimension}>)"""
  }

  // ----------------------------------------------------------- KDB.AI

  /** One column of the KDB.AI create-table schema
    * (`kdbai_import.py:150-182`): the chosen vector column carries a
    * vectorIndex config, every other parquet column a pytype. */
  final case class KdbaiVectorIndex(dims: Int, metric: String, `type`: String)
  final case class KdbaiColumn(name: String,
      pytype: Option[String] = None,
      vectorIndex: Option[KdbaiVectorIndex] = None)
  final case class KdbaiTableSpec(columns: Seq[KdbaiColumn],
      droppedColumns: Seq[String])

  object KdbAi {
    /** `kdbai_import.py:78-83`: dashes become underscores; a leading
      * underscore gains a "col" prefix. Applied to EVERY parquet
      * column, not just vectors (`kdbai_import.py:127-137`). */
    def compliantName(name: String): String = {
      val n = name.replace("-", "_")
      if (n.startsWith("_")) "col" + n else n
    }

    /** pytype mapping (`kdbai_import.py:177-182`): parquet "string" →
      * "str", "double" → "float64"; everything else passes through. */
    def pytype(parquetType: String): String = parquetType match {
      case "string" => "str"
      case "double" => "float64"
      case t => t
    }

    /** Schema synthesis (`kdbai_import.py:150-175`): the chosen vector
      * column leads with its vectorIndex (manifest dims, metric through
      * the KDB.AI bimap CS/L2/IP, lowercased index type); other parquet
      * columns follow as pytypes; NON-chosen vector columns are
      * dropped. `parquetColumns` is (name, parquet type) pre-rename. */
    def tableSpec(ns: NamespaceMeta, indexType: String,
        parquetColumns: Seq[(String, String)],
        vectorColumns: Seq[String], vectorColumn: String): KdbaiTableSpec = {
      val vecCols = vectorColumns.map(compliantName).toSet
      val vecCol = compliantName(vectorColumn)
      val head = KdbaiColumn(vecCol, vectorIndex = Some(KdbaiVectorIndex(
        ns.dimensions, reverseMetric("kdbai", ns.metric),
        indexType.toLowerCase)))
      val renamed = parquetColumns.map { case (n, t) => (compliantName(n), t) }
      val rest = renamed.collect {
        case (n, t) if !vecCols.contains(n) =>
          KdbaiColumn(n, pytype = Some(pytype(t)))
      }
      val dropped = renamed.collect {
        case (n, _) if vecCols.contains(n) && n != vecCol => n
      }
      KdbaiTableSpec(head +: rest, dropped)
    }
  }

  // ------------------------------------------------------------ Vespa

  /** One Vespa Document-API document (`marqo_vespa_util.py:8-11`):
    * an id plus a free-form fields map. */
  final case class VespaDoc(id: String, fields: Map[String, Any])

  /** One visit page (`marqo_vespa_util.py:13-18`): documents + count +
    * the continuation token that drives the next fetch. */
  final case class VespaVisitPage(pathId: String, documents: Seq[VespaDoc],
      documentCount: Long, continuation: Option[String])

  /** The reference's real Vespa logic lives in `marqo_vespa_util.py`
    * (its vespa_export.py only drives it); these are the pure halves:
    * URL/visit synthesis and the continuation-chain scan wiring. */
  object Vespa {
    private def stripSlashes(s: String): String =
      s.dropWhile(_ == '/').reverse.dropWhile(_ == '/').reverse

    /** Visit-URL synthesis (`marqo_vespa_util.py:66-95`
      * get_all_documents): base URL stripped of slashes at both ends
      * (python `strip("/")`), the path doubles the schema name
      * (`/document/v1/{schema}/{schema}/docid`), `stream` always
      * present as a lowercase boolean ("false" is a non-empty string,
      * so the reference's `if value` filter keeps it), `continuation`
      * only when non-empty. */
    def visitUrl(documentUrl: String, schema: String, stream: Boolean,
        continuation: Option[String]): String = {
      val params = Seq("stream" -> stream.toString) ++
        continuation.filter(_.nonEmpty).map("continuation" -> _)
      s"${stripSlashes(documentUrl)}/document/v1/$schema/$schema/docid?" +
        params.map { case (k, v) => s"$k=$v" }.mkString("&")
    }

    /** Feed-side twin (public Vespa Document API shape): one PUT per
      * document id — the id-addressed upsert a real feed client calls. */
    def feedUrl(documentUrl: String, schema: String, id: String): String =
      s"${stripSlashes(documentUrl)}/document/v1/$schema/$schema/docid/$id"

    /** Wire a visit-page fetcher into the engine's continuation-token
      * scan shape: one Spark partition walks one schema's continuation
      * chain (`PaginatedScan.byContinuation` — executors fetch, the
      * driver never sees a page), flattening (id, fields) into
      * `outSchema` columns; absent fields become null. The chain ends
      * when the service stops returning a continuation token, exactly
      * like the reference's visit loop. */
    def scan(spark: org.apache.spark.sql.SparkSession,
        outSchema: org.apache.spark.sql.types.StructType,
        schemas: Seq[String])(
        visit: (String, Option[String]) => VespaVisitPage): org.apache.spark.sql.DataFrame =
      PaginatedScan.byContinuation(spark, outSchema, schemas) { (schema, tok) =>
        val page = visit(schema, tok)
        val rows = page.documents.map(d =>
          org.apache.spark.sql.Row.fromSeq(outSchema.fieldNames.toSeq.map {
            case "id" => d.id
            case f => d.fields.getOrElse(f, null)
          }))
        (rows, page.continuation.filter(_.nonEmpty))
      }
  }

  // --------------------------------------------------------- Weaviate

  /** Class config for the import half (the reference ships no Weaviate
    * import; this out-covers its stub using only public Weaviate
    * naming rules): GraphQL class names are UpperCamel, vectors are
    * brought-your-own (vectorizer "none"), and the manifest metric maps
    * through the weaviate bimap into vectorIndexConfig.distance. */
  final case class WeaviateClassSpec(className: String, vectorizer: String,
      distance: String)

  object Weaviate {
    /** Class selection (`weaviate_export.py:67-76` get_index_names):
      * no request → every class; otherwise requested classes missing
      * from the instance are REPORTED (not fatal) and the kept set
      * preserves the INSTANCE's order — the reference filters
      * all_classes by membership, not the request order. */
    def selectClasses(allClasses: Seq[String],
        requested: Option[String]): (Seq[String], Set[String]) =
      requested match {
        case None => (allClasses, Set.empty)
        case Some(s) =>
          val want = s.split(",").toSet
          (allClasses.filter(want), want -- allClasses.toSet)
      }

    /** Weaviate class names must begin uppercase (public naming rule). */
    def compliantName(name: String): String =
      name.headOption.fold(name)(h => h.toUpper.toString + name.tail)

    def classSpec(indexName: String, ns: NamespaceMeta): WeaviateClassSpec =
      WeaviateClassSpec(
        className = compliantName(
          if (ns.namespace.nonEmpty) s"${indexName}_${ns.namespace}" else indexName),
        vectorizer = "none",
        distance = reverseMetric("weaviate", ns.metric))
  }

  // ------------------------------------------- Vertex AI Vector Search

  /** Tree-AH index creation args with the reference's defaults
    * (`vertexai_vector_search_import.py:320-330`). */
  final case class VertexIndexSpec(
      displayName: String, dimensions: Int,
      approximateNeighborsCount: Int = 150,
      leafNodeEmbeddingCount: Int = 1000,
      leafNodesToSearchPercent: Int = 7,
      distanceMeasureType: String = "DOT_PRODUCT_DISTANCE",
      shardSize: String = "SHARD_SIZE_MEDIUM")

  /** One string-filter restrict config (`vertexai…import.py:236-268`):
    * a namespace plus the row COLUMNS whose values become allow/deny
    * tokens per datapoint. */
  final case class VertexRestrict(namespace: String,
      allowCols: Seq[String] = Nil, denyCols: Seq[String] = Nil)
  final case class VertexNumericRestrict(namespace: String, dataType: String)

  object VertexAi {
    /** Index naming (`vertexai…import.py:300-310`): `{base}_{namespace}`
      * when the namespace is nonempty; under create_new, collision
      * suffixes append CUMULATIVELY (idx → idx_2 → idx_2_3), exactly
      * as the reference's loop concatenates. */
    def indexName(base: String, namespace: String,
        existing: Set[String], createNew: Boolean): String = {
      val n0 = if (namespace.nonEmpty) s"${base}_$namespace" else base
      if (!createNew) n0
      else {
        var n = n0
        var suffix = 2
        while (existing(n)) { n = s"${n}_$suffix"; suffix += 1 }
        n
      }
    }

    def indexSpec(name: String, ns: NamespaceMeta,
        distanceMeasure: Option[String] = None): VertexIndexSpec =
      VertexIndexSpec(
        displayName = name, dimensions = ns.dimensions,
        distanceMeasureType =
          distanceMeasure.getOrElse("DOT_PRODUCT_DISTANCE"))

    /** Datapoint shaping (`vertexai…import.py:905-985`): stringified
      * ids, the raw vector as feature_vector, per-row restricts whose
      * allow/deny token lists accumulate CUMULATIVELY across restrict
      * entries (the reference shares one allow_values/deny_values list
      * per row across its entry loop — faithfully reproduced), numeric
      * restricts carrying the typed row value, and a stringified
      * crowding tag. All column expressions — no driver-side row
      * loop. */
    def datapointRows(df: org.apache.spark.sql.DataFrame, idCol: String,
        vecCol: String,
        restricts: Seq[VertexRestrict] = Nil,
        numeric: Seq[VertexNumericRestrict] = Nil,
        crowdingTagCol: Option[String] = None): org.apache.spark.sql.DataFrame = {
      import org.apache.spark.sql.functions._
      var allowSoFar = Seq.empty[org.apache.spark.sql.Column]
      var denySoFar = Seq.empty[org.apache.spark.sql.Column]
      // an empty token list must still be array<string> (array() alone
      // types as array<void>, which breaks schema-checked writes)
      def strArray(cols: Seq[org.apache.spark.sql.Column]) =
        if (cols.isEmpty) array().cast("array<string>") else array(cols: _*)
      val restrictCols = restricts.map { r =>
        allowSoFar ++= r.allowCols.map(c => col(c).cast("string"))
        denySoFar ++= r.denyCols.map(c => col(c).cast("string"))
        struct(lit(r.namespace).as("namespace"),
          strArray(allowSoFar).as("allow_list"),
          strArray(denySoFar).as("deny_list"))
      }
      // the reference keys the row value by data_type (value_int /
      // value_float / value_double on the datapoint proto); one typed
      // double field plus the data_type discriminator carries the same
      // information without per-entry struct shapes
      val numericCols = numeric.map { nr =>
        struct(lit(nr.namespace).as("namespace"),
          lit(nr.dataType).as("data_type"),
          col(nr.namespace).cast("double").as("value"))
      }
      df.select(
        col(idCol).cast("string").as("datapoint_id"),
        col(vecCol).as("feature_vector"),
        (if (restrictCols.nonEmpty) array(restrictCols: _*)
         else array().cast("array<struct<namespace:string," +
           "allow_list:array<string>,deny_list:array<string>>>"))
          .as("restricts"),
        (if (numericCols.nonEmpty) array(numericCols: _*)
         else array().cast("array<struct<namespace:string," +
           "data_type:string,value:double>>")).as("numeric_restricts"),
        crowdingTagCol.map(c => col(c).cast("string"))
          .getOrElse(lit(null).cast("string")).as("crowding_tag"))
    }
  }
}
