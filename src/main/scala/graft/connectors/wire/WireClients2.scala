package graft.connectors.wire

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.connectors.PaginatedScan

/** Wire dialects 9–11 (round 9): LanceDB Cloud's REST surface,
  * KDB.AI's REST query API, and Vertex AI Vector Search's
  * findNeighbors/readIndexDatapoints composition — the last three
  * reference connectors without a wire exercise (their adapters were
  * struct-level only through round 8).
  *
  *  - LanceDB (`export_vdf/lancedb_export.py:68-141`,
  *    `import_vdf/lancedb_import.py:64-160`): table-scoped REST —
  *    `POST /v1/table/{t}/query/` with offset+limit and a `columns`
  *    allowlist (the pruning surface), `describe` for schema
  *    discovery, `merge_insert?on=id` for last-wins upserts,
  *    `create_index` carrying the metric. Offset paging → a full
  *    [[WireDialect]], so the DSv2 range-partitioned scan applies.
  *    Round 10: the data plane speaks the service's real framing —
  *    query responses and merge-insert bodies are Arrow IPC record
  *    batches ([[WireArrow]]); control-plane calls stay JSON.
  *  - KDB.AI (`export_vdf/kdbai_export.py:107-120` full-table
  *    `table.query()`, `import_vdf/kdbai_import.py:150-182` schema
  *    synthesis): `POST /api/v1/data` queries with limit/offset, an
  *    `aggs` count, a q-style `[["in","id",[…]]]` filter for targeted
  *    retrieves, and `POST /api/v1/insert` row batches. The query API
  *    has no column projection — vector stripping for pruned scans is
  *    client-side, mirroring the reference's full-dump export.
  *  - Vertex AI (`export_vdf/vertexai_vector_search_export.py:209-258`,
  *    `import_vdf/vertexai_vector_search_import.py:849-865`): the
  *    service has NO listing call, so the reference exports by asking
  *    `findNeighbors` for `vectorsCount` neighbors of the zero vector
  *    (ids only), then hydrating via `readIndexDatapoints` — a
  *    list→hydrate composition like Pinecone's, except the listing is
  *    ONE driver-side call and only the hydration distributes
  *    (`PaginatedScan.byIdShards`, ×2/3 shrink on faults). Writes are
  *    `upsertDatapoints` batches with payload carried as restrict
  *    namespaces. Auth is an OAuth bearer token (google.auth
  *    credentials in the reference — a credentials FILE, no env-token
  *    analogue, so the token is caller-supplied).
  */
object WireClients2

/** LanceDB Cloud REST: offset-paged queries with a `columns`
  * allowlist, schema via describe, merge-insert upserts. */
final case class LanceDbWire(base: String,
    apiKey: Option[String] = None) extends WireDialect
    with RedactsCredential {
  private def hdrs = apiKey.toSeq.map(WireAuth.header("lancedb", _))
  private def url(t: String, op: String) = s"$base/v1/table/$t/$op/"

  override def create(c: String, dims: Int,
      metric: graft.core.Metric): Unit = {
    WireHttp.post(url(c, "create"), WireJson.write(Map("dims" -> dims)),
      hdrs)
    // the metric lives on the vector INDEX, not the table
    // (`lancedb_import.py` creates tables metric-less; standardized
    // names through the lancedb bimap: Cosine/L2/Dot)
    WireHttp.post(url(c, "create_index"), WireJson.write(Map(
      "column" -> "vector",
      "metric" -> graft.core.Metric.toDbName("lancedb", metric)
        .getOrElse("Cosine"))), hdrs)
  }

  /** LanceDB exposes the metric on the index listing. */
  override def metricOf(c: String): Option[graft.core.Metric] =
    WireHttp.post(url(c, "index"), "{}", hdrs).get("indexes")
      .collect { case s: Seq[_] => s }
      .flatMap(_.headOption)
      .collect { case m: Map[_, _] => m.asInstanceOf[Map[String, Any]] }
      .flatMap(_.get("metric"))
      .map(m => graft.core.Metric.standardize("lancedb", m.toString))

  override def count(c: String): Long =
    WireHttp.post(url(c, "count_rows"), "{}", hdrs)("count")
      .asInstanceOf[Number].longValue()

  /** Table schema (column names) — the pruning allowlist for scans
    * that skip the vector: LanceDB's `columns` param is an allowlist,
    * so "everything but the vector" needs the column inventory.
    * Memoized per table (transient — rebuilt per executor JVM after
    * task serialization): the inventory is static per table, so a
    * payload-only scan pays ONE describe round-trip per JVM instead of
    * one per page. */
  @transient private lazy val columnCache =
    new java.util.concurrent.ConcurrentHashMap[String, Seq[String]]()
  private def columnsOf(c: String): Seq[String] =
    columnCache.computeIfAbsent(c, _ =>
      WireHttp.post(url(c, "describe"), "{}", hdrs)("schema")
        .asInstanceOf[Map[String, Any]]("columns")
        .asInstanceOf[Seq[Any]]
        .map(_.asInstanceOf[Map[String, Any]]("name").toString))

  private def queryCols(c: String, wantVector: Boolean,
      wantPayload: Boolean): Option[Seq[String]] =
    (wantVector, wantPayload) match {
      case (true, true) => None // no columns param = all columns
      case (true, false) => Some(Seq("id", "vector"))
      case (false, false) => Some(Seq("id"))
      case (false, true) => Some(columnsOf(c).filterNot(_ == "vector"))
    }

  /** Data-plane reads speak the service's REAL framing: the query
    * REQUEST is JSON (params + columns allowlist), the RESPONSE is an
    * Arrow IPC record-batch stream (`lancedb_export.py:82-111` reads
    * `to_arrow().to_batches()`), negotiated by the Accept header so
    * the stub's JSON form stays available to sidecar-ignorant
    * clients. */
  override def fetchPage(c: String, offset: Long, limit: Int,
      wantVector: Boolean, wantPayload: Boolean): WirePage = {
    // empty `vector` = filter-only scan (no ANN), the documented way
    // to page a table through the query endpoint
    val body: Map[String, Any] = Map("vector" -> Seq.empty[Double],
      "limit" -> limit, "offset" -> offset) ++
      queryCols(c, wantVector, wantPayload).map("columns" -> _)
    val pts = WireArrow.decodePoints(WireHttp.postAccepting(
      url(c, "query"), WireJson.write(body), WireArrow.Mime, hdrs))
    WirePage(pts, pts.size)
  }

  override def fetchByIds(c: String, ids: Seq[String],
      wantVector: Boolean, wantPayload: Boolean): Seq[WirePoint] = {
    if (ids.isEmpty) return Seq.empty
    val quoted = ids.map(id => s"'${id.replace("'", "''")}'")
    val body: Map[String, Any] = Map("vector" -> Seq.empty[Double],
      "filter" -> s"id IN (${quoted.mkString(", ")})",
      "limit" -> ids.size) ++
      queryCols(c, wantVector, wantPayload).map("columns" -> _)
    WireArrow.decodePoints(WireHttp.postAccepting(
      url(c, "query"), WireJson.write(body), WireArrow.Mime, hdrs))
  }

  /** merge_insert on the id column — the service's last-wins upsert
    * (`when_matched_update_all + when_not_matched_insert_all`). The
    * row batch travels as an Arrow IPC stream body, the data-plane
    * write framing the managed service takes. */
  override def upsertOnce(c: String, points: Seq[WirePoint]): Unit =
    WireHttp.postBinary(s"${url(c, "merge_insert")}?on=id",
      WireArrow.encodePoints(points), WireArrow.Mime, hdrs)
}

/** KDB.AI REST: `/api/v1/data` queries (limit/offset/filter/aggs) and
  * `/api/v1/insert` row batches; schema (and the vector column's
  * metric) via `/api/v1/config/table/{t}`. */
final case class KdbaiWire(base: String,
    apiKey: Option[String] = None) extends WireDialect
    with RedactsCredential {
  private def hdrs = apiKey.toSeq.map(WireAuth.header("kdbai", _))

  override def create(c: String, dims: Int,
      metric: graft.core.Metric): Unit =
    // the import-side schema shape (`kdbai_import.py:150-175`): the
    // vector column leads with its vectorIndex (dims + CS/L2/IP metric
    // + index type), scalar columns follow as pytypes
    WireHttp.post(s"$base/api/v1/config/table/$c", WireJson.write(Map(
      "schema" -> Map("columns" -> Seq(
        Map("name" -> "vectors", "vectorIndex" -> Map(
          "dims" -> dims,
          "metric" -> graft.core.Metric.toDbName("kdbai", metric)
            .getOrElse("CS"),
          "type" -> "flat")),
        Map("name" -> "id", "pytype" -> "str"))))), hdrs)

  override def metricOf(c: String): Option[graft.core.Metric] =
    WireJson.parse(WireHttp.get(s"$base/api/v1/config/table/$c", hdrs))
      .get("schema").collect { case m: Map[_, _] =>
        m.asInstanceOf[Map[String, Any]] }
      .flatMap(_.get("columns")).collect { case s: Seq[_] => s }
      .flatMap(_.collectFirst {
        case col: Map[_, _]
            if col.asInstanceOf[Map[String, Any]].contains("vectorIndex") =>
          col.asInstanceOf[Map[String, Any]]("vectorIndex")
            .asInstanceOf[Map[String, Any]]("metric").toString
      })
      .map(graft.core.Metric.standardize("kdbai", _))

  override def count(c: String): Long =
    WireHttp.post(s"$base/api/v1/data", WireJson.write(Map(
        "table" -> c, "aggs" -> Map("cnt" -> Seq("count", "id")))),
        hdrs)("result")
      .asInstanceOf[Seq[Any]].head.asInstanceOf[Map[String, Any]]("cnt")
      .asInstanceOf[Number].longValue()

  private def rowPoints(rsp: Map[String, Any],
      wantVector: Boolean, wantPayload: Boolean): Seq[WirePoint] =
    rsp("result").asInstanceOf[Seq[Any]].map { r0 =>
      val r = r0.asInstanceOf[Map[String, Any]]
      // the query API has no projection — strip client-side so the
      // engine-facing contract (pruned scans carry no vector bytes
      // INTO Spark) still holds even though the wire bytes don't thin
      WirePoint(r("id").toString,
        if (wantVector) Decode.vec(r.getOrElse("vectors", null))
        else Seq.empty,
        if (wantPayload) Decode.pay(r - "id" - "vectors") else Map.empty)
    }

  override def fetchPage(c: String, offset: Long, limit: Int,
      wantVector: Boolean, wantPayload: Boolean): WirePage = {
    val pts = rowPoints(WireHttp.post(s"$base/api/v1/data",
      WireJson.write(Map("table" -> c, "limit" -> limit,
        "offset" -> offset)), hdrs), wantVector, wantPayload)
    WirePage(pts, pts.size)
  }

  override def fetchByIds(c: String, ids: Seq[String],
      wantVector: Boolean, wantPayload: Boolean): Seq[WirePoint] = {
    if (ids.isEmpty) return Seq.empty
    // q-style filter triple: [["in", "id", [ids…]]]
    rowPoints(WireHttp.post(s"$base/api/v1/data", WireJson.write(Map(
      "table" -> c, "filter" -> Seq(Seq("in", "id", ids)))), hdrs),
      wantVector, wantPayload)
  }

  override def upsertOnce(c: String, points: Seq[WirePoint]): Unit =
    WireHttp.post(s"$base/api/v1/insert", WireJson.write(Map(
      "table" -> c,
      "rows" -> points.map(p =>
        Map("id" -> p.id, "vectors" -> p.vector) ++ p.payload))), hdrs)
}

/** Vertex AI Vector Search: the reference's export composition —
  * index stats for the count, ONE `findNeighbors` call listing all
  * datapoint ids (queries=[zero-vector], returnFullDatapoint=false),
  * then `readIndexDatapoints` hydration in id batches; writes are
  * `upsertDatapoints`. The listing is inherently driver-side (one
  * call); hydration and writes distribute. */
final case class VertexWire(base: String, endpointId: String,
    bearerToken: Option[String] = None) extends Serializable
    with RedactsCredential {
  private def hdrs =
    bearerToken.toSeq.map(t => "Authorization" -> s"Bearer $t")

  /** indexStats.vectorsCount + config.dimensions from the index
    * resource (`vertexai_vector_search_export.py:222-227`). */
  def indexStats(index: String): (Long, Int) = {
    val rsp = WireJson.parse(
      WireHttp.get(s"$base/v1/indexes/$index", hdrs))
    val n = rsp.get("indexStats")
      .map(_.asInstanceOf[Map[String, Any]])
      .flatMap(_.get("vectorsCount"))
      .map(_.toString.toLong).getOrElse(0L)
    val dims = rsp.get("metadata").map(_.asInstanceOf[Map[String, Any]])
      .flatMap(_.get("config")).map(_.asInstanceOf[Map[String, Any]])
      .flatMap(_.get("dimensions")).map(_.toString.toInt).getOrElse(0)
    (n, dims)
  }

  /** distanceMeasureType from the index config, standardized through
    * the vertexai bimap (COSINE_DISTANCE / SQUARED_L2_DISTANCE /
    * DOT_PRODUCT_DISTANCE / L1_DISTANCE). */
  def metricOf(index: String): Option[graft.core.Metric] =
    WireJson.parse(WireHttp.get(s"$base/v1/indexes/$index", hdrs))
      .get("metadata").map(_.asInstanceOf[Map[String, Any]])
      .flatMap(_.get("config")).map(_.asInstanceOf[Map[String, Any]])
      .flatMap(_.get("distanceMeasureType"))
      .map(m => graft.core.Metric.standardize("vertexai_vectorsearch",
        m.toString))

  /** All datapoint ids via the zero-vector neighbor proxy
    * (`vertexai_vector_search_export.py:231-241`). */
  def listIds(deployedIndexId: String, total: Long, dims: Int): Seq[String] = {
    val rsp = WireHttp.post(
      s"$base/v1/indexEndpoints/$endpointId:findNeighbors",
      WireJson.write(Map(
        "deployedIndexId" -> deployedIndexId,
        "returnFullDatapoint" -> false,
        "queries" -> Seq(Map(
          "datapoint" -> Map("featureVector" -> Seq.fill(dims)(0.0)),
          "neighborCount" -> total)))), hdrs)
    rsp("nearestNeighbors").asInstanceOf[Seq[Any]].headOption.toSeq
      .flatMap(_.asInstanceOf[Map[String, Any]]("neighbors")
        .asInstanceOf[Seq[Any]])
      .map(_.asInstanceOf[Map[String, Any]]("datapoint")
        .asInstanceOf[Map[String, Any]]("datapointId").toString)
  }

  /** Hydrate ids (`read_index_datapoints`,
    * `vertexai_vector_search_export.py:242-257`); payload carried as
    * restrict namespaces with single-token allowLists. */
  def readDatapoints(deployedIndexId: String,
      ids: Seq[String]): Seq[WirePoint] = {
    if (ids.isEmpty) return Seq.empty
    val rsp = WireHttp.post(
      s"$base/v1/indexEndpoints/$endpointId:readIndexDatapoints",
      WireJson.write(Map("deployedIndexId" -> deployedIndexId,
        "ids" -> ids)), hdrs)
    rsp.get("datapoints").map(_.asInstanceOf[Seq[Any]]).getOrElse(Seq.empty)
      .map { d0 =>
        val d = d0.asInstanceOf[Map[String, Any]]
        val payload = d.get("restricts").map(_.asInstanceOf[Seq[Any]])
          .getOrElse(Seq.empty).flatMap { r0 =>
            val r = r0.asInstanceOf[Map[String, Any]]
            r("allowList").asInstanceOf[Seq[Any]].headOption.map(v =>
              r("namespace").toString -> v.toString)
          }.toMap
        WirePoint(d("datapointId").toString,
          Decode.vec(d.getOrElse("featureVector", null)), payload)
      }
  }

  def upsertOnce(index: String, points: Seq[WirePoint]): Unit =
    WireHttp.post(s"$base/v1/indexes/$index:upsertDatapoints",
      WireJson.write(Map("datapoints" -> points.map(p => Map(
        "datapointId" -> p.id,
        "featureVector" -> p.vector,
        "restricts" -> p.payload.toSeq.map { case (k, v) =>
          Map("namespace" -> k, "allowList" -> Seq(v))
        })))), hdrs)

  /** Distributed scan: one driver-side id listing (the reference's
    * single find_neighbors call), hydration sharded across executors
    * with the ×2/3 in-task batch shrink. */
  def scan(spark: SparkSession, index: String, deployedIndexId: String,
      batchSize: Int = 500, parallelism: Int = 8): DataFrame = {
    val (total, dims) = indexStats(index)
    val ids = listIds(deployedIndexId, total, dims)
    import spark.implicits._
    val self = this
    PaginatedScan.byIdShards(ids.toDF("id"), "id", WireVdb.Schema,
      batchSize, parallelism) { batch =>
      self.readDatapoints(deployedIndexId, batch).map(WireClients.pointRow)
    }
  }

  /** Batched, shrink-on-fault distributed write. */
  def write(df: DataFrame, index: String, batchSize: Int): Unit = {
    val self = this
    df.foreachPartition { (it: Iterator[org.apache.spark.sql.Row]) =>
      graft.connectors.UpsertPolicy.batchedWithShrink(
        it.map(r => WirePoint(r.getString(0),
          Option(r.getSeq[Double](1)).getOrElse(Seq.empty),
          Option(r.getMap[String, String](2)).map(_.toMap)
            .getOrElse(Map.empty))),
        batchSize) { batch => self.upsertOnce(index, batch) }
      ()
    }
  }
}
