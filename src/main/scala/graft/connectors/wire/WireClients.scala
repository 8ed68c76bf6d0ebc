package graft.connectors.wire

import org.apache.spark.sql.{DataFrame, Row, SparkSession}

import graft.connectors.{PaginatedScan, UpsertPolicy}

/** Wire dialects 5–7 (round 8): AstraDB's JSON Data API, Turbopuffer's
  * columnar REST, and Weaviate's after-cursor object listing — the
  * remaining REST shapes the reference's export/import classes speak
  * that the offset-partitioned [[WireDialect]] trio can't model,
  * because all three paginate by OPAQUE tokens:
  *
  *  - Astra: `find` returns `nextPageState`
  *    (`export_vdf/astradb_export.py:271-303`), with the reference's
  *    −10% fetch-shrink retrying the SAME state on scan errors
  *    (`astradb_export.py:239-254`);
  *  - Turbopuffer: cursor-chained `GET /v1/vectors/{ns}` with
  *    COLUMNAR bodies (`turbopuffer_export.py:64-110`,
  *    `turbopuffer_import.py:101-160`);
  *  - Weaviate: `GET /v1/objects?class=…&after=…` — the exhaustive
  *    cursor listing (the reference's export stub stops at a count,
  *    `weaviate_export.py:78-89`; this out-covers it with public API
  *    shapes only).
  *
  * Like [[VespaWire]], each client is a tiny Serializable case class
  * (base URL only) whose scan side plugs into
  * `PaginatedScan.byContinuation` — one Spark partition walks one
  * collection's token chain on an executor — and whose write side is
  * ONE wire call per batch, with batching/shrink/retry living in
  * `UpsertPolicy.batchedWithShrink` (a 429/500/413 shrinks ×2/3 and
  * re-splits the failed rows). Column pruning reaches the wire as each
  * dialect's own flag: Astra's `projection {"$vector": 0}`,
  * Turbopuffer's `include_vectors=false`, Weaviate's `include=vector`
  * omission.
  */
object WireClients {
  private[wire] def pointRow(p: WirePoint): Row =
    Row(p.id, p.vector, p.payload)
}

/** AstraDB JSON Data API: `POST /api/json/v1/{keyspace}/{collection}`
  * with one command per request (`find` / `insertMany` /
  * `estimatedDocumentCount`) — the public Data API the reference's
  * astrapy client wraps. */
final case class AstraWire(base: String,
    keyspace: String = "default_keyspace",
    apiKey: Option[String] = None) extends Serializable
    with RedactsCredential {

  private def url(c: String) = s"$base/api/json/v1/$keyspace/$c"
  private def hdrs = apiKey.toSeq.map(WireAuth.header("astra", _))

  def count(c: String): Long =
    WireHttp.post(url(c),
        WireJson.write(Map("estimatedDocumentCount" -> Map.empty[String, Any])),
        hdrs)(
        "status").asInstanceOf[Map[String, Any]]("count")
      .asInstanceOf[Number].longValue()

  /** One `find` page with the reference's −10% FETCH-SHRINK: an error
    * reduces the page size by 10% and re-requests the SAME pageState
    * (`astradb_export.py:245-252` — `fetch_size = int(fetch_size *
    * 0.9)`), so rows are neither lost nor duplicated. Gives up after
    * `maxRetries` consecutive failures at fetch size 1. */
  def findPage(c: String, pageState: Option[String], fetchSize: Int,
      wantVector: Boolean, maxRetries: Int = 3): (Seq[WirePoint], Option[String]) = {
    var fetch = fetchSize
    var failures = 0
    while (true) {
      try {
        val options: Map[String, Any] =
          Map("limit" -> fetch) ++ pageState.map("pageState" -> _)
        val find: Map[String, Any] = Map("options" -> options) ++
          (if (wantVector) Map.empty
           else Map("projection" -> Map("$vector" -> 0)))
        val data = WireHttp.post(url(c), WireJson.write(Map("find" -> find)),
          hdrs)(
          "data").asInstanceOf[Map[String, Any]]
        val docs = data("documents").asInstanceOf[Seq[Any]].map { d0 =>
          val d = d0.asInstanceOf[Map[String, Any]]
          WirePoint(d("_id").toString,
            Decode.vec(d.getOrElse("$vector", null)),
            Decode.pay(d - "_id" - "$vector"))
        }
        return (docs, data.get("nextPageState").filter(_ != null).map(_.toString))
      } catch {
        case WireHttpError(code, _) if WireHttpError.retryable(code) =>
          if (fetch > 1) fetch = math.max(1, fetch * 9 / 10)
          else {
            failures += 1
            if (failures >= maxRetries)
              throw WireHttpError(code,
                s"find page at state $pageState failed $maxRetries times at fetch 1")
          }
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** One insertMany wire call — the batch body astrapy's
    * `insert_many` posts (`astradb_import.py:225-241`). */
  def insertOnce(c: String, points: Seq[WirePoint]): Unit =
    WireHttp.post(url(c), WireJson.write(Map("insertMany" -> Map(
      "documents" -> points.map(p =>
        Map("_id" -> p.id, "$vector" -> p.vector) ++ p.payload)))), hdrs)

  /** Distributed scan: one partition walks the pageState chain. */
  def scan(spark: SparkSession, c: String, fetchSize: Int,
      wantVector: Boolean): DataFrame =
    PaginatedScan.byContinuation(spark, WireVdb.Schema, Seq(c)) { (col, tok) =>
      val (pts, next) = findPage(col, tok, fetchSize, wantVector)
      (pts.map(WireClients.pointRow), next)
    }

  /** Batched, shrink-on-fault distributed write. */
  def write(df: DataFrame, c: String, batchSize: Int): Unit = {
    val self = this
    df.foreachPartition { (it: Iterator[Row]) =>
      UpsertPolicy.batchedWithShrink(it.map(r => WirePoint(r.getString(0),
        Option(r.getSeq[Double](1)).getOrElse(Seq.empty),
        Option(r.getMap[String, String](2)).map(_.toMap).getOrElse(Map.empty))),
        batchSize) { batch => self.insertOnce(c, batch) }
      ()
    }
  }
}

/** Turbopuffer REST: COLUMNAR upsert bodies and a cursor-chained
  * export — `{ids, vectors, attributes: {name: [...]}}` on the wire,
  * the shape `turbopuffer_import.py:148-158` posts per batch. */
final case class TurbopufferWire(base: String,
    apiKey: Option[String] = None) extends Serializable
    with RedactsCredential {
  private def hdrs = apiKey.toSeq.map(WireAuth.header("turbopuffer", _))

  def upsertOnce(ns: String, points: Seq[WirePoint]): Unit = {
    // columnar pivot: every attribute key becomes one aligned array
    val keys = points.flatMap(_.payload.keys).distinct
    WireHttp.post(s"$base/v1/vectors/$ns", WireJson.write(Map(
      "ids" -> points.map(_.id),
      "vectors" -> points.map(_.vector),
      "attributes" -> keys.map(k =>
        k -> points.map(_.payload.get(k).orNull)).toMap)), hdrs)
  }

  /** One cursor page; `include_vectors=false` keeps the heaviest
    * column off the wire entirely. A 429/5xx shrinks the page limit
    * ×2/3 and re-requests the SAME cursor (cursors are idempotent
    * reads, so rows are neither lost nor duplicated) — resilience
    * parity with the sibling dialects' scan paths; gives up after
    * `maxRetries` consecutive failures at limit 1. */
  def page(ns: String, cursor: Option[String], limit: Int,
      includeVectors: Boolean, maxRetries: Int = 3)
      : (Seq[WirePoint], Option[String]) = {
    var lim = limit
    var failures = 0
    while (true) {
      try {
        val q = s"?limit=$lim&include_vectors=$includeVectors" +
          cursor.map(c => s"&cursor=$c").getOrElse("")
        val rsp = WireJson.parse(WireHttp.get(s"$base/v1/vectors/$ns$q", hdrs))
        val ids = rsp("ids").asInstanceOf[Seq[Any]].map(_.toString)
        val vecs = Option(rsp.getOrElse("vectors", null))
          .map(_.asInstanceOf[Seq[Any]].map(Decode.vec))
          .getOrElse(ids.map(_ => Seq.empty[Double]))
        val attrs = Option(rsp.getOrElse("attributes", null))
          .map(_.asInstanceOf[Map[String, Any]].map { case (k, vs) =>
            k -> vs.asInstanceOf[Seq[Any]]
          }).getOrElse(Map.empty)
        val pts = ids.zipWithIndex.map { case (id, i) =>
          WirePoint(id, vecs(i),
            attrs.flatMap { case (k, vs) =>
              Option(vs(i)).map(v => k -> v.toString)
            })
        }
        return (pts, rsp.get("next_cursor").filter(_ != null).map(_.toString))
      } catch {
        case WireHttpError(code, _) if WireHttpError.retryable(code) =>
          if (lim > 1) lim = math.max(1, lim * 2 / 3)
          else {
            failures += 1
            if (failures >= maxRetries)
              throw WireHttpError(code,
                s"page at cursor $cursor failed $maxRetries times at limit 1")
          }
      }
    }
    throw new IllegalStateException("unreachable")
  }

  def scan(spark: SparkSession, ns: String, limit: Int,
      includeVectors: Boolean): DataFrame =
    PaginatedScan.byContinuation(spark, WireVdb.Schema, Seq(ns)) { (n, tok) =>
      val (pts, next) = page(n, tok, limit, includeVectors)
      (pts.map(WireClients.pointRow), next)
    }

  def write(df: DataFrame, ns: String, batchSize: Int): Unit = {
    val self = this
    df.foreachPartition { (it: Iterator[Row]) =>
      UpsertPolicy.batchedWithShrink(it.map(r => WirePoint(r.getString(0),
        Option(r.getSeq[Double](1)).getOrElse(Seq.empty),
        Option(r.getMap[String, String](2)).map(_.toMap).getOrElse(Map.empty))),
        batchSize) { batch => self.upsertOnce(ns, batch) }
      ()
    }
  }
}

/** Weaviate REST: `POST /v1/batch/objects` writes and the exhaustive
  * after-cursor listing `GET /v1/objects?class=…&limit=…&after=…` —
  * the public cursor API for full exports (vector included only when
  * `include=vector`). */
final case class WeaviateWire(base: String,
    apiKey: Option[String] = None) extends Serializable
    with RedactsCredential {
  private def hdrs = apiKey.toSeq.map(WireAuth.header("weaviate", _))

  def batchObjectsOnce(cls: String, points: Seq[WirePoint]): Unit =
    WireHttp.post(s"$base/v1/batch/objects", WireJson.write(Map(
      "objects" -> points.map(p => Map(
        "class" -> cls, "id" -> p.id,
        "properties" -> p.payload, "vector" -> p.vector)))), hdrs)

  def listAfter(cls: String, after: Option[String], limit: Int,
      includeVector: Boolean): (Seq[WirePoint], Option[String]) = {
    val q = s"?class=$cls&limit=$limit" +
      (if (includeVector) "&include=vector" else "") +
      after.map(a => s"&after=$a").getOrElse("")
    val rsp = WireJson.parse(WireHttp.get(s"$base/v1/objects$q", hdrs))
    val objs = rsp("objects").asInstanceOf[Seq[Any]].map { o0 =>
      val o = o0.asInstanceOf[Map[String, Any]]
      WirePoint(o("id").toString,
        Decode.vec(o.getOrElse("vector", null)),
        Decode.pay(o.getOrElse("properties", null)))
    }
    // cursor semantics: only an EMPTY page ends the chain (the
    // documented exhaustive-listing idiom). Keying exhaustion off
    // `objs.size < limit` truncates against a live server whose
    // effective page cap (Weaviate's QUERY_MAXIMUM_RESULTS) is lower
    // than the requested limit: a full-but-capped page reads as
    // "short". One extra empty-page request per chain is the price.
    val next = if (objs.isEmpty) None else Some(objs.last.id)
    (objs, next)
  }

  def scan(spark: SparkSession, cls: String, limit: Int,
      includeVector: Boolean): DataFrame =
    PaginatedScan.byContinuation(spark, WireVdb.Schema, Seq(cls)) { (c, tok) =>
      val (pts, next) = listAfter(c, tok, limit, includeVector)
      (pts.map(WireClients.pointRow), next)
    }

  def write(df: DataFrame, cls: String, batchSize: Int): Unit = {
    val self = this
    df.foreachPartition { (it: Iterator[Row]) =>
      UpsertPolicy.batchedWithShrink(it.map(r => WirePoint(r.getString(0),
        Option(r.getSeq[Double](1)).getOrElse(Seq.empty),
        Option(r.getMap[String, String](2)).map(_.toMap).getOrElse(Map.empty))),
        batchSize) { batch => self.batchObjectsOnce(cls, batch) }
      ()
    }
  }
}
