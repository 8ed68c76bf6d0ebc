package graft.connectors.wire

import java.io.{DataInputStream, DataOutputStream}
import java.net.{InetSocketAddress, ServerSocket, Socket}
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.connectors.PaginatedScan
import graft.core.Metric

/** Milvus over the framed binary transport — the reference's
  * most-used connector whose NATIVE protocol is gRPC
  * (`export_vdf/milvus_export.py:85-87` dials `connections.connect`,
  * `:117-158` exports via `query_iterator` batches over collections
  * whose schema is a VARCHAR primary key + one dtype-100/101 vector
  * field; `import_vdf/milvus_import.py:111-125` creates VARCHAR-pk /
  * FLOAT_VECTOR collections with `enable_dynamic_field=True` and
  * upserts row batches with the same ×2/3 shrink loop this engine's
  * `UpsertPolicy` implements).
  *
  * Two scan shapes, both real Milvus public API:
  *
  *  - [[MilvusWire.fetchPage]]: `query` with `offset`/`limit`
  *    pagination — offset-seekable, so the DSv2 connector plans one
  *    `InputPartition` per page range and executors pull ranges
  *    concurrently (the cluster-scale path);
  *  - [[MilvusWire.iteratorScan]]: the reference's `query_iterator`
  *    loop — an opaque server-side iterator token walked batch by
  *    batch until an EMPTY batch (`milvus_export.py:144-148`:
  *    `len(res) == 0` closes the iterator), via
  *    `PaginatedScan.byContinuation` on one executor per collection.
  *
  * Message framing reuses [[GrpcFraming]] (5-byte gRPC prefix +
  * protobuf-style TLV payloads). Milvus-flavored fields: the schema
  * surface (describe → pk name, vector field name, dtype 101 =
  * FLOAT_VECTOR, dim, metric_type) and columnar-ish FieldData rows.
  * Auth rides field 14 (gRPC `authorization` metadata), key sourced
  * from ZILLIZ_CLOUD_TOKEN (`milvus_export.py:60-65`).
  */
final case class MilvusWire(hostPort: String,
    token: Option[String] = None) extends WireDialect
    with RedactsCredential {
  import GrpcFraming._
  import MilvusWire._

  // Transport by scheme: `h2://host:port` dials REAL gRPC-over-HTTP/2
  // ([[GrpcH2Client]] — one multiplexed connection per endpoint, the
  // method as `:path`, auth as a real `authorization` header);
  // `tls://` / bare host:port ride the framed TCP pool
  // ([[FramedChannelPool]], one keep-alive channel per exchange, the
  // reference's one-connection-per-process shape
  // `milvus_export.py:85-87`), with the method on payload field 15 and
  // auth on field 14 — the TLV stand-ins for what HTTP/2 carries as
  // headers. The protobuf request/response payloads are IDENTICAL on
  // both transports.
  private val h2 = hostPort.startsWith("h2://") ||
    hostPort.startsWith("h2s://")
  // h2s:// = gRPC's default deployment: HTTP/2 over TLS with ALPN
  private def h2Endpoint: String =
    if (hostPort.startsWith("h2s://"))
      "tls:" + hostPort.stripPrefix("h2s://")
    else hostPort.stripPrefix("h2://")

  private def call(method: Int, idempotent: Boolean = true)(
      build: DataOutputStream => Unit): Map[Int, Seq[Any]] = {
    val rspBytes =
      if (h2)
        GrpcH2.unframe(GrpcH2Client.call(h2Endpoint,
          MilvusWire.h2Path(method), GrpcH2.frame(message(build)), token))
      else {
        val payload = message { o =>
          token.foreach(writeStringField(o, 14, _))
          writeVarintField(o, 15, method)
          build(o)
        }
        FramedChannelPool.exchange(hostPort, payload, idempotent)
      }
    val rsp = readMessage(rspBytes)
    val status = rsp.get(1).flatMap(_.headOption)
      .map(_.asInstanceOf[Long].toInt).getOrElse(0)
    if (status != 0)
      throw WireHttpError(statusToHttp(status), s"milvus status $status")
    rsp
  }

  private def utf8(b: Any): String =
    new String(b.asInstanceOf[Array[Byte]], StandardCharsets.UTF_8)

  /** CreateCollection + AUTOINDEX: VARCHAR pk, FLOAT_VECTOR field,
    * dynamic field on, metric from the VDF manifest
    * (`milvus_import.py:111-150`). */
  override def create(c: String, dims: Int, metric: Metric): Unit = {
    // NOT idempotent: a stale-channel re-send of a create the server
    // already applied surfaces ALREADY_EXISTS — propagate instead
    call(MCreate, idempotent = false) { o =>
      writeStringField(o, 2, c)
      writeVarintField(o, 9, dims)
      writeStringField(o, 10,
        Metric.toDbName("milvus", metric).getOrElse("COSINE"))
    }
    ()
  }

  /** DescribeCollection: pk field name, vector field name + dtype,
    * dim, and the index's metric_type — what the export reads to find
    * the dtype-100/101 field (`milvus_export.py:127-135`). */
  def describe(c: String): MilvusSchema = {
    val rsp = call(MDescribe) { o =>
      writeStringField(o, 2, c)
    }
    MilvusSchema(
      pkField = utf8(rsp(5).head),
      vectorField = utf8(rsp(6).head),
      dtype = rsp(7).head.asInstanceOf[Long].toInt,
      dim = rsp(8).head.asInstanceOf[Long].toInt,
      metricType = utf8(rsp(9).head))
  }

  override def metricOf(c: String): Option[Metric] =
    Some(Metric.standardize("milvus", describe(c).metricType))

  override def count(c: String): Long =
    call(MCount) { o =>
      writeStringField(o, 2, c)
    }.get(2).flatMap(_.headOption).map(_.asInstanceOf[Long]).getOrElse(0L)

  /** `query` with offset/limit pagination — the offset-seekable public
    * shape the DSv2 range partitions need. */
  override def fetchPage(c: String, offset: Long, limit: Int,
      wantVector: Boolean, wantPayload: Boolean): WirePage = {
    val rsp = call(MQuery) { o =>
      writeStringField(o, 2, c)
      writeVarintField(o, 3, offset)
      writeVarintField(o, 4, limit)
      writeVarintField(o, 5, if (wantVector) 1 else 0)
      writeVarintField(o, 6, if (wantPayload) 1 else 0)
    }
    val pts = rsp.getOrElse(3, Seq.empty)
      .map(b => readPoint(b.asInstanceOf[Array[Byte]]))
    val listed = rsp.get(4).flatMap(_.headOption)
      .map(_.asInstanceOf[Long].toInt).getOrElse(pts.size)
    WirePage(pts, listed)
  }

  /** `query` with a `pk in [...]` expr — the targeted-retrieve form an
    * id pushdown lands on. */
  override def fetchByIds(c: String, ids: Seq[String],
      wantVector: Boolean, wantPayload: Boolean): Seq[WirePoint] =
    call(MRetrieve) { o =>
      writeStringField(o, 2, c)
      ids.foreach(writeStringField(o, 7, _))
      writeVarintField(o, 5, if (wantVector) 1 else 0)
      writeVarintField(o, 6, if (wantPayload) 1 else 0)
    }.getOrElse(3, Seq.empty).map(b => readPoint(b.asInstanceOf[Array[Byte]]))

  /** Upsert a row batch (`collection.upsert`,
    * `milvus_import.py:200-203`); one wire call — shrink/re-split
    * lives in the caller's `UpsertPolicy.batchedWithShrink`, matching
    * the reference's `current_batch_size * 2 // 3` loop
    * (`milvus_import.py:208-210`). */
  override def upsertOnce(c: String, points: Seq[WirePoint]): Unit = {
    call(MUpsert) { o =>
      writeStringField(o, 2, c)
      points.foreach(p => writePoint(o, p, withVector = true,
        withPayload = true))
    }
    ()
  }

  /** One `query_iterator.next()` batch: an absent token opens the
    * iterator, the returned token resumes it, an EMPTY batch ends the
    * chain (`milvus_export.py:142-148`). */
  def iteratorNext(c: String, itToken: Option[String], batchSize: Int,
      wantVector: Boolean): (Seq[WirePoint], Option[String]) = {
    val rsp = call(MIterate) { o =>
      writeStringField(o, 2, c)
      writeVarintField(o, 4, batchSize)
      writeVarintField(o, 5, if (wantVector) 1 else 0)
      writeVarintField(o, 6, 1)
      itToken.foreach(writeStringField(o, 11, _))
    }
    val pts = rsp.getOrElse(3, Seq.empty)
      .map(b => readPoint(b.asInstanceOf[Array[Byte]]))
    // iterator exhaustion IS the empty batch; the token is otherwise
    // always carried forward
    val next =
      if (pts.isEmpty) None
      else rsp.get(11).flatMap(_.headOption).map(utf8)
    (pts, next)
  }

  /** The reference's export loop as a distributed scan: one Spark
    * partition per collection walks the query_iterator chain on an
    * executor until the empty batch. */
  def iteratorScan(spark: SparkSession, c: String, batchSize: Int,
      wantVector: Boolean = true): DataFrame =
    PaginatedScan.byContinuation(spark, WireVdb.Schema, Seq(c)) { (col, tok) =>
      val (pts, next) = iteratorNext(col, tok, batchSize, wantVector)
      (pts.map(WireClients.pointRow), next)
    }
}

object MilvusWire {
  /** Method ids on the framed transport. */
  val MCreate = 1
  val MCount = 2
  val MQuery = 3
  val MRetrieve = 4
  val MUpsert = 5
  val MDescribe = 6
  val MIterate = 7

  /** The same methods as real gRPC `:path`es (the H2 transport routes
    * by path, never by a payload field). Names follow the
    * MilvusService RPCs these calls correspond to; QueryIterator is
    * the reference's client-side iterator loop surfaced as one RPC
    * name on the stub. */
  private val H2Service = "/milvus.proto.milvus.MilvusService/"
  val h2Path: Map[Int, String] = Map(
    MCreate -> (H2Service + "CreateCollection"),
    MCount -> (H2Service + "GetCollectionStatistics"),
    MQuery -> (H2Service + "Query"),
    MRetrieve -> (H2Service + "Get"),
    MUpsert -> (H2Service + "Upsert"),
    MDescribe -> (H2Service + "DescribeCollection"),
    MIterate -> (H2Service + "QueryIterator"))
  val h2Method: Map[String, Int] = h2Path.map(_.swap)

  /** Milvus DataType values the reference keys on
    * (`milvus_export.py:133`: `f.dtype.value in [100, 101]`). */
  val DtypeBinaryVector = 100
  val DtypeFloatVector = 101
  val DtypeVarchar = 21
}

/** What DescribeCollection returns: the schema surface the export
  * reads (`milvus_export.py:127-135`). */
final case class MilvusSchema(pkField: String, vectorField: String,
    dtype: Int, dim: Int, metricType: String)

/** Stub server half: Milvus-flavored methods over the same framed
  * transport, with the fault-injection surface the other stubs have so
  * specs assert identical shrink behavior. Iterator state is
  * server-side (real Milvus holds a query cursor); tokens are opaque
  * to the client. */
final class MilvusStubServer(port: Int = 0,
    tls: Option[WireTls.KeyMaterial] = None) {
  import GrpcFraming._
  import MilvusWire._

  private final case class Col(dims: Int, metricType: String,
    rows: java.util.LinkedHashMap[String, (Seq[Double], Map[String, String])])

  private val store = new java.util.LinkedHashMap[String, Col]()
  val requestLog = new java.util.concurrent.ConcurrentLinkedQueue[String]()
  /** `method collection token=…` per request — field-14 metadata. */
  val authLog = new java.util.concurrent.ConcurrentLinkedQueue[String]()
  private val writeFails = new java.util.concurrent.atomic.AtomicInteger(0)
  @volatile private var writeFailStatus = 14
  private val readFails = new java.util.concurrent.atomic.AtomicInteger(0)
  @volatile private var readFailStatus = 14
  @volatile var maxUpsertBatch: Int = Int.MaxValue

  def failNextWrites(n: Int, status: Int): Unit = {
    writeFailStatus = status; writeFails.set(n)
  }
  def failNextReads(n: Int, status: Int): Unit = {
    readFailStatus = status; readFails.set(n)
  }

  // port 0 (default) = ephemeral; a fixed port lets the pool specs
  // restart the server in place to stale the parked channels. With
  // key material the accept socket speaks TLS and hostPort carries
  // the tls:// scheme the framed channels dial.
  private val server: ServerSocket = tls match {
    case Some(km) => WireTls.serverContext(km.keyStore, km.password)
      .getServerSocketFactory.createServerSocket()
    case None => new ServerSocket()
  }
  server.bind(new InetSocketAddress("127.0.0.1", port))
  val hostPort: String =
    s"${if (tls.isDefined) "tls://" else ""}127.0.0.1:${server.getLocalPort}"

  /** TCP connections ACCEPTED — with keep-alive clients this must stay
    * ≪ the request count (the reuse assertion in MilvusWireSpec). */
  val connections = new java.util.concurrent.atomic.AtomicInteger(0)

  // cached pool: keep-alive connections occupy a thread while open, so
  // a fixed-8 pool would starve new connections behind idle ones
  private val pool = java.util.concurrent.Executors.newCachedThreadPool()
  @volatile private var running = true
  // accepted sockets, so stop() can sever live keep-alive connections
  // too (the pool specs restart the stub to stale parked channels —
  // a stop that leaves handler threads serving old sockets would keep
  // the "dead" connections answering)
  private val open = new java.util.concurrent.ConcurrentLinkedQueue[Socket]()
  private val acceptor = new Thread(() => {
    while (running) {
      try {
        val sock = server.accept()
        open.add(sock)
        pool.execute(() => handle(sock))
      } catch { case _: Exception if !running => }
    }
  }, "milvus-stub-acceptor")
  acceptor.setDaemon(true)
  acceptor.start()

  def stop(): Unit = {
    running = false
    server.close()
    open.forEach(s => try s.close() catch { case _: Exception => () })
    pool.shutdown()
  }

  /** One request → one framed response, transport-agnostic: the
    * gRPC-over-HTTP/2 stub ([[GrpcH2StubServer]]) routes a real
    * `:path` + `authorization` header into the SAME dispatch the TCP
    * acceptor uses — h2Method maps the path back to the method id and
    * the bearer token is re-injected as field 14 so authLog records
    * one shape for both transports. Unknown path → 501 → grpc
    * UNIMPLEMENTED in the trailers. */
  def dispatchH2(path: String, auth: Option[String],
      framedReq: Array[Byte]): Array[Byte] = {
    val method = MilvusWire.h2Method.getOrElse(path,
      throw WireHttpError(501, s"unimplemented path $path"))
    val base = readMessage(GrpcH2.unframe(framedReq))
    val req = base ++ Map[Int, Seq[Any]](
      15 -> Seq(method.toLong),
      14 -> GrpcH2.bearer(auth).toSeq.map(t =>
        t.getBytes(StandardCharsets.UTF_8)))
    val bos = new java.io.ByteArrayOutputStream()
    serve(req, new DataOutputStream(bos))
    bos.toByteArray
  }

  def collectionSize(c: String): Int = synchronized {
    Option(store.get(c)).map(_.rows.size).getOrElse(0)
  }

  private def ensure(c: String, dims: Int, metricType: String): Unit =
    synchronized {
      if (!store.containsKey(c))
        store.put(c, Col(dims, metricType, new java.util.LinkedHashMap()))
    }
  private def page(c: String, offset: Int, limit: Int): Seq[WirePoint] =
    synchronized {
      val col = store.get(c)
      require(col != null, s"no such collection $c")
      import scala.jdk.CollectionConverters._
      col.rows.entrySet().asScala.toSeq.slice(offset, offset + limit)
        .map(e => WirePoint(e.getKey, e.getValue._1, e.getValue._2))
    }

  private def respond(out: DataOutputStream)(build: DataOutputStream => Unit)
      : Unit = writeFrame(out, message(build))
  private def respondStatus(out: DataOutputStream, status: Int): Unit =
    respond(out)(o => writeVarintField(o, 1, status))

  private def str(f: Map[Int, Seq[Any]], field: Int): String =
    new String(f(field).head.asInstanceOf[Array[Byte]], StandardCharsets.UTF_8)
  private def num(f: Map[Int, Seq[Any]], field: Int, dflt: Long = 0): Long =
    f.get(field).flatMap(_.headOption).map(_.asInstanceOf[Long]).getOrElse(dflt)

  private def writePoints(o: DataOutputStream, pts: Seq[WirePoint],
      wantVec: Boolean, wantPay: Boolean): Unit =
    pts.foreach(p => writePoint(o,
      WirePoint(p.id,
        if (wantVec) p.vector else Seq.empty,
        if (wantPay) p.payload else Map.empty),
      withVector = wantVec, withPayload = wantPay, field = 3))

  private def handle(sock: Socket): Unit = try {
    connections.incrementAndGet()
    val in = new DataInputStream(sock.getInputStream)
    val out = new DataOutputStream(sock.getOutputStream)
    // keep-alive: serve frames until the client closes the connection
    while (true) {
      val req =
        try readMessage(readFrame(in))
        catch {
          case _: java.io.EOFException | _: java.net.SocketException =>
            return
        }
      serve(req, out)
    }
  } catch {
    case _: Exception => // connection dropped mid-frame
  } finally sock.close()

  private def serve(req: Map[Int, Seq[Any]],
      out: DataOutputStream): Unit = {
    val method = num(req, 15)
    val c = str(req, 2)
    authLog.add(s"milvus m$method $c token=" +
      req.get(14).flatMap(_.headOption)
        .map(b => new String(b.asInstanceOf[Array[Byte]],
          StandardCharsets.UTF_8)).getOrElse("-"))
    method.toInt match {
      case MCreate =>
        val dims = num(req, 9).toInt
        val mt = str(req, 10)
        requestLog.add(s"milvus create $c dims=$dims metric=$mt")
        ensure(c, dims, mt)
        respondStatus(out, 0)

      case MCount =>
        requestLog.add(s"milvus count $c")
        respond(out) { o =>
          writeVarintField(o, 1, 0)
          writeVarintField(o, 2, collectionSize(c))
        }

      case MDescribe =>
        requestLog.add(s"milvus describe $c")
        val col = synchronized(Option(store.get(c)))
        col match {
          case None => respondStatus(out, 5) // NOT_FOUND
          case Some(cc) => respond(out) { o =>
            writeVarintField(o, 1, 0)
            writeStringField(o, 5, "id")
            writeStringField(o, 6, "vector")
            writeVarintField(o, 7, DtypeFloatVector)
            writeVarintField(o, 8, cc.dims)
            writeStringField(o, 9, cc.metricType)
          }
        }

      case MQuery =>
        val off = num(req, 3).toInt
        val limit = num(req, 4).toInt
        val wantVec = num(req, 5) == 1
        val wantPay = num(req, 6) == 1
        requestLog.add(s"milvus query $c offset=$off limit=$limit " +
          s"want_vector=$wantVec want_payload=$wantPay")
        if (readFails.getAndUpdate(n => math.max(0, n - 1)) > 0)
          respondStatus(out, readFailStatus)
        else {
          val pts = page(c, off, limit)
          respond(out) { o =>
            writeVarintField(o, 1, 0)
            writePoints(o, pts, wantVec, wantPay)
            writeVarintField(o, 4, pts.size)
          }
        }

      case MIterate =>
        val batch = num(req, 4).toInt
        val wantVec = num(req, 5) == 1
        val tok = req.get(11).flatMap(_.headOption)
          .map(b => new String(b.asInstanceOf[Array[Byte]],
            StandardCharsets.UTF_8))
        requestLog.add(s"milvus iterate $c token=${tok.getOrElse("-")} " +
          s"batch=$batch")
        if (readFails.getAndUpdate(n => math.max(0, n - 1)) > 0)
          respondStatus(out, readFailStatus)
        else {
          // server-side cursor: the token encodes progress opaquely
          val off = tok.map(_.stripPrefix("it").toInt).getOrElse(0)
          val pts = page(c, off, batch)
          respond(out) { o =>
            writeVarintField(o, 1, 0)
            writePoints(o, pts, wantVec, wantPay = true)
            writeStringField(o, 11, s"it${off + pts.size}")
          }
        }

      case MRetrieve =>
        val ids = req.getOrElse(7, Seq.empty).map(b =>
          new String(b.asInstanceOf[Array[Byte]], StandardCharsets.UTF_8))
        val wantVec = num(req, 5) == 1
        val wantPay = num(req, 6) == 1
        requestLog.add(s"milvus retrieve $c n=${ids.size} " +
          s"want_vector=$wantVec want_payload=$wantPay")
        if (readFails.getAndUpdate(n => math.max(0, n - 1)) > 0)
          respondStatus(out, readFailStatus)
        else {
          val pts = synchronized {
            val col = store.get(c)
            require(col != null, s"no such collection $c")
            ids.flatMap(id => Option(col.rows.get(id))
              .map(v => WirePoint(id, v._1, v._2)))
          }
          respond(out) { o =>
            writeVarintField(o, 1, 0)
            writePoints(o, pts, wantVec, wantPay)
          }
        }

      case MUpsert =>
        val pts = req.getOrElse(1, Seq.empty).map(b =>
          readPoint(b.asInstanceOf[Array[Byte]]))
        requestLog.add(s"milvus upsert $c n=${pts.size}")
        if (writeFails.getAndUpdate(n => math.max(0, n - 1)) > 0)
          respondStatus(out, writeFailStatus)
        else if (pts.size > maxUpsertBatch)
          respondStatus(out, 8) // RESOURCE_EXHAUSTED
        else {
          ensure(c, pts.headOption.map(_.vector.size).getOrElse(0), "COSINE")
          synchronized {
            val col = store.get(c)
            pts.foreach(p => col.rows.put(p.id, (p.vector, p.payload)))
          }
          respondStatus(out, 0)
        }

      case m =>
        requestLog.add(s"milvus unknown method $m")
        respondStatus(out, 12) // UNIMPLEMENTED
    }
  }
}
