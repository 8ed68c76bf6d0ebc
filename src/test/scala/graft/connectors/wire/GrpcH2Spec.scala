package graft.connectors.wire

import graft.SparkSpec
import graft.core.Metric

import scala.jdk.CollectionConverters._

/** Round-11 ask #5: real gRPC-over-HTTP/2 for the Milvus dialect.
  * grpc-java is not in the offline cache, but Netty's HTTP/2 codec is
  * on the Spark classpath — so [[GrpcH2Client]]/[[GrpcH2StubServer]]
  * speak the actual gRPC wire protocol (HTTP/2 streams, `:path`
  * routing, `application/grpc` 5-byte DATA framing, `authorization`
  * header, `grpc-status` trailers) and the Milvus dialect runs on it
  * end to end via `h2://host:port`, with the TLV TCP transport as the
  * documented fallback. */
class GrpcH2Spec extends SparkSpec {

  private def withServers[T](body: (MilvusStubServer, GrpcH2StubServer,
      String) => T): T = {
    val m = new MilvusStubServer()
    val h2 = new GrpcH2StubServer(m.dispatchH2)
    try body(m, h2, s"h2://${h2.hostPort}")
    finally { h2.stop(); m.stop() }
  }

  test("Milvus dialect over real HTTP/2: create/upsert/describe/count/page round trip") {
    withServers { (m, h2, ep) =>
      val c = "mlv_h2"
      val w = MilvusWire(ep, token = Some("ztok"))
      w.create(c, 3, Metric.Cosine)
      w.upsertOnce(c, (0 until 120).map(i =>
        WirePoint(s"$c-$i", Seq(i.toDouble, 0, 0), Map("r" -> i.toString))))
      assert(w.count(c) == 120)
      val sch = w.describe(c)
      assert(sch.dtype == MilvusWire.DtypeFloatVector && sch.dim == 3)
      val page = w.fetchPage(c, 10, 7, wantVector = true, wantPayload = true)
      assert(page.points.size == 7 && page.points.head.id == s"$c-10")
      // the method rode :path and auth rode a REAL authorization header
      val logged = h2.requestLog.toArray.map(_.toString)
      assert(logged.exists(_.startsWith(
        "/milvus.proto.milvus.MilvusService/CreateCollection")))
      assert(logged.forall(_.endsWith("authorization=Bearer ztok")))
      // and the same dispatch logged the token server-side
      assert(m.authLog.toArray.map(_.toString)
        .forall(_.endsWith("token=ztok")))
    }
  }

  test("one HTTP/2 connection, many streams: a multi-page DSv2 scan multiplexes") {
    withServers { (m, h2, ep) =>
      val c = "mlv_h2_scan"
      val w = MilvusWire(ep)
      w.create(c, 3, Metric.Cosine)
      w.upsertOnce(c, (0 until 400).map(i =>
        WirePoint(s"$c-$i", Seq(i.toDouble, 0, 0), Map("r" -> i.toString))))
      val connBefore = h2.connections.get()
      val reqBefore = h2.requestLog.size()
      val back = WireVdb.read(spark, "milvus", ep, c, batchSize = 10)
      assert(back.count() == 400)
      val pages = h2.requestLog.size() - reqBefore
      assert(pages >= 40, s"expected >=40 page RPCs, saw $pages")
      // gRPC channel model: the 4 task threads' 40+ RPCs share the
      // per-endpoint connection — streams multiplex, sockets don't
      assert(h2.connections.get() - connBefore <= 1,
        s"${h2.connections.get() - connBefore} new connections for $pages RPCs")
    }
  }

  test("application status flows in DATA, transport errors in trailers") {
    withServers { (m, h2, ep) =>
      val w = MilvusWire(ep)
      // app-level NOT_FOUND: embedded status in the response message
      // (Milvus's common.Status shape) → the shared taxonomy
      val e1 = intercept[WireHttpError] { w.describe("missing") }
      assert(e1.code == 404)
      // transport-level: unknown :path → trailers-only UNIMPLEMENTED
      val e2 = intercept[WireHttpError] {
        GrpcH2Client.call(ep.stripPrefix("h2://"),
          "/milvus.proto.milvus.MilvusService/Nope",
          GrpcH2.frame(Array[Byte]()))
      }
      assert(e2.code == 501)
    }
  }

  test("h2s://: gRPC over TLS with ALPN — round trip, reuse, untrusted refusal") {
    val km = WireTls.generate(java.nio.file.Files.createTempDirectory("h2s"))
    System.setProperty("graft.wire.truststore", km.trustStore.toString)
    System.setProperty("graft.wire.truststorePass", km.password)
    try {
      val m = new MilvusStubServer()
      val h2 = new GrpcH2StubServer(m.dispatchH2, tls = Some(km))
      try {
        val c = "mlv_h2s"
        val w = MilvusWire(s"h2s://${h2.hostPort}", token = Some("tok"))
        w.create(c, 3, Metric.Cosine)
        w.upsertOnce(c, (0 until 30).map(i =>
          WirePoint(s"$c-$i", Seq(i.toDouble, 0, 0), Map.empty)))
        assert(w.count(c) == 30)
        // all RPCs multiplexed one TLS connection (ALPN-negotiated h2)
        assert(h2.connections.get() == 1)
      } finally h2.stop()
      // a client without the trust bundle is refused at the TLS
      // handshake — fresh server so no cached trusted channel serves it
      val m2 = new MilvusStubServer()
      val h2b = new GrpcH2StubServer(m2.dispatchH2, tls = Some(km))
      try {
        System.setProperty("graft.wire.truststore", "")
        intercept[java.io.IOException] {
          MilvusWire(s"h2s://${h2b.hostPort}").count("nope")
        }
      } finally { h2b.stop(); m2.stop() }
      m.stop()
    } finally {
      System.clearProperty("graft.wire.truststore")
      System.clearProperty("graft.wire.truststorePass")
    }
  }

  test("the generic GrpcWire dialect rides HTTP/2 too (the pinecone/qdrant-preferred shape)") {
    val g = new GrpcStubServer()
    val h2 = new GrpcH2StubServer(g.dispatchH2)
    try {
      val c = "g_h2"
      val w = GrpcWire(s"h2://${h2.hostPort}", Some("tok"))
      w.create(c, 3, Metric.Cosine)
      w.upsertOnce(c, (0 until 50).map(i =>
        WirePoint(s"$c-$i", Seq(i.toDouble, 0, 0), Map("r" -> i.toString))))
      assert(w.count(c) == 50)
      val got = w.fetchByIds(c, Seq(s"$c-7"), wantVector = true,
        wantPayload = true)
      assert(got.size == 1 && got.head.id == s"$c-7")
      assert(h2.requestLog.toArray.map(_.toString).exists(_.startsWith(
        "/graft.v1.VectorService/Get")))
    } finally { h2.stop(); g.stop() }
  }

  test("flow control: multi-megabyte messages cross the 64 KB HTTP/2 windows both ways") {
    // a gRPC DATA payload far beyond the default 65535-byte stream and
    // connection windows — the transfer stalls unless consumed bytes
    // are acked (WINDOW_UPDATE) as the handlers read
    withServers { (m, h2, ep) =>
      val c = "mlv_h2_big"
      val w = MilvusWire(ep)
      w.create(c, 64, Metric.Cosine)
      val pts = (0 until 4000).map(i => WirePoint(s"$c-$i",
        (0 until 64).map(j => i * 0.001 + j), Map("r" -> ("x" * 50))))
      w.upsertOnce(c, pts) // ~3 MB request body
      assert(w.count(c) == 4000)
      val page = w.fetchPage(c, 0, 4000, wantVector = true,
        wantPayload = true) // ~3 MB response body
      assert(page.points.size == 4000)
      assert(page.points(1234).vector.size == 64)
    }
  }

  test("flow-control preface pins the MEASURED config: 4 MiB per-stream SETTINGS + codec-expanded connection window") {
    // r13b: the connection window is raised by Netty's Http2FrameCodec
    // ITSELF (tryExpandConnectionFlowControlWindow: 2× the SETTINGS
    // delta, eagerly advertised in WINDOW_UPDATE(0)) — NOT by the
    // stray explicit initialWindowSize call the r13 code carried
    // (a no-op: it only revisits active streams, and SETTINGS never
    // touches stream 0 per RFC 7540 §6.9.2). The self-review first
    // misread that no-op as "stream 0 still 64 KiB" and 'fixed' it by
    // force-sizing stream 0 to exactly 4 MiB — HALVING the
    // codec-expanded budget: the force-shrunk import leg never beat
    // 5.5 s across 7 interleaved rounds while the codec-sized config
    // dipped to 2.5-3.2 s the same hour. This pins the healthy preface:
    // SETTINGS advertises the 4 MiB per-stream window, and an eager
    // WINDOW_UPDATE(0) of at least 4 MiB follows it. If either assert
    // fires after a flow-control change, bring an interleaved A/B
    // (see the comment in GrpcH2StubServer).
    withServers { (_, h2, _) =>
      val Array(host, port) = h2.hostPort.split(":")
      val sock = new java.net.Socket(host, port.toInt)
      try {
        sock.setSoTimeout(2000)
        val out = sock.getOutputStream
        out.write("PRI * HTTP/2.0\r\n\r\nSM\r\n\r\n".getBytes("US-ASCII"))
        out.write(Array[Byte](0, 0, 0, 4, 0, 0, 0, 0, 0)) // empty SETTINGS
        out.flush()
        val in = new java.io.DataInputStream(sock.getInputStream)
        var streamWindow = -1L
        var increment = -1L
        var sawSettings = false
        var frames = 0
        var sawSettingsAck = false
        // read the whole server preface: SETTINGS ... SETTINGS-ack
        // bounds the scan (everything eager precedes the ack)
        while (!sawSettingsAck && frames < 8) {
          val hdr = new Array[Byte](9); in.readFully(hdr)
          val len = ((hdr(0) & 0xff) << 16) | ((hdr(1) & 0xff) << 8) |
            (hdr(2) & 0xff)
          val tpe = hdr(3) & 0xff
          val sid = ((hdr(5) & 0x7f) << 24) | ((hdr(6) & 0xff) << 16) |
            ((hdr(7) & 0xff) << 8) | (hdr(8) & 0xff)
          val body = new Array[Byte](len); in.readFully(body)
          if (tpe == 4 && (hdr(4) & 1) == 1) sawSettingsAck = true
          if (tpe == 4 && (hdr(4) & 1) == 0) {
            sawSettings = true
            // 6-byte settings entries: id(2) value(4); id 4 =
            // SETTINGS_INITIAL_WINDOW_SIZE (the per-stream half)
            var i = 0
            while (i + 6 <= len) {
              val id = ((body(i) & 0xff) << 8) | (body(i + 1) & 0xff)
              if (id == 4) streamWindow =
                ((body(i + 2) & 0x7f).toLong << 24) |
                  ((body(i + 3) & 0xff) << 16) |
                  ((body(i + 4) & 0xff) << 8) | (body(i + 5) & 0xff)
              i += 6
            }
          }
          if (tpe == 8 && sid == 0) {
            assert(sawSettings,
              "WINDOW_UPDATE(0) must FOLLOW the server SETTINGS")
            increment = ((body(0) & 0x7f).toLong << 24) |
              ((body(1) & 0xff) << 16) | ((body(2) & 0xff) << 8) |
              (body(3) & 0xff)
          }
          frames += 1
        }
        assert(streamWindow == 4L * 1024 * 1024,
          s"per-stream SETTINGS window $streamWindow — expected 4 MiB")
        assert(increment >= 4L * 1024 * 1024,
          s"eager connection WINDOW_UPDATE(0) increment $increment — " +
            "the codec expansion is missing or force-shrunk")
      } finally sock.close()
    }
  }

  test("dispatch runs OFF the IO event loop (r13: concurrent streams must not serialize behind a handler)") {
    // the r13 REST-vs-h2 A/B traced a consistent 2.4× import gap to
    // dispatch (decode+store) running on the connection's single netty
    // IO thread; this pins the executor offload by observing the
    // thread every dispatch runs on
    val threads = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
    val m = new MilvusStubServer()
    val h2 = new GrpcH2StubServer({ (path, auth, body) =>
      threads.add(Thread.currentThread().getName)
      m.dispatchH2(path, auth, body)
    })
    try {
      val w = MilvusWire(s"h2://${h2.hostPort}")
      val c = "mlv_h2_offload"
      w.create(c, 4, Metric.Cosine)
      val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
      try {
        val futs = (0 until 8).map { t =>
          pool.submit(new java.lang.Runnable {
            override def run(): Unit =
              w.upsertOnce(c, (0 until 500).map(i => WirePoint(
                s"$c-$t-$i", Seq(i.toDouble, 1, 2, 3), Map("k" -> "v"))))
          })
        }
        futs.foreach(_.get(60, java.util.concurrent.TimeUnit.SECONDS))
      } finally pool.shutdownNow()
      assert(w.count(c) == 8 * 500)
      assert(threads.asScala.forall(_.startsWith("graft-h2-stub-handler")),
        s"dispatch ran on: $threads — the IO loop would serialize streams")
    } finally { h2.stop(); m.stop() }
  }

  test("32 concurrent caller threads multiplex one connection without loss") {
    // the executor shape: every task thread fires RPCs at once; stream
    // creation and writes race on the one shared channel
    withServers { (m, h2, ep) =>
      val c = "mlv_h2_conc"
      val w = MilvusWire(ep)
      w.create(c, 3, Metric.Cosine)
      w.upsertOnce(c, (0 until 640).map(i =>
        WirePoint(f"$c-$i%04d", Seq(i.toDouble, 0, 0), Map.empty)))
      val pool = java.util.concurrent.Executors.newFixedThreadPool(32)
      try {
        val futs = (0 until 32).map { t =>
          pool.submit(new java.util.concurrent.Callable[Seq[String]] {
            override def call(): Seq[String] =
              (0 until 20).flatMap { r =>
                w.fetchPage(c, ((t * 20 + r) % 64) * 10, 10,
                  wantVector = false, wantPayload = false)
                  .points.map(_.id)
              }
          })
        }
        val ids = futs.flatMap(_.get(60, java.util.concurrent.TimeUnit.SECONDS))
        assert(ids.size == 32 * 20 * 10)
        assert(ids.toSet.size == 640) // every page slice correct
      } finally pool.shutdownNow()
    }
  }

  test("TLV fallback unchanged: the same dialect code drives both transports") {
    // identical calls, one stub — plain TCP endpoint vs h2:// endpoint
    withServers { (m, h2, ep) =>
      val c = "mlv_both"
      MilvusWire(ep).create(c, 3, Metric.Cosine)
      MilvusWire(ep).upsertOnce(c, (0 until 25).map(i =>
        WirePoint(s"$c-$i", Seq(i.toDouble, 0, 0), Map.empty)))
      // the TCP acceptor serves the SAME store through field-15 framing
      assert(MilvusWire(m.hostPort).count(c) == 25)
      val viaTcp = MilvusWire(m.hostPort)
        .fetchPage(c, 0, 25, wantVector = true, wantPayload = false)
      val viaH2 = MilvusWire(ep)
        .fetchPage(c, 0, 25, wantVector = true, wantPayload = false)
      assert(viaTcp.points.map(_.id) == viaH2.points.map(_.id))
      assert(viaTcp.points.map(_.vector) == viaH2.points.map(_.vector))
    }
  }

  test("a non-200 :status surfaces as WireHttpError with the HTTP code, not a frame-parse failure") {
    // an intermediary (LB, proxy) answering 503 with an HTML body and
    // no grpc-status — the client must fail at the transport layer
    val h2 = new GrpcH2StubServer((path, _, body) =>
      if (path.endsWith("/Boom"))
        throw GrpcH2StubServer.NonGrpcResponse(503, "text/html",
          "<html>service unavailable</html>".getBytes("UTF-8"))
      else GrpcH2.frame(GrpcH2.unframe(body)))
    try {
      val e = intercept[WireHttpError] {
        GrpcH2Client.call(h2.hostPort, "/x.Y/Boom",
          GrpcH2.frame(Array[Byte](1, 2, 3)))
      }
      assert(e.code == 503)
      // the guard is surgical: a proper gRPC call on the same channel
      // still round-trips
      val ok = GrpcH2Client.call(h2.hostPort, "/x.Y/Echo",
        GrpcH2.frame(Array[Byte](9, 8)))
      assert(GrpcH2.unframe(ok).toSeq == Seq[Byte](9, 8))
    } finally h2.stop()
  }

  test("a 200 response without application/grpc content-type is a transport error") {
    val h2 = new GrpcH2StubServer((_, _, _) =>
      throw GrpcH2StubServer.NonGrpcResponse(200, "text/plain",
        "not grpc".getBytes("UTF-8")))
    try {
      val e = intercept[WireHttpError] {
        GrpcH2Client.call(h2.hostPort, "/x.Y/Z", GrpcH2.frame(Array[Byte](1)))
      }
      assert(e.body.contains("text/plain"))
    } finally h2.stop()
  }

  test("flipping the truststore knobs redials h2s and closes the stale channel") {
    val tmp = java.nio.file.Files.createTempDirectory("h2sflip")
    val km = WireTls.generate(tmp)
    System.setProperty("graft.wire.truststore", km.trustStore.toString)
    System.setProperty("graft.wire.truststorePass", km.password)
    try {
      val m = new MilvusStubServer()
      val h2 = new GrpcH2StubServer(m.dispatchH2, tls = Some(km))
      try {
        val w = MilvusWire(s"h2s://${h2.hostPort}")
        w.create("flip", 3, Metric.Cosine)
        val d0 = GrpcH2Client.dials.get()
        assert(w.count("flip") == 0) // reuses the cached channel
        assert(GrpcH2Client.dials.get() == d0)
        val oldKey = GrpcH2Client.conns.keySet().stream()
          .filter(_.startsWith(s"tls:${h2.hostPort}|")).findFirst().get()
        val oldCh = GrpcH2Client.conns.get(oldKey)
        // same trust CONTENT at a different path: the TLS context was
        // captured at dial time, so the cache key must change
        val ts2 = tmp.resolve("copy-truststore.p12")
        java.nio.file.Files.copy(
          java.nio.file.Paths.get(km.trustStore.toString), ts2)
        System.setProperty("graft.wire.truststore", ts2.toString)
        assert(w.count("flip") == 0) // still served — via a FRESH dial
        assert(GrpcH2Client.dials.get() == d0 + 1)
        // and the superseded channel was closed, not leaked
        assert(oldCh.closeFuture().await(5000))
        assert(!oldCh.isActive)
      } finally { h2.stop(); m.stop() }
    } finally {
      System.clearProperty("graft.wire.truststore")
      System.clearProperty("graft.wire.truststorePass")
    }
  }
}
