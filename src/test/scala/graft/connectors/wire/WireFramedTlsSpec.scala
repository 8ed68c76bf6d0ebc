package graft.connectors.wire

import graft.SparkSpec
import graft.core.Metric
import org.scalatest.BeforeAndAfterAll

/** Round-11 ask #4: TLS for the FRAMED binary transports. Round 10
  * closed TLS for every HTTP dialect; GrpcWire/MilvusWire still rode
  * plain TCP while real gRPC endpoints are TLS-by-default. A
  * `tls://host:port` endpoint now wraps the channel pool's sockets in
  * SSL (same test-time-generated certs, same truststore knob, real
  * endpoint identification), and keep-alive reuse must SURVIVE the
  * wrap — a TLS handshake per page would be strictly worse than the
  * plain-TCP socket-per-page the pool exists to avoid. */
class WireFramedTlsSpec extends SparkSpec with BeforeAndAfterAll {

  private var km: WireTls.KeyMaterial = _

  override def beforeAll(): Unit = {
    super.beforeAll()
    km = WireTls.generate(java.nio.file.Files.createTempDirectory("ftls"))
    System.setProperty("graft.wire.truststore", km.trustStore.toString)
    System.setProperty("graft.wire.truststorePass", km.password)
  }

  override def afterAll(): Unit = {
    System.clearProperty("graft.wire.truststore")
    System.clearProperty("graft.wire.truststorePass")
    super.afterAll()
  }

  test("Milvus framed dialect over TLS: multi-page DSv2 scan, keep-alive survives the wrap") {
    val m = new MilvusStubServer(tls = Some(km))
    try {
      assert(m.hostPort.startsWith("tls://"))
      val c = "mlv_tls"
      val w = MilvusWire(m.hostPort)
      w.create(c, 3, Metric.Cosine)
      w.upsertOnce(c, (0 until 300).map(i =>
        WirePoint(s"$c-$i", Seq(i.toDouble, 0, 0), Map("r" -> i.toString))))
      val d0 = FramedChannelPool.dials.get()
      val back = WireVdb.read(spark, "milvus", m.hostPort, c, batchSize = 10)
      assert(back.count() == 300)
      val dials = FramedChannelPool.dials.get() - d0
      // ≥30 pages rode ≤ #task-thread TLS channels — reuse, not a
      // handshake per page
      assert(dials <= 8, s"$dials fresh TLS dials for a 30-page scan")
    } finally m.stop()
  }

  test("GrpcWire over TLS: create/count/page round trip") {
    val g = new GrpcStubServer(tls = Some(km))
    try {
      val c = "grpc_tls"
      val w = GrpcWire(g.hostPort, token = Some("tok"))
      w.create(c, 3, Metric.Cosine)
      w.upsertOnce(c, (0 until 40).map(i =>
        WirePoint(s"$c-$i", Seq(i.toDouble, 0, 0), Map.empty)))
      assert(w.count(c) == 40)
      val page = w.fetchPage(c, 0, 15, wantVector = true, wantPayload = false)
      assert(page.points.size == 15)
    } finally g.stop()
  }

  test("a client without the trust bundle is refused at the handshake") {
    val m = new MilvusStubServer(tls = Some(km))
    try {
      val saved = System.getProperty("graft.wire.truststore")
      System.setProperty("graft.wire.truststore", "")
      try {
        // platform roots don't trust the test CA: the handshake (or
        // the server's alert-close) must surface as an IO failure —
        // never a silent plaintext fallback
        intercept[java.io.IOException] {
          MilvusWire(m.hostPort).count("nope")
        }
      } finally System.setProperty("graft.wire.truststore", saved)
    } finally m.stop()
  }

  test("plain endpoints are untouched: no scheme, no TLS") {
    val m = new MilvusStubServer()
    try {
      assert(!m.hostPort.startsWith("tls://"))
      val w = MilvusWire(m.hostPort)
      w.create("plain_c", 3, Metric.Cosine)
      assert(w.count("plain_c") == 0)
    } finally m.stop()
  }
}
