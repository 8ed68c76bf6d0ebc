package graft.connectors

import graft.SparkSpec
import graft.connectors.wire._
import graft.core.Metric
import org.apache.spark.sql.Row

import scala.jdk.CollectionConverters._

/** TLS on the wire clients (round-10 ask #4): the same dialects, auth,
  * and CLI migration paths the plain-HTTP specs freeze, exercised over
  * an in-process HTTPS stub with a TEST-TIME self-signed cert
  * (`WireTls.testMaterial` — nothing committed). Clients reach it via
  * the trust-store knob (`graft.wire.truststore`), the private-CA
  * deployment shape; an unconfigured client must REFUSE the cert
  * (hostname/trust verification really runs). */
class WireTlsSpec extends SparkSpec {

  private var server: WireStubServer = _

  override def beforeAll(): Unit = {
    super.beforeAll()
    server = new WireStubServer(tls = true)
    val m = WireTls.testMaterial
    System.setProperty("graft.wire.truststore", m.trustStore.toString)
    System.setProperty("graft.wire.truststorePass", m.password)
  }

  override def afterAll(): Unit = {
    System.clearProperty("graft.wire.truststore")
    System.clearProperty("graft.wire.truststorePass")
    if (server != null) server.stop()
    super.afterAll()
  }

  private def points(n: Int, prefix: String) = {
    val rows = (0 until n).map { i =>
      Row(s"$prefix-$i", Seq(i.toDouble, 0.5, 1.0),
        Map("lang" -> s"l${i % 3}"))
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toSeq, 2), WireVdb.Schema)
  }

  private def asIds(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(_.getString(0)).toSet

  test("the stub really speaks TLS: an untrusted client is refused") {
    assert(server.url.startsWith("https://"), server.url)
    // drop the knob → platform trust roots → self-signed cert refused
    val saved = System.getProperty("graft.wire.truststore")
    System.setProperty("graft.wire.truststore", "")
    try intercept[java.io.IOException] {
      QdrantWire(server.url).count("nope")
    } finally System.setProperty("graft.wire.truststore", saved)
  }

  test("offset-REST family over TLS: DSv2 round-trip with the auth header on every request") {
    val c = "tls_qdrant"
    val d = QdrantWire(server.url, apiKey = Some("tls-secret"))
    d.create(c, 3, Metric.Euclid)
    server.authLog.clear()
    val df = points(120, c)
    WireVdb.write(df, "qdrant", server.url, c, batchSize = 50,
      apiKey = Some("tls-secret"))
    val back = WireVdb.read(spark, "qdrant", server.url, c, batchSize = 40,
      apiKey = Some("tls-secret"))
    assert(asIds(back) == asIds(df))
    val reqs = server.authLog.asScala.toSeq.filter(_.contains("/collections/"))
    // HTTP header names are case-insensitive; the stub logs the
    // canonical spelling
    assert(reqs.nonEmpty &&
      reqs.forall(_.toLowerCase.contains("api-key=tls-secret")),
      reqs.mkString("\n"))
    // metric read-back works over TLS too
    assert(d.metricOf(c).contains(Metric.Euclid))
  }

  test("cursor family over TLS: turbopuffer paged scan + shrink-on-fault write") {
    val c = "tls_tpuf"
    val w = TurbopufferWire(server.url, apiKey = Some("tpuf-secret"))
    server.failNextWrites(1, 429)
    w.write(points(90, c).repartition(1), c, batchSize = 90)
    val back = w.scan(spark, c, limit = 25, includeVectors = true)
    assert(back.count() == 90)
    // the 429 shrank the first batch ×2/3 — fault handling is
    // transport-independent
    val sizes = server.requestLog.asScala.toSeq
      .filter(_.contains(s"/v1/vectors/$c "))
      .flatMap("n=([0-9]+)".r.findFirstMatchIn(_)).map(_.group(1).toInt)
    assert(sizes.take(2) == Seq(90, 60), sizes.mkString(","))
  }

  test("CLI migration over TLS: qdrant → VDF → pinecone") {
    val src = "tls_mig"
    val d = QdrantWire(server.url)
    d.create(src, 3, Metric.Dot)
    WireVdb.write(points(80, src), "qdrant", server.url, src, batchSize = 80)
    val tmp = java.nio.file.Files.createTempDirectory("tls_mig").toFile
    val vdf = new java.io.File(tmp, "vdf").getAbsolutePath
    assert(graft.cli.Cli.run(spark, Seq("export", "--db", "qdrant",
      "--db_root", server.url, "--collections", src, "--out", vdf)) == 0)
    assert(graft.core.VdfMeta.read(vdf).indexes.values.flatten
      .exists(_.metric.contains("Dot")))
    assert(graft.cli.Cli.run(spark, Seq("import", "--db", "pinecone",
      "--db_root", server.url, "--dir", vdf)) == 0)
    val back = WireVdb.read(spark, "pinecone", server.url, src)
    assert(back.count() == 80)
  }
}
