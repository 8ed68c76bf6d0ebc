package graft.connectors

import graft.SparkSpec
import graft.connectors.wire._
import graft.core.Metric
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions.col

import scala.jdk.CollectionConverters._

/** The last three reference connectors on the wire (round 9): LanceDB
  * Cloud REST, KDB.AI's query API, and Vertex AI Vector Search's
  * findNeighbors/readIndexDatapoints composition — real localhost HTTP
  * against the stub, asserting each dialect's paging/pruning shape,
  * the shrink-on-fault write policy, metric round-trips, the auth
  * header on every request, and a CLI migration through VDF. */
class WireClients2Spec extends SparkSpec {

  private var server: WireStubServer = _

  override def beforeAll(): Unit = {
    super.beforeAll()
    server = new WireStubServer
  }

  override def afterAll(): Unit = {
    if (server != null) server.stop()
    super.afterAll()
  }

  private def points(n: Int, prefix: String) = {
    val rows = (0 until n).map { i =>
      Row(s"$prefix-$i", Seq(i.toDouble, 0.5, 1.0),
        Map("lang" -> s"l${i % 3}", "rank" -> i.toString))
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toSeq, 2), WireVdb.Schema)
  }

  private def asPoints(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getString(0),
      Option(r.getSeq[Double](1)).getOrElse(Seq.empty),
      Option(r.getMap[String, String](2)).map(_.toMap).getOrElse(Map.empty)))
      .toSet

  // ---------------------------------------------------------- LanceDB

  test("lancedb: DSv2 round-trip; query pages carry offset+limit") {
    val c = "ldb_rt"
    LanceDbWire(server.url).create(c, 3, Metric.Euclid)
    val df = points(500, c)
    WireVdb.write(df, "lancedb", server.url, c, batchSize = 200)
    server.requestLog.clear()
    val back = WireVdb.read(spark, "lancedb", server.url, c, batchSize = 150)
    assert(asPoints(back) == asPoints(df))
    val pages = server.requestLog.asScala.toSeq
      .filter(_.startsWith(s"POST /v1/table/$c/query"))
    // 500 rows / 150-row pages = 3 full pages + the 50-row remainder
    assert(pages.size == 4 &&
      pages.count(_.contains("limit=150")) == 3, pages.mkString("\n"))
    // metric round-trips through the index listing (created L2 /
    // Euclid; lancedb names through the bimap)
    assert(LanceDbWire(server.url).metricOf(c).contains(Metric.Euclid))
  }

  test("lancedb: the columns allowlist is the pruning surface") {
    val c = "ldb_prune"
    val w = LanceDbWire(server.url)
    w.create(c, 3, Metric.Cosine)
    w.upsertOnce(c, (0 until 40).map(i =>
      WirePoint(s"$c-$i", Seq(i.toDouble, 0, 0), Map("rank" -> i.toString))))
    server.requestLog.clear()
    // id-only page: columns=["id"], no vector bytes requested
    val page = w.fetchPage(c, 0, 25, wantVector = false, wantPayload = false)
    assert(page.points.size == 25 && page.points.forall(_.vector.isEmpty))
    val q = server.requestLog.asScala.toSeq.filter(_.contains("/query"))
    assert(q.exists(_.contains("columns=id ")) ||
      q.exists(_.contains("columns=id")), q.mkString("\n"))
    // payload-without-vector goes through describe for the inventory
    server.requestLog.clear()
    val p2 = w.fetchPage(c, 0, 10, wantVector = false, wantPayload = true)
    assert(p2.points.forall(p => p.vector.isEmpty && p.payload.nonEmpty))
    val log2 = server.requestLog.asScala.toSeq
    assert(log2.exists(_.contains("/describe")), log2.mkString("\n"))
    assert(log2.exists(l => l.contains("/query") && !l.contains("vector")),
      log2.mkString("\n"))
  }

  test("lancedb: merge_insert is last-wins; 413 shrinks the batch") {
    val c = "ldb_merge"
    val w = LanceDbWire(server.url)
    w.create(c, 3, Metric.Cosine)
    w.upsertOnce(c, Seq(WirePoint("a", Seq(1, 0, 0), Map("v" -> "old"))))
    w.upsertOnce(c, Seq(WirePoint("a", Seq(2, 0, 0), Map("v" -> "new"))))
    assert(w.count(c) == 1)
    assert(w.fetchByIds(c, Seq("a"), wantVector = true, wantPayload = true)
      .head.payload("v") == "new")
    // oversized batches shrink ×2/3 in the writer, not the dialect
    server.maxUpsertBatch = 120
    try {
      WireVdb.write(points(300, c), "lancedb", server.url, c, batchSize = 300)
      val sizes = server.requestLog.asScala.toSeq
        .filter(_.startsWith(s"POST /v1/table/$c/merge_insert"))
        .map(_.split(" n=")(1).toInt)
      assert(sizes.exists(_ > 120) && sizes.filter(_ <= 120).sum >= 300,
        sizes.mkString(","))
    } finally server.maxUpsertBatch = Int.MaxValue
  }

  test("lancedb: the data plane is Arrow IPC — query responses and merge-insert bodies") {
    val c = "ldb_arrow"
    val w = LanceDbWire(server.url)
    w.create(c, 3, Metric.Cosine)
    server.requestLog.clear()
    w.upsertOnce(c, (0 until 25).map(i =>
      WirePoint(s"$c-$i", Seq(i.toDouble, 0.5, -1.0),
        Map("lang" -> s"l${i % 2}", "rank" -> i.toString))))
    // the write body crossed the wire as an Arrow stream
    val merges = server.requestLog.asScala.toSeq
      .filter(_.contains(s"/v1/table/$c/merge_insert"))
    assert(merges.nonEmpty && merges.forall(_.contains("framing=arrow")),
      merges.mkString("\n"))
    // the read path round-trips every field through record batches,
    // including a pruned schema (no vector column at all)
    val full = w.fetchPage(c, 0, 25, wantVector = true, wantPayload = true)
    assert(full.points.size == 25)
    assert(full.points.forall(p => p.vector.size == 3 &&
      p.payload.keySet == Set("lang", "rank")))
    val pruned = w.fetchPage(c, 0, 25, wantVector = false,
      wantPayload = false)
    assert(pruned.points.forall(p =>
      p.vector.isEmpty && p.payload.isEmpty))
    // codec symmetry on the exact wire schema, empty-batch included
    val pts = Seq(
      WirePoint("a", Seq(1.5, -2.25), Map("k" -> "v")),
      WirePoint("b", Seq.empty, Map.empty))
    assert(WireArrow.decodePoints(WireArrow.encodePoints(pts)) == pts)
    assert(WireArrow.decodePoints(WireArrow.encodePoints(Seq.empty)).isEmpty)
    val noVec = WireArrow.decodePoints(
      WireArrow.encodePoints(pts, includeVector = false))
    assert(noVec.forall(_.vector.isEmpty))
  }

  // ----------------------------------------------------------- KDB.AI

  test("kdbai: round-trip, aggs count, q-style in-filter retrieve") {
    val c = "kdb_rt"
    val w = KdbaiWire(server.url)
    w.create(c, 3, Metric.Cosine)
    val df = points(260, c)
    WireVdb.write(df, "kdbai", server.url, c, batchSize = 100)
    assert(w.count(c) == 260)
    val back = WireVdb.read(spark, "kdbai", server.url, c, batchSize = 90)
    assert(asPoints(back) == asPoints(df))
    // targeted retrieve lands as the [["in","id",[…]]] filter
    server.requestLog.clear()
    val got = w.fetchByIds(c, Seq(s"$c-3", s"$c-7", "missing"),
      wantVector = true, wantPayload = true)
    assert(got.map(_.id).toSet == Set(s"$c-3", s"$c-7"))
    assert(server.requestLog.asScala.exists(_.contains("filter=in n=3")))
    // metric round-trips CS → Cosine through the kdbai bimap
    assert(w.metricOf(c).contains(Metric.Cosine))
  }

  test("kdbai: no wire projection — pruning is client-side") {
    val c = "kdb_prune"
    val w = KdbaiWire(server.url)
    w.create(c, 3, Metric.Euclid)
    w.upsertOnce(c, (0 until 20).map(i =>
      WirePoint(s"$c-$i", Seq(i.toDouble, 0, 0), Map("rank" -> i.toString))))
    val page = w.fetchPage(c, 0, 20, wantVector = false, wantPayload = false)
    // the engine-facing contract still holds: no vector/payload enters
    // Spark even though the query API has no projection param
    assert(page.points.size == 20)
    assert(page.points.forall(p => p.vector.isEmpty && p.payload.isEmpty))
  }

  // -------------------------------------------------------- Vertex AI

  test("vertex: one findNeighbors listing + sharded readIndexDatapoints") {
    val c = "vtx_rt"
    val w = VertexWire(server.url, endpointId = "default")
    val df = points(300, c)
    // seed via the write path (upsertDatapoints batches)
    w.write(df, c, batchSize = 100)
    val (total, dims) = w.indexStats(c)
    assert(total == 300 && dims == 3)
    server.requestLog.clear()
    val back = w.scan(spark, c, deployedIndexId = c, batchSize = 60,
      parallelism = 4)
    assert(asPoints(back) == asPoints(df))
    val log = server.requestLog.asScala.toSeq
    // exactly ONE listing call (the reference's single find_neighbors),
    // hydration in readIndexDatapoints batches of ≤60
    assert(log.count(_.contains(":findNeighbors")) == 1, log.mkString("\n"))
    val reads = log.filter(_.contains(":readIndexDatapoints"))
    assert(reads.size >= 5 &&
      reads.forall(_.split("n=")(1).toInt <= 60), reads.mkString("\n"))
  }

  test("vertex: restricts carry the payload; faults shrink the batch") {
    val c = "vtx_faults"
    val w = VertexWire(server.url, endpointId = "default")
    server.failNextWrites(2, 429)
    // one partition so the first wire batch is the full 200
    w.write(points(200, c).repartition(1), c, batchSize = 200)
    val back = w.readDatapoints(c, Seq(s"$c-5"))
    assert(back.head.payload == Map("lang" -> "l2", "rank" -> "5"))
    val sizes = server.requestLog.asScala.toSeq
      .filter(_.contains(s":upsertDatapoints"))
      .map(_.split(" n=")(1).toInt)
    // two 429s → two ×2/3 shrinks before progress
    assert(sizes.take(3) == Seq(200, 133, 88), sizes.mkString(","))
    // DOT_PRODUCT_DISTANCE default standardizes to Dot
    assert(w.metricOf(c).contains(Metric.Dot))
  }

  // ---------------------------------------------------- auth + CLI

  test("auth: lancedb x-api-key and kdbai X-Api-Key ride every request") {
    val c = "auth2"
    server.authLog.clear()
    val ldb = LanceDbWire(server.url, apiKey = Some("ldb-secret"))
    ldb.create(c, 3, Metric.Cosine)
    ldb.upsertOnce(c, Seq(WirePoint("a", Seq(1, 0, 0), Map.empty)))
    ldb.fetchPage(c, 0, 10, wantVector = true, wantPayload = true)
    val ldbReqs = server.authLog.asScala.toSeq.filter(_.contains("/v1/table/"))
    assert(ldbReqs.nonEmpty &&
      ldbReqs.forall(_.contains("x-api-key=ldb-secret")), ldbReqs.mkString("\n"))

    server.authLog.clear()
    val kdb = KdbaiWire(server.url, apiKey = Some("kdb-secret"))
    kdb.create(s"$c-k", 3, Metric.Cosine)
    kdb.upsertOnce(s"$c-k", Seq(WirePoint("a", Seq(1, 0, 0), Map.empty)))
    kdb.count(s"$c-k")
    val kdbReqs = server.authLog.asScala.toSeq.filter(_.contains("/api/v1/"))
    // the stub's header probe is case-insensitive (HTTP semantics)
    assert(kdbReqs.nonEmpty &&
      kdbReqs.forall(_.contains("=kdb-secret")), kdbReqs.mkString("\n"))
  }

  test("cli: lancedb → VDF → vertex migration carries rows and metric") {
    val src = "mig_ldb"
    val w = LanceDbWire(server.url)
    w.create(src, 3, Metric.Dot)
    val df = points(120, src)
    WireVdb.write(df, "lancedb", server.url, src, batchSize = 120)

    val tmp = java.nio.file.Files.createTempDirectory("wire2_mig").toFile
    val vdf = new java.io.File(tmp, "vdf").getAbsolutePath
    assert(graft.cli.Cli.run(spark, Seq("export", "--db", "lancedb",
      "--db_root", server.url, "--collections", src, "--out", vdf)) == 0)
    // the exported manifest recorded the READ metric (standard name
    // "Dot"), not a hardcoded Cosine — the r8 ADVICE fix covering the
    // new dialects
    val meta = graft.core.VdfMeta.read(vdf)
    assert(meta.indexes.values.flatten.exists(_.metric.contains("Dot")),
      meta.indexes.toString)

    assert(graft.cli.Cli.run(spark, Seq("import", "--db", "vertex",
      "--db_root", server.url, "--dir", vdf)) == 0)
    val back = VertexWire(server.url, "default")
      .scan(spark, src, deployedIndexId = src)
    assert(back.count() == 120)
    assert(asPoints(back).map(_._1) == asPoints(df).map(_._1))
  }
}
