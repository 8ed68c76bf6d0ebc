package graft.tools

import org.apache.spark.sql.SparkSession

import graft.connectors.UpsertPolicy
import graft.connectors.wire._

/** End-to-end WIRE-PATH throughput bench (round-12 ask #7): the
  * reference's flagship use case — migrate a collection between vector
  * DBs — timed leg by leg over real wire traffic against the in-process
  * stub servers:
  *
  *   leg 0  spark → qdrant (REST, DSv2 write, shrink-capable batches)
  *   leg 1  qdrant → VDF   (CLI export: REST scroll pages → parquet+manifest)
  *   leg 2  VDF → milvus   (CLI import over REAL gRPC-over-HTTP/2, h2://)
  *
  * Reports rows/s per leg, scroll pages, h2 RPC/connection counts,
  * fresh dials (must stay ~1 per endpoint — the gRPC channel model),
  * and shrink events (0 on a healthy run; a faulted mini-leg at the end
  * proves the counter observes injected 429s). Every byte crosses a
  * real localhost socket — JSON/REST one way, HTTP/2 frames the other —
  * so the number is a transport+client cost, not a Spark-only figure.
  *
  * Usage: SPARK_DRIVER_MEM=48g tools/run_main.sh
  *   graft.tools.WireMigrationBench [rows] [dim] [batchSize]
  */
object WireMigrationBench {
  def main(args: Array[String]): Unit = {
    val n = args.lift(0).map(_.toInt).getOrElse(1000000)
    val dim = args.lift(1).map(_.toInt).getOrElse(64)
    val batch = args.lift(2).map(_.toInt).getOrElse(
      graft.core.Constants.DefaultBatchSize)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import scala.jdk.CollectionConverters._

    val http = new WireStubServer
    val mh2 = new MilvusStubServer()
    val h2 = new GrpcH2StubServer(mh2.dispatchH2)
    val c = "migbench"
    try {
      // deterministic corpus: n ids, dim-d vectors, 2 payload fields
      val df = spark.range(0, n.toLong, 1, 32).selectExpr(
        "concat('doc-', id) AS id",
        s"transform(sequence(0, ${dim - 1}), " +
          "j -> CAST((id % 97) + j AS DOUBLE) / 100.0) AS vector",
        "map('lang', concat('l', CAST(id % 3 AS STRING)), " +
          "'rank', CAST(id AS STRING)) AS payload")

      def leg(name: String)(body: => Unit): Unit = {
        val s0 = UpsertPolicy.shrinkEvents.get()
        val d0 = GrpcH2Client.dials.get()
        val t0 = System.nanoTime()
        body
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"LEG $name%-26s ${dt}%8.2f s  ${n / dt}%11.0f rows/s  " +
          s"shrinks=${UpsertPolicy.shrinkEvents.get() - s0}  " +
          s"h2_dials=${GrpcH2Client.dials.get() - d0}")
      }

      println(s"# rows=$n dim=$dim batch=$batch")
      WireDialect("qdrant", http.url).create(c, dim)
      leg("seed spark->qdrant REST") {
        WireVdb.write(df, "qdrant", http.url, c, batchSize = batch)
      }
      require(http.collectionSize(c) == n,
        s"qdrant store has ${http.collectionSize(c)}")

      val vdf = java.nio.file.Files.createTempDirectory("migbench_vdf")
        .toString
      http.requestLog.clear()
      leg("export qdrant REST->VDF") {
        require(graft.cli.Cli.run(spark, Seq("export", "--db", "qdrant",
          "--db_root", http.url, "--collections", c,
          "--batch_size", batch.toString, "--out", vdf)) == 0)
      }
      val pages = http.requestLog.asScala.count(_.contains("/points/scroll"))
      def walk(f: java.io.File): Long =
        if (f.isDirectory)
          Option(f.listFiles()).map(_.map(walk).sum).getOrElse(0L)
        else f.length
      println(f"  scroll pages=$pages  vdf_bytes=${walk(new java.io.File(vdf))}%,d")

      h2.requestLog.clear()
      leg("import VDF->milvus gRPC/h2") {
        require(graft.cli.Cli.run(spark, Seq("import", "--db", "milvus",
          "--db_root", s"h2://${h2.hostPort}",
          "--batch_size", batch.toString, "--dir", vdf)) == 0)
      }
      val rpcs = h2.requestLog.size()
      val upserts = h2.requestLog.asScala.count(
        _.startsWith("/milvus.proto.milvus.MilvusService/Upsert"))
      println(s"  h2 RPCs=$rpcs (upserts=$upserts) " +
        s"connections=${h2.connections.get()}")
      require(mh2.collectionSize(c) == n,
        s"milvus side has ${mh2.collectionSize(c)} of $n")

      // faulted mini-leg: injected 429s on the next writes — the
      // shrink counter must observe the ×2/3 re-splits (the healthy
      // legs above must have reported 0)
      http.failNextWrites(3, 429)
      val s0 = UpsertPolicy.shrinkEvents.get()
      WireVdb.write(df.limit(3 * batch), "qdrant", http.url, c,
        batchSize = batch)
      println(s"FAULTED mini-leg (3x injected 429): " +
        s"shrinks=${UpsertPolicy.shrinkEvents.get() - s0}")
    } finally {
      h2.stop(); mh2.stop(); http.stop(); spark.stop()
    }
  }
}
