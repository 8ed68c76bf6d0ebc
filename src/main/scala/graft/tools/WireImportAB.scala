package graft.tools

import org.apache.spark.sql.SparkSession

import graft.connectors.wire._

/** Interleaved REST-vs-gRPC/h2 import A/B (round-13 ask #4): the r12
  * wire bench's h2 import leg spanned 37.8–90.5k rows/s across two
  * windows and the artifact attributed the spread to host variance
  * WITHOUT the interleaved-minima treatment every other cross-window
  * claim in this repo gets. This tool settles it: one seeded corpus is
  * exported to VDF once, then the REST import (VDF → qdrant dialect,
  * JSON bodies) and the h2 import (VDF → milvus dialect, protobuf over
  * real HTTP/2 frames) run in ALTERNATING windows at the SAME batch
  * size — contention bursts hit both transports in the same window, so
  * the per-arm minimum is the transport cost, not the weather. If h2
  * is still materially slower at the minima, the suspect is the
  * per-row protobuf Struct assembly in MilvusWire.
  *
  * Usage: SPARK_DRIVER_MEM=48g tools/run_main.sh
  *   graft.tools.WireImportAB [rows] [dim] [batchSize] [rounds]
  */
object WireImportAB {
  def main(args: Array[String]): Unit = {
    val n = args.lift(0).map(_.toInt).getOrElse(1000000)
    val dim = args.lift(1).map(_.toInt).getOrElse(64)
    val batch = args.lift(2).map(_.toInt).getOrElse(
      graft.core.Constants.DefaultBatchSize)
    val rounds = args.lift(3).map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val http = new WireStubServer
    val mh2 = new MilvusStubServer()
    val h2 = new GrpcH2StubServer(mh2.dispatchH2)
    val c = "abbench"
    try {
      val df = spark.range(0, n.toLong, 1, 32).selectExpr(
        "concat('doc-', id) AS id",
        s"transform(sequence(0, ${dim - 1}), " +
          "j -> CAST((id % 97) + j AS DOUBLE) / 100.0) AS vector",
        "map('lang', concat('l', CAST(id % 3 AS STRING)), " +
          "'rank', CAST(id AS STRING)) AS payload")
      println(s"# rows=$n dim=$dim batch=$batch rounds=$rounds (alternating)")
      WireDialect("qdrant", http.url).create(c, dim)
      WireVdb.write(df, "qdrant", http.url, c, batchSize = batch)
      val vdf = java.nio.file.Files.createTempDirectory("abbench_vdf").toString
      require(graft.cli.Cli.run(spark, Seq("export", "--db", "qdrant",
        "--db_root", http.url, "--collections", c,
        "--batch_size", batch.toString, "--out", vdf)) == 0)

      def restImport(): Unit =
        require(graft.cli.Cli.run(spark, Seq("import", "--db", "qdrant",
          "--db_root", http.url, "--batch_size", batch.toString,
          "--dir", vdf)) == 0)
      def h2Import(): Unit =
        require(graft.cli.Cli.run(spark, Seq("import", "--db", "milvus",
          "--db_root", s"h2://${h2.hostPort}",
          "--batch_size", batch.toString, "--dir", vdf)) == 0)

      // warm both arms (plan compile, channel dial, stub JIT)
      restImport(); h2Import()
      require(mh2.collectionSize(c) == n)
      var bestRest = Double.MaxValue
      var bestH2 = Double.MaxValue
      for (r <- 1 to rounds) {
        val t0 = System.nanoTime()
        restImport()
        val wr = (System.nanoTime() - t0) / 1e9
        bestRest = math.min(bestRest, wr)
        val t1 = System.nanoTime()
        h2Import()
        val wh = (System.nanoTime() - t1) / 1e9
        bestH2 = math.min(bestH2, wh)
        println(f"round $r  rest=$wr%7.2fs (${n / wr}%9.0f rows/s)  " +
          f"h2=$wh%7.2fs (${n / wh}%9.0f rows/s)")
      }
      println(f"== minima: rest ${n / bestRest}%9.0f rows/s  " +
        f"h2 ${n / bestH2}%9.0f rows/s  (h2/rest wall ratio " +
        f"${bestH2 / bestRest}%5.2f)")
    } finally {
      h2.stop(); mh2.stop(); http.stop(); spark.stop()
    }
  }
}
