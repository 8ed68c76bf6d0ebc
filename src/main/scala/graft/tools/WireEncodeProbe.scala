package graft.tools

import graft.connectors.wire._

/** Micro-profile for the h2-vs-REST import gap (round-13 ask #4): time
  * the CLIENT-side protobuf point encoding and the SERVER-side decode
  * in isolation, against the same corpus shape the A/B bench ships —
  * separates "per-row assembly cost" (MilvusWire/GrpcWire encoding)
  * from transport/concurrency effects (connection count, event-loop
  * serialization).
  *
  * Usage: tools/run_main.sh graft.tools.WireEncodeProbe [rows] [dim] [batch]
  */
object WireEncodeProbe {
  def main(args: Array[String]): Unit = {
    val n = args.lift(0).map(_.toInt).getOrElse(200000)
    val dim = args.lift(1).map(_.toInt).getOrElse(64)
    val batch = args.lift(2).map(_.toInt).getOrElse(10000)
    val pts = (0 until n).map { i =>
      WirePoint(s"doc-$i",
        (0 until dim).map(j => ((i % 97) + j) / 100.0),
        Map("lang" -> s"l${i % 3}", "rank" -> i.toString))
    }
    def time[A](label: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"$label%-28s $dt%7.3f s  ${n / dt}%11.0f rows/s")
      r
    }
    // warm JIT
    pts.take(batch).grouped(batch).foreach { b =>
      GrpcFraming.message { o => b.foreach(p =>
        GrpcFraming.writePoint(o, p, withVector = true, withPayload = true)) }
    }
    for (round <- 1 to 3) {
      println(s"-- round $round")
      val encoded = time("encode (writePoint batches)") {
        pts.grouped(batch).map { b =>
          GrpcFraming.message { o =>
            GrpcFraming.writeStringField(o, 2, "c")
            b.foreach(p =>
              GrpcFraming.writePoint(o, p, withVector = true, withPayload = true))
          }
        }.toVector
      }
      println(f"   encoded bytes=${encoded.map(_.length.toLong).sum}%,d " +
        f"batches=${encoded.size}")
      time("decode (readMessage+readPoint)") {
        encoded.foreach { m =>
          GrpcFraming.readMessage(m).getOrElse(1, Seq.empty)
            .foreach(b => GrpcFraming.readPoint(b.asInstanceOf[Array[Byte]]))
        }
      }
      // the REST leg's equivalent serialization for comparison
      time("json encode (jackson map)") {
        pts.grouped(batch).foreach { b =>
          WireJson.write(Map("points" -> b.map(p => Map(
            "id" -> p.id, "vector" -> p.vector, "payload" -> p.payload))))
        }
      }
    }
  }
}
