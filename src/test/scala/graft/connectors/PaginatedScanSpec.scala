package graft.connectors

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

object PaginatedScanSpec {
  /** JVM-global flip so the task closure (local mode: same JVM) can
    * fail exactly one batch without capturing the spec instance. */
  val failOnce = new java.util.concurrent.atomic.AtomicBoolean(true)
}

class PaginatedScanSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("id", StringType), StructField("v", IntegerType)))

  // a fake "vector DB": 95 points keyed "0".."94"
  private val store: Map[String, Int] = (0 until 95).map(i => i.toString -> i).toMap

  test("byOffset covers all rows exactly once") {
    val local = store // local copy: the task closure must not capture the spec
    val sorted = local.keys.toSeq.sortBy(_.toInt)
    val df = PaginatedScan.byOffset(spark, schema, totalCount = 95, batchSize = 10) {
      (off, limit) =>
        sorted.slice(off.toInt, off.toInt + limit).map(k => Row(k, local(k)))
    }
    val got = df.collect().map(_.getString(0)).toSet
    assert(got == store.keySet)
  }

  test("byIdShards fetches every id, surviving transient batch failures") {
    import spark.implicits._
    val local = store
    val ids = local.keys.toSeq.toDF("id")
    val df = PaginatedScan.byIdShards(ids, "id", schema,
      batchSize = 16, parallelism = 4) { batch =>
      if (PaginatedScanSpec.failOnce.compareAndSet(true, false))
        throw new RuntimeException("transient fetch error")
      batch.map(k => Row(k, local(k)))
    }
    val got = df.collect()
    assert(got.length == 95)
    assert(got.map(_.getString(0)).toSet == store.keySet)
  }

  test("byContinuation walks token chains per shard") {
    // two shards, each a token chain of 3 pages (local: serialized into tasks)
    val pages: Map[String, Vector[Seq[Row]]] = Map(
      "s1" -> Vector(Seq(Row("a1", 1)), Seq(Row("a2", 2)), Seq(Row("a3", 3))),
      "s2" -> Vector(Seq(Row("b1", 1)), Seq(Row("b2", 2))))
    val df = PaginatedScan.byContinuation(spark, schema, Seq("s1", "s2")) {
      (shard, token) =>
        val i = token.map(_.toInt).getOrElse(0)
        val chain = pages(shard)
        val next = if (i + 1 < chain.length) Some((i + 1).toString) else None
        (chain(i), next)
    }
    val got = df.collect().map(_.getString(0)).toSet
    assert(got == Set("a1", "a2", "a3", "b1", "b2"))
  }

  test("vespa scan walks visit continuation chains, nulls absent fields") {
    import Adapters.{VespaDoc, VespaVisitPage}
    // one schema = one visit chain of 2 pages; page 2 returns no token
    // (and the second doc omits "v", which must surface as null)
    val df = Adapters.Vespa.scan(spark, schema, Seq("prod")) { (sch, tok) =>
      tok match {
        case None => VespaVisitPage(s"/document/v1/$sch/$sch/docid",
          Seq(VespaDoc("d1", Map("v" -> 1))), 1, Some("AAA"))
        case Some("AAA") => VespaVisitPage(s"/document/v1/$sch/$sch/docid",
          Seq(VespaDoc("d2", Map.empty)), 1, Some("")) // empty == end
        case other => sys.error(s"unexpected continuation $other")
      }
    }
    val got = df.collect().map(r => r.getString(0) -> Option(r.get(1))).toMap
    assert(got == Map("d1" -> Some(1), "d2" -> None))
  }

  test("idRange / probeWindows enumeration (S6b/S6d)") {
    val ids = PaginatedScan.idRange(spark, 5, 9).collect().map(_.getString(0))
    assert(ids.toSeq.sorted == Seq("5", "6", "7", "8", "9"))
    val windows = PaginatedScan.probeWindows(2000, 50000, maxTries = 150)
    assert(windows.size <= 151)
    assert(windows.head._1 == 1000)
    assert(windows.last._2 == 60000)
    // contiguous coverage
    windows.sliding(2).foreach { case Seq((_, e), (s, _)) => assert(s == e + 1) }
  }
}
