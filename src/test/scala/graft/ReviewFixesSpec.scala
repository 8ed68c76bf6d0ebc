package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.connectors.UpsertPolicy
import graft.core.{NamespaceMeta, VdfMeta}
import graft.io.VdfIO

/** Regression tests for the round-2 code-review findings on the
  * earlier round-2 code (data-loss swaps, non-shrinking batches,
  * iterator contract, column binding, passthrough-field loss, metric
  * loss, native-expression null semantics). */
class ReviewFixesSpec extends SparkSpec {
  import spark.implicits._

  test("consolidate on a bootstrapped bare dir (data_path '.') keeps the data") {
    val dir = Files.createTempDirectory("graft-bare").toString
    (1L to 100L).map(i => (i, s"row$i")).toDF("id", "text")
      .repartition(4).write.mode("overwrite").parquet(dir)
    // bootstrap synthesizes data_path "." — the case that used to wipe
    // the whole dataset on consolidate
    VdfIO.bootstrapMeta(spark, dir)
    val metaBefore = VdfMeta.read(dir)
    assert(metaBefore.indexes.values.flatten.exists(_.data_path == "."))
    VdfIO.consolidate(spark, dir, metaBefore.indexes.keys.head)
    assert(VdfMeta.exists(dir), "manifest must survive the swap")
    val after = spark.read.option("recursiveFileLookup", "true")
      .option("pathGlobFilter", "*.parquet").parquet(dir)
    assert(after.count() == 100L, "all rows must survive consolidation")
  }

  test("batchedWithShrink re-splits the failing batch at the shrunk size") {
    // sink rejects any batch larger than 400 rows — the policy must
    // shrink AND re-split, not re-send the same oversized batch
    var writes = 0
    val written = UpsertPolicy.batchedWithShrink(
        (1 to 2000).iterator, batchSize = 1000) { batch =>
      writes += 1
      if (batch.size > 400) throw new RuntimeException("payload too large")
    }
    assert(written == 2000L)
    assert(writes > 4) // several shrink attempts + successful sub-batches
  }

  test("batchedWithShrink aborts after maxRetries at the floor size") {
    val e = intercept[RuntimeException] {
      UpsertPolicy.batchedWithShrink((1 to 100).iterator, batchSize = 10,
          minFraction = 0.1, maxRetries = 3) { _ =>
        throw new RuntimeException("sink down")
      }
    }
    assert(e.getMessage == "sink down")
  }

  test("byIdShards tolerates fetches that return no rows (deleted ids)") {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("id", StringType)))
    val ids = (1 to 50).map(_.toString).toDF("id")
    // only even ids still exist in the "source DB"
    val out = graft.connectors.PaginatedScan.byIdShards(
        ids, "id", schema, batchSize = 7, parallelism = 3) { batch =>
      batch.filter(_.toInt % 2 == 0).map(org.apache.spark.sql.Row(_))
    }
    assert(out.count() == 25)
  }

  test("Ivf binds id/vector columns by name regardless of position") {
    val vecs = (0L until 30L).map { i =>
      val c = (i % 3).toInt
      (s"meta$i", Array.tabulate(4)(j => if (j == c) 10f else 0f), i)
    }.toDF("extra", "embedding", "vec_id") // id column LAST
    val index = graft.similarity.Ivf.build(vecs, "vec_id", "embedding", nlist = 3)
    val q = vecs.filter(col("vec_id") === 0)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    val hits = graft.similarity.Ivf.search(index, q, k = 3, nprobe = 3)
      .collect()
    assert(hits.length == 3)
    assert(hits.forall(_.getLong(1) % 3 == 0)) // same synthetic cluster
  }

  test("copy().withExtrasFrom keeps foreign manifest fields through rewrite") {
    val json =
      """{"version":"1.0","file_structure":[],"author":"x","exported_from":"y",
        |"exported_at":"t","custom_tool_field":42,
        |"indexes":{"i":[{"namespace":"","index_name":"i","total_vector_count":1,
        |"exported_vector_count":1,"dimensions":2,"vector_columns":["v"],
        |"data_path":"i","future_ns_field":"keepme"}]}}""".stripMargin
    val meta = VdfMeta.fromJson(json)
    val ns = meta.indexes("i").head
    val rewritten = meta.copy(author = "z").withExtrasFrom(meta)
      .copy(indexes = Map("i" -> List(
        ns.copy(total_vector_count = 2).withExtrasFrom(ns))))
      .withExtrasFrom(meta)
    val out = VdfMeta.toJson(rewritten)
    assert(out.contains("custom_tool_field"), out)
    assert(out.contains("future_ns_field"), out)
  }

  test("native fold expressions agree with the HOF formulation on nulls") {
    val df = Seq(
      (Array[java.lang.Float](1f, 2f), Array[java.lang.Float](3f, 4f)),
      (Array[java.lang.Float](1f, null), Array[java.lang.Float](3f, 4f)),
      (Array[java.lang.Float](1f), Array[java.lang.Float](3f, 4f)))
      .toDF("a", "b")
    val hof = df.select(expr(
      "aggregate(zip_with(a, b, (x, y) -> CAST(x AS DOUBLE) * y), " +
        "CAST(0.0 AS DOUBLE), (s, v) -> s + v)").as("r"))
      .as[Option[Double]].collect().toSeq
    val native = df.select(
      graft.expressions.GraftExtensions.dot(col("a"), col("b")).as("r"))
      .as[Option[Double]].collect().toSeq
    assert(hof == Seq(Some(11.0), None, None))
    assert(native == hof)
  }

  test("export records each index's metric; import honors it (CLI round trip)") {
    val meta = VdfIO.writeVdf(
      Map(("ix", "") -> Seq((1L, Array(0.1f, 0.2f))).toDF("id", "vector")),
      Files.createTempDirectory("graft-metric").toString,
      metrics = Map("ix" -> "Dot"))
    assert(meta.indexes("ix").head.metric.contains("Dot"))
  }
}
