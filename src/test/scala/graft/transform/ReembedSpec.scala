package graft.transform

import graft.SparkSpec
import graft.core.NamespaceMeta
import org.apache.spark.sql.functions._

class ReembedSpec extends SparkSpec {

  private lazy val docs = {
    import spark.implicits._
    Seq(
      ("1", "the quick brown fox", Array(1f, 0f)),
      ("2", "lazy dogs sleep", Array(0f, 1f)),
      ("3", null.asInstanceOf[String], Array(1f, 1f))
    ).toDF("id", "text", "vector")
  }

  private val ns = NamespaceMeta(index_name = "i", data_path = "i",
    dimensions = 2, vector_columns = List("vector"))

  test("embedColumn appends aligned vectors; nulls embed as empty text") {
    val emb = new Reembed.HashingEmbedder(8)
    val out = Reembed.embedColumn(docs, "text", "emb", emb, batchSize = 2)
    val rows = out.collect()
    assert(rows.length == 3)
    assert(out.columns.toSeq == Seq("id", "text", "vector", "emb"))
    val v1 = rows.find(_.getString(0) == "1").get.getAs[scala.collection.Seq[Float]]("emb")
    assert(v1.length == 8)
    // deterministic: same text → same vector
    val again = Reembed.embedColumn(docs, "text", "emb", emb, batchSize = 96)
      .collect().find(_.getString(0) == "1").get.getAs[scala.collection.Seq[Float]]("emb")
    assert(v1 == again)
    // L2-normalized
    assert(math.abs(v1.map(x => x * x).sum - 1.0) < 1e-5)
  }

  test("reembedNamespace: column naming, manifest update, overwrite guard") {
    val emb = new Reembed.HashingEmbedder(8)
    val (df, newNs) = Reembed.reembedNamespace(docs, ns, Seq("text"),
      "test-model", emb)
    val expect = Reembed.vectorColumnName("text", "test-model", None, 8)
    assert(expect == "vec_text_test_model_dim8")
    assert(df.columns.contains(expect))
    assert(newNs.vector_columns == List(expect, "vector"))
    assert(newNs.model_map.get(expect).text_column.contains("text"))
    assert(newNs.dimensions == 8)
    // re-running against the updated manifest must refuse (reembed.py:125-139)
    assertThrows[IllegalArgumentException] {
      Reembed.reembedNamespace(df, newNs, Seq("text"), "test-model", emb)
    }
  }

  test("reembedNamespace: multi-column text composition (F14) + int8 quantize") {
    val emb = new Reembed.HashingEmbedder(4)
    val (df, _) = Reembed.reembedNamespace(docs, ns, Seq("id", "text"),
      "m", emb, quantize = Some("int8"))
    assert(df.columns.contains("id_text"))
    val qCol = "vec_id_text_m_int8_dim4_int8"
    assert(df.columns.exists(_.endsWith("_int8")))
    val joined = df.filter(col("id") === "3").collect().head.getAs[String]("id_text")
    assert(joined == "3") // null text dropped from the join
  }
}
