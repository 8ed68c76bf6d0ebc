package graft.core

import org.scalatest.funsuite.AnyFunSuite

class VdfMetaSpec extends AnyFunSuite {

  private val ns = NamespaceMeta(
    namespace = "",
    index_name = "idx1",
    total_vector_count = 1000L,
    exported_vector_count = 1000L,
    dimensions = 8,
    model_name = Some("test-model"),
    vector_columns = List("vector"),
    data_path = "idx1",
    metric = Some("Cosine"),
    model_map = Some(Map("vector" -> ModelMap(
      Some("test-model"), Some("title"), Some(8), Some("vector")))),
    index_config = Some(Map("hnsw_config" -> Map("m" -> 16))))

  private val meta = VdfMeta(
    version = "0.1.247",
    file_structure = List("idx1/1.parquet", "VDF_META.json"),
    author = "test",
    exported_from = "mock",
    indexes = Map("idx1" -> List(ns)),
    exported_at = "2026-01-01T00:00:00Z",
    id_column = Some("id"))

  test("JSON round trip preserves all modeled fields") {
    val back = VdfMeta.fromJson(VdfMeta.toJson(meta))
    assert(back.version == meta.version)
    assert(back.file_structure == meta.file_structure)
    assert(back.id_column.contains("id"))
    val n = back.indexes("idx1").head
    assert(n.index_name == "idx1")
    assert(n.dimensions == 8)
    assert(n.metric.contains("Cosine"))
    assert(n.model_map.get("vector").model_name.contains("test-model"))
    assert(n.index_config.isDefined)
  }

  test("id_column defaults to None like the reference (meta_types.py:29)") {
    val m = VdfMeta.fromJson("""{"version":"1.0"}""")
    assert(m.id_column.isEmpty)
    assert(m.idColumnOrDefault == Constants.IdColumn)
  }

  test("index_config deserializes from externally produced JSON") {
    val json =
      """{"version":"1.0","indexes":{"i":[{"index_name":"i","dimensions":4,
        |"index_config":{"hnsw":{"m":16,"ef":200},"on_disk":true}}]}}""".stripMargin
    val m = VdfMeta.fromJson(json)
    val cfg = m.indexes("i").head.index_config
    assert(cfg.isDefined)
    assert(cfg.get.contains("hnsw"))
    assert(cfg.get("on_disk") == true)
  }

  test("unknown fields survive a read→rewrite round trip") {
    val json =
      """{"version":"1.0","custom_tool_field":"keepme",
        |"indexes":{"i":[{"index_name":"i","dimensions":4,
        |"future_ns_field":[1,2,3]}]}}""".stripMargin
    val m = VdfMeta.fromJson(json)
    assert(m.unknownFields.get("custom_tool_field").contains("keepme"))
    val rewritten = VdfMeta.toJson(m)
    assert(rewritten.contains("custom_tool_field"))
    assert(rewritten.contains("keepme"))
    assert(rewritten.contains("future_ns_field"))
  }

  test("file write/read round trip") {
    val dir = java.nio.file.Files.createTempDirectory("vdfmeta").toString
    VdfMeta.write(meta, dir)
    assert(VdfMeta.exists(dir))
    val back = VdfMeta.read(dir)
    assert(back.indexes.keySet == Set("idx1"))
  }

  test("metric bimaps normalize and reverse (util.py:159-248)") {
    assert(Metric.standardize("pinecone", "dotproduct") == Metric.Dot)
    assert(Metric.standardize("milvus", "L2") == Metric.Euclid)
    assert(Metric.standardize("qdrant", "Manhattan") == Metric.Manhattan)
    // unknown → Cosine fallback like the reference
    assert(Metric.standardize("nope", "nope") == Metric.Cosine)
    assert(Metric.toDbName("milvus", Metric.Euclid).contains("L2"))
    assert(Metric.toDbName("pinecone", Metric.Manhattan).isEmpty)
  }
}
