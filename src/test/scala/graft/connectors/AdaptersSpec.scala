package graft.connectors

import graft.core.NamespaceMeta
import org.scalatest.funsuite.AnyFunSuite

/** Offline fixtures for the per-connector semantics adapters, shaped
  * after the reference's own structures (qdrant_import.py:178-250,
  * milvus_import.py:92-146, archive/example-VDF_META.json). */
class AdaptersSpec extends AnyFunSuite {

  private val qdrantIndexConfig: Map[String, Any] = Map(
    "params" -> Map(
      "vectors" -> Map("size" -> 384, "distance" -> "Cosine",
        "on_disk" -> true)),
    "hnsw_config" -> Map("m" -> 16, "ef_construct" -> 100),
    "optimizers_config" -> Map("default_segment_number" -> 2),
    "wal_config" -> Map("wal_capacity_mb" -> 32),
    "quantization_config" -> Map(
      "scalar" -> Map("type" -> "int8", "always_ram" -> true)),
    "on_disk_payload" -> true,
    "sparse_vectors_config" -> Map(
      "text-sparse" -> Map("index" -> Map("on_disk" -> false))))

  private def ns(dims: Int, metric: Option[String],
      cfg: Option[Map[String, Any]], namespace: String = "") =
    NamespaceMeta(namespace = namespace, index_name = "idx",
      dimensions = dims, metric = metric, index_config = cfg)

  test("nested() walks maps and treats non-map intermediates as absent") {
    assert(Adapters.nested(Some(qdrantIndexConfig),
      Seq("params", "vectors", "size")).contains(384))
    assert(Adapters.nested(Some(qdrantIndexConfig),
      Seq("params", "vectors", "missing")).isEmpty)
    assert(Adapters.nested(Some(qdrantIndexConfig),
      Seq("on_disk_payload", "deeper")).isEmpty)
    assert(Adapters.nested(None, Seq("params")).isEmpty)
  }

  test("qdrant collection spec: full index_config passthrough + named vectors") {
    val spec = Adapters.Qdrant.collectionSpec("docs",
      ns(-1, Some("Dot"), Some(qdrantIndexConfig), namespace = "prod"),
      Seq("vec_a", "vec_b"))
    assert(spec.collectionName == "docs_prod")
    // dims resolved from index_config.params.vectors.size (manifest -1)
    assert(spec.vectorsConfig.keySet == Set("vec_a", "vec_b"))
    assert(spec.vectorsConfig("vec_a") ==
      Adapters.QdrantVectorParams(384, "Dot", Some(true)))
    assert(spec.sparseVectorsConfig.contains(
      qdrantIndexConfig("sparse_vectors_config")))
    assert(spec.hnswConfig.contains(qdrantIndexConfig("hnsw_config")))
    assert(spec.optimizersConfig.contains(qdrantIndexConfig("optimizers_config")))
    assert(spec.walConfig.contains(qdrantIndexConfig("wal_config")))
    assert(spec.quantizationConfig.contains(qdrantIndexConfig("quantization_config")))
    assert(spec.onDiskPayload.contains(true))
  }

  test("qdrant defaults: Cosine metric, no config sections, manifest dims") {
    val spec = Adapters.Qdrant.collectionSpec("docs",
      ns(128, None, None), Seq("vector"))
    assert(spec.collectionName == "docs")
    assert(spec.vectorsConfig("vector") ==
      Adapters.QdrantVectorParams(128, "Cosine", None))
    assert(spec.sparseVectorsConfig.isEmpty && spec.hnswConfig.isEmpty &&
      spec.quantizationConfig.isEmpty && spec.onDiskPayload.isEmpty)
  }

  test("qdrant dims: unresolvable dims raise like the reference") {
    intercept[IllegalArgumentException] {
      Adapters.Qdrant.collectionSpec("docs", ns(-1, None, None), Seq("v"))
    }
  }

  test("milvus collection spec: VARCHAR pk, dynamic fields, '-' renames") {
    val spec = Adapters.Milvus.collectionSpec("my-index",
      ns(256, Some("Euclid"), None, namespace = "n-s"), "id", "text-embedding")
    assert(spec.collectionName == "my_index_n_s")
    assert(spec.pkField == "id" && spec.pkMaxLength == 65535)
    assert(spec.vectorField == "text_embedding")
    assert(spec.dim == 256)
    assert(spec.enableDynamicField)
  }

  test("milvus index spec: reverse-metric AUTOINDEX") {
    assert(Adapters.Milvus.indexSpec(ns(8, Some("Euclid"), None)) ==
      Adapters.MilvusIndexSpec("L2", "AUTOINDEX"))
    assert(Adapters.Milvus.indexSpec(ns(8, Some("Dot"), None)) ==
      Adapters.MilvusIndexSpec("IP", "AUTOINDEX"))
    assert(Adapters.Milvus.indexSpec(ns(8, None, None)) ==
      Adapters.MilvusIndexSpec("COSINE", "AUTOINDEX"))
    // unknown metric name falls back to the Cosine default
    assert(Adapters.Milvus.indexSpec(ns(8, Some("weird"), None)) ==
      Adapters.MilvusIndexSpec("COSINE", "AUTOINDEX"))
  }
}
