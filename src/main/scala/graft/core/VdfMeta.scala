package graft.core

import com.fasterxml.jackson.annotation.{JsonAnyGetter, JsonAnySetter, JsonIgnore}
import com.fasterxml.jackson.databind.{DeserializationFeature, ObjectMapper}
import com.fasterxml.jackson.module.scala.DefaultScalaModule
import java.nio.file.{Files, Paths}
import java.nio.charset.StandardCharsets
import scala.jdk.CollectionConverters._

/** The VDF (Universal Vector Dataset Format) manifest model.
  *
  * Mirrors the reference's pydantic models (vector-io `meta_types.py:5-29`)
  * as Scala case classes: a VDF dataset is a directory of Parquet files
  * plus a `VDF_META.json` describing indexes → namespaces → files.
  *
  * Unknown manifest fields written by other tools survive a read→rewrite
  * round trip (any-getter/any-setter passthrough), so this engine never
  * silently strips a field it doesn't model.
  */
final case class ModelMap(
    model_name: Option[String] = None,
    text_column: Option[String] = None,
    dimensions: Option[Int] = None,
    vector_column: Option[String] = None)

/** Per-namespace metadata (`meta_types.py:5-20`), including the
  * `index_config` passthrough dict the import connectors forward to the
  * target DB (e.g. qdrant hnsw/quantization config,
  * `import_vdf/qdrant_import.py:178-249`). */
final case class NamespaceMeta(
    namespace: String = "",
    index_name: String = "",
    total_vector_count: Long = 0L,
    exported_vector_count: Long = 0L,
    dimensions: Int = -1,
    model_name: Option[String] = None,
    vector_columns: List[String] = List("vector"),
    data_path: String = "",
    metric: Option[String] = None,
    model_map: Option[Map[String, ModelMap]] = None,
    schema_dict_str: Option[String] = None,
    index_config: Option[Map[String, Any]] = None) {
  @JsonIgnore private val _extra =
    new java.util.LinkedHashMap[String, Any]()
  @JsonAnySetter private[core] def putExtra(k: String, v: Any): Unit =
    _extra.put(k, v)
  @JsonAnyGetter private[core] def extraFields: java.util.Map[String, Any] = _extra
  /** Fields present in the source JSON that this model doesn't declare. */
  @JsonIgnore def unknownFields: Map[String, Any] = _extra.asScala.toMap
  /** Carry unknown passthrough fields from `other` onto this instance.
    * REQUIRED after case-class `copy()` — the copy starts with an
    * empty passthrough map, so `ns.copy(...).withExtrasFrom(ns)` is
    * the pattern that keeps foreign manifest fields alive. */
  @JsonIgnore def withExtrasFrom(other: NamespaceMeta): NamespaceMeta = {
    other._extra.asScala.foreach { case (k, v) => _extra.put(k, v) }
    this
  }
}

/** Top-level manifest (`meta_types.py:22-29`). `id_column` defaults to
  * None exactly like the reference (`meta_types.py:29`); readers fall
  * back to `Constants.IdColumn` at use sites (`vdf_import_cls.py:63`). */
final case class VdfMeta(
    version: String = "1.0",
    file_structure: List[String] = Nil,
    author: String = "graft",
    exported_from: String = "mock",
    indexes: Map[String, List[NamespaceMeta]] = Map.empty,
    exported_at: String = "",
    id_column: Option[String] = None) {
  @JsonIgnore private val _extra =
    new java.util.LinkedHashMap[String, Any]()
  @JsonAnySetter private[core] def putExtra(k: String, v: Any): Unit =
    _extra.put(k, v)
  @JsonAnyGetter private[core] def extraFields: java.util.Map[String, Any] = _extra
  @JsonIgnore def unknownFields: Map[String, Any] = _extra.asScala.toMap
  /** See NamespaceMeta.withExtrasFrom — same copy() caveat. */
  @JsonIgnore def withExtrasFrom(other: VdfMeta): VdfMeta = {
    other._extra.asScala.foreach { case (k, v) => _extra.put(k, v) }
    this
  }
  /** Effective id column: manifest value or the reference default. */
  @JsonIgnore def idColumnOrDefault: String =
    id_column.getOrElse(Constants.IdColumn)
}

object VdfMeta {
  val FileName = "VDF_META.json"

  private lazy val mapper: ObjectMapper = {
    val m = new ObjectMapper()
    m.registerModule(DefaultScalaModule)
    m.configure(DeserializationFeature.FAIL_ON_UNKNOWN_PROPERTIES, false)
    m
  }

  def toJson(meta: VdfMeta): String =
    mapper.writerWithDefaultPrettyPrinter().writeValueAsString(meta)

  def fromJson(json: String): VdfMeta = mapper.readValue(json, classOf[VdfMeta])

  def write(meta: VdfMeta, dir: String): Unit = {
    Files.createDirectories(Paths.get(dir))
    Files.write(Paths.get(dir, FileName),
      toJson(meta).getBytes(StandardCharsets.UTF_8))
  }

  def read(dir: String): VdfMeta =
    fromJson(new String(Files.readAllBytes(Paths.get(dir, FileName)),
      StandardCharsets.UTF_8))

  def exists(dir: String): Boolean = Files.exists(Paths.get(dir, FileName))
}

/** Typed row at the connector boundary (SURVEY §1.1): the canonical
  * `(id, vector, metadata…)` point (`export_vdf/vdb_export_cls.py:68-84`)
  * with the open-world metadata flattened into a string map. The
  * untyped DataFrame stays the working currency — this is for the
  * typed paths where a case-class Encoder pays (connector upserts,
  * property tests, user-facing Dataset APIs). */
final case class VdfPoint(id: String, vector: Array[Float],
    meta: Map[String, String])

/** Engine constants (reference `constants.py:1-4`). */
object Constants {
  val IdColumn = "id"
  /** In-memory flush threshold, bytes (`DISK_SPACE_LIMIT`). */
  val DiskSpaceLimit: Long = 100000000L
  /** Default import/export batch (`DEFAULT_BATCH_SIZE`). */
  val DefaultBatchSize: Int = 10000
  /** Default max Parquet chunk size, MB (`export_vdf_cli.py:65`). */
  val DefaultMaxFileSizeMb: Int = 1024
}
