package graft.connectors.wire

import java.io.ByteArrayInputStream
import java.nio.charset.StandardCharsets

import org.apache.arrow.memory.RootAllocator
import org.apache.arrow.vector.{Float8Vector, VarCharVector, VectorSchemaRoot}
import org.apache.arrow.vector.complex.ListVector
import org.apache.arrow.vector.ipc.{ArrowStreamReader, ArrowStreamWriter}
import org.apache.arrow.vector.types.FloatingPointPrecision
import org.apache.arrow.vector.types.pojo.{ArrowType, Field, FieldType, Schema}

import scala.jdk.CollectionConverters._

/** Arrow IPC framing for the LanceDB data plane — the managed
  * service's REAL body format (`export_vdf/lancedb_export.py:82-111`
  * iterates `to_arrow().to_batches()`; the cloud REST API returns
  * query results as an Arrow stream and takes merge-insert bodies the
  * same way). Control-plane calls (create / describe / count) stay
  * JSON, exactly like the service.
  *
  * Field shapes are the ones the JSON dialect already froze: `id`
  * utf8 (non-null), `vector` list<float64>, and one utf8 column per
  * payload key — so the two framings are interchangeable row-wise and
  * the stub serves either, negotiated by Accept/Content-Type
  * ([[Mime]]). */
object WireArrow {

  val Mime = "application/vnd.apache.arrow.stream"

  /** One record batch carrying the points. `includeVector` mirrors the
    * column pruning the JSON shape does by omission: a pruned response
    * simply has no vector field in its schema. */
  def encodePoints(points: Seq[WirePoint],
      includeVector: Boolean = true): Array[Byte] = {
    val payloadKeys = points.flatMap(_.payload.keys).distinct.sorted
    val fields =
      Seq(new Field("id", FieldType.notNullable(ArrowType.Utf8.INSTANCE),
        null)) ++
      (if (includeVector)
         Seq(new Field("vector", FieldType.nullable(new ArrowType.List()),
           Seq(new Field("item",
             FieldType.nullable(new ArrowType.FloatingPoint(
               FloatingPointPrecision.DOUBLE)), null)).asJava))
       else Nil) ++
      payloadKeys.map(k =>
        new Field(k, FieldType.nullable(ArrowType.Utf8.INSTANCE), null))
    val allocator = new RootAllocator()
    try {
      val root = VectorSchemaRoot.create(
        new Schema(fields.asJava), allocator)
      try {
        val ids = root.getVector("id").asInstanceOf[VarCharVector]
        points.zipWithIndex.foreach { case (p, i) =>
          ids.setSafe(i, p.id.getBytes(StandardCharsets.UTF_8))
        }
        if (includeVector) {
          val vecs = root.getVector("vector").asInstanceOf[ListVector]
          val w = vecs.getWriter
          points.zipWithIndex.foreach { case (p, i) =>
            w.setPosition(i)
            if (p.vector.nonEmpty) {
              w.startList()
              p.vector.foreach(w.float8().writeFloat8)
              w.endList()
            } else w.writeNull()
          }
        }
        payloadKeys.foreach { k =>
          val col = root.getVector(k).asInstanceOf[VarCharVector]
          points.zipWithIndex.foreach { case (p, i) =>
            p.payload.get(k) match {
              case Some(v) =>
                col.setSafe(i, v.getBytes(StandardCharsets.UTF_8))
              case None => col.setNull(i)
            }
          }
        }
        root.setRowCount(points.size)
        val bos = new java.io.ByteArrayOutputStream()
        val writer = new ArrowStreamWriter(root, null,
          java.nio.channels.Channels.newChannel(bos))
        writer.start(); writer.writeBatch(); writer.end(); writer.close()
        bos.toByteArray
      } finally root.close()
    } finally allocator.close()
  }

  /** Decode a stream back into points: `id`/`vector` by name, every
    * other column a payload key (null = absent). A schema without a
    * vector field — the pruned-response case — yields empty vectors. */
  def decodePoints(bytes: Array[Byte]): Seq[WirePoint] = {
    val allocator = new RootAllocator()
    try {
      val reader = new ArrowStreamReader(
        new ByteArrayInputStream(bytes), allocator)
      try {
        val out = scala.collection.mutable.ArrayBuffer[WirePoint]()
        val root = reader.getVectorSchemaRoot
        val names = root.getSchema.getFields.asScala.map(_.getName).toSeq
        while (reader.loadNextBatch()) {
          val ids = root.getVector("id").asInstanceOf[VarCharVector]
          val vecs =
            if (names.contains("vector"))
              Some(root.getVector("vector").asInstanceOf[ListVector])
            else None
          val payloadCols = names.filterNot(n => n == "id" || n == "vector")
            .map(n => n -> root.getVector(n).asInstanceOf[VarCharVector])
          (0 until root.getRowCount).foreach { i =>
            val vector = vecs match {
              case Some(v) if !v.isNull(i) =>
                v.getObject(i).asScala.toSeq
                  .map(_.asInstanceOf[java.lang.Double].doubleValue())
              case _ => Seq.empty[Double]
            }
            val payload = payloadCols.flatMap { case (k, col) =>
              if (col.isNull(i)) None
              else Some(k -> new String(col.get(i), StandardCharsets.UTF_8))
            }.toMap
            out += WirePoint(
              new String(ids.get(i), StandardCharsets.UTF_8), vector, payload)
          }
        }
        out.toSeq
      } finally reader.close()
    } finally allocator.close()
  }
}
