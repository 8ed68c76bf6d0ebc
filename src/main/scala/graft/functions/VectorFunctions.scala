package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector-column functions over `ArrayType(FloatType)` / `ArrayType(DoubleType)`.
  *
  * Spark-first re-expression of the reference's vector handling
  * (vector-io `import_vdf/vdf_import_cls.py:189-212` extract_vector,
  * `scripts/reembed.py:455-512` quantization) plus the distance /
  * similarity functions needed by the similarity-search extension.
  *
  * All arithmetic is forced to double precision with a deterministic
  * left-fold (`aggregate`), so results are reproducible across engines
  * regardless of the stored element type (float32 at rest).
  */
object VectorFunctions {

  /** Elementwise product folded to a double dot-product.
    *
    * Delegates to the native codegen expression
    * (graft.expressions.DotProduct): a tight primitive loop inside
    * whole-stage codegen instead of an interpreted
    * aggregate(zip_with(...)) — same fold order, bit-identical values
    * (asserted in VectorExpressionsSpec). */
  def dotProduct(a: Column, b: Column): Column =
    graft.expressions.GraftExtensions.dot(a, b)

  /** The HOF formulation of dotProduct, kept as the pure-SQL-builtin
    * reference implementation the native expression is tested against. */
  def dotProductHof(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, v) => acc + v)

  /** Euclidean norm, double precision. */
  def l2Norm(a: Column): Column = sqrt(dotProduct(a, a))

  /** Cosine similarity in [-1, 1]; null-safe via division semantics. */
  def cosineSimilarity(a: Column, b: Column): Column =
    dotProduct(a, b) / (l2Norm(a) * l2Norm(b))

  /** Squared L2 distance (cheaper than l2Distance when only ranking). */
  def l2DistanceSq(a: Column, b: Column): Column =
    graft.expressions.GraftExtensions.l2Sq(a, b)

  def l2Distance(a: Column, b: Column): Column = sqrt(l2DistanceSq(a, b))

  /** Manhattan distance (reference Metric "Manhattan", util.py:159-218). */
  def l1Distance(a: Column, b: Column): Column =
    graft.expressions.GraftExtensions.l1(a, b)

  /** L2-normalize to unit length (double elements). */
  def l2Normalize(a: Column): Column = {
    val n = l2Norm(a)
    transform(a, x => x.cast("double") / n)
  }

  /** Symmetric int8 quantization with a fixed scale: round(x*scale)
    * clamped to [-128, 127], as byte. Mirrors reference quantization
    * (`reembed.py:455-470`) expressed as a codegen-friendly column
    * transform instead of a Python loop. The clamp runs before the cast
    * so out-of-range inputs saturate (standard quantization semantics)
    * instead of wrapping through the ANSI-off tinyint cast. */
  def quantizeInt8(a: Column, scale: Double): Column =
    transform(a, x =>
      least(greatest(round(x.cast("double") * lit(scale)), lit(-128d)), lit(127d))
        .cast("tinyint"))

  /** Vector dimensionality (NamespaceMeta.dimensions resolution,
    * `vdf_import_cls.py:152-187`: first non-null vector's length). */
  def dims(a: Column): Column = size(a)
}
