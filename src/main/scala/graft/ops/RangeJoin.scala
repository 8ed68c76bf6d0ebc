package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval (range-containment) join: points ⋈ intervals on
  * `start <= point <= end`, with no equi-key.
  *
  * Spark plans a bare inequality join as BroadcastNestedLoop — O(n·m)
  * comparisons, a non-starter when the point side is a 100 TB corpus.
  * This operator re-expresses it as an EQUI-join on coarse buckets:
  * each interval is exploded to every bucket of width `bucketWidth` it
  * overlaps, points map to exactly one bucket, and the bucket equi-join
  * (hash-partitioned, spillable, AQE-skew-splittable) is filtered to
  * exact containment. Each qualifying (point, interval) pair meets in
  * exactly ONE bucket — the point's — so no post-join dedup is needed.
  *
  * Cost model: the interval side is replicated ×(len/bucketWidth + 1),
  * the point side not at all. Pick `bucketWidth` around the typical
  * interval length: replication stays O(1) while each bucket pairs a
  * point only with intervals overlapping its bucket — the candidate
  * set the nested loop could never prune. (The same trick underlies
  * interval joins in Flink and bioinformatics range engines.)
  *
  * Both column sets must be integral (long-compatible: days, epoch
  * nanos, ids). Floor division keeps pre-epoch (negative) values in
  * the correct bucket.
  */
object RangeJoin {

  /** Exact integral floor division: the remainder-subtracted numerator
    * divides with Catalyst's IntegralDivide (SQL `div`), never `/` —
    * double division loses exactness above 2^53, which epoch-nanos
    * values (~1.7e18) exceed, and a mis-bucketed point would silently
    * miss every interval in its true bucket. */
  private def floorDiv(c: Column, w: Long): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    val num = (c - pmod(c, lit(w))).cast("long")
    Bridge.column(org.apache.spark.sql.catalyst.expressions.IntegralDivide(
      Bridge.expression(num), Bridge.expression(lit(w))))
  }

  /** Inner interval join. Every output row = one (point row, interval
    * row) pair with `intervals.start <= points.point <= intervals.end`.
    * Column name collisions are the caller's to resolve (as with
    * `crossJoin`). */
  def intervalJoin(points: DataFrame, pointCol: String,
      intervals: DataFrame, startCol: String, endCol: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val p = points.withColumn("__bucket", floorDiv(col(pointCol), bucketWidth))
    val iv = intervals
      .filter(col(startCol).isNotNull && col(endCol).isNotNull &&
        col(startCol) <= col(endCol))
      .withColumn("__bucket",
        explode(sequence(floorDiv(col(startCol), bucketWidth),
          floorDiv(col(endCol), bucketWidth))))
    p.join(iv, Seq("__bucket"))
      .filter(col(pointCol).between(col(startCol), col(endCol)))
      .drop("__bucket")
  }

  /** Band (epsilon) join: pairs with `|left.x − right.y| <= eps` — the
    * other classic inequality-join shape (record linkage, time-series
    * alignment). Reduces to `intervalJoin` by treating each right row
    * as the interval `[y − eps, y + eps]`; same bucket-equi-join plan,
    * no nested loop. `bucketWidth` defaults to the band width. */
  def bandJoin(left: DataFrame, leftCol: String,
      right: DataFrame, rightCol: String, eps: Long,
      bucketWidth: Long = 0L): DataFrame = {
    require(eps >= 0, "eps must be non-negative")
    val w = if (bucketWidth > 0) bucketWidth else math.max(2 * eps, 1L)
    val iv = right
      .withColumn("__lo", col(rightCol) - eps)
      .withColumn("__hi", col(rightCol) + eps)
    intervalJoin(left, leftCol, iv, "__lo", "__hi", w)
      .drop("__lo", "__hi")
  }
}
