package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** As-of (most-recent-match) join — for each left row, attach the
  * latest right row with the same key whose time is <= (or <) the left
  * row's time. Spark has no built-in as-of join; the naive formulations
  * either explode (inequality join → range candidates per row) or
  * collect (per-key sorted lookup on the driver). This is the
  * union-merge formulation: tag both sides, union them, and carry the
  * last-seen right payload forward in ONE ordered window pass.
  *
  * Scale shape: a single hash exchange on the key and a single
  * in-partition sort — the same cost as one sort-merge join, with no
  * intermediate candidate set at all. Survives 100×: the window frame
  * (unbounded-preceding `last(ignoreNulls)`) is computed streamingly
  * per partition, so memory is O(1) per row beyond the sort.
  *
  * Determinism: right rows must be unique per (key, time) — pre-
  * aggregate the right side otherwise (as `q_asof_join` does); with
  * duplicates the carried payload would depend on intra-partition
  * order.
  */
object AsofJoin {

  /** Backward as-of join. Output = every left row + the matched right
    * row's time and payload columns (null when no right row precedes).
    *
    * @param inclusive when true (default) a right row at exactly the
    *   left time matches (t_r <= t_l); when false, strict (t_r < t_l).
    */
  def asofBackward(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      inclusive: Boolean = true): DataFrame = {
    val lCols = left.columns.toSeq
    val rOut = rightTime +: right.columns.filterNot(c =>
      c == rightKey || c == rightTime).toSeq
    val lStructT = StructType(lCols.map(c => left.schema(c)))
    val rStructT = StructType(rOut.map(c => right.schema(c)))

    // Sides sort right-before-left at equal times for inclusive
    // semantics, left-before-right for strict.
    val (rSide, lSide) = if (inclusive) (0, 1) else (1, 0)
    val lTagged = left.select(
      col(leftKey).as("__k"), col(leftTime).as("__t"), lit(lSide).as("__side"),
      struct(lCols.map(col): _*).as("__l"), lit(null).cast(rStructT).as("__r"))
    // A right row with a null key or time can never be "the most
    // recent match" — drop it up front so all three as-of
    // implementations agree (and null-keyed left rows match nothing).
    val rTagged = right
      .filter(col(rightKey).isNotNull && col(rightTime).isNotNull)
      .select(
        col(rightKey).as("__k"), col(rightTime).as("__t"), lit(rSide).as("__side"),
        lit(null).cast(lStructT).as("__l"), struct(rOut.map(col): _*).as("__r"))

    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__t").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lTagged.unionByName(rTagged)
      .withColumn("__m", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__l").isNotNull)
      .select(lCols.map(c => col(s"__l.$c").as(c)) ++
        rOut.map(c => col(s"__m.$c").as(c)): _*)
  }

  /** Broadcast as-of join: when the right side is dimension-sized, the
    * big left side should not shuffle AT ALL. The right side is
    * collected, sorted per key, broadcast, and each left row resolves
    * its match with an in-memory binary search inside `mapPartitions`.
    * Same semantics as `asofBackward` (asserted in AsofJoinSpec); plan
    * contains no Exchange on the left — at 100 TB left-side events vs
    * a few million reference rows, this is the difference between a
    * map-only job and a full shuffle of the corpus. */
  def asofBackwardBroadcast(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      inclusive: Boolean = true): DataFrame = {
    val lCols = left.columns.toSeq
    val rOut = rightTime +: right.columns.filterNot(c =>
      c == rightKey || c == rightTime).toSeq
    val outSchema = org.apache.spark.sql.types.StructType(
      lCols.map(left.schema(_)) ++
        rOut.map(c => right.schema(c).copy(nullable = true)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)

    // key -> right rows as (times, payload cells) sorted by time;
    // plain arrays keep the broadcast payload compact
    val cmp = (a: Any, b: Any) => a.asInstanceOf[Comparable[Any]].compareTo(b)
    val lookup: Map[Any, (Array[Any], Array[Array[Any]])] =
      right.filter(col(rightKey).isNotNull && col(rightTime).isNotNull)
        .select((rightKey +: rightTime +: rOut.tail).map(col): _*)
        .collect()
        .groupBy(_.get(0))
        .map { case (k, rows) =>
          val sorted = rows.sortWith((x, y) => cmp(x.get(1), y.get(1)) < 0)
          (k, (sorted.map(_.get(1): Any),
            sorted.map(r => Array.tabulate(r.length - 2)(i => r.get(i + 2)))))
        }
    val bc = left.sparkSession.sparkContext.broadcast(lookup)

    val kIdx = left.schema.fieldIndex(leftKey)
    val tIdx = left.schema.fieldIndex(leftTime)
    val nulls = Seq.fill(rOut.length)(null)
    val incl = inclusive
    left.mapPartitions { rows =>
      val m = bc.value
      rows.map { r =>
        val matched: Seq[Any] =
          if (r.isNullAt(kIdx) || r.isNullAt(tIdx)) nulls
          else m.get(r.get(kIdx)) match {
            case None => nulls
            case Some((times, payloads)) =>
              val t = r.get(tIdx)
              // rightmost index with times(i) <= t (or < t when strict)
              var lo = 0; var hi = times.length - 1; var ans = -1
              while (lo <= hi) {
                val mid = (lo + hi) >>> 1
                val c = cmp(times(mid), t)
                if (c < 0 || (incl && c == 0)) { ans = mid; lo = mid + 1 }
                else hi = mid - 1
              }
              if (ans < 0) nulls else times(ans) +: payloads(ans)
          }
        Row.fromSeq(r.toSeq ++ matched)
      }
    }(enc)
  }
}
