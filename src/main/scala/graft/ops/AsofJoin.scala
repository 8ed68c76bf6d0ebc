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
    * big left side should not shuffle AT ALL. Delegates to the native
    * broadcast operator (`plans.AsofJoinBroadcastExec`): the right side
    * goes through a planner-inserted `BroadcastExchange` (reused across
    * stages, AQE-aware, no driver-side collect on the query path), and
    * each left partition resolves matches with a binary search over a
    * per-executor `key -> rows sorted by time` index, entirely on
    * InternalRows. Same semantics as `asofBackward` (asserted in
    * SessionsAsofSpec); the left side plans with no shuffle and no
    * sort — at 100 TB left-side events vs a few million reference rows,
    * this is the difference between a map-only job and a full shuffle
    * of the corpus. Replaced a collect+Row-encoder `mapPartitions`
    * formulation that was ~6× slower at sf0.1 (encoder boxing dominated). */
  def asofBackwardBroadcast(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      inclusive: Boolean = true): DataFrame =
    graft.plans.AsofJoinNative.asofBroadcast(left, right,
      leftKey, rightKey, leftTime, rightTime, inclusive)
}
