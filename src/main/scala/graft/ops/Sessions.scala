package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization — a training-pipeline operator the
  * reference lacks (vector-io is batch ETL with no event-time notion;
  * SURVEY §2.11). Standard clickstream semantics: within each key, a
  * new session starts at the first event and whenever the gap to the
  * previous event exceeds `gap`.
  *
  * Shuffle shape: exactly one exchange on the key, then a single
  * in-partition sort feeding BOTH window passes (lag and running sum
  * share the same ordering, so Catalyst plans one Sort + two adjacent
  * Window operators, no second exchange). At 100 TB the cost is the
  * one hash-partition by key — the same lower bound any per-key
  * ordered computation has. Skewed keys (one user = one partition's
  * worth of events) are the known hazard; mitigate upstream by
  * splitting hot keys with `Scale.saltedAgg`-style salting on a
  * coarse time bucket when a key exceeds partition-size budget.
  */
object Sessions {

  /** Adds `session_id` (0-based per-key session index) to `events`.
    *
    * @param tieBreak extra ordering columns so rows with identical
    *   timestamps order deterministically (required for reproducible
    *   session boundaries when `tsCol` has duplicates within a key).
    */
  def sessionize(events: DataFrame, keyCol: String, tsCol: String,
      gap: Long, tieBreak: Seq[String] = Nil): DataFrame = {
    val ordering: Seq[Column] = (col(tsCol) +: tieBreak.map(col)).map(_.asc)
    val w = Window.partitionBy(keyCol).orderBy(ordering: _*)
    val prev = lag(col(tsCol), 1).over(w)
    val isNew = when(prev.isNull || (col(tsCol) - prev) > gap, 1L).otherwise(0L)
    events.withColumn("session_id",
      sum(isNew).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)) - 1L)
  }

  /** Per-session summary: event count and [start, end] bounds. */
  def sessionStats(events: DataFrame, keyCol: String, tsCol: String,
      gap: Long, tieBreak: Seq[String] = Nil): DataFrame =
    sessionize(events, keyCol, tsCol, gap, tieBreak)
      .groupBy(col(keyCol), col("session_id"))
      .agg(count(lit(1)).as("n_events"),
        min(col(tsCol)).as("start_ts"),
        max(col(tsCol)).as("end_ts"))
}
