package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming extensions (SURVEY §2.11 / §7.4).
  *
  * The reference is batch-only; its one incremental mechanism — the
  * Pinecone `modify_to_search` marker that mutates live metadata to
  * track export progress (`export_vdf/pinecone_export.py:184-259`,
  * `432-465`) — becomes checkpointed streaming state here: watermarked
  * tumbling-window aggregation for continuous rollups, and
  * `flatMapGroupsWithState` for exactly-once last-wins upsert dedupe.
  * Source data is never mutated.
  */
object StreamingOps {

  /** Tumbling-window event rollup: the streaming twin of the batch
    * qWindowHourly query. Late data beyond the watermark is dropped
    * deterministically instead of corrupting closed windows. */
  def windowedCounts(events: DataFrame, tsCol: String, keyCol: String,
      windowDuration: String, watermarkDelay: String): DataFrame =
    events
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(window(col(tsCol), windowDuration), col(keyCol))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("window_start"), col(keyCol),
        col("n"), col("sum_value"))

  final case class Upsert(id: String, ts: Long, payload: String)

  /** Streaming last-wins dedupe (J6 as continuous state): keeps the
    * latest (by ts) version of each id, emitting a row only when the
    * stored version changes. State is Spark-checkpointed — the
    * principled replacement for the reference's marker-mutation
    * progress tracking. */
  def lastWinsUpserts(updates: Dataset[Upsert]): Dataset[Upsert] = {
    import updates.sparkSession.implicits._
    updates
      .groupByKey(_.id)
      .flatMapGroupsWithState[Upsert, Upsert](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (_: String, rows: Iterator[Upsert], state: GroupState[Upsert]) =>
          val newest = (rows ++ state.getOption.iterator)
            .reduceOption((a, b) => if (a.ts >= b.ts) a else b)
          newest match {
            case Some(v) if !state.getOption.contains(v) =>
              state.update(v); Iterator.single(v)
            case _ => Iterator.empty
          }
      }
  }

  /** Incremental export progress as streaming state: which ids have
    * been exported (replaces S6f's metadata-marker hack). Batch-side
    * resume = anti-join against this checkpointed set. */
  def unexported(all: DataFrame, exportedIds: DataFrame, idCol: String): DataFrame =
    all.join(exportedIds, Seq(idCol), "left_anti")
}
