package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.core.GraftDatabase
import graft.operators.Ingest

/** Structured Streaming surface — beyond-reference (SURVEY.md §7.5: the
  * reference is fully synchronous; streaming is engine-native surface a
  * training-data pipeline needs for continuous ingest).
  *
  * Design: the streaming transforms are the SAME logical operators as the
  * batch path — [[eventCounts]] runs identically over a batch DataFrame
  * (oracle-checkable) and a streaming one (incremental with watermark
  * state); ingest reuses the batch chunk/embed/validate pipeline per
  * micro-batch via foreachBatch, so exactly one code path owns the
  * semantics.
  */
object Streaming {

  /** Windowed event aggregation: tumbling window per event_type. On a
    * streaming input the 25h watermark bounds state; on a batch input the
    * same plan computes the full history. Window start is emitted as a
    * column so results are schema-stable across both modes. */
  def eventCounts(events: DataFrame, windowLength: String = "1 day",
                  watermark: Option[String] = Some("25 hours"),
                  approxDistinct: Boolean = true): DataFrame = {
    val src = watermark.fold(events)(w => events.withWatermark("ts", w))
    // approx_count_distinct (HLL, mergeable, bounded state) is the scale
    // default; exact countDistinct only for cross-engine oracle checks
    // (HLL sketches differ between engines).
    val users =
      if (approxDistinct) approx_count_distinct(col("user_id"))
      else count_distinct(col("user_id"))
    src
      .groupBy(window(col("ts"), windowLength).as("w"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        round(sum(col("value")), 4).as("sum_value"),
        users.as("n_users"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n_events"), col("sum_value"), col("n_users"))
  }

  /** Continuous collection ingest: any streaming (id, chunk) text source →
    * per-micro-batch chunk/embed/validate/append through the SAME batch
    * pipeline (Ingest.makeRecords + GraftDatabase.addRecords). Exactly-once
    * per micro-batch comes from the sink-side dedup the catalog's
    * duplicate-id validation provides. */
  def streamIngest(db: GraftDatabase, collectionId: String, chunks: DataFrame,
                   embedderId: String, checkpointDir: String): StreamingQuery =
    chunks.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          db.addRecords(collectionId,
            Ingest.makeRecords(batch.sparkSession, batch, embedderId))
        }
      }
      .start()
}
