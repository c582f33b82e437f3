package graft.streaming

import graft.core.{Mention, Turn}
import graft.dicts.Dicts
import graft.ner.MentionDetector
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery, Trigger}

/** Structured-Streaming face of the per-turn pipeline.
  *
  * The reference is pure batch (SURVEY.md §2.11 — its "stream_files" are
  * bounded generators), but every per-turn stage here is stateless, so the
  * same mention detector runs unchanged under `readStream`: transcripts
  * arrive as micro-batches, mentions flow out in append mode, and windowed
  * mention counts demonstrate watermark + event-time aggregation. The only
  * cross-document stage (ED) stays batch (run it periodically over the
  * streamed mention sink — the `foreachBatch` shape).
  */
object StreamingPipeline {

  /** Streaming mention detection: same code path as batch (mapPartitions
    * over broadcast dicts), applied to a streaming Dataset[Turn].
    */
  def mentions(turns: Dataset[Turn], d: Dicts): Dataset[Mention] =
    MentionDetector.mentions(turns, turns.sparkSession.sparkContext.broadcast(d))

  /** Windowed mention counts with a watermark: event-time tumbling window
    * over `ts`, counting mentions per surface.
    */
  def windowedMentionCounts(turns: Dataset[Turn], d: Dicts,
      window: String = "5 minutes", watermark: String = "10 minutes"): DataFrame = {
    val spark = turns.sparkSession
    import spark.implicits._
    val m = mentions(turns, d)
    val withTs = m.join(turns.select($"conv_id", $"turn_idx", $"ts"), Seq("conv_id", "turn_idx"))
    withTs
      .withWatermark("ts", watermark)
      .groupBy(org.apache.spark.sql.functions.window($"ts", window), $"surface")
      .agg(count(lit(1)).as("n"))
      .select($"window.start".as("win_start"), $"surface", $"n")
  }

  /** Drive a bounded source through the streaming mention path into an
    * in-memory sink and block until drained (test/local harness).
    */
  def runToMemory(spark: SparkSession, streamingTurns: Dataset[Turn], d: Dicts,
      queryName: String): StreamingQuery = {
    val q = mentions(streamingTurns, d).writeStream
      .outputMode(OutputMode.Append)
      .format("memory")
      .queryName(queryName)
      .trigger(Trigger.ProcessingTime("1 second"))
      .start()
    q.processAllAvailable()
    q
  }
}
