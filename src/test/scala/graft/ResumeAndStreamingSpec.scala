package graft

import java.nio.file.Files

import graft.dicts.Dicts
import graft.pipeline.{Checkpoints, Transcripts}
import graft.streaming.StreamingPipeline
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ResumeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def collectTriples(df: org.apache.spark.sql.DataFrame): Set[String] =
    df.collect().map(_.toString).toSet

  test("kill-after-stage-k resume: identical output, upstream stages not recomputed") {
    val base = Files.createTempDirectory("graft-ck").toString
    val turns = Transcripts.fixture(spark)

    val first = collectTriples(Checkpoints.runPipeline(spark, turns, Dicts.fixture, base))
    assert(first.nonEmpty)

    // record checkpoint mtimes, then simulate a crash after stage 3:
    // drop lineage for edges/components/triples and rerun
    val mentionsLineage = java.nio.file.Paths.get(s"$base/mentions_lineage.json")
    val mtimeBefore = Files.getLastModifiedTime(mentionsLineage)
    val ck = new Checkpoints(spark, base)
    ck.invalidate("edges", "components", "triples")

    val second = collectTriples(Checkpoints.runPipeline(spark, turns, Dicts.fixture, base))
    assert(second == first, "resumed output must equal the original")
    assert(Files.getLastModifiedTime(mentionsLineage) == mtimeBefore,
      "mentions stage must be resumed from checkpoint, not recomputed")
  }

  test("content hash is partition-layout independent") {
    val ck = new Checkpoints(spark, Files.createTempDirectory("graft-h").toString)
    val df = Transcripts.fixture(spark).toDF()
    assert(ck.contentHash(df) == ck.contentHash(df.repartition(7)))
    assert(ck.contentHash(df) != ck.contentHash(df.limit(5)))
  }
}

class StreamingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("streaming mention detection equals batch on the same turns") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-stream").toString
    val turns = Transcripts.fixture(spark)
    turns.write.mode("overwrite").parquet(dir)

    val batch = graft.ner.MentionDetector
      .mentions(spark, turns, Dicts.fixture).collect().map(_.toString).toSet

    val streamingTurns = spark.readStream
      .schema(turns.schema).parquet(dir).as[graft.core.Turn]
    val q = StreamingPipeline.runToMemory(spark, streamingTurns, Dicts.fixture, "m_sink")
    val streamed = spark.sql("SELECT * FROM m_sink").as[graft.core.Mention]
      .collect().map(_.toString).toSet
    q.stop()
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }

  test("windowed mention counts with watermark run in streaming mode") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-stream2").toString
    val turns = Transcripts.fixture(spark)
    turns.write.mode("overwrite").parquet(dir)
    val streamingTurns = spark.readStream
      .schema(turns.schema).parquet(dir).as[graft.core.Turn]
    val agg = StreamingPipeline.windowedMentionCounts(streamingTurns, Dicts.fixture)
    val q = agg.writeStream.outputMode("append").format("memory").queryName("w_sink").start()
    q.processAllAvailable()
    q.stop()
    // append mode only emits closed windows; correctness of the aggregation
    // itself is covered by the batch-equivalence above — here we assert the
    // streaming plan is executable with watermark + window
    assert(spark.sql("SELECT * FROM w_sink").columns.toSet == Set("win_start", "surface", "n"))
  }
}
