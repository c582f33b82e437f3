package graft

import java.nio.file.Files

import scala.jdk.CollectionConverters._

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
    val detectedLineage = java.nio.file.Paths.get(s"$base/detected_lineage.json")
    val mtimeBefore = Files.getLastModifiedTime(detectedLineage)
    val ck = new Checkpoints(spark, base)
    ck.invalidate("edges", "components", "triples")

    val second = collectTriples(Checkpoints.runPipeline(spark, turns, Dicts.fixture, base))
    assert(second == first, "resumed output must equal the original")
    assert(Files.getLastModifiedTime(detectedLineage) == mtimeBefore,
      "detection stage must be resumed from checkpoint, not recomputed")
  }

  test("checkpointed pipeline runs ONE detection stage (fused NER+RE)") {
    val base = Files.createTempDirectory("graft-ck1").toString
    Checkpoints.runPipeline(spark, Transcripts.fixture(spark), Dicts.fixture, base)
    val metrics = new String(Files.readAllBytes(java.nio.file.Paths.get(s"$base/metrics.jsonl")))
    val stages = """"stage":"([a-z]+)"""".r.findAllMatchIn(metrics).map(_.group(1)).toSeq
    assert(stages.count(_ == "detected") == 1, s"one fused detection stage expected, got $stages")
    assert(!stages.contains("mentions") && !stages.contains("relations"),
      "mentions/relations must be projections of the fused stage, not separate detection scans")
    assert(stages.toSet == Set("detected", "samples", "edges", "components", "triples"))
  }

  test("resume of a completed run is O(metadata): no full stage re-hash") {
    val base = Files.createTempDirectory("graft-ck2").toString
    val turns = Transcripts.fixture(spark)
    val first = collectTriples(Checkpoints.runPipeline(spark, turns, Dicts.fixture, base))

    val ck = new Checkpoints(spark, base)
    val second = collectTriples(Checkpoints.runPipelineWith(ck, spark, turns, Dicts.fixture))
    assert(second == first)
    // the only permitted content-hash scan on a fully-valid resume is the
    // INPUT fingerprint (stale-input detection); completed stages validate
    // against their recorded file manifest without any Spark scan
    assert(ck.hashScans.get() == 1,
      s"resume must not re-hash completed stages (got ${ck.hashScans.get()} scans)")

    // audit mode is still available and re-validates content in full
    val ckAudit = new Checkpoints(spark, base, auditFullHash = true)
    val third = collectTriples(Checkpoints.runPipelineWith(ckAudit, spark, turns, Dicts.fixture))
    assert(third == first)
    assert(ckAudit.hashScans.get() > 1, "audit mode must re-hash checkpoints")
  }

  test("corrupted/rewritten checkpoint data fails metadata validation and recomputes") {
    val base = Files.createTempDirectory("graft-ck3").toString
    val turns = Transcripts.fixture(spark)
    val first = collectTriples(Checkpoints.runPipeline(spark, turns, Dicts.fixture, base))

    // truncate one data file of the edges checkpoint (size no longer
    // matches the recorded manifest)
    val edgesDir = java.nio.file.Paths.get(s"$base/edges")
    val part = Files.list(edgesDir).iterator().asScala
      .find(_.getFileName.toString.endsWith(".parquet")).get
    val bytes = Files.readAllBytes(part)
    Files.write(part, bytes.dropRight(1))
    val ck = new Checkpoints(spark, base)
    assert(!ck.isValid("edges", ck.hashOf("detected")), "size mismatch must invalidate")

    val second = collectTriples(Checkpoints.runPipeline(spark, turns, Dicts.fixture, base))
    assert(second == first, "recomputed-from-corruption output must equal the original")
  }

  test("stale input invalidates completed stages instead of resuming") {
    val base = Files.createTempDirectory("graft-ck4").toString
    val turns = Transcripts.fixture(spark)
    collectTriples(Checkpoints.runPipeline(spark, turns, Dicts.fixture, base))
    val detectedLineage = java.nio.file.Paths.get(s"$base/detected_lineage.json")
    val mtimeBefore = Files.getLastModifiedTime(detectedLineage)

    import spark.implicits._
    val changed = turns.filter($"turn_idx" =!= 0)
    collectTriples(Checkpoints.runPipeline(spark, changed, Dicts.fixture, base))
    assert(Files.getLastModifiedTime(detectedLineage) != mtimeBefore,
      "changed input must recompute the detection stage")
  }

  test("configFingerprint covers every detection-relevant dict field") {
    val base = Dicts.fixture
    def fp(d: Dicts, t: Double = 0.13) = Checkpoints.configFingerprint(d, t)
    val f0 = fp(base)
    assert(f0 == fp(Dicts.fixture), "deterministic")
    assert(f0 != fp(base, 0.2), "threshold")
    assert(f0 != fp(base.copy(strongSources = base.strongSources.tail)), "strong set")
    assert(f0 != fp(base.copy(sourceType = base.sourceType.updated(0, "PlugIn"))), "source type")
    assert(f0 != fp(base.copy(licenses = base.licenses + "ZZZ-1.0")), "licenses")
    // value-level change under an IDENTICAL key set (the round-2 digest
    // hashed inverted keys only and missed this)
    val moved = base.inverted.updated("Stata", Array(1))
    assert(f0 != fp(base.copy(inverted = moved)), "inverted source-id values")
    assert(f0 != fp(base.copy(dbpediaLabel = base.dbpediaLabel - "STATA")), "label mapping")
    // separator regression (ADVICE r04, high): without the \u0001 joiner the
    // sorted set {"ab","c"} and {"a","bc"} both concatenate to "abc" and two
    // different configs silently resume each other's checkpoints
    assert(fp(base.copy(licenses = Set("ab", "c"))) !=
      fp(base.copy(licenses = Set("a", "bc"))), "set-element boundary")
    // and without the \u0002 key/value separator, key "ab" with value "1"
    // collides with key "ab1" carrying an empty-ish tail at the boundary
    assert(fp(base.copy(sourceIds = Map("ab" -> 1, "x" -> 2))) !=
      fp(base.copy(sourceIds = Map("ab1" -> 1, "x" -> 2))) &&
      fp(base.copy(sourceIds = Map("a" -> 11))) !=
      fp(base.copy(sourceIds = Map("a1" -> 1))), "key/value boundary")
    // SECTION boundary (round-5 review): an entry moving between two
    // adjacent maps must change the fingerprint — with the same separator
    // for entries and sections, {a,b}|{c} and {a}|{b,c} serialized
    // byte-identically
    assert(fp(base.copy(sourceIds = Map("a" -> 1, "b" -> 2), inverted = Map("c" -> Array(3)))) !=
      fp(base.copy(sourceIds = Map("a" -> 1), inverted = Map("b" -> Array(2), "c" -> Array(3)))),
      "entry moving across the section boundary")
    // set VALUES can contain commas — a comma joiner collided these
    // (round-5 review)
    assert(fp(base.copy(dbpediaUnique = base.dbpediaUnique.updated("K", Set("Washington, D.C.")))) !=
      fp(base.copy(dbpediaUnique = base.dbpediaUnique.updated("K", Set("Washington", " D.C.")))),
      "comma inside a surface must not merge set elements")
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

  test("mapGroupsWithState running mention counts: state folds across micro-batches, totals equal batch") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-stream3").toString
    val t1 = Transcripts.fixture(spark)
    val t2 = t1.map(t => t.copy(conv_id = t.conv_id + "_b"))
    // two single-file writes + maxFilesPerTrigger=1 → every surface arrives
    // in (at least) two separate micro-batches, so the per-key state must
    // genuinely fold, not just initialize
    t1.coalesce(1).write.mode("overwrite").parquet(dir)
    t2.coalesce(1).write.mode("append").parquet(dir)
    val streamingTurns = spark.readStream.schema(t1.schema)
      .option("maxFilesPerTrigger", 1).parquet(dir).as[graft.core.Turn]
    val counts = StreamingPipeline.runningMentionCounts(streamingTurns, Dicts.fixture)
    val q = counts.toDF("surface", "total", "batches").writeStream
      .outputMode("update").format("memory").queryName("rc_sink").start()
    q.processAllAvailable()
    q.stop()
    val finalTotals = spark.sql("SELECT surface, max(total) AS t FROM rc_sink GROUP BY surface")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val batch = graft.ner.MentionDetector
      .mentions(spark, t1.unionByName(t2).as[graft.core.Turn], Dicts.fixture)
      .groupBy($"surface").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(finalTotals == batch)
    assert(spark.sql("SELECT max(batches) AS b FROM rc_sink").head().getLong(0) >= 2,
      "state must have folded across at least two micro-batches")
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
