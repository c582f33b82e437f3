package graft

import java.nio.file.Files

import graft.dicts.Dicts
import graft.io.TableIO
import graft.pipeline.{Checkpoints, Transcripts}
import graft.streaming.StreamingPipeline
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-4 gates: Hadoop-FS manifest layer (VERDICT r03 #1), mtime
  * integrity signal (ADVICE r03), read-committed triples helper, fused
  * MinHash kernel parity, TTL'd streaming state.
  */
class HadoopFsManifestSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def fileUri(prefix: String): String =
    "file://" + Files.createTempDirectory(prefix).toString

  test("TableIO snapshot commit + read work against a file:/// Hadoop-FS URI") {
    import spark.implicits._
    val base = fileUri("graft-hfs")
    val s0 = TableIO.writeSnapshot(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), base)
    val s1 = TableIO.writeSnapshot(Seq((1L, "a2")).toDF("id", "v"), base)
    assert(s0 == 0L && s1 == 1L)
    assert(TableIO.currentSnapshot(base) == 1L)
    assert(TableIO.read(spark, base).collect().map(_.getString(1)).toSeq == Seq("a2"))
    // time travel still resolves the previous snapshot
    assert(TableIO.readSnapshot(spark, base, 0L).count() == 2L)
    TableIO.vacuum(base)
    assert(TableIO.readSnapshot(spark, base, 1L).count() == 1L)
  }

  test("pointer recovery: missing or stale _current degrades to the _committed scan") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft-ptr")
    val base = "file://" + tmp.toString
    TableIO.writeSnapshot(Seq(1L).toDF("id"), base)
    TableIO.writeSnapshot(Seq(1L, 2L).toDF("id"), base)

    // crash shape 1: rename never landed — no pointer at all
    Files.delete(tmp.resolve("_current"))
    assert(TableIO.currentSnapshot(base) == 1L, "scan for _committed must recover the snapshot")
    assert(TableIO.read(spark, base).count() == 2L)

    // crash shape 2 (object store without atomic rename): marker written,
    // flip lost — the pointer TRAILS a newer committed snapshot; the next
    // write after recovery must also not reuse the committed id
    Files.write(tmp.resolve("_current"), "0".getBytes)
    assert(TableIO.currentSnapshot(base) == 1L, "stale pointer must be overridden by _committed probe")
    val next = TableIO.writeSnapshot(Seq(3L).toDF("id"), base)
    assert(next == 2L)
    assert(TableIO.read(spark, base).count() == 1L)

    // corrupt pointer content
    Files.write(tmp.resolve("_current"), "garbage".getBytes)
    assert(TableIO.currentSnapshot(base) == 2L)
  }

  test("checkpointed pipeline resumes against a file:/// URI with O(metadata) validation") {
    val tmp = Files.createTempDirectory("graft-ckfs")
    val base = "file://" + tmp.toString
    val turns = Transcripts.fixture(spark)
    val first = Checkpoints.runPipeline(spark, turns, Dicts.fixture, base)
      .collect().map(_.toString).toSet
    assert(first.nonEmpty)
    assert(Files.exists(tmp.resolve("detected_lineage.json")), "lineage lands under the URI's path")

    // fresh-session shape: drop THIS baseDir's bucketed-stage catalog
    // entries (prefix = per-baseDir hash — other suites' checkpoints may be
    // in flight concurrently) so the resume must RE-REGISTER them from
    // lineage with the file:// LOCATION
    val prefix = "graft_ck_" + java.lang.Long.toHexString(graft.core.Hash61.hash(base))
    spark.catalog.listTables().collect().map(_.name)
      .filter(_.startsWith(prefix)).foreach(t => spark.sql(s"DROP TABLE $t"))
    val ck = new Checkpoints(spark, base)
    val second = Checkpoints.runPipelineWith(ck, spark, turns, Dicts.fixture)
      .collect().map(_.toString).toSet
    assert(second == first, "fully-valid resume must reproduce the output")
    assert(ck.hashScans.get() == 1L,
      "resume through the Hadoop-FS layer must hash ONLY the input fingerprint " +
        s"(got ${ck.hashScans.get()} content scans)")
  }

  test("same-size in-place rewrite of a checkpoint file invalidates via mtime (ADVICE r03)") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft-mtime")
    val ck = new Checkpoints(spark, tmp.toString)
    ck.stage("s", "fp") { Seq(1, 2, 3).toDF("x").coalesce(1) }
    assert(ck.isValid("s", "fp"))
    val scansAfterWrite = ck.hashScans.get() // the write itself hashes once

    import scala.jdk.CollectionConverters._
    val dataFile = Files.list(tmp.resolve("s")).iterator().asScala
      .find(_.getFileName.toString.endsWith(".parquet")).get
    // bit-flip in place: same byte count, different content — the round-3
    // names+sizes manifest accepted this silently
    val bytes = Files.readAllBytes(dataFile)
    bytes(bytes.length / 2) = (bytes(bytes.length / 2) ^ 0x01).toByte
    Files.write(dataFile, bytes)
    // force a DIFFERENT mtime even on a coarse-granularity filesystem
    Files.setLastModifiedTime(dataFile,
      java.nio.file.attribute.FileTime.fromMillis(
        Files.getLastModifiedTime(dataFile).toMillis + 2000))
    assert(!ck.isValid("s", "fp"),
      "same-size corruption must fail the mtime check without a content re-hash")
    assert(ck.hashScans.get() == scansAfterWrite, "the mtime check itself must stay O(metadata)")
  }

  test("committedTriples hides a batch written before its state commit (ADVICE r03)") {
    import spark.implicits._
    val d = Dicts.fixture
    val dir = Files.createTempDirectory("graft-rc").toString
    val fixture = Transcripts.fixture(spark).collect()
    StreamingPipeline.processBatch(
      fixture.filter(_.conv_id == "c1").toSeq.toDS(), d, dir, s"$dir/out", 0L)

    val committed0 = StreamingPipeline.committedTriples(spark, dir, s"$dir/out")
    val raw0 = spark.read.parquet(s"$dir/out").count()
    assert(committed0.count() == raw0 && raw0 > 0)

    // crash between triples write and state commit: batch 1's partition is
    // on disk but the watermark still says 0
    val batch1 = fixture.filter(_.conv_id == "c2").toSeq.toDS()
    graft.re.RelationExtractor.relations(batch1, Dicts.broadcast(spark, d)).toDF()
      .withColumn("subj_canon", $"subj_surface").withColumn("obj_canon", $"obj_surface")
      .select($"subj_surface".as("subj"), $"pred", $"obj_surface".as("obj"),
        $"conv_id", $"turn_idx", $"subj_canon", $"obj_canon")
      .write.mode("overwrite").parquet(s"$dir/out/batch_id=1")
    assert(spark.read.parquet(s"$dir/out").count() > raw0, "raw read sees the orphan batch")
    assert(StreamingPipeline.committedTriples(spark, dir, s"$dir/out").count() == raw0,
      "read-committed view must exclude the uncommitted batch partition")

    // once the replayed batch commits, the same helper includes it
    StreamingPipeline.processBatch(batch1, d, dir, s"$dir/out", 1L)
    assert(StreamingPipeline.committedTriples(spark, dir, s"$dir/out").count() ==
      spark.read.parquet(s"$dir/out").count())
  }
}

class BucketedPipelineSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("checkpointed samples⋈components stay co-located: no Exchange, survives a fresh session") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft-bktck").toString
    val turns = Transcripts.fixture(spark)
    val first = Checkpoints.runPipeline(spark, turns, Dicts.fixture, base)
      .collect().map(_.toString).toSet
    assert(first.nonEmpty)

    // per-baseDir prefix: other suites' bucketed checkpoints may be live
    // concurrently in the shared session — never touch theirs
    val prefix = "graft_ck_" + java.lang.Long.toHexString(graft.core.Hash61.hash(base))
    def ckTables() = spark.catalog.listTables().collect()
      .map(_.name).filter(_.startsWith(prefix)).toSeq
    val tables = ckTables()
    assert(tables.exists(_.endsWith("_samples")) && tables.exists(_.endsWith("_components")),
      s"bucketed stages must register catalog tables, got $tables")

    // simulate a FRESH session resuming: the catalog is empty there, only
    // data + lineage survive on storage — drop the entries and resume
    tables.foreach(t => spark.sql(s"DROP TABLE $t"))
    val ck = new Checkpoints(spark, base)
    val second = Checkpoints.runPipelineWith(ck, spark, turns, Dicts.fixture)
      .collect().map(_.toString).toSet
    assert(second == first, "resume through re-registered bucketed checkpoints must reproduce output")
    assert(ck.hashScans.get() == 1L, "bucketed resume must stay O(metadata)")

    // the canonical back-join itself, forced onto the SMJ path: both sides
    // read from the bucketed checkpoints → NO Exchange anywhere in the plan
    val sTable = ckTables().find(_.endsWith("_samples")).get
    val cTable = ckTables().find(_.endsWith("_components")).get
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", -1)
    try {
      val s = spark.table(sTable).select($"mention", $"sample_id")
      val c = spark.table(cTable)
      val joined = s.join(c, $"sample_id" === c("id"))
        .select($"mention", $"component".as("canonical"))
      assert(joined.count() > 0)
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed canonical back-join must not shuffle either side:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}

class Round4OpsSpec extends AnyFunSuite {
  /** True iff a reliable checkpoint was actually WRITTEN under `dir`.
    * `setCheckpointDir` eagerly creates a UUID subdirectory, so "dir is
    * non-empty" is vacuously true the moment the dir is configured — the
    * evidence is the `rdd-*` checkpoint data directories inside it.
    */
  private def hasRddCheckpoint(dir: String): Boolean = {
    import scala.jdk.CollectionConverters._
    val w = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
    try w.iterator().asScala.exists(_.getFileName.toString.startsWith("rdd-"))
    finally w.close()
  }

  private lazy val spark = SparkTestSession.spark

  test("fused minhash kernel is bit-identical to the declarative band build") {
    import spark.implicits._
    val texts = Seq(
      "alpha beta gamma delta epsilon zeta",
      "alpha beta gamma delta epsilon eta",
      "one",                       // fewer tokens than k
      "",                          // empty text → single empty-token shingle
      "double  space   runs here", // consecutive spaces → empty tokens kept
      "x y z x y z x y z",
      "tail space ",               // trailing empty token kept by split(-1)
      "ünïcode tökens ❄ mit 🎈 emoji bytes") // multi-byte UTF-8 through the byte-hash path
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    for (k <- Seq(2, 3); (nh, nb) <- Seq((8, 4), (16, 16))) {
      val declarative = graft.ops.Dedup.minhashBands(
        docs.select(col("doc_id"),
          explode(transform(
            filter(
              transform(sequence(lit(0), greatest(size(split(col("text"), " ")) - k, lit(0))),
                i => slice(split(col("text"), " "), i + 1, lit(k))),
              a => size(a) > 0),
            a => xxhash64(array_join(a, " ")))).as("shingle")), nh, nb)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
      val fused = graft.ops.Dedup.minhashBandSignatures(docs, k, nh, nb)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
      assert(fused == declarative, s"k=$k numHashes=$nh bands=$nb")
    }
  }

  test("fused shingleSets equals the declarative shingle table, grouped and sorted") {
    import spark.implicits._
    val texts = Seq(
      "alpha beta gamma delta epsilon zeta",
      "one", "", "double  space   runs here",
      "x y z x y z x y z", "tail space ",
      "ünïcode tökens ❄ mit 🎈 emoji bytes")
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    for (k <- Seq(2, 3)) {
      val declarative = graft.ops.Dedup.shingles(docs, k)
        .collect().groupBy(_.getLong(0))
        .map { case (id, rows) => id -> rows.map(_.getLong(1)).sorted.toSeq }
      val fused = graft.ops.Dedup.shingleSets(docs, k)
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
      assert(fused == declarative, s"k=$k")
    }
  }

  test("fused simhash kernel is bit-identical to the declarative 60-column build") {
    import spark.implicits._
    val texts = Seq(
      "alpha beta gamma delta epsilon zeta",
      "one", "", "double  space   runs here",
      "x y z x y z x y z", "tail space ",
      "ünïcode tökens ❄ mit 🎈 emoji bytes",
      "the same boilerplate text repeated across documents")
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val declarative = graft.ops.Dedup.simhash(docs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val fused = graft.ops.Dedup.simhashSignatures(docs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fused == declarative)
  }

  test("real PNG decode recovers the generator's exact pixel statistics") {
    import graft.ops.Multimodal
    for (id <- Seq(0L, 1L, 17L, 255L, 4096L, 99999L)) {
      val d = Multimodal.decodeImage(id, Multimodal.encodePng(id))
      val (w, h) = Multimodal.pngDims(id)
      assert(d.meta.width == w && d.meta.height == h)
      assert(d.meta.channels == 1 && d.meta.format == "png")
      val sum = (for { y <- 0 until h; x <- 0 until w } yield (id * 31 + x * 7 + y * 13) % 256).sum
      assert(d.luma_mean == (sum * 10000L / (w.toLong * h)).toDouble / 10000.0,
        s"doc $id: decoded luma must equal the closed form")
      assert(d.n_bytes > 0)
    }
    // a non-image payload fails loudly, not silently
    assertThrows[IllegalArgumentException](
      Multimodal.decodeImage(1L, "not an image".getBytes))
  }

  test("nearest-neighbor resize samples the exact source pixels (incl. upscale duplication)") {
    import graft.ops.Multimodal
    // ids cover w>4 (downsample), w=1 (pixel duplication) and mixed
    for (id <- Seq(7L, 16L, 0L, 133L)) {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(Multimodal.encodePng(id)))
      val (w, h) = Multimodal.pngDims(id)
      val got = Multimodal.resizeNearest(img.getRaster, 4, 3)
      val want = for { y <- 0 until 3; x <- 0 until 4 } yield {
        val sx = x * w / 4
        val sy = y * h / 3
        ((id * 31 + sx * 7 + sy * 13) % 256).toInt
      }
      assert(got.toSeq == want, s"doc $id ($w x $h)")
    }
  }

  test("distributed CC rounds under a reliable checkpoint dir yield identical components") {
    import spark.implicits._
    // force the distributed loop (driverCutoff = 0) over a chain + ring +
    // isolated vertex; rerun with a checkpoint dir configured — the rounds
    // switch to reliable checkpoint() (Reliably.checkpoint) with identical
    // results
    val edges = Seq((1L, 2L), (2L, 3L), (10L, 11L), (11L, 12L), (12L, 10L))
      .map { case (s_, d_) => graft.core.Edge(s_, d_, 0.0) }.toDS()
    val vertices = (1L to 12L).map(java.lang.Long.valueOf).toDS()
    def components(): Map[Long, Long] =
      graft.ed.ConnectedComponents.run(vertices, edges, driverCutoff = 0L)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val local = components()
    val ckDir = Files.createTempDirectory("graft-cc-ck").toString
    spark.sparkContext.setCheckpointDir(ckDir)
    try {
      val reliable = components()
      assert(reliable == local)
      assert(reliable(3L) == 1L && reliable(12L) == 10L && reliable(7L) == 7L)
      assert(hasRddCheckpoint(ckDir),
        "CC rounds must have written rdd-* reliable checkpoints under the configured dir")
    } finally spark.sparkContext.setCheckpointDir(null)
  }

  test("cosineDupes finds genuinely near-duplicate embeddings (recall 1.0 at high cosine)") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    // 40 random base vectors, each with a near-duplicate (tiny perturbation
    // → cosine ≈ 1, where banding recall is ≈ 1 by the formula), plus the
    // mutually quasi-orthogonal bases as distractors
    val bases = (0 until 40).map(i => (i, Array.fill(64)(rnd.nextGaussian().toFloat)))
    val rows = bases.flatMap { case (i, v) =>
      val dup = v.map(x => x + 0.01f * rnd.nextGaussian().toFloat)
      Seq((i.toLong, v), (100L + i, dup))
    }
    val emb = rows.toDF("vec_id", "embedding")
    val exact = graft.ops.SimilaritySearch.exactCosinePairs(emb, 0.9)
    assert(exact.count() == 40, "each base pairs only with its perturbation at cosine 0.9")
    val approx = graft.ops.SimilaritySearch.cosineDupes(emb, 0.9)
    val recall = graft.ops.SimilaritySearch.pairRecall(approx, exact)
    assert(recall == 1.0, s"banding must not lose near-identical pairs (recall $recall)")
    // precision 1.0 by construction: every emitted pair passed exact cosine
    assert(approx.join(exact, Seq("src", "dst"), "left_anti").count() == 0)
  }

  test("minhashDupes under a reliable checkpoint dir yields the same verified pairs") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog tonight"),
      (2L, "the quick brown fox jumps over the lazy dog today"),
      (3L, "an entirely different document about spark joins and shuffles")
    ).toDF("doc_id", "text")
    val local = graft.ops.Dedup.minhashDupes(docs, k = 3, numHashes = 32, bands = 32,
      threshold = 0.5).select("src", "dst").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ckDir = Files.createTempDirectory("graft-reliable-ck").toString
    spark.sparkContext.setCheckpointDir(ckDir)
    try {
      val reliable = graft.ops.Dedup.minhashDupes(docs, k = 3, numHashes = 32, bands = 32,
        threshold = 0.5).select("src", "dst").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(reliable == local && reliable == Set((1L, 2L)))
      assert(hasRddCheckpoint(ckDir),
        "reliable checkpoint must actually write rdd-* data under the configured dir")
    } finally {
      // restore the default localCheckpoint path for the other suites
      spark.sparkContext.setCheckpointDir(null)
    }
  }
}

class StreamingTtlSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("runningMentionCounts with an idle TTL folds identically while keys stay active") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-ttl").toString
    val t1 = Transcripts.fixture(spark)
    val t2 = t1.map(t => t.copy(conv_id = t.conv_id + "_b"))
    t1.coalesce(1).write.mode("overwrite").parquet(dir)
    t2.coalesce(1).write.mode("append").parquet(dir)
    val streamingTurns = spark.readStream.schema(t1.schema)
      .option("maxFilesPerTrigger", 1).parquet(dir).as[graft.core.Turn]
    // TTL far beyond the test's wall-clock: exercises the
    // ProcessingTimeTimeout state path without triggering eviction
    val counts = StreamingPipeline.runningMentionCounts(streamingTurns, Dicts.fixture,
      idleTimeout = Some("1 hour"))
    // poll-and-stop, NOT processAllAvailable/AvailableNow-termination: with
    // ProcessingTimeTimeout registered every batch schedules a future timer
    // batch, so the engine always "requires another batch" — noNewData
    // never latches (processAllAvailable blocks) and AvailableNow never
    // terminates. The timer batches emit nothing (no key idles an hour),
    // so the sink converges; wait for the expected totals, then stop.
    val q = counts.toDF("surface", "total", "batches").writeStream
      .outputMode("update").format("memory").queryName("ttl_sink").start()
    val batch = graft.ner.MentionDetector
      .mentions(spark, t1.unionByName(t2).as[graft.core.Turn], Dicts.fixture)
      .groupBy($"surface").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    def sinkTotals() = spark.sql(
      "SELECT surface, max(total) AS t FROM ttl_sink WHERE batches > 0 GROUP BY surface")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val deadline = System.nanoTime() + 180L * 1000000000L
    while (sinkTotals() != batch && System.nanoTime() < deadline) Thread.sleep(500)
    val finalTotals = sinkTotals()
    q.stop()
    assert(finalTotals == batch)
  }
}
