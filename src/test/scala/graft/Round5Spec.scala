package graft

import java.nio.file.Files
import org.apache.spark.storage.StorageLevel
import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.{Checkpoints, Pipeline, Transcripts}
import graft.dicts.Dicts

/** Round-5 hardening: durable metrics under concurrent Checkpoints roots,
  * targeted cache release for harness loops, and session hygiene.
  */
class Round5Spec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("checkpoint cleanup conf is on (long-running session hygiene)") {
    assert(spark.sparkContext.getConf
      .getBoolean("spark.cleaner.referenceTracking.cleanCheckpoints", false),
      "spark.cleaner.referenceTracking.cleanCheckpoints must be set where sessions are built")
  }

  test("metrics survive two Checkpoints roots sharing a baseDir (no lost records)") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft-metrics").toString
    val a = new Checkpoints(spark, base)
    val b = new Checkpoints(spark, base)
    // interleave stage writes from the two roots — the old shared-file
    // read-modify-write could drop whichever record lost the race; with
    // one file per stage run, all four must be present
    a.stage("s1", "i1") { Seq(1, 2, 3).toDF("v") }
    b.stage("s2", "i2") { Seq(4).toDF("v") }
    a.stage("s3", "i3") { Seq(5, 6).toDF("v") }
    b.stage("s4", "i4") { Seq(7).toDF("v") }
    for (ck <- Seq(a, b)) {
      val recs = ck.metricRecords
      assert(recs.size == 4, s"expected 4 metric records, got ${recs.size}")
      assert(Seq("s1", "s2", "s3", "s4").forall(s => recs.exists(_.contains("\"stage\":\"" + s + "\""))))
    }
    // the derived convenience view is maintained incrementally per writer:
    // it must contain the LAST writer's complete record set (b wrote s2, s4)
    // and nothing that is not a real record; under concurrent roots it may
    // omit the other root's records — the record files above are the truth
    val jsonl = new String(Files.readAllBytes(java.nio.file.Paths.get(s"$base/metrics.jsonl")))
    assert(Seq("s2", "s4").forall(s => jsonl.contains("\"stage\":\"" + s + "\"")),
      "last writer's own records must be in the derived view")
    assert(jsonl.linesIterator.forall(l => a.metricRecords.contains(l)),
      "derived view must contain only real records")
  }

  test("a pre-round-5 metrics.jsonl is migrated, not destroyed, on first write") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft-legacy").toString
    // old layout: appended metrics.jsonl, no metrics/ record directory
    Files.writeString(java.nio.file.Paths.get(s"$base/metrics.jsonl"),
      "{\"stage\":\"old1\",\"rows\":5}\n{\"stage\":\"old2\",\"rows\":7}\n")
    val ck = new Checkpoints(spark, base)
    ck.stage("fresh", "i") { Seq(1).toDF("v") }
    val recs = ck.metricRecords
    assert(Seq("old1", "old2", "fresh").forall(n => recs.exists(_.contains("\"stage\":\"" + n + "\""))),
      s"legacy records must survive migration: $recs")
    val jsonl = new String(Files.readAllBytes(java.nio.file.Paths.get(s"$base/metrics.jsonl")))
    assert(Seq("old1", "old2", "fresh").forall(n => jsonl.contains("\"stage\":\"" + n + "\"")))
  }

  test("Reliably.checkpoint leaves a caller-persisted dataframe cached") {
    import spark.implicits._
    val ckDir = Files.createTempDirectory("graft-rel").toString
    spark.sparkContext.setCheckpointDir(ckDir)
    try {
      val df = Seq(1, 2, 3).toDF("v").persist()
      df.count()
      graft.io.Reliably.checkpoint(df).count()
      assert(df.storageLevel != org.apache.spark.storage.StorageLevel.NONE,
        "the helper must not unpersist a cache it does not own (round-5 review)")
      df.unpersist()
    } finally spark.sparkContext.setCheckpointDir(null)
  }

  test("reserved/unsafe stage names are rejected") {
    val ck = new Checkpoints(spark, Files.createTempDirectory("graft-names").toString)
    import spark.implicits._
    intercept[IllegalArgumentException](ck.stage("metrics") { Seq(1).toDF("v") })
    intercept[IllegalArgumentException](ck.stage("bad-name") { Seq(1).toDF("v") })
    intercept[IllegalArgumentException](ck.stage("") { Seq(1).toDF("v") })
    ck.stage("ok_name_1") { Seq(1).toDF("v") } // sane names still work
  }

  test("vacuum repairs a trailing pointer before deleting what it points at") {
    import spark.implicits._
    import graft.io.TableIO
    val base = Files.createTempDirectory("graft-vac").toString + "/t"
    TableIO.writeSnapshot(Seq((1, "a")).toDF("k", "v"), base)   // snapshot 0
    TableIO.writeSnapshot(Seq((2, "b")).toDF("k", "v"), base)   // snapshot 1
    TableIO.writeSnapshot(Seq((3, "c")).toDF("k", "v"), base)   // snapshot 2
    // simulate the documented crash window: _committed for 1 and 2 exist
    // but the pointer still names 0 (crash after marker, before flip)
    Files.writeString(java.nio.file.Paths.get(s"$base/_current"), "0")
    assert(TableIO.currentSnapshot(base) == 2L, "forward probe")
    TableIO.vacuum(base)
    // pre-fix: vacuum deleted snapshot 0 and 1 but left the pointer at 0 —
    // reads threw, and the NEXT commit got id 1, silently shadowed by the
    // orphaned snapshot 2
    assert(TableIO.currentSnapshot(base) == 2L, "pointer repaired")
    assert(TableIO.read(spark, base).collect().map(_.getInt(0)).toSeq == Seq(3))
    val next = TableIO.writeSnapshot(Seq((4, "d")).toDF("k", "v"), base)
    assert(next == 3L, "next commit must go ABOVE the orphan, not below it")
    assert(TableIO.read(spark, base).collect().map(_.getInt(0)).toSeq == Seq(4))
  }

  test("currentSnapshot falls back to the committed scan on a dangling pointer") {
    import spark.implicits._
    import graft.io.TableIO
    val base = Files.createTempDirectory("graft-dangle").toString + "/t"
    TableIO.writeSnapshot(Seq((1, "a")).toDF("k", "v"), base)   // snapshot 0
    TableIO.writeSnapshot(Seq((2, "b")).toDF("k", "v"), base)   // snapshot 1
    // pointer names a snapshot whose directory is gone entirely
    Files.writeString(java.nio.file.Paths.get(s"$base/_current"), "7")
    assert(TableIO.currentSnapshot(base) == 1L,
      "a pointer to a missing snapshot must degrade to the _committed scan")
  }

  test("vacuum retain=N keeps the N newest committed snapshots") {
    import spark.implicits._
    import graft.io.TableIO
    val base = Files.createTempDirectory("graft-retain").toString + "/t"
    (0 until 4).foreach(i => TableIO.writeSnapshot(Seq((i, "x")).toDF("k", "v"), base))
    TableIO.vacuum(base, retain = 2)
    assert(!Files.exists(java.nio.file.Paths.get(s"$base/snapshot=1")))
    assert(Files.exists(java.nio.file.Paths.get(s"$base/snapshot=2")), "predecessor retained")
    assert(Files.exists(java.nio.file.Paths.get(s"$base/snapshot=3")))
    assert(TableIO.currentSnapshot(base) == 3L)
  }

  test("streaming watermark-regression guard fires even when the recycled batch is empty") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-regress").toString
    val turns = Transcripts.fixture(spark)
    graft.streaming.StreamingPipeline.processBatch(turns, Dicts.fixture, dir, s"$dir/out", 5L)
    // lost checkpointLocation: the source renumbers from 0 — even an EMPTY
    // recycled batch must fail loudly, not slide silently toward a fake
    // "replay" collision at the watermark id (round-5 review)
    val empty = turns.filter($"turn_idx" < -1)
    val e = intercept[IllegalArgumentException] {
      graft.streaming.StreamingPipeline.processBatch(empty, Dicts.fixture, dir, s"$dir/out", 0L)
    }
    assert(e.getMessage.contains("regressed below committed watermark"))
  }

  test("zero-norm embeddings score cosine 0.0 — never NaN-rank-first or NaN-duplicate") {
    import spark.implicits._
    import graft.ops.SimilaritySearch
    def vec(xs: Double*): Array[Float] = xs.map(_.toFloat).toArray
    val emb = Seq(
      (0L, vec(1, 0, 0, 0), 0),
      (1L, vec(0.9, 0.1, 0, 0), 0),
      (2L, vec(0, 0, 0, 0), 9) // all-zero: empty doc / failed encoder
    ).toDF("vec_id", "embedding", "label")
    val top = SimilaritySearch.bruteForceTopK(emb, emb.filter($"vec_id" === 0L), k = 2)
      .orderBy("rank").collect()
    assert(top.head.getAs[Long]("neighbor_id") == 1L,
      "the zero vector must not NaN-sort above the true nearest neighbor")
    assert(top.forall(r => !r.getAs[Double]("sim").isNaN), "no NaN sims in output")
    val dupes = SimilaritySearch.cosineDupes(emb, threshold = 0.5).collect()
    assert(!dupes.exists(r => r.getAs[Long]("src") == 2L || r.getAs[Long]("dst") == 2L),
      s"the zero vector must not pair as a duplicate: ${dupes.mkString(",")}")
  }

  test("HAC collects ties against the TRUE round minimum (min-then-collect)") {
    import graft.ed.Hac
    // pair values in sorted-key order: d(0,1)=0.5, d(0,2)=0.5-4e-10,
    // d(1,2)=0.5-8e-10. The old single-pass appended (0,2) as a tie of the
    // STALE 0.5, then reset matches to {(1,2)} alone — merging only {1,2}
    // in round 1 and stopping (complete-linkage d({0},{1,2}) = 0.5 >
    // threshold). The reference computes the minimum FIRST: ties to it are
    // {(0,2),(1,2)} -> transitive merge of all three.
    val d = Map((0, 1) -> 0.5, (0, 2) -> (0.5 - 4e-10), (1, 2) -> (0.5 - 8e-10))
    def dist(i: Int, j: Int) = d((math.min(i, j), math.max(i, j)))
    val r = Hac.cluster(IndexedSeq(10L, 20L, 30L), dist, "complete", threshold = 0.5 - 6e-10)
    assert(r.values.toSet.size == 1,
      s"all three items must share one cluster under min-then-collect ties: $r")
  }

  test("edgesBetween on overlapping sample sets emits no self-loops") {
    import spark.implicits._
    val turns = Transcripts.fixture(spark)
    val r = Pipeline.run(spark, turns, Dicts.fixture)
    val samples = r.samples
    val bc = Dicts.broadcast(spark, Dicts.fixture)
    val edges = graft.ed.EdEval.edgesBetween(samples, samples, bc, excludeSelf = true).collect()
    assert(!edges.exists(e => e.src == e.dst),
      s"excludeSelf must suppress self-scoring: ${edges.filter(e => e.src == e.dst).mkString(",")}")
    // and the DEFAULT keeps the J8 semantics: identical samples across the
    // two sets match at dist 0 (what q_j8_compare counts)
    val withSelf = graft.ed.EdEval.edgesBetween(samples, samples, bc).collect()
    assert(withSelf.exists(e => e.src == e.dst), "default must keep cross-set identity matches")
    r.unpersist()
  }

  test("Pipeline.releaseAll frees exactly the pipeline's persisted intermediates") {
    val turns = Transcripts.fixture(spark)
    val r = Pipeline.run(spark, turns, Dicts.fixture)
    r.triples.count()
    // an unrelated cached fixture must SURVIVE the release (the reason
    // Verify stopped calling session-wide clearCache — ADVICE r04)
    import spark.implicits._
    val fixture = Seq(1, 2, 3).toDF("v").cache()
    fixture.count()
    assert(r.samples.storageLevel != StorageLevel.NONE, "pipeline persisted its samples")
    Pipeline.releaseAll()
    assert(r.samples.storageLevel == StorageLevel.NONE, "releaseAll must unpersist samples")
    assert(r.edges.storageLevel == StorageLevel.NONE, "releaseAll must unpersist edges")
    assert(fixture.storageLevel != StorageLevel.NONE, "unrelated caches must survive")
    fixture.unpersist()
  }
}
