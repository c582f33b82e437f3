package graft

import graft.dicts.Dicts
import graft.ed.{Blocking, ConnectedComponents, Linking}
import graft.pipeline.{Pipeline, Transcripts}
import org.apache.spark.sql.SparkSession
import org.apache.spark.storage.StorageLevel

/** Measurement-only harness for the optimization rounds (guide §1) — the
  * graded `Bench` is frozen, so every extra instrument lives here.
  *
  * Modes (first arg):
  *  - `stages [cores] [convs]`: the 6M-turn scaling workload broken into
  *    per-stage wall-clock (generate / detect / samples / edges / cc /
  *    triples), one JSON line — localizes a scaling-gate miss to a stage
  *    (VERDICT r05 next-round #1, measured here instead of in the frozen
  *    harness).
  *  - `queries [reps]`: headline queries timed with the noop sink
  *    (guide §1.4 — computation only, no count()-side pruning ambiguity)
  *    AND with the Bench-identical count() action, min of `reps`.
  *  - `plans <suffix> [names...]`: dump `.explain("formatted")` of the named
  *    queries (default: the bench headline set) to
  *    `plans/r06/<query>_<suffix>.txt`.
  */
object BenchExtra {

  private def session(cores: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"graft-benchextra-$cores")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.cleaner.referenceTracking.cleanCheckpoints", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  private def time[A](f: => A): Double = {
    val t0 = System.nanoTime()
    f
    (System.nanoTime() - t0) / 1e9
  }

  private def n(v: Double): String =
    String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))

  /** Per-stage breakdown of EXACTLY the Pipeline.run flow the scaling bench
    * times (same operators, same actions, same order — only with timers
    * between the actions Pipeline.run already performs).
    */
  private def stages(cores: Int, nConvs: Int, turnsPer: Int): Unit = {
    val spark = session(cores)
    import spark.implicits._
    spark.range(10).count()
    val sc = spark.sparkContext

    // warm-up at 1/10 scale, exactly like Bench.oneRun(warm = true)
    sc.setJobDescription("warmup 1/10 scale")
    val warm = Pipeline.run(spark, Transcripts.synthetic(spark, nConvs / 10, turnsPer), Dicts.fixture)
    warm.triples.count()
    warm.unpersist()

    // generation alone (not part of the real flow — detect fuses over it):
    sc.setJobDescription("stage: generate (noop)")
    val tGen = time {
      Transcripts.synthetic(spark, nConvs, turnsPer).write.format("noop").mode("overwrite").save()
    }

    val turns = Transcripts.synthetic(spark, nConvs, turnsPer)
    val d = Dicts.fixture
    val bc = Dicts.broadcast(spark, d)

    sc.setJobDescription("stage: detect (fused NER+RE pass + cache)")
    val det = Pipeline.detectFlat(turns, bc).persist(StorageLevel.MEMORY_AND_DISK)
    val tDetect = time(det.count())
    val detDF = det.toDF()
    val relations = Pipeline.relationsView(detDF)
    val mentions = Pipeline.mentionsView(detDF)

    sc.setJobDescription("stage: samples (top-5 ctx agg + rels)")
    val samples = Linking.samples(mentions, relations).persist(StorageLevel.MEMORY_AND_DISK)
    var nSamples = 0L
    val tSamples = time { nSamples = samples.count() }

    // Pipeline.run's ROUTED construction, via the ONE shared definition
    // (below the cutoff the pair join, union-find and canon map are a
    // single driver block — round 6)
    sc.setJobDescription("stage: edges + cc + canon")
    val scored = sc.longAccumulator("graft.ed.scoredPairs.benchextra")
    var canon: org.apache.spark.sql.DataFrame = null
    var edges: org.apache.spark.sql.Dataset[graft.core.Edge] = null
    val tEdgesCcCanon = time {
      val (e, _, c) = Pipeline.edgesComponentsCanon(
        samples, nSamples, d, bc, graft.ed.PairScorer.Threshold, Some(scored))
      edges = e
      canon = c
    }

    sc.setJobDescription("stage: canon join + triples count")
    val triples = Pipeline.backJoinTriples(relations.toDF(), canon)
    val tTriples = time(triples.count())

    det.unpersist(); samples.unpersist(); edges.unpersist()
    val total = tDetect + tSamples + tEdgesCcCanon + tTriples
    println(
      s"""{"mode":"stages","cores":$cores,"turns":${nConvs.toLong * turnsPer},""" +
        s""""gen_noop":${n(tGen)},"detect":${n(tDetect)},"samples":${n(tSamples)},""" +
        s""""edges_cc_canon":${n(tEdgesCcCanon)},"triples":${n(tTriples)},""" +
        s""""total":${n(total)}}""")
    spark.stop()
  }

  private val headline = Seq(
    "kg_pipeline_testdata" -> "q_kg_triples",
    "ner_mentions" -> "q_ner_mentions",
    "re_relations" -> "q_re_relations",
    "dedup_minhash" -> "q_dedup_minhash",
    "dedup_simhash" -> "q_dedup_simhash",
    "ann_topk" -> "q_ann_topk",
    "ann_lsh" -> "q_ann_lsh",
    "textq_quality" -> "q_textq_quality",
    "g2_components" -> "q_g2_components",
    "events_sessions" -> "q_events_sessions",
    "tpch_pricing" -> "q_tpch_pricing",
    "a1_vocab" -> "q_a1_vocab")

  private def queries(reps: Int): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = session(cpus)
    spark.range(10).count()
    val qmap = SparkEntry.queries
    val rows = headline.map { case (name, qname) =>
      val fn = qmap(qname)
      spark.sparkContext.setJobDescription(s"$name warmup")
      fn(spark, sfDir).count()
      Pipeline.releaseAll()
      spark.sparkContext.setJobDescription(s"$name noop")
      val tNoop = (1 to reps).map { _ =>
        val t = time(fn(spark, sfDir).write.format("noop").mode("overwrite").save())
        Pipeline.releaseAll(); t
      }.min
      spark.sparkContext.setJobDescription(s"$name count")
      val tCount = (1 to reps).map { _ =>
        val t = time(fn(spark, sfDir).count())
        Pipeline.releaseAll(); t
      }.min
      spark.sharedState.cacheManager.clearCache()
      s""""$name":{"noop":${n(tNoop)},"count":${n(tCount)}}"""
    }
    println(s"""{"mode":"queries","cpus":$cpus,"sf":"$sfDir",${rows.mkString(",")}}""")
    spark.stop()
  }

  /** VERDICT r05 #3: cold AND warm kg_pipeline_testdata side by side (the
    * frozen Bench measures cold-per-rep since the round-5 methodology fix;
    * the warm number re-anchors the r1-r4 trend lines). Cold = pipeline
    * caches released between reps; warm = caches kept.
    */
  private def kgColdWarm(reps: Int): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = session(cpus)
    spark.range(10).count()
    val fn = SparkEntry.queries("q_kg_triples")
    fn(spark, sfDir).count(); Pipeline.releaseAll() // warm-up
    val cold = (1 to reps).map { _ =>
      val t = time(fn(spark, sfDir).count()); Pipeline.releaseAll(); t
    }.min
    fn(spark, sfDir).count() // seed the warm caches
    val warm = (1 to reps).map(_ => time(fn(spark, sfDir).count())).min
    Pipeline.releaseAll()
    println(s"""{"mode":"kgcoldwarm","cpus":$cpus,"sf":"$sfDir","kg_pipeline_testdata_cold":${n(cold)},"kg_pipeline_testdata_warm":${n(warm)}}""")
    spark.stop()
  }

  /** Degraded-window sentinel (VERDICT r05 #4, housed here because the
    * graded Bench is frozen): a fixed single-thread reference workload with
    * its committed clean-window envelope. Run it before and after any
    * measurement session; `host_degraded=true` means the window's numbers
    * are not comparable to clean-window baselines. Envelope measured
    * 2026-08-22 across many clean samples: 0.28-0.33 s; the degraded
    * regime measured 1.5-2.5x that.
    */
  private def sentinel(): Unit = {
    val CleanEnvelopeSec = 0.33
    var acc = 1L
    val t0 = System.nanoTime()
    var i = 0
    while (i < 100000000) { acc = graft.core.Hash61.mulmod(acc | 1L, 131L); i += 1 }
    val sec = (System.nanoTime() - t0) / 1e9
    if (acc == 42) println("") // keep the loop live
    println(s"""{"mode":"sentinel","ref_sec":${n(sec)},""" +
      s""""clean_envelope_sec":$CleanEnvelopeSec,""" +
      s""""host_degraded":${sec > CleanEnvelopeSec * 1.5}}""")
  }

  private def plans(suffix: String, names: Seq[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = session(8)
    val dir = java.nio.file.Paths.get("plans/r06")
    java.nio.file.Files.createDirectories(dir)
    val picks = if (names.nonEmpty) names else headline.map(_._2)
    for (name <- picks) {
      val df = SparkEntry.queries(name)(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      java.nio.file.Files.writeString(dir.resolve(s"${name}_$suffix.txt"), plan)
      Pipeline.releaseAll()
      println(s"wrote plans/r06/${name}_$suffix.txt")
    }
    spark.stop()
  }

  def main(args: Array[String]): Unit = args.headOption match {
    case Some("stages") =>
      val cores = args.lift(1).map(_.toInt)
        .getOrElse(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt)
      val convs = args.lift(2).map(_.toInt)
        .getOrElse(sys.env.getOrElse("SPARK_GRAFT_BENCH_CONVS", "600000").toInt)
      stages(cores, convs, turnsPer = 10)
    case Some("queries") => queries(args.lift(1).map(_.toInt).getOrElse(3))
    case Some("kgcoldwarm") => kgColdWarm(args.lift(1).map(_.toInt).getOrElse(3))
    case Some("sentinel") => sentinel()
    case Some("plans") => plans(args.lift(1).getOrElse("before"), args.drop(2).toSeq)
    case other => sys.error(s"unknown mode: $other (stages|queries|plans|kgcoldwarm|sentinel)")
  }
}
