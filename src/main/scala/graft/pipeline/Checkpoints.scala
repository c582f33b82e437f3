package graft.pipeline

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardOpenOption}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.util.LongAccumulator

/** Stage checkpointing with per-stage lineage + accumulator-backed metrics —
  * the Spark-native replacement for the reference's manual resume machinery
  * (SURVEY.md §4: `bin/generate_file_list:28-33` skip-computed-files,
  * `efficient_prediction.py:169-171` skip-computed-blocks; north_rule:
  * "resumable from checkpoint with per-partition lineage + metrics").
  *
  * Contract:
  *  - `stage(name)(compute)` returns the stage output, either by reading a
  *    valid prior checkpoint (Parquet + `_lineage.json` whose content hash
  *    matches) or by computing, writing, hashing and recording it.
  *  - the content hash is ORDER-INDEPENDENT (sum of per-row xxhash64 over
  *    the canonical JSON of each row), so resume equality is semantic, not
  *    partition-layout-dependent: a rerun under different parallelism
  *    produces the same hash (this is what "byte-identical output" means for
  *    a distributed table — verified in ResumeSpec).
  *  - metrics: per-stage row counts flow through a LongAccumulator and are
  *    appended to `metrics.jsonl` with wall-clock.
  */
final class Checkpoints(spark: SparkSession, baseDir: String) {

  private def dir(name: String) = s"$baseDir/$name"
  private def lineagePath(name: String) = Paths.get(s"$baseDir/${name}_lineage.json")
  private val metricsPath = Paths.get(s"$baseDir/metrics.jsonl")
  Files.createDirectories(Paths.get(baseDir))

  /** Order-independent content hash of a DataFrame. The per-row hashes are
    * summed as decimal(38,0) — exact and ANSI-overflow-safe at any row count
    * — then folded with the row count.
    */
  def contentHash(df: DataFrame): String = {
    val row = df
      .select(xxhash64(to_json(struct(df.columns.map(col): _*))).cast("decimal(38,0)").as("h"))
      .agg(sum(col("h")).as("s"), count(lit(1)).as("n"))
      .collect()(0)
    val s = if (row.isNullAt(0)) "0" else row.getDecimal(0).toBigInteger.toString
    s + ":" + row.getLong(1)
  }

  private def writeLineage(name: String, hash: String, rows: Long, seconds: Double): Unit = {
    val json =
      s"""{"stage":"$name","content_hash":"$hash","rows":$rows,"seconds":$seconds}"""
    Files.write(lineagePath(name), json.getBytes(StandardCharsets.UTF_8))
    Files.write(metricsPath,
      (json + "\n").getBytes(StandardCharsets.UTF_8),
      StandardOpenOption.CREATE, StandardOpenOption.APPEND)
  }

  private def readLineage(name: String): Option[(String, Long)] = {
    val p = lineagePath(name)
    if (!Files.exists(p)) None
    else {
      val s = new String(Files.readAllBytes(p), StandardCharsets.UTF_8)
      val h = """"content_hash":"([-\d:]+)"""".r.findFirstMatchIn(s).map(_.group(1))
      val r = """"rows":(\d+)""".r.findFirstMatchIn(s).map(_.group(1).toLong)
      for (hh <- h; rr <- r) yield (hh, rr)
    }
  }

  /** True if the named stage checkpoint exists and its content re-hashes to
    * the recorded value (integrity check against partial writes).
    */
  def isValid(name: String): Boolean = readLineage(name).exists { case (h, _) =>
    try contentHash(spark.read.parquet(dir(name))) == h
    catch { case _: Throwable => false }
  }

  /** Run-or-resume a stage. */
  def stage(name: String)(compute: => DataFrame): DataFrame = {
    if (isValid(name)) {
      spark.read.parquet(dir(name))
    } else {
      val t0 = System.nanoTime()
      val rowsAcc: LongAccumulator = spark.sparkContext.longAccumulator(s"graft.$name.rows")
      val df = compute
      // accumulator-backed row metric piggybacks on the checkpoint write
      val counted = df.map { r => rowsAcc.add(1); r }(
        org.apache.spark.sql.Encoders.row(df.schema))
      counted.write.mode("overwrite").parquet(dir(name))
      val out = spark.read.parquet(dir(name))
      val h = contentHash(out)
      writeLineage(name, h, rowsAcc.value, (System.nanoTime() - t0) / 1e9)
      out
    }
  }

  /** Drop checkpoints from `name` onward (test hook for kill-after-stage-k). */
  def invalidate(names: String*): Unit = names.foreach { n =>
    Files.deleteIfExists(lineagePath(n))
  }
}

object Checkpoints {

  /** The checkpointed end-to-end pipeline: every stage materializes to
    * Parquet with lineage; a rerun resumes after the last valid stage.
    */
  def runPipeline(spark: SparkSession, turns: org.apache.spark.sql.Dataset[graft.core.Turn],
      d: graft.dicts.Dicts, baseDir: String): DataFrame = {
    import spark.implicits._
    val ck = new Checkpoints(spark, baseDir)
    val bc = graft.dicts.Dicts.broadcast(spark, d)

    val mentions = ck.stage("mentions") {
      graft.ner.MentionDetector.mentions(turns, bc).toDF()
    }
    val relations = ck.stage("relations") {
      graft.re.RelationExtractor.relations(turns, bc).toDF()
    }
    val samples = ck.stage("samples") {
      graft.ed.Linking.samples(
        mentions.as[graft.core.Mention],
        relations.as[graft.core.Relation]).toDF()
    }
    val edges = ck.stage("edges") {
      graft.ed.Blocking.edges(samples.as[graft.core.LinkingSample], bc).toDF()
    }
    val components = ck.stage("components") {
      graft.ed.ConnectedComponents.run(
        samples.select($"sample_id".as[java.lang.Long]),
        edges.as[graft.core.Edge])
    }
    ck.stage("triples") {
      val canon = graft.ed.Linking.canonicalMap(samples.as[graft.core.LinkingSample], components)
      relations
        .join(broadcast(canon.withColumnRenamed("mention", "obj_mention")
          .withColumnRenamed("canonical", "obj_can")),
          col("obj_surface") === col("obj_mention"), "left")
        .join(broadcast(canon.withColumnRenamed("mention", "subj_mention")
          .withColumnRenamed("canonical", "subj_can")),
          col("subj_surface") === col("subj_mention"), "left")
        .select(col("subj_surface").as("subj"), col("pred"), col("obj_surface").as("obj"),
          col("conv_id"), col("turn_idx"),
          coalesce(col("subj_can"), xxhash64(col("subj_surface"))).as("subj_canonical"),
          coalesce(col("obj_can"), xxhash64(col("obj_surface"))).as("obj_canonical"))
    }
  }
}
