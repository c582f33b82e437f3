package graft.pipeline

import graft.core._
import graft.dicts.Dicts
import graft.ed.{Blocking, ConnectedComponents, Linking}
import graft.ner.MentionDetector
import graft.re.RelationExtractor
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** The end-to-end KG-construction flow (SURVEY.md §3):
  * transcripts → mentions (NER) → relations (RE) → linking samples →
  * blocked similarity edges → connected components (canonicalization) →
  * deduplicated (subj, pred, obj) triples.
  *
  * Every stage is a Dataset transform; per-turn stages (NER+RE) are fused
  * into one mapPartitions pass with broadcast dictionaries, so the only
  * shuffles in the whole pipeline are (1) the sample-set aggregation,
  * (2) the blocked pair join, (3) the CC rounds, and (4) the final dedup —
  * each on compact keys, never on turn text.
  */
object Pipeline {

  final case class Result(
      mentions: Dataset[Mention],
      relations: Dataset[Relation],
      samples: Dataset[LinkingSample],
      edges: Dataset[Edge],
      components: DataFrame,
      triples: Dataset[Triple])

  def run(spark: SparkSession, turns: Dataset[Turn], d: Dicts,
      threshold: Double = graft.ed.PairScorer.Threshold): Result = {
    import spark.implicits._
    val bc = Dicts.broadcast(spark, d)

    val mentions = MentionDetector.mentions(turns, bc)
    val relations = RelationExtractor.relations(turns, bc)
    val samples = Linking.samples(mentions, relations)
    val edges = Blocking.edges(samples, bc, threshold)
    val vertices = samples.select($"sample_id".as[java.lang.Long])
    val components = ConnectedComponents.run(vertices, edges)
    val canon = Linking.canonicalMap(samples, components)

    // J9 back-join: obj (always a main mention) gets its canonical id;
    // subj falls back to a surface hash (attributes are not linked entities)
    val triples = relations
      .join(broadcast(canon.withColumnRenamed("mention", "obj_mention")
        .withColumnRenamed("canonical", "obj_can")),
        relations("obj_surface") === col("obj_mention"), "left")
      .join(broadcast(canon.withColumnRenamed("mention", "subj_mention")
        .withColumnRenamed("canonical", "subj_can")),
        relations("subj_surface") === col("subj_mention"), "left")
      .select(
        $"subj_surface".as("subj"),
        $"pred",
        $"obj_surface".as("obj"),
        $"conv_id",
        $"turn_idx",
        coalesce($"subj_can", xxhash64($"subj_surface")).as("subj_canonical"),
        coalesce($"obj_can", xxhash64($"obj_surface")).as("obj_canonical"))
      .as[Triple]

    Result(mentions, relations, samples, edges, components, triples)
  }

  /** Deduplicated KG materialization: one row per canonical
    * (subj_canonical, pred, obj_canonical), keeping the lexicographically
    * first provenance (deterministic under any partitioning).
    */
  def canonicalTriples(triples: Dataset[Triple]): Dataset[Triple] = {
    val spark = triples.sparkSession
    import spark.implicits._
    triples
      .groupByKey(t => (t.subj_canonical, t.pred, t.obj_canonical))
      .reduceGroups((a, b) =>
        if ((a.conv_id, a.turn_idx, a.subj, a.obj).toString <= (b.conv_id, b.turn_idx, b.subj, b.obj).toString) a else b)
      .map(_._2)
  }
}
