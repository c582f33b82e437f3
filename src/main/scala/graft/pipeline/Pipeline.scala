package graft.pipeline

import graft.core._
import graft.dicts.Dicts
import graft.ed.{Blocking, ConnectedComponents, Linking}
import graft.ner.MentionDetector
import graft.re.RelationExtractor
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** The end-to-end KG-construction flow (SURVEY.md §3):
  * transcripts → mentions (NER) → relations (RE) → linking samples →
  * blocked similarity edges → connected components (canonicalization) →
  * deduplicated (subj, pred, obj) triples.
  *
  * Execution shape at scale:
  *  - NER + RE run in ONE mapPartitions pass over the turns (the dominant
  *    cost at 10¹² turns is the per-turn scan — it must happen exactly
  *    once); the per-turn result persists at MEMORY_AND_DISK and both the
  *    mentions and relations views read from it.
  *  - the deduplicated sample set (unique surfaces) is persisted before the
  *    blocked pair join — it is referenced by the keying, the two payload
  *    re-joins, the CC vertex set and the canonical back-join.
  *  - the only shuffles are the sample aggregation, the blocked pair join,
  *    the CC rounds and the final dedup — all on compact keys, never on
  *    turn text.
  */
object Pipeline {

  /** One turn's detection output — the unit of the fused NER+RE pass. */
  final case class TurnResult(
      conv_id: String,
      turn_idx: Int,
      mentions: Seq[Mention],
      relations: Seq[Relation])

  final case class Result(
      perTurn: Dataset[TurnResult],
      mentions: Dataset[Mention],
      relations: Dataset[Relation],
      samples: Dataset[LinkingSample],
      edges: Dataset[Edge],
      components: DataFrame,
      triples: Dataset[Triple]) {
    def unpersist(): Unit = {
      perTurn.unpersist()
      samples.unpersist()
    }
  }

  /** Fused per-turn NER + RE: one pass, zero shuffle. */
  def detectPerTurn(turns: Dataset[Turn],
      bc: org.apache.spark.broadcast.Broadcast[Dicts]): Dataset[TurnResult] = {
    val spark = turns.sparkSession
    import spark.implicits._
    turns.mapPartitions(_.map { t =>
      val spans = MentionDetector.detect(t.text, bc.value)
      val ms = spans.iterator.zipWithIndex.map { case (s, i) =>
        Mention(t.conv_id, t.turn_idx, s"T${i + 1}", s.typ, s.beg, s.end, s.surface)
      }.toSeq
      val rs = RelationExtractor.classify(t.text, spans).map { case (s, pred, m) =>
        Relation(t.conv_id, t.turn_idx, pred, s.beg, s.surface, s.typ, m.beg, m.surface, m.typ)
      }
      TurnResult(t.conv_id, t.turn_idx, ms, rs)
    })
  }

  def run(spark: SparkSession, turns: Dataset[Turn], d: Dicts,
      threshold: Double = graft.ed.PairScorer.Threshold): Result = {
    import spark.implicits._
    val bc = Dicts.broadcast(spark, d)

    val perTurn = detectPerTurn(turns, bc).persist(StorageLevel.MEMORY_AND_DISK)
    val mentions = perTurn.flatMap(_.mentions)
    val relations = perTurn.flatMap(_.relations)

    val samples = Linking.samples(mentions, relations).persist(StorageLevel.MEMORY_AND_DISK)
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

    Result(perTurn, mentions, relations, samples, edges, components, triples)
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
