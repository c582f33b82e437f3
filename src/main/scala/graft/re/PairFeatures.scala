package graft.re

import graft.core._
import graft.dicts.Dicts
import graft.ner.MentionDetector
import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.Dataset

/** The FULL F18 RE pair-feature vector (`somenlp/RE/features.py:140-230`,
  * `get_features`) materialized as a typed table, plus the J3 gold-label
  * join (`features.py:265-271`: left-match candidate pairs to gold
  * relations on (ent1_beg, ent2_beg), default label 'none').
  *
  * Round 1 computed only the geometry subset inside the classifier; this is
  * the reusable feature operator a model-backed classifier would train on.
  * Pairs are ORDERED (both orders of every combination, features.py:257-260
  * J2); one-hot groups are carried as the corrected type strings plus
  * [[oneHot]] for the indicator expansion (F17; unknown type raises, like
  * `one_hot_encoding`, features.py:106-124).
  */
object PairFeatures {

  /** The 13-type main-entity list (features.py:11). */
  val MainEntities: Set[String] = Set(
    "Application_Creation", "Application_Deposition", "Application_Usage", "Application_Mention",
    "PlugIn_Creation", "PlugIn_Deposition", "PlugIn_Usage", "PlugIn_Mention",
    "ProgrammingEnvironment_Usage", "ProgrammingEnvironment_Mention",
    "OperatingSystem_Usage", "OperatingSystem_Mention", "SoftwareCoreference_Deposition")

  /** Closed vocabularies for the one-hot groups (the reference derives them
    * from the label encoding; the SoMeSci label set is closed — first and
    * second components of the combined labels plus the attribute names with
    * mention 'None').
    */
  val EntityTypes: Seq[String] = Seq(
    "Application", "PlugIn", "ProgrammingEnvironment", "OperatingSystem",
    "SoftwareCoreference", "Version", "Developer", "URL", "License", "Citation",
    "Abbreviation", "AlternativeName", "Release", "Extension", "Specification", "O")
  val MentionTypes: Seq[String] = Seq("Creation", "Deposition", "Usage", "Mention", "None")

  final case class REPairFeatures(
      conv_id: String, turn_idx: Int,
      ent0_beg: Int, ent0_surface: String, ent1_beg: Int, ent1_surface: String,
      entity_distance_abs: Int,
      entity_distance_tok: Int,
      entity_order: Boolean,
      entity_0_char_length: Int,
      entity_0_token_length: Int,
      entity_1_char_length: Int,
      entity_1_token_length: Int,
      num_main_entities: Int,
      entity_0_substring_of_entity_1: Boolean,
      acronym_entity_0_substring_of_entity_1: Boolean,
      acronym_entity_0_substring_of_acronym_entity_1: Boolean,
      entity_1_substring_of_entity_0: Boolean,
      acronym_entity_1_substring_of_entity_0: Boolean,
      acronym_entity_1_substring_of_acronym_entity_0: Boolean,
      entity_0_type: String, mention_0_type: String,
      entity_1_type: String, mention_1_type: String,
      label: String)

  /** F17 one-hot expansion with the reference's unknown-type raise. */
  def oneHot(vocab: Seq[String], value: String): Seq[Int] = {
    require(vocab.contains(value), s"Unknown entity type: $value")
    vocab.map(v => if (v == value) 1 else 0)
  }

  /** correct_types (features.py:32-37): Unknown → defaults. */
  private def corrected(label: String): (String, String) = {
    val i = label.indexOf('_')
    val ent0 = if (i < 0) label else label.substring(0, i)
    val men0 = if (i < 0) "None" else label.substring(i + 1)
    (if (ent0 == "Unknown") "Application" else ent0,
      if (men0 == "Unknown") "Usage" else men0)
  }

  private def tokCount(s: String): Int = {
    var n = 0
    var i = 0
    val len = s.length
    while (i < len) {
      while (i < len && s.charAt(i).isWhitespace) i += 1
      if (i < len) { n += 1; while (i < len && !s.charAt(i).isWhitespace) i += 1 }
    }
    n
  }

  /** get_features + J3 label for all ordered pairs of one turn. `gold` is
    * matched on (subj_beg, obj_beg) ↔ the reference's (ent1_b, ent2_b).
    */
  def forTurn(t: Turn, spans: Vector[Span], gold: Seq[Relation]): Seq[REPairFeatures] = {
    if (spans.length < 2) return Seq.empty
    val sorted = spans.sortBy(_.beg) // O4
    val mainCount = sorted.count(s => MainEntities(s.typ))
    val out = Vector.newBuilder[REPairFeatures]
    // per-SPAN precomputation, hoisted out of the ordered-pair double loop:
    // acronym() is regex-heavy and tokCount/corrected are pure functions of
    // the span — computing them per pair cost 2·k·(k−1) evaluations where k
    // suffice (round-5 review; 760 vs 20 acronym calls at k=20)
    val acrs = sorted.map(s => Normalize.acronym(s.surface.split("\\s+").toIndexedSeq))
    val tokCounts = sorted.map(s => tokCount(s.surface))
    val correctedTypes = sorted.map(s => corrected(s.typ))
    for (i <- sorted.indices; j <- sorted.indices if i != j) {
      val p0 = sorted(i); val p1 = sorted(j)
      val (smaller, larger) = if (p0.beg > p1.beg) (p1, p0) else (p0, p1)
      // Python slice semantics (features.py uses sentence[end:beg]): nested/
      // overlapping gold spans give end > beg, which slices to "" — a raw
      // substring would throw and kill the task on such annotations
      val lo = math.min(math.max(smaller.end, 0), t.text.length)
      val hi = math.min(math.max(larger.beg, lo), t.text.length)
      val distanceString = t.text.substring(lo, hi)
      val a0 = acrs(i); val a1 = acrs(j)
      val (e0t, m0t) = correctedTypes(i)
      val (e1t, m1t) = correctedTypes(j)
      val label = gold.find(r => r.subj_beg == p0.beg && r.obj_beg == p1.beg)
        .map(_.pred).getOrElse("none")
      out += REPairFeatures(
        t.conv_id, t.turn_idx, p0.beg, p0.surface, p1.beg, p1.surface,
        entity_distance_abs = distanceString.length,
        entity_distance_tok = tokCount(distanceString),
        entity_order = p1.beg > p0.beg,
        entity_0_char_length = p0.end - p0.beg,
        entity_0_token_length = tokCounts(i),
        entity_1_char_length = p1.end - p1.beg,
        entity_1_token_length = tokCounts(j),
        num_main_entities = mainCount,
        entity_0_substring_of_entity_1 = Normalize.isSubstring(Some(p0.surface), Some(p1.surface)),
        acronym_entity_0_substring_of_entity_1 = Normalize.isSubstring(a0, Some(p1.surface)),
        acronym_entity_0_substring_of_acronym_entity_1 = Normalize.isSubstring(a0, a1),
        entity_1_substring_of_entity_0 = Normalize.isSubstring(Some(p1.surface), Some(p0.surface)),
        acronym_entity_1_substring_of_entity_0 = Normalize.isSubstring(a1, Some(p0.surface)),
        acronym_entity_1_substring_of_acronym_entity_0 = Normalize.isSubstring(a1, a0),
        entity_0_type = e0t, mention_0_type = m0t,
        entity_1_type = e1t, mention_1_type = m1t,
        label = label)
    }
    out.result()
  }

  /** Distributed form: detect + classify inline per turn (one pass, no
    * shuffle); the engine's own deterministic relations serve as the gold
    * side of the J3 label join — swap in a real gold table by joining
    * before this stage when training data exists.
    */
  def pairs(turns: Dataset[Turn], dicts: Broadcast[Dicts]): Dataset[REPairFeatures] = {
    val spark = turns.sparkSession
    import spark.implicits._
    turns.mapPartitions(_.flatMap { t =>
      val spans = MentionDetector.detect(t.text, dicts.value)
      val gold = RelationExtractor.classify(t.text, spans).map { case (s, pred, m) =>
        Relation(t.conv_id, t.turn_idx, pred, s.beg, s.surface, s.typ, m.beg, m.surface, m.typ)
      }
      forTurn(t, spans, gold)
    })
  }
}
