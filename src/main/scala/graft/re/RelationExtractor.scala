package graft.re

import graft.core._
import graft.dicts.Dicts
import graft.ner.MentionDetector
import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic relation classification into the reference predicate set —
  * the rebuild's replacement for the sklearn RF/MLP classifier (SURVEY.md
  * §2.10 M5, `somenlp/RE/RE_model.py:129-157`), driven by the same F18
  * geometry features (char/token distance, order, types) computed over J2
  * candidate pairs.
  *
  * Predicates (`configurations/data_transforms/SoMeSci_relations.json`):
  * Version_of, Developer_of, URL_of, License_of, Citation_of,
  * Abbreviation_of, AlternativeName_of, Release_of, Specification_of,
  * PlugIn_of, Extension_of. `none` is never emitted (`RE_model.py:147`).
  *
  * Deterministic rule set:
  *  - an attribute mention (Version/Developer/URL/License/Citation/
  *    Abbreviation/AlternativeName/Release/Extension/Specification) relates
  *    to the NEAREST main software mention by character gap; ties prefer the
  *    preceding mention (SoMeSci's dominant annotation pattern: attributes
  *    follow their software, "Stata 13.1" → (13.1, Version_of, Stata))
  *  - PlugIn_of between two main mentions when the subject's soft type is
  *    PlugIn and a connective lemma ("for"/"of") separates them
  *    ("EEGLAB toolbox for MATLAB")
  */
object RelationExtractor {

  /** Candidate gate P3 (`RE/features.py:281,299`): >1 mention in the turn. */
  val MinMentions = 2

  private val AttrPredicate: Map[String, String] = Map(
    "Version" -> "Version_of",
    "Developer" -> "Developer_of",
    "URL" -> "URL_of",
    "License" -> "License_of",
    "Citation" -> "Citation_of",
    "Abbreviation" -> "Abbreviation_of",
    "AlternativeName" -> "AlternativeName_of",
    "Release" -> "Release_of",
    "Extension" -> "Extension_of",
    "Specification" -> "Specification_of")

  /** Main (software) mentions carry combined `{soft}_{mention}` labels
    * (↔ the 13-type main_entities list, `RE/features.py:11`).
    */
  def isMain(label: String): Boolean = label.contains('_')

  /** Pure per-turn classification over decoded spans (sorted by beg — O4). */
  def classify(text: String, spans: Vector[Span]): Vector[(Span, String, Span)] = {
    if (spans.length < MinMentions) return Vector.empty
    // detect() already emits spans sorted by beg — skip the re-sort (a
    // stable sort of a sorted vector is the identity) unless the caller
    // passed an unsorted set (BRAT-sourced paths)
    val sorted = {
      var i = 1
      var isSorted = true
      while (isSorted && i < spans.length) {
        isSorted = spans(i - 1).beg <= spans(i).beg
        i += 1
      }
      if (isSorted) spans else spans.sortBy(_.beg)
    }
    val mains = sorted.filter(s => isMain(s.typ))
    if (mains.isEmpty) return Vector.empty
    // tokenization only needed for the PlugIn connective check — lazy so the
    // common attribute-only turn never re-tokenizes
    lazy val lemmasAt = Tok.tokens(text).map(t => (t.beg, t.end, Lemma.of(t.surface)))

    def gap(a: Span, m: Span): Int =
      if (a.beg >= m.end) a.beg - m.end
      else if (m.beg >= a.end) m.beg - a.end
      else 0

    /** nearest main to `a`, ties → preceding (m.beg < a.beg), then leftmost */
    def nearestMain(a: Span, candidates: Vector[Span]): Option[Span] =
      candidates.sortBy(m => (gap(a, m), if (m.beg < a.beg) 0 else 1, m.beg)).headOption

    /** attribute target: the nearest PRECEDING main if any (SoMeSci's
      * dominant pattern — attributes trail their software: "Stata 13.1",
      * "version 5 under Windows" still binds 5 to the preceding tool),
      * else the nearest following one.
      */
    def attributeTarget(a: Span): Option[Span] = {
      val preceding = mains.filter(_.end <= a.beg)
      if (preceding.nonEmpty) preceding.sortBy(m => (gap(a, m), m.beg)).headOption
      else nearestMain(a, mains)
    }

    val out = Vector.newBuilder[(Span, String, Span)]
    // attribute → its main mention
    for (a <- sorted if !isMain(a.typ); pred <- AttrPredicate.get(a.typ);
         m <- attributeTarget(a)) {
      out += ((a, pred, m))
    }
    // PlugIn_of between mains: subject soft type PlugIn, connective between
    for (s <- mains if s.typ.startsWith("PlugIn")) {
      val others = mains.filter(m => m.beg != s.beg &&
        (m.typ.startsWith("Application") || m.typ.startsWith("ProgrammingEnvironment")))
      nearestMain(s, others).foreach { m =>
        val lo = math.min(s.end, m.end)
        val hi = math.max(s.beg, m.beg)
        val between = lemmasAt.filter(t => t._1 >= lo && t._2 <= hi).map(_._3)
        if (between.exists(Set("for", "of"))) out += ((s, "PlugIn_of", m))
      }
    }
    out.result()
  }

  private def toRelations(t: Turn, spans: Vector[Span]): Iterator[Relation] =
    classify(t.text, spans).iterator.map { case (s, pred, m) =>
      Relation(t.conv_id, t.turn_idx, pred, s.beg, s.surface, s.typ, m.beg, m.surface, m.typ)
    }

  /** Fused path: turns → relations in ONE mapPartitions (mention detection
    * inlined; no shuffle). Preferred at scale — the per-turn work is
    * embarrassingly parallel (SURVEY.md §3.2 Spark shape).
    */
  def relations(turns: Dataset[Turn], dicts: Broadcast[Dicts]): Dataset[Relation] = {
    val spark = turns.sparkSession
    import spark.implicits._
    turns.mapPartitions(_.flatMap { t =>
      toRelations(t, MentionDetector.detect(t.text, dicts.value))
    })
  }

  /** Checkpoint-resume path: classify from a persisted mentions table.
    * Requires the turn text for connective checks → co-grouped join with the
    * turns table on (conv_id, turn_idx). Produces output identical to the
    * fused path (asserted in tests).
    */
  def fromMentions(turns: Dataset[Turn], mentions: Dataset[Mention]): Dataset[Relation] = {
    val spark = turns.sparkSession
    import spark.implicits._
    val groupedMentions = mentions
      .groupByKey(m => (m.conv_id, m.turn_idx))
    turns
      .groupByKey(t => (t.conv_id, t.turn_idx))
      .cogroup(groupedMentions) { case (_, ts, ms) =>
        ts.toSeq.headOption.iterator.flatMap { t =>
          val spans = ms.map(m => Span(m.label, m.beg, m.end, m.surface)).toVector
          toRelations(t, spans)
        }
      }
  }

  def relations(spark: SparkSession, turns: Dataset[Turn], d: Dicts): Dataset[Relation] =
    relations(turns, Dicts.broadcast(spark, d))
}
