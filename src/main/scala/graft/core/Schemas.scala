package graft.core

import java.sql.Timestamp

/** Typed row models of the pipeline (SURVEY.md §1.1). All are case classes so
  * Catalyst derives `ExpressionEncoder`s and typed Dataset transforms stay
  * codegen-friendly.
  */

/** One transcript turn — the authoritative input shape
  * (`BASELINE.json.input_hint`): conversation ↔ reference document,
  * turn ↔ sentence line.
  */
final case class Turn(
    conv_id: String,
    turn_idx: Int,
    role: String,
    text: String,
    tool: String,
    ts: Timestamp)

/** A detected mention span within a turn (↔ BRAT T-line,
  * `data/minimal_example/text/<doc>.ann`). `label` is the combined
  * `{soft_type}_{mention_type}` or attribute type.
  */
final case class Mention(
    conv_id: String,
    turn_idx: Int,
    mention_id: String,
    label: String,
    beg: Int,
    end: Int,
    surface: String)

/** A relation candidate / classified relation within one turn
  * (↔ `.rel-pred` record, `somenlp/RE/RE_model.py:151-156`).
  */
final case class Relation(
    conv_id: String,
    turn_idx: Int,
    pred: String,
    subj_beg: Int,
    subj_surface: String,
    subj_label: String,
    obj_beg: Int,
    obj_surface: String,
    obj_label: String)

/** An attribute relation attached to a linking sample
  * (↔ `relations` array of the `.linking` JSON,
  * `bin/somesci_disambiguation_input:35-57`).
  */
final case class RelInfo(typ: String, string: String)

/** ED input sample: one mention with its normalized forms and context
  * relations (↔ `.linking` JSON + ReducedSampleSet fields,
  * `efficient_prediction.py:66-96`).
  */
final case class LinkingSample(
    sample_id: Long,
    conv_id: String,
    turn_idx: Int,
    beg: Int,
    mention: String,
    string: String, // remove_spaces(mention)
    norm: String, // normalize(mention)
    ent_type: String,
    relations: Seq[RelInfo])

/** A similarity edge between two linking samples (dist ≤ threshold). */
final case class Edge(src: Long, dst: Long, dist: Double)

/** Connected-component assignment: sample → canonical component id. */
final case class Component(id: Long, component: Long)

/** Final KG output row: deduplicated (subj, pred, obj) triple with
  * provenance and canonical ids (FIXTURES.md §3).
  */
final case class Triple(
    subj: String,
    pred: String,
    obj: String,
    conv_id: String,
    turn_idx: Int,
    subj_canonical: Long,
    obj_canonical: Long)
