package graft.sources

import graft.core.Relation
import org.apache.spark.sql.Dataset

/** S5 — the reference's relation text format, both directions
  * (`somenlp/NER/data_handler.py:277-301` parse,
  * `somenlp/RE/RE_model.py:151-156` emit): one line per sentence, records
  * joined by `;;`, each record tab-separated
  * `type\tent1_str\tent1_beg\tent1_idx\tent2_str\tent2_beg\tent2_idx`.
  * An empty line means "sentence with no relations". Needed for interop
  * tests against raw reference outputs; the engine-internal form stays the
  * typed [[graft.core.Relation]] Dataset.
  */
object RelationFile {

  final case class RelRecord(
      typ: String,
      ent1_s: String, ent1_b: Int, ent1_n: Int,
      ent2_s: String, ent2_b: Int, ent2_n: Int)

  /** Parse one line (one sentence) — `_read_relation_file` semantics:
    * blank → no relations; records split on `;;`, blanks skipped.
    */
  def parseLine(line: String): Seq[RelRecord] = {
    if (line.trim.isEmpty) return Seq.empty
    line.split(";;").iterator.filter(_.trim.nonEmpty).map { rel =>
      val f = rel.split("\t")
      require(f.length == 7, s"relation record needs 7 tab fields, got ${f.length}: '$rel'")
      RelRecord(f(0), f(1), f(2).toInt, f(3).toInt, f(4), f(5).toInt, f(6).toInt)
    }.toSeq
  }

  /** Emit one line — `RE_model.predict` sink format (`;;`-joined,
    * trailing separator after each record like the reference's
    * `'{}\t...;;'.format` accumulation).
    */
  def formatLine(rels: Seq[RelRecord]): String =
    rels.map(r => s"${r.typ}\t${r.ent1_s}\t${r.ent1_b}\t${r.ent1_n}\t${r.ent2_s}\t${r.ent2_b}\t${r.ent2_n};;")
      .mkString

  /** Round-trip helpers over the engine's Relation rows: entity index is
    * positional within the turn (O4 order-by-beg), reconstructed on write
    * and carried through on read.
    */
  def toRecords(rels: Seq[Relation]): Seq[RelRecord] = {
    val begs = rels.flatMap(r => Seq(r.subj_beg, r.obj_beg)).distinct.sorted
    val idx = begs.zipWithIndex.toMap
    rels.map(r => RelRecord(r.pred,
      r.subj_surface, r.subj_beg, idx(r.subj_beg),
      r.obj_surface, r.obj_beg, idx(r.obj_beg)))
  }

  /** Distributed emit: one formatted line per turn (sorted within turn by
    * subject then object begin — deterministic under any partitioning).
    */
  def lines(relations: Dataset[Relation]): Dataset[(String, Int, String)] = {
    val spark = relations.sparkSession
    import spark.implicits._
    relations.groupByKey(r => (r.conv_id, r.turn_idx))
      .mapGroups { (key, it) =>
        val sorted = it.toVector.sortBy(r => (r.subj_beg, r.obj_beg, r.pred))
        (key._1, key._2, formatLine(toRecords(sorted)))
      }
  }
}
