package graft.sources

import graft.core.{Mention, Relation, Turn}
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
    * positional within the turn over ALL of the turn's entities (O4
    * order-by-beg — the reference indexes the full sentence entity list,
    * `RE_model.py:151-156`), reconstructed on write and carried through on
    * read. `entityBegs` is that full list; when empty (no mention table
    * available) it degrades to indexing over the relation-participating
    * entities only — fine for round-trips of this writer's own output, but
    * NOT byte-compatible with reference files for turns that contain
    * relation-less entities.
    */
  def toRecords(rels: Seq[Relation], entityBegs: Seq[Int] = Nil): Seq[RelRecord] = {
    val begs =
      if (entityBegs.nonEmpty) entityBegs.distinct.sorted
      else rels.flatMap(r => Seq(r.subj_beg, r.obj_beg)).distinct.sorted
    val idx = begs.zipWithIndex.toMap
    def at(b: Int): Int = idx.getOrElse(b,
      throw new NoSuchElementException(s"relation entity at beg=$b not in the turn's entity list"))
    rels.map(r => RelRecord(r.pred,
      r.subj_surface, r.subj_beg, at(r.subj_beg),
      r.obj_surface, r.obj_beg, at(r.obj_beg)))
  }

  /** Distributed emit, full file contract: ONE line per TURN of `turns`
    * (the reference's reader aligns lines to sentences POSITIONALLY, so a
    * relation-less turn must emit an empty line — omitting it shifts every
    * later sentence's relations onto the wrong sentence), entity indices
    * over the turn's full mention list, records sorted by (subj, obj, pred)
    * — deterministic under any partitioning.
    */
  def lines(turns: Dataset[Turn], relations: Dataset[Relation],
      mentions: Dataset[Mention]): Dataset[(String, Int, String)] = {
    val spark = turns.sparkSession
    import spark.implicits._
    val relsByTurn = relations.groupByKey(r => (r.conv_id, r.turn_idx))
      .mapGroups((k, it) => (k._1, k._2, it.toSeq))
      .toDF("conv_id", "turn_idx", "rels")
    val begsByTurn = mentions.groupByKey(m => (m.conv_id, m.turn_idx))
      .mapGroups((k, it) => (k._1, k._2, it.map(_.beg).toSeq))
      .toDF("conv_id", "turn_idx", "ent_begs")
    turns.select($"conv_id", $"turn_idx")
      .join(relsByTurn, Seq("conv_id", "turn_idx"), "left")
      .join(begsByTurn, Seq("conv_id", "turn_idx"), "left")
      .as[(String, Int, Seq[Relation], Seq[Int])]
      .map { case (c, t, rels, begs) =>
        val rs = Option(rels).getOrElse(Seq.empty)
          .sortBy(r => (r.subj_beg, r.obj_beg, r.pred))
        (c, t, formatLine(toRecords(rs, Option(begs).getOrElse(Seq.empty))))
      }
  }

  /** Relations-only emit (no turn/mention tables): lines for turns that
    * HAVE relations, indices over participating entities. Round-trips with
    * [[parseLine]]; see [[lines]] for the positional file contract.
    */
  def linesFromRelations(relations: Dataset[Relation]): Dataset[(String, Int, String)] = {
    val spark = relations.sparkSession
    import spark.implicits._
    relations.groupByKey(r => (r.conv_id, r.turn_idx))
      .mapGroups { (key, it) =>
        val sorted = it.toVector.sortBy(r => (r.subj_beg, r.obj_beg, r.pred))
        (key._1, key._2, formatLine(toRecords(sorted)))
      }
  }
}
