package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** BRAT standoff-annotation source (S6) — the reference's gold-data format
  * (the `.ann` files in `data/minimal_example/text/`, consumed via
  * `bin/somesci_disambiguation_input:21-23` and
  * `bin/map_unique_names_to_files:33-35`):
  *
  * {{{
  * T1\tApplication_Usage 185 190\tStata
  * T2\tVersion 191 195\t13.1
  * R1\tVersion_of Arg1:T2 Arg2:T1\t
  * }}}
  *
  * `T` lines carry (id, type, char-beg, char-end, surface); `R` lines carry
  * (id, type, Arg1:<T-id>, Arg2:<T-id>). Other standoff line kinds
  * (`#` notes, `A` attributes, `*` equivs) are skipped, matching what the
  * reference's `annotation_to_dict` consumer reads. Parsing is a pure
  * per-line map — a `Dataset` transform with no shuffle; documents group
  * with one compact-key aggregation.
  */
object Brat {

  final case class AnnEntity(id: String, typ: String, beg: Int, end: Int, surface: String)
  final case class AnnRelation(id: String, typ: String, arg1: String, arg2: String)
  final case class AnnotatedDoc(doc_id: String, entities: Seq[AnnEntity], relations: Seq[AnnRelation])

  private val ArgRe = "Arg([12]):(\\S+)".r

  /** Parse one standoff line; None for blank/unsupported kinds. */
  def parseLine(line: String): Option[Either[AnnEntity, AnnRelation]] = {
    if (line.isEmpty) return None
    line.charAt(0) match {
      case 'T' =>
        // id \t "Type beg end[;beg end]*" \t surface — discontinuous spans
        // are normalized to their envelope (min beg, max end), like the
        // reference's consumer which only reads beg/end of the first part.
        val parts = line.split("\t", 3)
        if (parts.length < 3) None
        else {
          val mid = parts(1).split(" |;")
          val typ = mid(0)
          // defensive like every other malformed shape: a T-line with no
          // offsets (truncated file) or ANY non-numeric offset token must be
          // SKIPPED whole — not crash the distributed parse with empty.min /
          // NumberFormatException, and not half-parse a corrupt span
          // (round-5 review)
          val numOpts = mid.drop(1).filter(_.nonEmpty).map(_.toIntOption)
          if (numOpts.isEmpty || numOpts.exists(_.isEmpty)) None
          else {
            val nums = numOpts.flatten
            Some(Left(AnnEntity(parts(0), typ, nums.min, nums.max, parts(2))))
          }
        }
      case 'R' =>
        val parts = line.split("\t")
        if (parts.length < 2) None
        else {
          val mid = parts(1).split(" ")
          val typ = mid(0)
          var a1 = ""; var a2 = ""
          mid.drop(1).foreach {
            case ArgRe("1", t) => a1 = t
            case ArgRe("2", t) => a2 = t
            case _ =>
          }
          if (a1.nonEmpty && a2.nonEmpty) Some(Right(AnnRelation(parts(0), typ, a1, a2)))
          else None
        }
      case _ => None
    }
  }

  /** Driver-side parse of one full `.ann` document. */
  def parseDoc(docId: String, annText: String): AnnotatedDoc = {
    val es = Vector.newBuilder[AnnEntity]
    val rs = Vector.newBuilder[AnnRelation]
    annText.linesIterator.foreach { l =>
      parseLine(l.stripLineEnd) match {
        case Some(Left(e))  => es += e
        case Some(Right(r)) => rs += r
        case None           =>
      }
    }
    AnnotatedDoc(docId, es.result(), rs.result())
  }

  /** Distributed parse: (doc_id, ann file content) rows → typed docs.
    * Pure per-row map, no shuffle.
    */
  def parse(files: Dataset[(String, String)]): Dataset[AnnotatedDoc] = {
    val spark = files.sparkSession
    import spark.implicits._
    files.map { case (id, text) => parseDoc(id, text) }
  }

  /** U2 — txt∩ann doc intersection
    * (`bin/somesci_disambiguation_input:104-110`: only docs with BOTH a
    * text and an annotation file move forward). Plain inner join on the
    * doc key.
    */
  def withText(ann: Dataset[AnnotatedDoc], txt: DataFrame, txtKey: String = "doc_id"): DataFrame =
    ann.toDF().join(txt.withColumnRenamed(txtKey, "doc_id"), Seq("doc_id"), "inner")

  // --- `.ann.unique` sink (S12 output format) --------------------------------

  /** True for the entity labels the reference maps by surface string:
    * `'_' in label and "Coreference" not in label`
    * (`bin/map_unique_names_to_files:69`).
    */
  def isUniqueMapped(label: String): Boolean =
    label.contains('_') && !label.contains("Coreference")

  /** One document's `.ann.unique` content
    * (`bin/map_unique_names_to_files:90-97`): every entity re-emits as
    * `id\tType beg end\tsurface[\tunique_id]`, every relation as
    * `id\tType Arg1:a Arg2:b\t` — byte-exact to the reference's writer.
    */
  def formatUnique(doc: AnnotatedDoc, uniqueIds: Map[String, String]): String = {
    val sb = new StringBuilder
    doc.entities.foreach { e =>
      uniqueIds.get(e.id) match {
        case Some(u) => sb.append(s"${e.id}\t${e.typ} ${e.beg} ${e.end}\t${e.surface}\t$u\n")
        case None    => sb.append(s"${e.id}\t${e.typ} ${e.beg} ${e.end}\t${e.surface}\n")
      }
    }
    doc.relations.foreach { r =>
      sb.append(s"${r.id}\t${r.typ} Arg1:${r.arg1} Arg2:${r.arg2}\t\n")
    }
    sb.toString
  }

  /** Parse one `.ann.unique` line back: entity lines may carry the appended
    * unique id as a 4th tab field (round-trip check of [[formatUnique]]).
    */
  def parseUniqueLine(line: String): Option[Either[(AnnEntity, Option[String]), AnnRelation]] = {
    if (line.isEmpty) return None
    if (line.charAt(0) == 'T') {
      val parts = line.split("\t", -1)
      if (parts.length < 3) None
      else {
        val mid = parts(1).split(" |;")
        val nums = mid.drop(1).filter(_.nonEmpty).map(_.toInt)
        val uid = if (parts.length >= 4 && parts(3).nonEmpty) Some(parts(3)) else None
        Some(Left((AnnEntity(parts(0), mid(0), nums.min, nums.max, parts(2)), uid)))
      }
    } else parseLine(line) match {
      case Some(Right(r)) => Some(Right(r))
      case _              => None
    }
  }

  /** Distributed `.ann.unique` sink: attach canonical cluster ids to a BRAT
    * corpus by SURFACE (the reference's `duplicate_name_mapping` path,
    * `bin/map_unique_names_to_files:42-46,69-74` — only main-type labels per
    * [[isUniqueMapped]]), and render one `.ann.unique` content string per
    * document. `surfaceToUnique` is (mention, canonical) — exactly the
    * [[graft.ed.Linking.canonicalMap]] output, so the KG pipeline's
    * canonical ids re-emit onto the gold annotations end-to-end.
    *
    * Shuffle shape: entities explode to compact (doc_id, ent_id, surface)
    * rows, join the canonical map on surface (AQE broadcasts it when small),
    * and regroup per document — entity payloads never fan out.
    */
  def uniqueFiles(ann: Dataset[AnnotatedDoc], surfaceToUnique: DataFrame): Dataset[(String, String)] = {
    val spark = ann.sparkSession
    import spark.implicits._
    val ents = ann.flatMap(d => d.entities.collect {
      case e if isUniqueMapped(e.typ) => (d.doc_id, e.id, e.surface)
    }).toDF("doc_id", "ent_id", "surface")
    val canon = surfaceToUnique
      .select(col("mention").as("surface"), col("canonical").cast("string").as("unique_id"))
    val assigned = ents.join(canon, Seq("surface"))
      .select($"doc_id", $"ent_id", $"unique_id").as[(String, String, String)]
      .groupByKey(_._1)
      .mapGroups((d, it) => (d, it.map(t => t._2 -> t._3).toMap))
    ann.joinWith(assigned, ann("doc_id") === assigned("_1"), "left")
      .map { case (d, m) => (d.doc_id, formatUnique(d, Option(m).map(_._2).getOrElse(Map.empty))) }
  }
}
