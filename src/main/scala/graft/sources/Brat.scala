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
          val nums = mid.drop(1).filter(_.nonEmpty).map(_.toInt)
          Some(Left(AnnEntity(parts(0), typ, nums.min, nums.max, parts(2))))
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
}
