package graft.core

/** A decoded entity mention span with character offsets into the turn text. */
final case class Span(typ: String, beg: Int, end: Int, surface: String)

/** BIO tag-sequence operators (SURVEY.md §2.5 W1-W3, §2.4 A2).
  *
  * W1 decode mirrors `articlenizer.formatting.bio_to_brat` as used by
  * `somenlp/NER/output_handler.py:118-127` and `somenlp/RE/features.py:300`:
  * `B-X` opens a span, `I-X` of the same type continues it, anything else
  * closes it; char offsets are taken from the token offsets of the
  * space-joined sentence. A dangling `I-X` (no open span) opens a new span —
  * the repaired form produced by `fix_annotation`.
  *
  * W2 repair mirrors `bin/combine_annotations:85-113` (`fix_annotation`),
  * including the software-vs-class asymmetry on mid-span type change.
  *
  * W3 merge + A2 majority vote mirror `bin/combine_annotations:17-68`
  * (`combine_tags` / `merge_annotations`) with Python `max(key=count)`
  * stability: among tie counts the value occurring earliest in the list wins.
  */
object Bio {

  /** W1 — decode an aligned (tokens, tags) pair into typed spans. */
  def decode(tokens: IndexedSeq[Token], tags: IndexedSeq[String]): Vector[Span] = {
    require(tokens.length == tags.length, s"token/tag length mismatch: ${tokens.length} vs ${tags.length}")
    val out = Vector.newBuilder[Span]
    var openTyp: String = null
    var openBeg = 0
    var openEnd = 0
    def close(): Unit = if (openTyp != null) {
      out += Span(openTyp, openBeg, openEnd, null) // surface filled by caller
      openTyp = null
    }
    var i = 0
    while (i < tokens.length) {
      val tag = tags(i)
      if (tag.startsWith("B-")) {
        close()
        openTyp = tag.substring(2); openBeg = tokens(i).beg; openEnd = tokens(i).end
      } else if (tag.startsWith("I-")) {
        val typ = tag.substring(2)
        if (openTyp == typ) openEnd = tokens(i).end
        else { close(); openTyp = typ; openBeg = tokens(i).beg; openEnd = tokens(i).end }
      } else close()
      i += 1
    }
    close()
    out.result()
  }

  /** W1 convenience: decode against the text itself (fills surfaces). */
  def decode(text: String, tags: IndexedSeq[String]): Vector[Span] = {
    val toks = Tok.tokens(text)
    decode(toks, tags).map(s => s.copy(surface = text.substring(s.beg, s.end)))
  }

  /** W1 allocation-light form: token offsets as parallel primitive arrays
    * (the detector's internal representation — avoids re-tokenizing and
    * per-token objects on the hot path).
    */
  def decode(text: String, begs: Array[Int], ends: Array[Int], tags: IndexedSeq[String]): Vector[Span] = {
    require(begs.length == tags.length, s"token/tag length mismatch: ${begs.length} vs ${tags.length}")
    val out = Vector.newBuilder[Span]
    var openTyp: String = null
    var openBeg = 0
    var openEnd = 0
    def close(): Unit = if (openTyp != null) {
      out += Span(openTyp, openBeg, openEnd, text.substring(openBeg, openEnd))
      openTyp = null
    }
    var i = 0
    while (i < begs.length) {
      val tag = tags(i)
      if (tag.startsWith("B-")) {
        close()
        openTyp = tag.substring(2); openBeg = begs(i); openEnd = ends(i)
      } else if (tag.startsWith("I-")) {
        val typ = tag.substring(2)
        if (openTyp == typ) openEnd = ends(i)
        else { close(); openTyp = typ; openBeg = begs(i); openEnd = ends(i) }
      } else close()
      i += 1
    }
    close()
    out.result()
  }

  /** W2 — repair a raw tag sequence (`fix_annotation`).
    * `software=true` → mid-span type change starts a new `B-`; otherwise the
    * previous type is inherited (`I-` of last tag).
    */
  def fix(annotation: IndexedSeq[String], software: Boolean): IndexedSeq[String] = {
    val out = new Array[String](annotation.length)
    var lastAnno = "O"
    var lastTag = ""
    var i = 0
    while (i < annotation.length) {
      var ann = annotation(i)
      if (ann.startsWith("B-")) {
        lastTag = ann.substring(2)
      } else if (ann.startsWith("I-")) {
        var tag = ann.substring(2)
        if (!(lastAnno.startsWith("B-") || lastAnno.startsWith("I-"))) {
          ann = "B-" + tag
        } else if (lastTag != tag) {
          if (software) ann = "B-" + tag
          else { ann = "I-" + lastTag; tag = lastTag }
        }
        lastTag = tag
      } else {
        lastTag = ""
      }
      lastAnno = ann
      out(i) = ann
      i += 1
    }
    scala.collection.immutable.ArraySeq.unsafeWrapArray(out) // local array — no copy needed
  }

  /** A2 — Python-stable mode: value with max count; ties → the value whose
    * occurrence comes first in list order; empty → "Unknown".
    * (`bin/combine_annotations:19-22`)
    */
  def stableMode(values: Seq[String]): String = {
    if (values.isEmpty) return "Unknown"
    val counts = values.groupBy(identity).map { case (k, v) => (k, v.size) }
    // Python max(values, key=count) scans values in order, keeps first strict max.
    var best = values.head
    var bestCount = counts(best)
    for (v <- values.tail) {
      val c = counts(v)
      if (c > bestCount) { best = v; bestCount = c }
    }
    best
  }

  /** W3 — merge the three task layers (`merge_annotations` +
    * `combine_tags`): segment by software-layer B-/I-Application spans;
    * within each span, majority-vote the non-O suffixes of the mention-type
    * and soft-type layers; combined label `s"${soft}_${mention}"`.
    */
  def merge(
      softwareTags: IndexedSeq[String],
      mentionTypeTags: IndexedSeq[String],
      softTypeTags: IndexedSeq[String]): IndexedSeq[String] = {
    val n = softwareTags.length
    require(mentionTypeTags.length == n && softTypeTags.length == n, "layer length mismatch")
    val out = Vector.newBuilder[String]
    val curM = Vector.newBuilder[String]
    val curT = Vector.newBuilder[String]
    var curLen = 0

    def flush(): Unit = if (curLen > 0) {
      val mTypes = curM.result().filter(_ != "O").map(t => t.substring(t.lastIndexOf('-') + 1))
      val sTypes = curT.result().filter(_ != "O").map(t => t.substring(t.lastIndexOf('-') + 1))
      val mentionTag = if (mTypes.nonEmpty) stableMode(mTypes) else "Unknown"
      val softTag = if (sTypes.nonEmpty) stableMode(sTypes) else "Unknown"
      val outType = s"${softTag}_$mentionTag"
      out += s"B-$outType"
      var k = 1
      while (k < curLen) { out += s"I-$outType"; k += 1 }
      curM.clear(); curT.clear(); curLen = 0
    }

    var i = 0
    while (i < n) {
      val s = softwareTags(i)
      if (s == "B-Application") {
        flush()
        curM += mentionTypeTags(i); curT += softTypeTags(i); curLen += 1
      } else if (s == "I-Application") {
        curM += mentionTypeTags(i); curT += softTypeTags(i); curLen += 1
      } else {
        flush()
        out += s
      }
      i += 1
    }
    flush()
    out.result()
  }
}
