package graft.ner

import graft.core._
import graft.dicts.Dicts
import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{Dataset, SparkSession}

/** Deterministic per-turn mention detection — the rebuild's replacement for
  * the reference's learned taggers (SURVEY.md §2.10 M1-M4), per north_star:
  * gazetteer + contextual feature scoring via broadcast dictionaries and
  * mapPartitions-batched inference.
  *
  * Pipeline per turn (all pure, no cross-row state → embarrassingly
  * parallel, zero shuffle):
  *   1. W5 candidate spans of 1..6 tokens (`bin/custom_feature_gen:18`)
  *   2. J4 gazetteer membership on the space-joined span
  *      (`distant_supervision_rules.py:3-10`)
  *   3. F15 contextual trigger rules on the closed lemma vocabulary
  *      (`candidate_rules.py:3-113`)
  *   4. span acceptance + greedy longest-match overlap resolution
  *   5. three BIO layers (software / mention type / soft type) → W2 fix →
  *      W3 merge (`bin/combine_annotations`) → W1 decode → typed mentions
  *   6. attribute spans (Version/Citation/URL/Developer/License/Abbreviation)
  *      from the token-class regexes of `sentence_rep.py:13-21` + rules
  */
object MentionDetector {

  // Token classes (sentence_rep.py:13-21) — allocation-free char scans in
  // core.TokenClass (regex Matchers were the dominant hot-path garbage;
  // equivalence property-tested in TokenClassSpec)

  private val MainSoftTypes = Set("Application", "PlugIn", "ProgrammingEnvironment", "OperatingSystem")
  // shared with TokenFeatures (ONE definition — round-5 review found the
  // same three sets re-allocated per candidate span there)
  private[ner] val DeveloperMarkers = Set("inc.", "ltd.", "corp.", "apply", "inc", "ltd", "corp")
  private[ner] val OpenBrackets = Set("(", "[", "{")
  private[ner] val CloseBrackets = Set(")", "]", "}")

  final private case class SoftSpan(
      begTok: Int, endTok: Int, // token range, exclusive end
      softType: String,
      mentionType: String)

  def versionLike(t: String): Boolean =
    TokenClass.floatNum(t) || TokenClass.versionLikeNum(t) ||
      TokenClass.longVersion(t) || TokenClass.vPrefixed(t) ||
      TokenClass.digits(t)

  /** Pure per-turn detection. Returns mention spans sorted by `beg`, with
    * ids T1..Tn — the unit the Spark wrapper batches over partitions.
    *
    * Hot-path discipline: tokens live in parallel primitive/String arrays
    * (no per-token objects), token classes are char scans — at 10¹² turns
    * the per-turn allocation rate, not CPU, is what breaks scaling (see
    * BASELINE.md host calibration).
    */
  def detect(text: String, d: Dicts): Vector[Span] = {
    if (text == null) return Vector.empty // null turn text = empty turn (P1)
    // inline whitespace tokenization: pass 1 counts, pass 2 fills arrays
    val tlen = text.length
    var n = 0
    var p = 0
    while (p < tlen) {
      while (p < tlen && text.charAt(p).isWhitespace) p += 1
      if (p < tlen) { n += 1; while (p < tlen && !text.charAt(p).isWhitespace) p += 1 }
    }
    if (n == 0) return Vector.empty
    val begs = new Array[Int](n)
    val ends = new Array[Int](n)
    val surfaces = new Array[String](n)
    val lemmas = new Array[String](n)
    p = 0
    var k = 0
    while (p < tlen) {
      while (p < tlen && text.charAt(p).isWhitespace) p += 1
      if (p < tlen) {
        val b = p
        while (p < tlen && !text.charAt(p).isWhitespace) p += 1
        begs(k) = b; ends(k) = p
        val s = text.substring(b, p)
        surfaces(k) = s
        lemmas(k) = Lemma.of(s)
        k += 1
      }
    }

    // --- F15 trigger rules over lemma context -------------------------------
    def leftLem(i: Int, k: Int): IndexedSeq[String] = lemmas.slice(math.max(i - k, 0), i)
    def rightLem(i: Int, k: Int): IndexedSeq[String] = lemmas.slice(i, math.min(i + k, n))
    /** Distinct trigger-rule FAMILIES firing for span [b,e). The reference
      * counts each pan rule separately as a feature (A4); for the accept
      * decision the nested left-context rules (pan_top_2 ⊂ 3 ⊂ 4) collapse
      * into one family so they cannot self-corroborate.
      *
      * All families depend only on b (left context) or e (right context), so
      * they precompute in O(n) and panCount is O(1) per span — the candidate
      * loop visits 6n spans, so this must not allocate.
      */
    def lem(i: Int): String = lemmas(i)
    val leftUse = Array.tabulate(n + 1)(b => b >= 1 && lem(b - 1) == "use")
    val famB = Array.tabulate(n + 1) { b =>
      (b >= 2 && lem(b - 2) == "perform" && lem(b - 1) == "use") || // pan_top_2
        (b >= 3 && lem(b - 3) == "be" && lem(b - 2) == "perform" && lem(b - 1) == "use") || // pan_top_3
        (b >= 4 && lem(b - 4) == "analysis" && lem(b - 3) == "be" &&
          lem(b - 2) == "perform" && lem(b - 1) == "use") // pan_top_4
    }
    val pan5 = Array.tabulate(n + 1)(b =>
      b >= 2 && (lem(b - 2) == "analyze" || lem(b - 2) == "analyse") && lem(b - 1) == "use")
    val pan6 = Array.tabulate(n + 1)(b =>
      b >= 4 && lem(b - 4) == "analysis" && lem(b - 3) == "be" &&
        lem(b - 2) == "perform" && lem(b - 1) == "with")
    val rightSoftware = Array.tabulate(n + 1)(e => e < n && lem(e) == "software")
    val pan7 = Array.tabulate(n + 1)(e =>
      e + 1 < n && lem(e) == "statistical" && lem(e + 1) == "software")
    val pan8 = Array.tabulate(n + 1)(e =>
      e + 2 < n && lem(e) == "software" && lem(e + 1) == "be" && lem(e + 2) == "use")
    def panCount(b: Int, e: Int): Int = {
      var c = 0
      if (leftUse(b) && rightSoftware(e)) c += 1 // pan_top_1
      if (famB(b)) c += 1
      if (pan5(b)) c += 1
      if (pan6(b)) c += 1
      if (pan7(e)) c += 1
      if (pan8(e)) c += 1
      c
    }
    def inBrackets(b: Int, e: Int): Boolean =
      b > 0 && e < n && OpenBrackets(surfaces(b - 1)) && CloseBrackets(surfaces(e))
    def developerRule(b: Int, e: Int): Boolean =
      b > 0 && e < n && surfaces(b - 1) == "(" && surfaces(e) == ")" &&
        surfaces.slice(b, e).exists(t => DeveloperMarkers(t.toLowerCase(java.util.Locale.ROOT)))

    // --- W5 candidate enumeration + acceptance ------------------------------
    // 6n candidate spans; the gazetteer lookup prunes on the first token
    // (d.firstTokenMaxLen) so the joined-string build only happens for spans
    // that can possibly match — O(1) per span otherwise.
    val accepted = Vector.newBuilder[(Int, Int, Array[Int], Int, Boolean)] // (b, e, srcIds, pan, strong)
    val developerSpans = Vector.newBuilder[(Int, Int)]
    var len = 1
    while (len <= 6) {
      var b = 0
      while (b + len <= n) {
        val e = b + len
        if ((len > 1 || surfaces(b).length != 1) && developerRule(b, e)) developerSpans += ((b, e))
        val srcIds: Array[Int] =
          if (len == 1) d.inverted.getOrElse(surfaces(b), null)
          else if (d.firstTokenMaxLen.getOrElse(surfaces(b), 0) >= len)
            d.inverted.getOrElse(surfaces.slice(b, e).mkString(" "), null)
          else null
        val pan = panCount(b, e)
        val strongHits = if (srcIds == null) 0 else srcIds.count(d.strongSources)
        val weakHit = srcIds != null && srcIds.nonEmpty
        // F12 word-shape evidence (word_rules.py:1-23): an out-of-gazetteer
        // CamelCase / all-caps token counts like a weak-dictionary hit — it
        // still needs ≥1 contextual trigger, so lowercase corpora and plain
        // capitalized sentence-starts never fire this path.
        val shapeHit = len == 1 && !weakHit && WordShape.distinctiveShape(surfaces(b))
        val isSoftware = strongHits >= 1 || ((weakHit || shapeHit) && pan >= 1) || pan >= 2
        if (isSoftware)
          accepted += ((b, e, if (srcIds == null) Array.empty[Int] else srcIds, pan, strongHits >= 1))
        b += 1
      }
      len += 1
    }

    // greedy overlap resolution: dictionary-backed spans beat rule-only
    // spans, then longest match, then leftmost (token granularity)
    val covered = new Array[Boolean](n)
    var softSpans = accepted.result()
      .sortBy { case (b, e, _, _, strong) => (if (strong) 0 else 1, -(e - b), b) }
      .filter { case (b, e, _, _, _) =>
        val free = (b until e).forall(i => !covered(i))
        if (free) (b until e).foreach(covered(_) = true)
        free
      }
      .map { case (b, e, srcIds, pan, _) =>
        val softType = srcIds.iterator.flatMap(d.sourceType.get)
          .find(MainSoftTypes).getOrElse("Application")
        val mentionType =
          if (pan >= 1) "Usage"
          else {
            val ctx = leftLem(b, 4) ++ rightLem(e, 4)
            if (ctx.exists(Set("develop", "implement", "create", "write"))) "Creation"
            else if (ctx.exists(Set("deposit", "release", "download", "available"))) "Deposition"
            else if (leftLem(b, 4).contains("use") || rightLem(e, 4).contains("use") ||
              leftLem(b, 4).contains("run") || leftLem(b, 4).contains("compute")) "Usage"
            else "Mention"
          }
        SoftSpan(b, e, softType, mentionType)
      }
      .sortBy(_.begTok)

    // "Full Name ( ABBR )" demotion: a single-token software span in
    // brackets that is the acronym / DBpedia alt name of a preceding
    // multi-token software span is an Abbreviation attribute, not a second
    // software mention (SoMeSci pattern behind Abbreviation_of).
    val demoted = Vector.newBuilder[(Int, Int)]
    softSpans = softSpans.filter { s =>
      val single = s.endTok - s.begTok == 1
      val isDemotable = single && inBrackets(s.begTok, s.endTok) && {
        val t = surfaces(s.begTok)
        softSpans.exists { p =>
          p.endTok <= s.begTok - 1 && (p.endTok - p.begTok) > 1 && {
            val pToks = surfaces.slice(p.begTok, p.endTok)
            val pSurface = text.substring(begs(p.begTok), ends(p.endTok - 1))
            Normalize.acronym(pToks).contains(t.toLowerCase(java.util.Locale.ROOT)) || d.altNames(pSurface).contains(t)
          }
        }
      }
      if (isDemotable) demoted += ((s.begTok, s.endTok))
      !isDemotable
    }

    // --- three BIO layers → fix → merge → decode (W1-W3 in production) ------
    val swTags = Array.fill(n)("O")
    val mtTags = Array.fill(n)("O")
    val stTags = Array.fill(n)("O")
    for (s <- softSpans; i <- s.begTok until s.endTok) {
      val p = if (i == s.begTok) "B-" else "I-"
      swTags(i) = p + "Application"
      mtTags(i) = p + s.mentionType
      stTags(i) = p + s.softType
    }
    import scala.collection.immutable.ArraySeq.unsafeWrapArray
    val merged = Bio.merge(
      Bio.fix(unsafeWrapArray(swTags), software = true),
      Bio.fix(unsafeWrapArray(mtTags), software = false),
      Bio.fix(unsafeWrapArray(stTags), software = false))
    val softwareMentions = Bio.decode(text, begs, ends, merged.toIndexedSeq)

    // --- attribute spans over uncovered tokens ------------------------------
    val attrs = Vector.newBuilder[Span]
    def free(i: Int): Boolean = !covered(i)
    def claim(b: Int, e: Int): Unit = (b until e).foreach(covered(_) = true)
    def spanOf(b: Int, e: Int, typ: String): Span =
      Span(typ, begs(b), ends(e - 1), text.substring(begs(b), ends(e - 1)))

    // demoted "( ABBR )" spans become Abbreviation attributes (keep covered)
    for ((b, e) <- demoted.result()) attrs += spanOf(b, e, "Abbreviation")

    // Developer: parenthesized span containing inc./ltd./corp. (longest first)
    for ((b, e) <- developerSpans.result().sortBy(t => (-(t._2 - t._1), t._1))
         if (b until e).forall(free)) {
      claim(b, e); attrs += spanOf(b, e, "Developer")
    }
    // License: exact dictionary surfaces, 1..3 tokens, longest first
    for (l <- 3 to 1 by -1; b <- 0 to n - l) {
      val e = b + l
      if ((b until e).forall(free) && d.licenses(surfaces.slice(b, e).mkString(" "))) {
        claim(b, e); attrs += spanOf(b, e, "License")
      }
    }
    var i = 0
    while (i < n) {
      val t = surfaces(i)
      if (free(i)) {
        if (TokenClass.citation(t)) {
          claim(i, i + 1); attrs += spanOf(i, i + 1, "Citation")
        } else if (t == "[" && i + 2 < n && free(i + 1) && free(i + 2) &&
          TokenClass.citationNum(surfaces(i + 1)) && surfaces(i + 2) == "]") {
          claim(i, i + 3); attrs += spanOf(i, i + 3, "Citation")
        } else if (TokenClass.url(Lemma.of(t))) {
          claim(i, i + 1); attrs += spanOf(i, i + 1, "URL")
        }
      }
      i += 1
    }
    // Version: version-like token within 2 tokens after a software span,
    // or directly after the lemma "version"
    val softEnds = softSpans.map(_.endTok)
    i = 0
    while (i < n) {
      if (free(i) && versionLike(surfaces(i))) {
        val nearSoftware = softEnds.exists(e => i >= e && i - e <= 1)
        val afterVersionWord = i > 0 && lemmas(i - 1) == "version"
        if (nearSoftware || afterVersionWord) {
          claim(i, i + 1); attrs += spanOf(i, i + 1, "Version")
        }
      }
      i += 1
    }
    // Abbreviation: free all-caps token equal to a software span's acronym or
    // a DBpedia alt name of its surface
    val softSurfaces = softSpans.map(s => (surfaces.slice(s.begTok, s.endTok),
      text.substring(begs(s.begTok), ends(s.endTok - 1))))
    i = 0
    while (i < n) {
      val t = surfaces(i)
      if (free(i) && t.length >= 2 && t.forall(c => c.isUpper || c.isDigit) && t.exists(_.isLetter)) {
        val isAbbr = softSurfaces.exists { case (spanToks, spanSurface) =>
          Normalize.acronym(spanToks).contains(t.toLowerCase(java.util.Locale.ROOT)) ||
            (d.altNames(spanSurface).contains(t) && spanSurface != t)
        }
        if (isAbbr) { claim(i, i + 1); attrs += spanOf(i, i + 1, "Abbreviation") }
      }
      i += 1
    }

    (softwareMentions ++ attrs.result()).sortBy(_.beg)
  }

  /** Spark wrapper: turns → mentions, batched per partition with the
    * broadcast dictionary bundle (north_star: "mapPartitions-batched
    * inference"). No shuffle; partitioning of the input is preserved.
    */
  def mentions(turns: Dataset[Turn], dicts: Broadcast[Dicts]): Dataset[Mention] = {
    val spark = turns.sparkSession
    import spark.implicits._
    turns.mapPartitions { it =>
      it.flatMap { t =>
        val spans = detect(t.text, dicts.value)
        spans.iterator.zipWithIndex.map { case (s, i) =>
          Mention(t.conv_id, t.turn_idx, s"T${i + 1}", s.typ, s.beg, s.end, s.surface)
        }
      }
    }
  }

  def mentions(spark: SparkSession, turns: Dataset[Turn], d: Dicts): Dataset[Mention] =
    mentions(turns, Dicts.broadcast(spark, d))
}
