package graft.ed

import graft.core._
import graft.dicts.Dicts

/** The 23 ED pair features of the reference
  * (10 string + 13 context; `somenlp/entity_disambiguation/feature_calculator.py:52-193`), plus the
  * deterministic distance combination that replaces the trained scoring MLP
  * (SURVEY.md §2.10 M6) while keeping the threshold semantics P5
  * (`efficient_prediction.py:243-244`: keep pair iff dist ≤ threshold).
  *
  * All features are distances in [0,1]; 0 = identical, "missing" → 1.0
  * (the reference's init value).
  */
object PairScorer {

  /** Feature names in reference order (10 string + 13 context features). */
  val FeatureNames: Seq[String] = Seq(
    "LenFirst", "LenSecond", "Jaro", "Levenshtein", "Substring",
    "Norm_string_Jaro", "Norm_string_Levenshtein", "KnownAbbr",
    "MenGenAbbr", "NormGenAbbr",
    "GivenAbbr",
    "URL_LenFirst", "URL_LenSecond", "URL_Jaro", "URL_Substring",
    "Devel_LenFirst", "Devel_LenSecond", "Devel_Jaro", "Devel_Substring",
    "Version_LenFirst", "Version_LenSecond", "Version_Jaro", "Version_Substring")

  val MentionScaling = 60.0 // feature_calculator.py:20
  val UrlScaling = 120.0
  val DevelScaling = 30.0
  val VersionScaling = 10.0

  import StringSim.{jaroDist, normLevenshtein, substringDist}

  private def addInfoStrings(rels: Seq[RelInfo], name: String): Seq[String] =
    rels.collect { case RelInfo(t, s) if t == name => s }

  private def addInfoLen(rels: Seq[RelInfo], name: String, factor: Double): Double = {
    val xs = addInfoStrings(rels, name)
    val avg = if (xs.isEmpty) 0.0 else xs.map(_.length).sum.toDouble / xs.size
    avg / factor
  }

  private def addInfoJaro(a: Seq[RelInfo], b: Seq[RelInfo], name: String): Double = {
    val xs = addInfoStrings(a, name)
    if (xs.isEmpty) return 1.0
    val ys = addInfoStrings(b, name)
    if (ys.isEmpty) return 1.0
    var min = 1.0
    for (x <- xs; y <- ys) { val d = jaroDist(x, y); if (d < min) min = d }
    min
  }

  private def addInfoSubstring(a: Seq[RelInfo], b: Seq[RelInfo], name: String): Double = {
    val xs = addInfoStrings(a, name)
    if (xs.isEmpty) return 1.0
    val ys = addInfoStrings(b, name)
    if (ys.isEmpty) return 1.0
    if (xs.exists(x => ys.exists(y => x.contains(y) || y.contains(x)))) 0.0 else 1.0
  }

  /** MenGenAbbr / NormGenAbbr (`feature_calculator.py:348-366`). */
  def genAbbrDist(x: String, y: String): Double = {
    val ax = Normalize.generatedAbbr(x)
    val ay = Normalize.generatedAbbr(y)
    if (ax.isEmpty && ay.isEmpty) 1.0
    else math.min(math.min(jaroDist(ax, y), jaroDist(ay, x)), jaroDist(ax, ay))
  }

  /** KnownAbbr (`feature_calculator.py:368-397`): min Jaro over the DBpedia
    * two-hop alt-name expansions of both surfaces.
    */
  def knownAbbrDist(x: String, y: String, d: Dicts): Double = {
    val xa = d.altNames(x)
    val ya = d.altNames(y)
    var min = 1.0
    for (ix <- xa) { val v = jaroDist(ix, y); if (v < min) min = v }
    for (iy <- ya) { val v = jaroDist(iy, x); if (v < min) min = v }
    for (ix <- xa; iy <- ya) { val v = jaroDist(ix, iy); if (v < min) min = v }
    min
  }

  /** GivenAbbr (`feature_calculator.py:399-422`): min Jaro between declared
    * Abbreviation_of / AlternativeName_of strings and the other mention.
    */
  def givenAbbrDist(a: LinkingSample, b: LinkingSample): Double = {
    val xs = a.relations.collect {
      case RelInfo(t, s) if t == "Abbreviation_of" || t == "AlternativeName_of" => s
    }
    val ys = b.relations.collect {
      case RelInfo(t, s) if t == "Abbreviation_of" || t == "AlternativeName_of" => s
    }
    var min = 1.0
    for (x <- xs) { val v = jaroDist(x, b.string); if (v < min) min = v }
    for (y <- ys) { val v = jaroDist(y, a.string); if (v < min) min = v }
    for (x <- xs; y <- ys) { val v = jaroDist(x, y); if (v < min) min = v }
    min
  }

  /** The full 23-feature vector in reference order. */
  def features(a: LinkingSample, b: LinkingSample, d: Dicts): Array[Double] = Array(
    a.string.length / MentionScaling,
    b.string.length / MentionScaling,
    jaroDist(a.string, b.string),
    normLevenshtein(a.string, b.string),
    substringDist(a.string, b.string),
    jaroDist(a.norm, b.norm),
    normLevenshtein(a.norm, b.norm),
    knownAbbrDist(a.string, b.string, d),
    genAbbrDist(a.string, b.string),
    genAbbrDist(a.norm, b.norm),
    givenAbbrDist(a, b),
    addInfoLen(a.relations, "URL_of", UrlScaling),
    addInfoLen(b.relations, "URL_of", UrlScaling),
    addInfoJaro(a.relations, b.relations, "URL_of"),
    addInfoSubstring(a.relations, b.relations, "URL_of"),
    addInfoLen(a.relations, "Developer_of", DevelScaling),
    addInfoLen(b.relations, "Developer_of", DevelScaling),
    addInfoJaro(a.relations, b.relations, "Developer_of"),
    addInfoSubstring(a.relations, b.relations, "Developer_of"),
    addInfoLen(a.relations, "Version_of", VersionScaling),
    addInfoLen(b.relations, "Version_of", VersionScaling),
    addInfoJaro(a.relations, b.relations, "Version_of"),
    addInfoSubstring(a.relations, b.relations, "Version_of"))

  /** Deterministic distance — the fixed monotone combination replacing the
    * MLP [15,10,5,1]+sigmoid (M6). Each alternative path to "same entity"
    * contributes a candidate distance; the minimum wins (mirrors the
    * reference's min-over-context-pairs edge semantics — any scored context
    * pair below threshold links the pair in union-find).
    *
    *  - raw / normalized surface similarity: Jaro+Levenshtein mix
    *  - DBpedia alt-name match (KnownAbbr), generated-acronym match,
    *    declared-abbreviation match: base offset 0.10 + scaled Jaro so an
    *    exact alt-name/acronym lands at 0.10 ≤ threshold (0.13) and a weak
    *    one stays above it
    *  - shared URL/Developer evidence tightens the verdict slightly
    */
  def distance(a: LinkingSample, b: LinkingSample, d: Dicts): Double = {
    val f = features(a, b, d)
    val raw = 0.5 * f(2) + 0.5 * f(3)
    val norm = 0.5 * f(5) + 0.5 * f(6)
    val known = 0.10 + 0.80 * f(7)
    val genAbbr = 0.10 + 0.80 * math.min(f(8), f(9))
    val given = 0.10 + 0.80 * f(10)
    val base = math.min(math.min(raw, norm), math.min(math.min(known, genAbbr), given))
    // corroborating context: identical URL or Developer shaves a hair
    val bonus = if (f(13) == 0.0 || f(17) == 0.0) 0.02 else 0.0
    math.max(0.0, base - bonus)
  }

  /** Link threshold (`configurations/PMC/ED/efficient_config_pred.json`). */
  val Threshold = 0.13
}
