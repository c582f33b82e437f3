package graft.dicts

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.SparkSession

/** Broadcast dictionary bundle for the deterministic taggers.
  *
  * Mirrors the reference's distant-supervision dictionary
  * (`somenlp/feature_engineering/gen_custom_features.py:48-63`: JSON
  * `{source -> [surfaces]}` inverted at load to `{surface -> [sourceIds]}`)
  * and the DBpedia two-way candidate index (`bin/dbpedia_to_json:20-37`:
  * `unique_mapping` canonical→alt-labels, `label_mapping` label→canonicals).
  *
  * All maps are driver-built and broadcast once; hit-testing happens inside
  * `mapPartitions` (broadcast-hash-join shape, no shuffle — SURVEY.md §2.3 J4/J5).
  */
final case class Dicts(
    /** source name → dense id, insertion-ordered (A1-style determinism). */
    sourceIds: Map[String, Int],
    /** gazetteer surface → source ids (J4). Keys are exact surfaces. */
    inverted: Map[String, Array[Int]],
    /** sources whose hits alone qualify a span as software ("strong"):
      * curated software lists, vs. weak natural-language dictionaries
      * (wiktionary confounders need contextual rule support). */
    strongSources: Set[Int],
    /** source id → soft type vote (Application / PlugIn /
      * ProgrammingEnvironment / OperatingSystem). */
    sourceType: Map[Int, String],
    /** DBpedia canonical → alternative labels (J5). */
    dbpediaUnique: Map[String, Set[String]],
    /** DBpedia label → canonicals (J5). */
    dbpediaLabel: Map[String, Set[String]],
    /** license-name surfaces (License attribute detection). */
    licenses: Set[String]) {

  /** first token of a gazetteer entry → max token count of entries starting
    * with it. Lets the detector skip building candidate-span strings whose
    * first token can never match (the dominant case) — the J4 lookup then
    * costs O(1) per span instead of an O(len) string build.
    */
  lazy val firstTokenMaxLen: Map[String, Int] = {
    val m = scala.collection.mutable.Map.empty[String, Int]
    inverted.keysIterator.foreach { surf =>
      val sp = surf.indexOf(' ')
      val first = if (sp < 0) surf else surf.substring(0, sp)
      val n = surf.count(_ == ' ') + 1
      val cur = m.getOrElse(first, 0)
      if (n > cur) m(first) = n
    }
    m.toMap
  }

  /** Null-returning views of [[inverted]] / [[firstTokenMaxLen]] for the
    * detector's candidate loop: the immutable-Map `getOrElse` path allocates
    * an Option per lookup and the loop does ~6 lookups per token of the
    * corpus (guide §1.2 "per-task work"). @transient lazy — rebuilt once per
    * executor after broadcast deserialization, never shipped.
    */
  @transient lazy val invertedJ: java.util.HashMap[String, Array[Int]] = {
    val m = new java.util.HashMap[String, Array[Int]](inverted.size * 2)
    inverted.foreach { case (k, v) => m.put(k, v) }
    m
  }

  @transient lazy val firstTokenMaxLenJ: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](firstTokenMaxLen.size * 2)
    firstTokenMaxLen.foreach { case (k, v) => m.put(k, Integer.valueOf(v)) }
    m
  }

  /** First tokens of license surfaces + the max license token count: lets
    * the License scan skip the per-position join-and-look-up unless the
    * position can possibly start a license (the old loop built a joined
    * string for every (position, len ≤ 3) of every turn).
    */
  @transient lazy val licenseFirst: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String](licenses.size * 2)
    licenses.foreach { l =>
      val sp = l.indexOf(' ')
      s.add(if (sp < 0) l else l.substring(0, sp))
    }
    s
  }

  @transient lazy val licenseMaxTokens: Int =
    if (licenses.isEmpty) 0 else licenses.iterator.map(_.count(_ == ' ') + 1).max

  /** J5 two-hop alt-name expansion (`feature_calculator.py:368-382`):
    * the surface itself, plus unique_mapping[s], or else for each canonical
    * in label_mapping[s] the canonical and its unique_mapping entries.
    */
  def altNames(s: String): Set[String] = {
    val out = scala.collection.mutable.Set(s)
    dbpediaUnique.get(s) match {
      case Some(alts) => out ++= alts
      case None =>
        dbpediaLabel.get(s).foreach { canonicals =>
          canonicals.foreach { c =>
            out += c
            out ++= dbpediaUnique.getOrElse(c, Set.empty)
          }
        }
    }
    out.toSet
  }
}

object Dicts {

  /** Build from `{source -> surfaces}` in given source order (insertion
    * order = dense ids, like the reference's Python-3.6 ordered dicts).
    */
  def build(
      sources: Seq[(String, Seq[String])],
      strong: Set[String],
      typeOf: Map[String, String],
      dbpediaUnique: Map[String, Set[String]] = Map.empty,
      licenses: Set[String] = DefaultLicenses): Dicts = {
    val sourceIds = sources.map(_._1).zipWithIndex.toMap
    val inv = scala.collection.mutable.Map.empty[String, List[Int]]
    for ((src, surfaces) <- sources; surf <- surfaces) {
      // reference filters entries > 6 tokens (bin/distant_supervision --max-token-length)
      if (surf.split(' ').length <= 6) {
        val id = sourceIds(src)
        val cur = inv.getOrElse(surf, Nil)
        if (!cur.contains(id)) inv(surf) = cur :+ id
      }
    }
    val labelMapping = {
      val m = scala.collection.mutable.Map.empty[String, Set[String]]
      for ((canonical, alts) <- dbpediaUnique; alt <- alts)
        m(alt) = m.getOrElse(alt, Set.empty) + canonical
      m.toMap
    }
    Dicts(
      sourceIds = sourceIds,
      inverted = inv.map { case (k, v) => (k, v.toArray) }.toMap,
      strongSources = strong.flatMap(sourceIds.get),
      sourceType = sourceIds.flatMap { case (name, id) => typeOf.get(name).map(id -> _) },
      dbpediaUnique = dbpediaUnique,
      dbpediaLabel = labelMapping,
      licenses = licenses)
  }

  val DefaultLicenses: Set[String] =
    Set("GPL", "GPLv2", "GPLv3", "LGPL", "MIT", "BSD", "Apache-2.0", "GNU GPL")

  /** Golden-fixture gazetteer (FIXTURES.md §5-6): curated software names the
    * unit/golden tests exercise, plus common-word confounders in the weak
    * wiktionary source.
    */
  lazy val fixture: Dicts = build(
    sources = Seq(
      "wikidata_software" -> Seq(
        "Stata", "SPSS", "IBM SPSS Statistics", "MATLAB", "EEGLAB", "SAS",
        "GraphPad Prism", "Excel", "Microsoft Excel", "ImageJ", "Photoshop",
        "STATA", "SPM", "FreeSurfer", "AFNI", "Statistical Package for the Social Sciences"),
      "pypi" -> Seq("numpy", "scipy", "pandas", "scikit-learn", "TensorFlow", "PyTorch"),
      "cran" -> Seq("ggplot2", "dplyr", "lme4", "limma"),
      "proglang" -> Seq("Python", "R", "Java", "Scala", "Julia", "Fortran"),
      "os_list" -> Seq("Windows", "Linux", "Ubuntu", "macOS", "Windows 10"),
      "plugin_list" -> Seq("EEGLAB toolbox", "Excel plugin"),
      "wiktionary_english" -> Seq("data", "model", "program", "table", "window", "value", "excel")),
    strong = Set("wikidata_software", "pypi", "cran", "proglang", "os_list", "plugin_list"),
    typeOf = Map(
      "wikidata_software" -> "Application",
      "pypi" -> "PlugIn",
      "cran" -> "PlugIn",
      "proglang" -> "ProgrammingEnvironment",
      "os_list" -> "OperatingSystem",
      "plugin_list" -> "PlugIn",
      "wiktionary_english" -> "Application"),
    dbpediaUnique = Map(
      "Stata" -> Set("STATA", "stata"),
      "SPSS" -> Set("IBM SPSS Statistics", "Statistical Package for the Social Sciences", "PASW"),
      "MATLAB" -> Set("Matlab", "MatLab"),
      "Microsoft Excel" -> Set("Excel", "MS Excel"),
      "Python" -> Set("CPython", "python"),
      "R" -> Set("GNU R", "R Project for Statistical Computing")))

  /** Gazetteer over the driver testdata's word-salad `documents` vocabulary:
    * treats a handful of its tokens as "software" names so the KG pipeline
    * has verifiable work when run over `/root/testdata` (TESTDATA.md). The
    * choice of surfaces is arbitrary but fixed; oracle SQL in SparkEntry
    * embeds the same list.
    */
  lazy val testdata: Dicts = build(
    sources = Seq(
      "wikidata_software" -> TestdataSoftware,
      "wiktionary_english" -> TestdataWiktionary),
    strong = Set("wikidata_software"),
    typeOf = Map("wikidata_software" -> "Application", "wiktionary_english" -> "Application"),
    dbpediaUnique = Map("spark" -> Set("Spark"), "hash" -> Set("Hash")))

  /** The surfaces the testdata gazetteer tags (mirrored in oracle SQL).
    * "Spark" (capitalized) never occurs in the lowercase word-salad corpus;
    * it enters via the augmented-transcript derivation (SparkEntry.turns2)
    * specifically so the ED stage has a VERIFIABLE case-variant merge
    * ("spark" ↔ "Spark" share a normalize block → distance 0 → one
    * component) that the DuckDB oracle reproduces.
    */
  val TestdataSoftware: Seq[String] =
    Seq("spark", "hash", "merge", "sort", "window", "filter", "scan", "agg", "Spark")

  /** The testdata weak-dictionary surfaces — same single-source contract as
    * [[TestdataSoftware]]: oracle SQL derives from THIS list (round-5
    * review found it duplicated verbatim in the q_a4 oracle).
    */
  val TestdataWiktionary: Seq[String] = Seq("table", "value", "data", "row", "line")

  def broadcast(spark: SparkSession, d: Dicts): Broadcast[Dicts] =
    spark.sparkContext.broadcast(d)
}
