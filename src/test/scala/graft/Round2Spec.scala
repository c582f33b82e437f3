package graft

import graft.core._
import graft.dicts.Dicts
import graft.ner.MentionDetector
import graft.sources.{Brat, LinkingJson, RelationFile}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class Hash61Spec extends AnyFunSuite {
  test("pinned reference values (cross-checked against the DuckDB SQL form)") {
    assert(Hash61.hash("hello world") == 348677905259091842L)
    assert(Hash61.hash("") == 0L)
    assert(Hash61.hash("a") == 861505634024003819L)
    assert(Hash61.hash("spark") == 1635417048349624661L)
    assert(Hash61.hash("Spark") == 1666687158205116981L)
    assert(Hash61.hash("0:17") == 1300275674198398456L)
  }

  test("mulmod agrees with BigInt arithmetic") {
    val rnd = new scala.util.Random(3)
    val M = BigInt(Hash61.M)
    for (_ <- 1 to 500) {
      val x = math.abs(rnd.nextLong()) % Hash61.M
      val y = math.abs(rnd.nextLong()) % Hash61.M
      assert(BigInt(Hash61.mulmod(x, y)) == (BigInt(x) * BigInt(y)) % M)
    }
  }

  test("native expression equals the Scala function") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    val words = Seq("alpha", "beta gamma", "", "C++", "ünïcode")
    val got = words.toDF("w")
      .select(graft.functions.GraftFunctions.hash61(col("w"))).as[Long].collect()
    assert(got.toSeq == words.map(Hash61.hash))
  }
}

class SpanMetricsSpec extends AnyFunSuite {
  import SpanMetrics.getEntities

  test("seqeval doc example: B-PER I-PER O B-LOC") {
    assert(getEntities(Seq("B-PER", "I-PER", "O", "B-LOC")) ==
      Seq(("PER", 0, 1), ("LOC", 3, 3)))
  }

  test("IOBES: S and E tags open/close chunks") {
    // S-X is a single-token chunk; B-X I-X E-X a three-token one
    assert(getEntities(Seq("S-X", "B-Y", "I-Y", "E-Y", "O")) ==
      Seq(("X", 0, 0), ("Y", 1, 3)))
  }

  test("type change mid-span splits the chunk") {
    assert(getEntities(Seq("B-A", "I-B", "I-B")) == Seq(("A", 0, 0), ("B", 1, 2)))
  }

  test("orphan I- opens a chunk (seqeval O→I start rule)") {
    assert(getEntities(Seq("O", "I-A", "I-A", "O")) == Seq(("A", 1, 2)))
  }

  test("bare tags get type '_'") {
    assert(getEntities(Seq("B", "I", "O")) == Seq(("_", 0, 1)))
  }

  test("per-class set metrics over a distributed span table") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    val pred = Seq((1L, "A", 0, 2), (1L, "A", 5, 6), (1L, "B", 9, 9), (2L, "A", 0, 0))
      .toDF("doc_id", "label", "beg", "end")
    val gold = Seq((1L, "A", 0, 2), (1L, "B", 9, 9), (2L, "B", 0, 0))
      .toDF("doc_id", "label", "beg", "end")
    val m = SpanMetrics.prfByClass(pred, gold, Seq("doc_id", "beg", "end"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(m("A") == ((1L, 2L, 0L))) // tp=1 ([0,2]@1), fp=2 ([5,6]@1, [0,0]@2), fn=0
    assert(m("B") == ((1L, 0L, 1L))) // tp=1 ([9,9]@1), fn=1 ([0,0]@2)
    val (p, r, f) = SpanMetrics.prfMicro(pred, gold, Seq("doc_id", "beg", "end"))
    assert(math.abs(p - 0.5) < 1e-9 && math.abs(r - 2.0 / 3) < 1e-9)
    assert(f > 0.5 && f < 0.6)
  }

  test("prfMicro: both sides empty → (0,0,0), not NPE (zero_division contract)") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    val empty = Seq.empty[(Long, String, Int, Int)].toDF("doc_id", "label", "beg", "end")
    assert(SpanMetrics.prfMicro(empty, empty, Seq("doc_id", "beg", "end")) == ((0.0, 0.0, 0.0)))
  }
}

class BratSpec extends AnyFunSuite {
  test("reference example lines parse exactly (10.1371_journal.pone.0147923.ann)") {
    val doc = Brat.parseDoc("d",
      "T1\tApplication_Usage 185 190\tStata\n" +
        "T2\tVersion 191 195\t13.1\n" +
        "R1\tVersion_of Arg1:T2 Arg2:T1\t\n" +
        "T3\tCitation 205 209\t[30]\n" +
        "R2\tCitation_of Arg1:T3 Arg2:T1\t\n" +
        "#1\tAnnotatorNotes T1\tcomment is skipped\n")
    assert(doc.entities == Seq(
      Brat.AnnEntity("T1", "Application_Usage", 185, 190, "Stata"),
      Brat.AnnEntity("T2", "Version", 191, 195, "13.1"),
      Brat.AnnEntity("T3", "Citation", 205, 209, "[30]")))
    assert(doc.relations == Seq(
      Brat.AnnRelation("R1", "Version_of", "T2", "T1"),
      Brat.AnnRelation("R2", "Citation_of", "T3", "T1")))
  }

  test("discontinuous span normalizes to its envelope") {
    val Some(Left(e)) = Brat.parseLine("T9\tURL 10 14;20 25\texample")
    assert(e.beg == 10 && e.end == 25)
  }

  test("U2: txt∩ann intersection keeps only docs with both sides") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    val ann = Brat.parse(Seq(("a", "T1\tVersion 0 1\tx"), ("b", "")).toDS())
    val txt = Seq(("b", "some text"), ("c", "other")).toDF("doc_id", "text")
    val joined = Brat.withText(ann, txt).select("doc_id").as[String].collect()
    assert(joined.toSeq == Seq("b"))
  }

  test(".ann.unique round-trip: canonical ids appended, reference line format, re-parse identical") {
    // format per bin/map_unique_names_to_files:90-97
    val doc = Brat.parseDoc("d",
      "T1\tApplication_Usage 185 190\tStata\n" +
        "T2\tVersion 191 195\t13.1\n" +
        "R1\tVersion_of Arg1:T2 Arg2:T1\t\n")
    val out = Brat.formatUnique(doc, Map("T1" -> "Software_42"))
    assert(out ==
      "T1\tApplication_Usage 185 190\tStata\tSoftware_42\n" +
        "T2\tVersion 191 195\t13.1\n" +
        "R1\tVersion_of Arg1:T2 Arg2:T1\t\n")
    // re-parse: entities + relations + unique ids survive byte-exactly
    val back = out.linesIterator.flatMap(Brat.parseUniqueLine).toSeq
    assert(back.collect { case Left((e, _)) => e } == doc.entities)
    assert(back.collect { case Right(r) => r } == doc.relations)
    assert(back.collect { case Left((e, Some(u))) => e.id -> u }.toMap == Map("T1" -> "Software_42"))
  }

  test(".ann.unique distributed sink: J9 canonical map re-emits onto a BRAT corpus by surface") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    val ann = Brat.parse(Seq(
      ("p1", "T1\tApplication_Usage 0 5\tStata\nT2\tVersion 6 10\t13.1\nR1\tVersion_of Arg1:T2 Arg2:T1\t"),
      ("p2", "T1\tApplication_Mention 0 5\tSTATA\nT2\tSoftwareCoreference_Deposition 6 8\tit"),
      ("p3", "T1\tVersion 0 3\t2.1")).toDS())
    // canonicalMap-shaped input: both case variants share one cluster id
    val canon = Seq(("Stata", 7L), ("STATA", 7L)).toDF("mention", "canonical")
    val files = Brat.uniqueFiles(ann, canon).collect().toMap
    assert(files("p1") ==
      "T1\tApplication_Usage 0 5\tStata\t7\n" +
        "T2\tVersion 6 10\t13.1\n" +
        "R1\tVersion_of Arg1:T2 Arg2:T1\t\n")
    // main-type entity gets the SAME cluster id; the Coreference label and
    // the attribute (no '_' in label) are never unique-mapped
    assert(files("p2") ==
      "T1\tApplication_Mention 0 5\tSTATA\t7\n" +
        "T2\tSoftwareCoreference_Deposition 6 8\tit\n")
    // a document with NO unique-mapped entities still re-emits (left join)
    assert(files("p3") == "T1\tVersion 0 3\t2.1\n")
  }
}

class TagRemapSpec extends AnyFunSuite {
  import TagRemap._

  test("prefix-preserving remap (data_handler.py:85-97)") {
    assert(remapTag("B-Application_Usage", Software) == "B-Application")
    assert(remapTag("I-PlugIn_Mention", Software) == "I-Application")
    assert(remapTag("B-Version", Software) == "O") // remap-to-O drops the prefix
    assert(remapTag("O", Software) == "O")
    assert(remapTag("I-OperatingSystem_Usage", SoftType) == "I-OperatingSystem")
    assert(remapTag("B-Application_Deposition", MentionType) == "B-Deposition")
    assert(remapTag("B-License", AddInfo) == "B-License")
    assertThrows[NoSuchElementException](remapTag("B-NotAType", Software))
  }

  test("all ten reference transform tables ship and agree on the key sets") {
    assert(ByName.size == 10)
    // every tag table covers the same 23 keys: O + 13 combined labels
    // (12 soft×mention + SoftwareCoreference_Deposition) + 9 attributes
    val tagTables = Seq(Software, SoftType, MentionType, AddInfo, SoftAddInfo,
      SoftRelations, SoftMentionType, KeepAll)
    for (t <- tagTables) assert(t.keySet == Software.keySet)
    assert(Software.keySet.size == 23)
    // spot-check verbatim values from the JSON files
    assert(SoftType("SoftwareCoreference_Deposition") == "SoftwareCoreference")
    assert(MentionType("SoftwareCoreference_Deposition") == "Deposition")
    assert(SoftAddInfo("OperatingSystem_Mention") == "Application")
    assert(Relations == RelationNames.map(r => r -> r).toMap)
  }

  test("column remap equals scalar remap on BIO arrays") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    val tags = Seq(Seq("O", "B-Application_Usage", "I-Application_Usage", "B-Version", "O"))
    val got = tags.toDF("tags")
      .select(remapColumn(col("tags"), Software).as("r")).as[Seq[String]].collect().head
    assert(got == remapSeq(tags.head, Software))
    assert(got == Seq("O", "B-Application", "I-Application", "O", "O"))
  }

  test("column remap splits at the FIRST dash like _adjust_tag (dashed type names)") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    // a type name that itself contains a dash: substring_index(…, -1) would
    // look up "Bar" instead of "Foo-Bar" and emit <<UNMAPPED>> (ADVICE r02)
    val m = Map("Foo-Bar" -> "Baz-Qux", "O" -> "O")
    assert(remapTag("B-Foo-Bar", m) == "B-Baz-Qux")
    val got = Seq(Seq("B-Foo-Bar", "I-Foo-Bar", "O")).toDF("tags")
      .select(remapColumn(col("tags"), m).as("r")).as[Seq[String]].collect().head
    assert(got == Seq("B-Baz-Qux", "I-Baz-Qux", "O"))
    assert(got == remapSeq(Seq("B-Foo-Bar", "I-Foo-Bar", "O"), m))
  }
}

class WordShapeSpec extends AnyFunSuite {
  import WordShape._

  test("word_rules.py semantics pinned") {
    assert(upperCased("SPSS") && !upperCased("Spss") && !upperCased("SPSS2"))
    assert(firstCharUpper("Excel") && !firstCharUpper("SPSS") && !firstCharUpper("FreeSurfer"))
    assert(mixedCase("FreeSurfer") && mixedCase("scikitLearn"))
    assert(!mixedCase("Excel") && !mixedCase("SPSS") && !mixedCase("excel"))
    assert(lowerCase("excel") && !lowerCase("Excel") && !lowerCase("excel2"))
  }

  test("sentence_rep punct / math-symbol classes (F14)") {
    assert(isPunct("(") && isPunct(",") && !isPunct("ab") && !isPunct("a"))
    assert(isMathSymbol("+") && isMathSymbol("=") && isMathSymbol("±"))
    assert(!isMathSymbol("-") && !isMathSymbol("(")) // '-' is Pd, '(' is Ps
  }

  test("detector: out-of-gazetteer CamelCase tool via shape + trigger (F12)") {
    val d = Dicts.fixture
    // 'be perform use <>' trigger + distinctive shape, not in any dict
    val hit = MentionDetector.detect("The analyses were performed using CamelTool .", d)
    assert(hit.exists(s => s.typ.contains("_") && s.surface == "CamelTool"))
    // same shape without trigger context → NOT a mention
    val noTrigger = MentionDetector.detect("We looked at CamelTool yesterday .", d)
    assert(!noTrigger.exists(_.typ.contains("_")))
    // same trigger with a lowercase unknown token → NOT a mention (no shape)
    val noShape = MentionDetector.detect("The analyses were performed using cameltool .", d)
    assert(!noShape.exists(_.typ.contains("_")))
  }
}

class GoldLinkingSpec extends AnyFunSuite {
  test("J6: gold joins by (conv_id, tokenizer-equal mention), not sample ids") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    val mentions = Seq(
      Mention("c1", 1, "T1", "Application_Usage", 0, 5, "Stata"),
      Mention("c2", 1, "T1", "Application_Usage", 0, 5, "STATA"),
      Mention("c2", 2, "T1", "PlugIn_Usage", 0, 14, "EEGLAB toolbox")).toDS()
    // gold mention text has raw spacing — the tokenizer normalizes both sides
    val gold = Seq(("c1", "Stata", 7L), ("c2", "STATA", 7L), ("c2", "EEGLAB   toolbox", 8L))
      .toDF("conv_id", "mention", "gold_id")
    val ids = graft.ed.EdEval.goldIds(mentions, gold).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    def sid(s: String) = {
      import org.apache.spark.sql.functions.{lit, xxhash64}
      Seq(1).toDF("x").select(xxhash64(lit(s))).as[Long].collect().head
    }
    assert(ids == Set((sid("Stata"), 7L), (sid("STATA"), 7L), (sid("EEGLAB toolbox"), 8L)))
  }
}

class FormatRoundTripSpec extends AnyFunSuite {
  test("S5: relation-file line round-trips (data_handler.py:277-301)") {
    val recs = Seq(
      RelationFile.RelRecord("Version_of", "13.1", 40, 1, "Stata", 34, 0),
      RelationFile.RelRecord("Citation_of", "[30]", 54, 2, "Stata", 34, 0))
    val line = RelationFile.formatLine(recs)
    assert(line == "Version_of\t13.1\t40\t1\tStata\t34\t0;;Citation_of\t[30]\t54\t2\tStata\t34\t0;;")
    assert(RelationFile.parseLine(line) == recs)
    assert(RelationFile.parseLine("").isEmpty)
    assert(RelationFile.parseLine("   ").isEmpty)
  }

  test("S5: distributed emit groups per turn deterministically") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    val rels = Seq(
      Relation("c1", 1, "Version_of", 40, "13.1", "Version", 34, "Stata", "Application_Usage"),
      Relation("c1", 1, "Citation_of", 54, "[30]", "Citation", 34, "Stata", "Application_Usage")).toDS()
    val lines = RelationFile.linesFromRelations(rels).collect()
    assert(lines.length == 1)
    val parsed = RelationFile.parseLine(lines.head._3)
    assert(parsed.map(_.typ).toSet == Set("Version_of", "Citation_of"))
    // entity index is positional by begin offset (O4): Stata(34)→0, 13.1(40)→1, [30](54)→2
    assert(parsed.find(_.typ == "Version_of").get.ent2_n == 0)
  }

  test("S5: full file contract — one line per TURN, indices over ALL entities") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    val ts = java.sql.Timestamp.valueOf("2025-01-01 00:00:00")
    val turns = Seq(
      Turn("c1", 0, "user", "no relations here", null, ts),
      Turn("c1", 1, "user", "x", null, ts)).toDS()
    // turn 1 has THREE entities (one relation-less at beg 10): the
    // reference indexes over the full sentence entity list, so Stata(34)→1
    // and 13.1(40)→2 — indexing only relation participants would give 0/1
    val mentions = Seq(
      Mention("c1", 1, "T1", "Application_Usage", 10, 15, "SPSS"),
      Mention("c1", 1, "T2", "Application_Usage", 34, 39, "Stata"),
      Mention("c1", 1, "T3", "Version", 40, 44, "13.1")).toDS()
    val rels = Seq(
      Relation("c1", 1, "Version_of", 40, "13.1", "Version", 34, "Stata", "Application_Usage")).toDS()
    val byTurn = RelationFile.lines(turns, rels, mentions).collect()
      .map(l => (l._1, l._2) -> l._3).toMap
    assert(byTurn.size == 2)
    assert(byTurn(("c1", 0)) == "", "relation-less turn must emit an EMPTY line (positional file)")
    val parsed = RelationFile.parseLine(byTurn(("c1", 1)))
    assert(parsed.head.ent1_n == 2 && parsed.head.ent2_n == 1,
      s"indices must count the relation-less entity at beg 10: $parsed")
  }

  test("S7: linking JSON round-trips and re-keys like Linking.samples") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("linkjson").toString
    val recs = Seq(
      LinkingJson.LinkingRecord("Stata", 1, "p1", 34, 39, "T1", "Application_Usage",
        Seq(RelInfo("Version_of", "13.1"))),
      LinkingJson.LinkingRecord("Stata", 0, "p0", 2, 7, "T1", "Application_Usage", Nil),
      LinkingJson.LinkingRecord("C + +", 2, "p2", 0, 5, "T2", "Application_Mention", Nil)).toDS()
    LinkingJson.write(recs, s"$dir/out")
    val back = LinkingJson.read(spark, s"$dir/out").collect().toSet
    assert(back == recs.collect().toSet)
    val samples = LinkingJson.toSamples(LinkingJson.read(spark, s"$dir/out")).collect()
    assert(samples.length == 2) // dedup by mention
    val stata = samples.find(_.mention == "Stata").get
    assert(stata.conv_id == "p0" && stata.turn_idx == 0) // first occurrence wins
    // relations AGGREGATE across the top-5 contexts like Linking.samples'
    // flatten(contexts.rels) — the Version_of here is annotated only in the
    // SECOND occurrence and was silently dropped before (round-5 review)
    assert(stata.relations == Seq(RelInfo("Version_of", "13.1")),
      s"relations from later contexts must be kept: ${stata.relations}")
    val cpp = samples.find(_.mention == "C + +").get
    assert(cpp.string == "C++" && cpp.norm == "c") // remove_spaces / normalize recomputed
  }

  test("S6: truncated/offset-less T-lines are skipped, not fatal") {
    val spark = SparkTestSession.spark
    // 'T1<TAB>Application<TAB>Stata' has a type but NO offsets; a bad-offset
    // line is equally malformed — both must parse to nothing instead of
    // killing the distributed parse with empty.min / NumberFormatException
    val lines = Seq(
      "T1\tApplication\tStata",
      "T2\tApplication 3 x\tR",
      "T3\tApplication 12 17\tSPSS")
    val parsed = Brat.parseDoc("d1", lines.mkString("\n"))
    assert(parsed.entities.map(_.id) == Seq("T3"),
      s"only the well-formed entity must survive: ${parsed.entities}")
  }
}

class TokenClassSpec extends AnyFunSuite {
  import TokenClass._
  // the original anchored regexes (sentence_rep.py:13-21) as ground truth
  private val Url = ("^(https?\\://[a-zA-Z0-9\\-\\.]+[\\w/\\._\\-\\:~\\?=#%]*[\\w/_\\-\\:~\\?=#%]" +
    "|ftp\\://[a-zA-Z0-9\\-\\.]+[\\w/\\._\\-\\:~\\?=#%]*[\\w/_\\-\\:~\\?=#%]" +
    "|www\\.[a-zA-Z0-9\\-\\.]+[\\w/\\._\\-\\:~\\?=#%]*" +
    "|[a-zA-Z0-9\\-\\.]+\\.(org|edu)/[\\w/_\\-\\:~\\?=#%]*)$").r
  private val cases = Map[String, (String => Boolean, scala.util.matching.Regex)](
    "digits" -> ((digits _, "^\\d+$".r)),
    "floatNum" -> ((floatNum _, "^\\d+\\.\\d*$".r)),
    "versionLikeNum" -> ((versionLikeNum _, "^(\\d+\\.){2}\\w*$".r)),
    "longVersion" -> ((longVersion _, "^(\\d+\\.){3,8}\\w*$".r)),
    "vPrefixed" -> ((vPrefixed _, "^[vV]\\d+(\\.\\d+)*$".r)),
    "citation" -> ((citation _, "^\\[[0-9\\-,\\?]+\\]$".r)),
    "citationNum" -> ((citationNum _, "^[0-9\\-,\\?]+$".r)),
    "url" -> ((url _, Url)))

  test("char-scan classes ≡ the reference regexes on generated tokens") {
    val alphabet = "0123456789.vVwx_-,?[]():/aborg.edu"
    val rnd = new scala.util.Random(13)
    val samples = Seq("", ".", "1", "13.1", "3.8.2", "1.2.3.4.5", "v2", "V1.0", "v.", "1.",
      "1..2", "[30]", "[3-5,?]", "[]", "[x]", "www.example.org/code", "http://a.b/c",
      "ftp://x.y", "a.org/", "a.edu/z", "software", "10.1371/journal", "1.2.x3", "12.",
      "v1.2.3", "-", "?", "1,2") ++
      (1 to 3000).map(_ => (0 until rnd.nextInt(12)).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString)
    for ((name, (fn, re)) <- cases; s <- samples) {
      assert(fn(s) == re.findFirstIn(s).isDefined, s"$name('$s')")
    }
  }
}

class HacSpec extends AnyFunSuite {
  import graft.ed.Hac

  private def mkDist(m: Map[(Int, Int), Double])(i: Int, j: Int): Double =
    m.getOrElse((i, j), m((j, i)))

  test("G3: linkage criterion changes the merge decision (clustering.py:115-251)") {
    val ids = IndexedSeq(10L, 20L, 30L)
    val d = mkDist(Map((0, 1) -> 0.1, (1, 2) -> 0.12, (0, 2) -> 0.5)) _
    // single: {10,20} then chain through 0.12 → one cluster
    assert(Hac.cluster(ids, d, "single", 0.2).values.toSet == Set(10L))
    // complete: {10,20} vs {30} = max(0.12, 0.5) = 0.5 > 0.2 → stays apart
    assert(Hac.cluster(ids, d, "complete", 0.2) == Map(10L -> 10L, 20L -> 10L, 30L -> 30L))
    // average: (0.12+0.5)/2 = 0.31 — above 0.2, below 0.35
    assert(Hac.cluster(ids, d, "average", 0.2).values.toSet.size == 2)
    assert(Hac.cluster(ids, d, "average", 0.35).values.toSet == Set(10L))
  }

  test("G3: tied minimum pairs merge transitively in one round (_match_clusters)") {
    val ids = IndexedSeq(1L, 2L, 3L)
    val d = mkDist(Map((0, 1) -> 0.1, (1, 2) -> 0.1, (0, 2) -> 0.1)) _
    assert(Hac.cluster(ids, d, "complete", 0.2).values.toSet == Set(1L))
  }

  test("G3: single-linkage HAC at threshold == union-find over thresholded edges") {
    val rnd = new scala.util.Random(5)
    for (_ <- 1 to 5) {
      val n = 12
      val ids = IndexedSeq.tabulate(n)(i => (i + 1).toLong)
      val dm = (for (i <- 0 until n; j <- i + 1 until n) yield (i, j) -> rnd.nextDouble()).toMap
      val thr = 0.25
      val hac = Hac.cluster(ids, mkDist(dm), "single", thr)
      // naive union-find over edges ≤ thr
      val parent = Array.tabulate(n)(identity)
      def find(x: Int): Int = if (parent(x) == x) x else { parent(x) = find(parent(x)); parent(x) }
      for (((i, j), v) <- dm if v <= thr) parent(find(i)) = find(j)
      val expect = (0 until n).map(i => ids(i) -> ids((0 until n).filter(find(_) == find(i)).min)).toMap
      assert(hac == expect)
    }
  }

  test("G3: distributed per-block HAC groups case variants, bounds blocks") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    def sample(id: Long, mention: String) =
      LinkingSample(id, "c", 0, 0, mention, Normalize.removeSpaces(mention),
        Normalize.normalize(mention), "Application_Usage", Nil)
    val samples = Seq(sample(1, "Stata"), sample(2, "STATA"), sample(3, "SPSS")).toDS()
    val bc = Dicts.broadcast(spark, Dicts.fixture)
    val got = graft.ed.Hac.clusters(samples, bc, threshold = 0.13, linkage = "complete")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(1L) == got(2L)) // same norm block, distance 0
    assert(got(3L) != got(1L))
  }

  test("G3b interval clustering: per-interval BATCHED transitive merge (clustering.py:252-449)") {
    val ids = IndexedSeq(1L, 2L, 3L)
    val d = mkDist(Map((0, 1) -> 0.3, (1, 2) -> 0.4, (0, 2) -> 0.9)) _
    // one interval at the threshold (linspace(0, 0.5, 2)[1:] = [0.5]): the
    // pair list {1-2 (0.3), 2-3 (0.4)} merges TRANSITIVELY into {1,2,3}
    // even though the complete distance 1-3 is 0.9 — the reference's
    // _match_clusters batch semantics, NOT exact HAC
    assert(graft.ed.Hac.intervalCluster(ids, d, "complete", 0.5, nIntervals = 2)
      .values.toSet == Set(1L))
    // exact complete-linkage HAC on the same input stops at {1,2},{3}
    assert(graft.ed.Hac.cluster(ids, d, "complete", 0.5) ==
      Map(1L -> 1L, 2L -> 1L, 3L -> 3L))
    // finer intervals restore the staged schedule: at 0.25 nothing merges,
    // at 0.5 the same batch applies — result identical to 2 intervals here
    assert(graft.ed.Hac.intervalCluster(ids, d, "complete", 0.5, nIntervals = 3)
      .values.toSet == Set(1L))
  }

  test("G3b interval clustering: single linkage == plain HAC == union-find components") {
    val rnd = new scala.util.Random(11)
    for (trial <- 1 to 5) {
      val n = 10
      val ids = IndexedSeq.tabulate(n)(i => (i + 1).toLong)
      val dm = (for (i <- 0 until n; j <- i + 1 until n) yield (i, j) -> rnd.nextDouble()).toMap
      val thr = 0.3
      val hac = graft.ed.Hac.cluster(ids, mkDist(dm), "single", thr)
      val ic = graft.ed.Hac.intervalCluster(ids, mkDist(dm), "single", thr, nIntervals = 7)
      assert(ic == hac, s"trial $trial")
    }
  }

  test("G3b interval clustering: distributed per-block form (nIntervals hook)") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    def sample(id: Long, mention: String) =
      LinkingSample(id, "c", 0, 0, mention, Normalize.removeSpaces(mention),
        Normalize.normalize(mention), "Application_Usage", Nil)
    val samples = Seq(sample(1, "Stata"), sample(2, "STATA"), sample(3, "SPSS")).toDS()
    val bc = Dicts.broadcast(spark, Dicts.fixture)
    val got = graft.ed.Hac.clusters(samples, bc, threshold = 0.13, linkage = "average",
      nIntervals = Some(10)).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(1L) == got(2L) && got(3L) != got(1L))
  }
}

class PairFeaturesSpec extends AnyFunSuite {
  import graft.re.PairFeatures
  private val d = Dicts.fixture
  private def turn(text: String) =
    Turn("c", 0, "user", text, null, java.sql.Timestamp.valueOf("2025-01-01 00:00:00"))

  test("F18: acronym flags on a multi-token mention (features.py:190-230)") {
    val text = "We used the Statistical Package for the Social Sciences ( SPSS ) here ."
    val spans = MentionDetector.detect(text, d)
    val rows = PairFeatures.forTurn(turn(text), spans, Nil)
    val long = "Statistical Package for the Social Sciences"
    val r = rows.find(x => x.ent0_surface == long && x.ent1_surface == "SPSS").get
    // acronym(long form) = "spss" (stopwords dropped) ⊆ "SPSS" casefolded
    assert(r.acronym_entity_0_substring_of_entity_1)
    assert(!r.entity_0_substring_of_entity_1) // the long form is not inside "SPSS"
    assert(r.entity_0_token_length == 6 && r.entity_1_token_length == 1)
    assert(r.entity_order) // SPSS begins after the long form
    assert(r.entity_0_type == "Application" && r.entity_1_type == "Abbreviation")
    assert(r.mention_1_type == "None")
    // distance features: chars and tokens between span ends ("( " before SPSS)
    assert(r.entity_distance_abs == text.indexOf("SPSS") - (text.indexOf(long) + long.length))
    assert(r.entity_distance_tok == 1) // the "(" token
  }

  test("J3: gold label attaches on (subj_beg, obj_beg); others default to none") {
    val text = "All analyses were performed using Stata 13.1 software [ 30 ] ."
    val spans = MentionDetector.detect(text, d)
    val gold = graft.re.RelationExtractor.classify(text, spans).map { case (s, p, m) =>
      Relation("c", 0, p, s.beg, s.surface, s.typ, m.beg, m.surface, m.typ)
    }
    val rows = PairFeatures.forTurn(turn(text), spans, gold)
    assert(rows.exists(r => r.ent0_surface == "13.1" && r.ent1_surface == "Stata" && r.label == "Version_of"))
    assert(rows.exists(r => r.ent0_surface == "[ 30 ]" && r.ent1_surface == "Stata" && r.label == "Citation_of"))
    // reversed order is a different candidate → none
    assert(rows.find(r => r.ent0_surface == "Stata" && r.ent1_surface == "13.1").get.label == "none")
    assert(rows.forall(_.num_main_entities == 1))
  }

  test("F17: one-hot expansion raises on unknown type") {
    assert(PairFeatures.oneHot(PairFeatures.EntityTypes, "Version").sum == 1)
    // Specification is a supported attribute label (AttrPredicate /
    // RelationNames) — it must be one-hot encodable too (round-5 review)
    assert(PairFeatures.oneHot(PairFeatures.EntityTypes, "Specification").sum == 1)
    assertThrows[IllegalArgumentException](PairFeatures.oneHot(PairFeatures.EntityTypes, "Nope"))
  }
}

class IncrementalCcSpec extends AnyFunSuite {
  test("incremental CC over label-edges == full CC over the edge union") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    val rnd = new scala.util.Random(17)
    for (trial <- 1 to 3) {
      val n = 30
      val all = (1 to 40).map { _ =>
        val a = rnd.nextInt(n).toLong; val b = rnd.nextInt(n).toLong
        Edge(math.min(a, b), math.max(a, b), 0.0)
      }.filter(e => e.src != e.dst).distinct
      val (half1, half2) = all.splitAt(all.length / 2)
      val vertices = spark.createDataset((0 until n).map(i => java.lang.Long.valueOf(i.toLong)))
      def groups(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => (r.getLong(0), r.getLong(1))).groupBy(_._2).values
        .map(_.map(_._1).toSet).toSet
      val prev = graft.ed.ConnectedComponents.run(vertices, spark.createDataset(half1))
      val inc = graft.ed.ConnectedComponents.incremental(prev, vertices, spark.createDataset(half2))
      val full = graft.ed.ConnectedComponents.run(vertices, spark.createDataset(all))
      assert(groups(inc) == groups(full), s"trial $trial")
    }
  }

  test("null / empty turn text yields empty detection, not a crash (P1)") {
    val d = Dicts.fixture
    assert(MentionDetector.detect(null, d).isEmpty)
    assert(MentionDetector.detect("", d).isEmpty)
    assert(MentionDetector.detect("   ", d).isEmpty)
    assert(graft.ner.TokenFeatures.forTurn("c", 0, null, d).isEmpty)
  }
}

class IncrementalKgSpec extends AnyFunSuite {
  test("foreachBatch KG: cross-batch entity linking matches the batch pipeline") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    val d = Dicts.fixture
    val dir = java.nio.file.Files.createTempDirectory("inckg").toString
    val fixture = graft.pipeline.Transcripts.fixture(spark).collect()
    // c1 arrives in micro-batch 0, c2 (with the STATA case variant) in batch 1
    graft.streaming.StreamingPipeline.processBatch(
      fixture.filter(_.conv_id == "c1").toSeq.toDS(), d, dir, s"$dir/out", 0L)
    graft.streaming.StreamingPipeline.processBatch(
      fixture.filter(_.conv_id == "c2").toSeq.toDS(), d, dir, s"$dir/out", 1L)

    // triple parity with the batch pipeline over the full fixture
    def streamedTriples() = spark.read.parquet(s"$dir/out")
      .select($"conv_id", $"turn_idx", $"subj", $"pred", $"obj")
      .as[(String, Int, String, String, String)].collect()
    val streamed = streamedTriples().toSet
    val batchRun = graft.pipeline.Pipeline
      .run(spark, graft.pipeline.Transcripts.fixture(spark), d).triples
      .collect().map(t => (t.conv_id, t.turn_idx, t.subj, t.pred, t.obj)).toSet
    assert(streamed == batchRun)

    // cross-batch ED: Stata (batch 0) and STATA (batch 1) share a component
    // in the accumulated state (maintained by INCREMENTAL CC — batch 1
    // never saw batch 0's edges, only its component labels)
    val samples = graft.io.TableIO.readTable(spark, s"$dir/state", "samples").as[LinkingSample]
    val comps = graft.io.TableIO.readTable(spark, s"$dir/state", "components")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val byMention = samples.collect().map(s => s.mention -> s.sample_id).toMap
    assert(comps(byMention("Stata")) == comps(byMention("STATA")))
    assert(comps(byMention("SPSS")) == comps(byMention("Statistical Package for the Social Sciences")))
    assert(comps(byMention("MATLAB")) != comps(byMention("Python")))
    // two committed snapshots: one per batch, ONE pointer per batch (samples,
    // components and the batch watermark move in a single atomic commit)
    assert(graft.io.TableIO.currentSnapshot(s"$dir/state") == 1L)
    assert(graft.io.TableIO.marker(s"$dir/state", "batch_id").contains("1"))

    // crash-replay idempotency: a restarted stream re-delivers batch 1 — the
    // committed watermark skips it, so triples and state are unchanged
    val beforeReplay = streamedTriples().toList.sorted
    graft.streaming.StreamingPipeline.processBatch(
      fixture.filter(_.conv_id == "c2").toSeq.toDS(), d, dir, s"$dir/out", 1L)
    assert(streamedTriples().toList.sorted == beforeReplay, "replayed batch must not duplicate triples")
    assert(graft.io.TableIO.currentSnapshot(s"$dir/state") == 1L)

    // crash BETWEEN the triples write and the state commit: batch 2's
    // partition exists but the watermark never advanced — the replay
    // overwrites the same batch_id=2 directory and then commits, yielding
    // exactly-once output
    val batch2 = fixture.filter(_.conv_id == "c1").toSeq.toDS()
    val bc = Dicts.broadcast(spark, d)
    graft.re.RelationExtractor.relations(batch2, bc).toDF()
      .withColumn("subj_canon", $"subj_surface").withColumn("obj_canon", $"obj_surface")
      .select($"subj_surface".as("subj"), $"pred", $"obj_surface".as("obj"),
        $"conv_id", $"turn_idx", $"subj_canon", $"obj_canon")
      .write.mode("overwrite").parquet(s"$dir/out/batch_id=2") // simulated partial write
    graft.streaming.StreamingPipeline.processBatch(batch2, d, dir, s"$dir/out", 2L)
    assert(graft.io.TableIO.marker(s"$dir/state", "batch_id").contains("2"))
    val expectedB2 = graft.re.RelationExtractor.relations(batch2, bc).count()
    assert(spark.read.parquet(s"$dir/out/batch_id=2").count() == expectedB2,
      "batch-2 replay must overwrite its partition, not append to the partial write")

    // a batch id BELOW the committed watermark (watermark is 2; id 0 would
    // only recur if the streaming checkpoint was lost and numbering reset)
    // must fail loudly, not silently skip new data under a recycled id
    assertThrows[IllegalArgumentException](
      graft.streaming.StreamingPipeline.processBatch(batch2, d, dir, s"$dir/out", 0L))
  }
}

class PartitionLineageSpec extends AnyFunSuite {
  test("stage lineage records per-partition rows+hash; total == sum of parts") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("lineage").toString
    val ck = new graft.pipeline.Checkpoints(spark, dir)
    ck.stage("s1", "fp") { (1 to 100).toDF("x").repartition(4) }
    val json = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$dir/s1_lineage.json")))
    assert(json.contains("\"partitions\":["))
    val partRows = """"rows":(\d+)""".r.findAllMatchIn(json).map(_.group(1).toLong).toSeq
    // first rows field is the stage total; the rest are per-partition
    assert(partRows.tail.sum == partRows.head && partRows.head == 100L)
    // resume still validates against the total
    assert(ck.isValid("s1", "fp"))
    assert(!ck.isValid("s1", "other-inputs"))
  }
}

class TableIOSpec extends AnyFunSuite {
  import graft.io.TableIO

  test("snapshot commit, pointer flip, time travel, vacuum") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("tableio").toString + "/triples"
    assert(TableIO.currentSnapshot(base) == -1L)
    val s0 = TableIO.writeSnapshot(Seq((1, "a"), (2, "b")).toDF("k", "v"), base, Seq("k"))
    assert(s0 == 0L)
    val s1 = TableIO.writeSnapshot(Seq((3, "c")).toDF("k", "v"), base, Seq("k"))
    assert(s1 == 1L && TableIO.currentSnapshot(base) == 1L)
    // current read sees only the latest commit; time travel sees the old one
    assert(TableIO.read(spark, base).count() == 1)
    assert(TableIO.readSnapshot(spark, base, 0).count() == 2)
    // partition directories exist (pruning-capable layout)
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(s"$base/snapshot=1/k=3")))
    // a stray non-numeric snapshot=* entry must not wedge retention cleanup
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$base/snapshot=manualbackup"))
    TableIO.vacuum(base)
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(s"$base/snapshot=0")))
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(s"$base/snapshot=manualbackup")))
    assert(TableIO.read(spark, base).count() == 1)
  }
}

class BucketedJoinSpec extends AnyFunSuite {
  test("bucketed tables join with NO shuffle exchange (co-located join)") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", -1) // force SMJ path
    try {
      val a = (1L to 1000L).map(i => (i, s"surface_$i")).toDF("sample_id", "mention")
      val b = (1L to 1000L).filter(_ % 3 == 0).map(i => (i, i * 10)).toDF("sample_id", "score")
      graft.io.TableIO.writeBucketed(a, "graft_bkt_samples", Seq("sample_id"), 4)
      graft.io.TableIO.writeBucketed(b, "graft_bkt_edges", Seq("sample_id"), 4)
      val joined = spark.table("graft_bkt_samples").join(spark.table("graft_bkt_edges"), "sample_id")
      val rows = joined.count()
      assert(rows == b.count())
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed co-located join must not shuffle either side:\n$plan")
      // values identical to the plain join
      val plain = a.join(b, "sample_id").collect().map(_.toString).toSet
      assert(joined.collect().map(_.toString).toSet == plain)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS graft_bkt_samples")
      spark.sql("DROP TABLE IF EXISTS graft_bkt_edges")
    }
  }
}

class DedupSkewSpec extends AnyFunSuite {
  test("capped buckets keep degenerate near-identical corpora sub-quadratic") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // 2000 identical docs: every band bucket is one giant bucket
    val skew = spark.range(2000).select(col("id").as("doc_id"),
      lit("the same boilerplate text repeated in every document of this corpus bucket").as("text"))
    val t0 = System.nanoTime()
    val n = graft.ops.Dedup.minhashDupes(skew, k = 3, numHashes = 16, bands = 16,
      threshold = 0.5, maxBucket = 50).count()
    val sec = (System.nanoTime() - t0) / 1e9
    assert(n == 50L * 49 / 2, "pairs = C(cap, 2) from the capped bucket")
    assert(sec < 60.0, s"degenerate bucket must not go quadratic (took $sec s)")
    // simhash path: identical signatures land in one bucket per slice
    val n2 = graft.ops.Dedup.simhashDupes(skew, maxHamming = 3, maxBucket = 50).count()
    assert(n2 == 50L * 49 / 2)
  }
}

class MergeEdgeSetsSpec extends AnyFunSuite {
  test("U5: direction-normalized union keeps min dist per pair") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    val a = Seq(Edge(1, 2, 0.10), Edge(3, 4, 0.05)).toDS()
    val b = Seq(Edge(2, 1, 0.02), Edge(5, 6, 0.07)).toDS()
    val got = graft.ed.EdEval.mergeEdgeSets(Seq(a, b)).collect().toSet
    assert(got == Set(Edge(1, 2, 0.02), Edge(3, 4, 0.05), Edge(5, 6, 0.07)))
  }
}

class TokenFeaturesSpec extends AnyFunSuite {
  import graft.ner.TokenFeatures
  private def idx(r: String) = TokenFeatures.RuleNames.indexOf(r)

  test("A4: rule hits count once per covered token per matching span") {
    val d = Dicts.fixture
    // tokens: The(0) analyses(1) were(2) performed(3) using(4) Stata(5)
    //         software(6) daily(7) .(8) — n = 9
    val rows = TokenFeatures.forTurn("c", 0,
      "The analyses were performed using Stata software daily .", d)
    val stata = rows.find(_.token == "Stata").get
    // pan_top_1 (use <> software) fires only for the len-1 span [5,6)
    assert(stata.rule_counts(idx("pan_top_1")) == 1)
    // pan_top_2/3/4 (left contexts) fire for EVERY span starting at 5:
    // lengths 1..4 fit in the sentence → count 4 on the covered token
    assert(stata.rule_counts(idx("pan_top_2")) == 4)
    assert(stata.rule_counts(idx("pan_top_4")) == 4)
    assert(stata.dict_counts(0) == 1) // wikidata_software membership, len-1 span
    val software = rows.find(_.token == "software").get
    // covered by the b=5 spans of lengths 2..4 → 3 increments
    assert(software.rule_counts(idx("pan_top_2")) == 3)
    assert(software.headwords.head) // 'software' is Headwords(0)
    assert(rows.forall(r => r.rule_counts.length == 10))
  }

  test("A4: brackets/developer rules respect the char-length-1 gate") {
    val d = Dicts.fixture
    val rows = TokenFeatures.forTurn("c", 0, "Excel ( Microsoft Corp. ) rocks .", d)
    val ms = rows.find(_.token == "Microsoft").get
    assert(ms.rule_counts(idx("text_is_in_brackets")) >= 1)
    assert(ms.rule_counts(idx("developer")) >= 1)
    // a single-char span inside brackets is gated out (len(base_span) != 1)
    val one = TokenFeatures.forTurn("c", 0, "x ( y ) z", d).find(_.token == "y").get
    assert(one.rule_counts(idx("text_is_in_brackets")) == 0)
  }
}

class LocaleDeterminismSpec extends AnyFunSuite {
  test("detection and features are identical under a Turkish default locale (dotless-i hazard)") {
    val d = Dicts.fixture
    val text = "All analyses were performed using Stata ( StataCorp Inc. ) ."
    val prev = java.util.Locale.getDefault
    val tr = java.util.Locale.forLanguageTag("tr-TR")
    try {
      java.util.Locale.setDefault(java.util.Locale.US)
      val spansUs = MentionDetector.detect(text, d)
      val featsUs = graft.ner.TokenFeatures.forTurn("c", 0, text, d)
      java.util.Locale.setDefault(tr)
      // the hazard is real on this JVM: default-locale lowering of I is dotless
      assert("Inc.".toLowerCase != "inc.", "tr locale must produce dotless i")
      assert(graft.core.Lemma.of("Using") == "use")
      assert(MentionDetector.detect(text, d) == spansUs,
        "mention detection must not depend on the JVM default locale")
      assert(graft.ner.TokenFeatures.forTurn("c", 0, text, d) == featsUs,
        "token features (incl. the developer-marker rule) must not depend on the JVM default locale")
    } finally java.util.Locale.setDefault(prev)
  }
}

class LemmaSpec extends AnyFunSuite {
  test("headword plurals lemmatize through real English inflection (es/ies)") {
    import graft.core.Lemma
    assert(Lemma.of("toolboxes") == "toolbox") // round-2 '+s' generated 'toolboxs' and missed this
    assert(Lemma.of("registries") == "registry")
    assert(Lemma.of("databases") == "database")
    assert(Lemma.of("packages") == "package")
    assert(Lemma.of("tools") == "tool")
    assert(Lemma.of("softwares") == "software")
    assert(Lemma.of("Using") == "use") // case-insensitive, locale-stable
  }
}

class PairFeaturesOverlapSpec extends AnyFunSuite {
  test("overlapping/nested gold spans slice to '' like Python, not crash") {
    import graft.core.{Span, Turn}
    val t = Turn("c", 0, "user", "IBM SPSS Statistics rocks", null,
      java.sql.Timestamp.valueOf("2025-01-01 00:00:00"))
    // nested: 'SPSS' inside 'IBM SPSS Statistics' → smaller.end > larger.beg
    val spans = Vector(
      Span("Application_Usage", 0, 19, "IBM SPSS Statistics"),
      Span("Application_Usage", 4, 8, "SPSS"))
    val rows = graft.re.PairFeatures.forTurn(t, spans, Nil)
    assert(rows.nonEmpty)
    assert(rows.forall(_.entity_distance_abs == 0), "overlap distance must be 0 (empty slice)")
  }
}

class RankingSpec extends AnyFunSuite {
  test("two-phase dense ids equal the single-task global window") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val keys = rnd.shuffle((1 to 500).map(_.toLong * 7)).toSeq
    val df = keys.toDF("fs").repartition(13)
    val got = graft.ops.Ranking.denseIds(df, "fs", "vid")
      .select("fs", "vid").as[(Long, Long)].collect().sortBy(_._2)
    assert(got.map(_._1).toSeq == keys.sorted)
    assert(got.map(_._2).toSeq == (1L to 500L))
  }
}
