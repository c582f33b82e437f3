package graft

import graft.core._
import graft.dicts.Dicts
import graft.ed._
import graft.ner.MentionDetector
import graft.pipeline.{Pipeline, Transcripts}
import graft.re.RelationExtractor
import org.scalatest.funsuite.AnyFunSuite

class MentionDetectorSpec extends AnyFunSuite {
  private val d = Dicts.fixture

  test("golden turn: Stata 13.1 software [ 30 ] — mention, version, citation") {
    val text = "All analyses were performed using Stata 13.1 software [ 30 ] ."
    val spans = MentionDetector.detect(text, d)
    val byType = spans.groupBy(_.typ)
    assert(byType("Application_Usage").map(_.surface) == Vector("Stata"))
    assert(byType("Version").map(_.surface) == Vector("13.1"))
    assert(byType("Citation").map(_.surface) == Vector("[ 30 ]"))
    // char offsets point into the original text
    val stata = byType("Application_Usage").head
    assert(text.substring(stata.beg, stata.end) == "Stata")
  }

  test("developer in parens: Excel ( Microsoft Corp. , Redmond )") {
    val text = "Data were entered into Excel ( Microsoft Corp. , Redmond ) for cleaning ."
    val spans = MentionDetector.detect(text, d)
    assert(spans.exists(s => s.typ.startsWith("Application") && s.surface == "Excel"))
    val dev = spans.filter(_.typ == "Developer")
    assert(dev.nonEmpty && dev.head.surface.contains("Microsoft Corp."))
  }

  test("longest gazetteer match wins: IBM SPSS Statistics over SPSS") {
    val spans = MentionDetector.detect("We used IBM SPSS Statistics for this .", d)
    assert(spans.count(_.typ.contains("_")) == 1)
    assert(spans.head.surface == "IBM SPSS Statistics")
  }

  test("soft types from source dictionaries") {
    val spans = MentionDetector.detect("Scripts run on Python under Windows .", d)
    val m = spans.filter(_.typ.contains("_")).map(s => s.surface -> s.typ).toMap
    assert(m("Python").startsWith("ProgrammingEnvironment"))
    assert(m("Windows").startsWith("OperatingSystem"))
  }

  test("usage trigger rules fire without a gazetteer hit") {
    // pan_top_4: 'analysis be perform use <>' — FooBar99 is not in any dict,
    // pan_top_8 right context 'software be use' also matches
    val spans = MentionDetector.detect("The analyses were performed using FooBar99 software and were used daily .", d)
    assert(spans.exists(s => s.typ == "Application_Usage" && s.surface == "FooBar99"))
  }

  test("weak wiktionary hits need contextual support") {
    val none = MentionDetector.detect("The data and the model were large .", d)
    assert(!none.exists(_.typ.contains("_")))
    val some = MentionDetector.detect("The analyses were performed using model .", d)
    assert(some.exists(s => s.typ.contains("_") && s.surface == "model"))
  }

  test("abbreviation: all-caps acronym of a multi-token mention") {
    val spans = MentionDetector.detect(
      "We used the Statistical Package for the Social Sciences ( SPSS ) here .", d)
    assert(spans.exists(s => s.typ.contains("_") &&
      s.surface == "Statistical Package for the Social Sciences"))
    assert(spans.exists(s => s.typ == "Abbreviation" && s.surface == "SPSS"))
  }

  test("URL and license detection") {
    val spans = MentionDetector.detect(
      "numpy is released under BSD at www.example.org/numpy for everyone .", d)
    assert(spans.exists(_.typ == "License"))
    assert(spans.exists(s => s.typ == "URL" && s.surface == "www.example.org/numpy"))
  }
}

class RelationExtractorSpec extends AnyFunSuite {
  private val d = Dicts.fixture

  private def rels(text: String): Vector[(String, String, String)] = {
    val spans = MentionDetector.detect(text, d)
    RelationExtractor.classify(text, spans).map { case (s, p, o) => (s.surface, p, o.surface) }
  }

  test("golden: (13.1, Version_of, Stata) and ([ 30 ], Citation_of, Stata)") {
    val r = rels("All analyses were performed using Stata 13.1 software [ 30 ] .")
    assert(r.contains(("13.1", "Version_of", "Stata")))
    assert(r.contains(("[ 30 ]", "Citation_of", "Stata")))
    assert(r.size == 2)
  }

  test("attribute attaches to NEAREST main mention, ties prefer preceding") {
    val r = rels("We used Stata 13.1 and MATLAB for the study .")
    assert(r.contains(("13.1", "Version_of", "Stata")))
    assert(!r.exists(t => t._1 == "13.1" && t._3 == "MATLAB"))
  }

  test("PlugIn_of via connective: EEGLAB toolbox for MATLAB") {
    val r = rels("The preprocessing ran in MATLAB with the EEGLAB toolbox for MATLAB .")
    assert(r.exists(t => t._1 == "EEGLAB toolbox" && t._2 == "PlugIn_of" && t._3 == "MATLAB"))
  }

  test("single-mention turns emit nothing (P3 gate)") {
    assert(rels("We only used Stata here .").isEmpty)
  }

  test("fused and from-mentions paths agree") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    val turns = Transcripts.fixture(spark)
    val bc = Dicts.broadcast(spark, d)
    val fused = RelationExtractor.relations(turns, bc).collect().toSet
    val mentions = MentionDetector.mentions(turns, bc)
    val viaCkpt = RelationExtractor.fromMentions(turns, mentions).collect().toSet
    assert(fused == viaCkpt)
    assert(fused.nonEmpty)
  }
}

class EdSpec extends AnyFunSuite {
  private val d = Dicts.fixture

  private def sample(id: Long, mention: String, rels: Seq[RelInfo] = Nil) =
    LinkingSample(id, "c", 0, 0, mention,
      Normalize.removeSpaces(mention), Normalize.normalize(mention), "Application_Usage", rels)

  test("23 features: identical strings are all-zero on string distances") {
    val f = PairScorer.features(sample(1, "Stata"), sample(2, "Stata"), d)
    assert(f(2) == 0.0 && f(3) == 0.0 && f(4) == 0.0 && f(5) == 0.0 && f(6) == 0.0)
    assert(f(0) == 5.0 / 60.0)
  }

  test("case variants merge via normalized forms: Stata vs STATA") {
    val dist = PairScorer.distance(sample(1, "Stata"), sample(2, "STATA"), d)
    assert(dist <= PairScorer.Threshold, s"dist=$dist")
  }

  test("known abbreviation merges: SPSS vs Statistical Package for the Social Sciences") {
    val dist = PairScorer.distance(
      sample(1, "SPSS"), sample(2, "Statistical Package for the Social Sciences"), d)
    assert(dist <= PairScorer.Threshold, s"dist=$dist")
  }

  test("distinct tools stay apart: Stata vs SPSS, Excel vs EEGLAB") {
    assert(PairScorer.distance(sample(1, "Stata"), sample(2, "SPSS"), d) > PairScorer.Threshold)
    assert(PairScorer.distance(sample(1, "Excel"), sample(2, "EEGLAB"), d) > PairScorer.Threshold)
  }

  test("given abbreviation evidence links") {
    val a = sample(1, "SK-L", Seq(RelInfo("Abbreviation_of", "scikit-learn")))
    val b = sample(2, "scikit-learn")
    assert(PairScorer.distance(a, b, d) <= PairScorer.Threshold)
  }

  test("blocking keys put abbreviation pairs in a shared block") {
    val a = sample(1, "SPSS")
    val b = sample(2, "Statistical Package for the Social Sciences")
    val ka = Blocking.keysFor(a, d).toSet
    val kb = Blocking.keysFor(b, d).toSet
    assert(ka.intersect(kb).nonEmpty, s"$ka vs $kb")
  }

  test("connected components equal naive union-find on random graphs") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 2) {
      val n = 20
      val edges = (1 to 25).map { _ =>
        val a = rnd.nextInt(n).toLong; val b = rnd.nextInt(n).toLong
        Edge(math.min(a, b), math.max(a, b), 0.0)
      }.filter(e => e.src != e.dst).distinct
      // naive union-find
      val parent = Array.tabulate(n)(identity)
      def find(x: Int): Int = if (parent(x) == x) x else { parent(x) = find(parent(x)); parent(x) }
      edges.foreach(e => parent(find(e.src.toInt)) = find(e.dst.toInt))
      val expected = (0 until n).groupBy(find).values.map(_.toSet).toSet
      val vertices = spark.createDataset((0 until n).map(i => java.lang.Long.valueOf(i.toLong)))
      // exercise BOTH paths: distributed loop (cutoff -1) and driver fast path
      val gotDistributed = ConnectedComponents.run(vertices, spark.createDataset(edges), driverCutoff = -1L)
        .collect().map(r => (r.getLong(0), r.getLong(1)))
        .groupBy(_._2).values.map(_.map(_._1.toInt).toSet).toSet
      val gotDriver = ConnectedComponents.run(vertices, spark.createDataset(edges))
        .collect().map(r => (r.getLong(0), r.getLong(1)))
        .groupBy(_._2).values.map(_.map(_._1.toInt).toSet).toSet
      assert(gotDistributed == expected, s"trial $trial (distributed)")
      assert(gotDriver == expected, s"trial $trial (driver)")
    }
  }
}

class PipelineSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private lazy val result = Pipeline.run(spark, Transcripts.fixture(spark), Dicts.fixture)

  test("end-to-end golden fixture: triples + shared canonical ids") {

    val triples = result.triples.collect()
    def has(subj: String, pred: String, obj: String): Boolean =
      triples.exists(t => t.subj == subj && t.pred == pred && t.obj == obj)

    assert(has("13.1", "Version_of", "Stata"))
    assert(has("[ 30 ]", "Citation_of", "Stata"))
    assert(has("21.0", "Version_of", "SPSS"))
    assert(has("EEGLAB toolbox", "PlugIn_of", "MATLAB"))
    assert(has("version 5", "Version_of", "GraphPad Prism") || has("5", "Version_of", "GraphPad Prism"))

    // canonicalization: Stata (c1) and STATA (c2) share a component
    val canon = triples.filter(t => t.obj == "Stata" || t.obj == "STATA").map(_.obj_canonical).toSet
    val stataTriples = result.samples.collect().filter(s => s.mention == "Stata" || s.mention == "STATA")
    assert(stataTriples.length == 2)
    val comps = result.components.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comps(stataTriples(0).sample_id) == comps(stataTriples(1).sample_id),
      "Stata and STATA must share a canonical id")

    // SPSS and the spelled-out name share a component
    val spss = result.samples.collect()
      .filter(s => s.mention == "SPSS" || s.mention == "Statistical Package for the Social Sciences")
    assert(spss.length == 2)
    assert(comps(spss(0).sample_id) == comps(spss(1).sample_id))

    // distinct tools in distinct components
    val bySurface = result.samples.collect().map(s => s.mention -> comps(s.sample_id)).toMap
    assert(bySurface("MATLAB") != bySurface("Python"))
  }

  test("pair scoring executes exactly once across all downstream consumers") {
    // Pipeline.run has already materialized edges (CC runs inside it);
    // further actions on ANY consumer must not re-run the scorer
    result.triples.count()
    val acc = result.scoredPairs.get
    val afterRun = acc.value.longValue
    assert(afterRun > 0, "scorer never ran?")
    result.components.count()
    result.triples.count()
    result.edges.count()
    assert(acc.value.longValue == afterRun,
      s"pair scoring re-executed: $afterRun -> ${acc.value}")
  }

  test("no sample_id collisions on the fixture vocabulary") {
    assert(graft.ed.Linking.sampleIdCollisions(result.samples) == 0L)
  }

  test("canonical dedup keeps one row per (subj_canonical, pred, obj_canonical)") {
    val deduped = Pipeline.canonicalTriples(result.triples).collect()
    val keys = deduped.map(t => (t.subj_canonical, t.pred, t.obj_canonical))
    assert(keys.distinct.length == keys.length)
  }

  /** The golden annotation of the fixture (FIXTURES.md §3) in the
    * reference's own BRAT standoff format (S6), one doc per annotated turn
    * — loaded through graft.sources.Brat, char offsets self-checked
    * against the turn texts below.
    */
  private val goldAnn: Map[(String, Int), String] = Map(
    ("c1", 1) ->
      """T1	Application_Usage 34 39	Stata
        |T2	Version 40 44	13.1
        |T3	Citation 54 60	[ 30 ]
        |R1	Version_of Arg1:T2 Arg2:T1
        |R2	Citation_of Arg1:T3 Arg2:T1	""".stripMargin,
    ("c1", 2) ->
      """T1	Application_Usage 23 28	Excel
        |T2	Developer 31 56	Microsoft Corp. , Redmond
        |R1	Developer_of Arg1:T2 Arg2:T1	""".stripMargin,
    ("c1", 3) ->
      """T1	Application_Usage 0 4	SPSS
        |T2	Developer 7 16	IBM Corp.
        |T3	Version 27 31	21.0
        |R1	Developer_of Arg1:T2 Arg2:T1
        |R2	Version_of Arg1:T3 Arg2:T1	""".stripMargin,
    ("c2", 0) ->
      """T1	PlugIn_Usage 41 55	EEGLAB toolbox
        |T2	Application_Usage 60 66	MATLAB
        |R1	PlugIn_of Arg1:T1 Arg2:T2	""".stripMargin,
    ("c2", 2) ->
      """T1	Application_Usage 17 60	Statistical Package for the Social Sciences
        |T2	Citation 61 67	[ 12 ]
        |R1	Citation_of Arg1:T2 Arg2:T1	""".stripMargin,
    ("c2", 3) ->
      """T1	Application_Usage 27 41	GraphPad Prism
        |T2	Version 50 51	5
        |R1	Version_of Arg1:T2 Arg2:T1	""".stripMargin,
    ("c2", 4) ->
      """T1	ProgrammingEnvironment_Usage 23 29	Python
        |T2	Version 30 35	3.8.2
        |T3	URL 51 71	www.example.org/code
        |R1	Version_of Arg1:T2 Arg2:T1
        |R2	URL_of Arg1:T3 Arg2:T1	""".stripMargin)

  test("P/R >= 0.95 gate: BRAT gold + span-set seqeval semantics (S6 + A7)") {
    import graft.sources.Brat
    val spark0 = spark
    import spark0.implicits._

    // parse the BRAT literals; self-check offsets against the turn texts
    val texts = Transcripts.fixture(spark).collect().map(t => (t.conv_id, t.turn_idx) -> t.text).toMap
    val goldDocs = goldAnn.map { case ((c, i), ann) => Brat.parseDoc(s"$c#$i", ann) }.toSeq
    for (doc <- goldDocs; e <- doc.entities) {
      val Array(c, i) = doc.doc_id.split("#")
      val text = texts((c, i.toInt))
      assert(text.substring(e.beg, e.end) == e.surface,
        s"gold offset drift in ${doc.doc_id}: ${e.id}")
    }

    // gold triples from the standoff relations (Arg1 = attribute/subject,
    // Arg2 = software/object — the reference's argument order)
    val goldTriples = goldDocs.flatMap { doc =>
      val Array(c, i) = doc.doc_id.split("#")
      val byId = doc.entities.map(e => e.id -> e).toMap
      doc.relations.map(r =>
        (c, i.toInt, byId(r.arg1).surface, r.typ, byId(r.arg2).surface))
    }.toDF("conv_id", "turn_idx", "subj", "pred", "obj")

    val predTriples = result.triples.toDF().select($"conv_id", $"turn_idx", $"subj", $"pred", $"obj")
    val (precision, recall, f1) = graft.core.SpanMetrics.prfMicro(
      predTriples, goldTriples, Seq("conv_id", "turn_idx", "subj", "obj"), "pred")
    assert(precision >= 0.95, s"precision=$precision")
    assert(recall >= 0.95, s"recall=$recall")
    assert(f1 >= 0.95, s"f1=$f1")
  }
}
