package graft.core

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Bridge: run a scalacheck Prop inside scalatest without scalatestplus. */
trait PropRunner { self: AnyFunSuite =>
  def check(prop: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, res.status.toString)
  }
}

class NormalizeSpec extends AnyFunSuite {
  import Normalize._

  test("F1 normalize matches reference semantics (linking_data.py:14-19)") {
    assert(normalize("Stata 13.1") == "stata")
    assert(normalize("SPSS") == "spss")
    assert(normalize("The R Project for Statistical Computing") == "r project statistical computing")
    assert(normalize("C + +") == "c")
    assert(normalize("IBM SPSS Statistics 21.0") == "ibm spss statistics")
    assert(normalize("MATLAB R2019b") == "matlab r2019b")
    assert(normalize("Microsoft Excel 2010") == "microsoft excel")
    assert(normalize("scikit-learn 0.24") == "scikit learn")
    assert(normalize("GraphPad Prism v5") == "graphpad prism v")
    // empty-result fallback to the original string
    assert(normalize("  123, .") == "  123, .")
    assert(normalize("a the of") == "a the of")
    assert(normalize("") == "")
  }

  test("F2 remove_spaces glues symbol/digit tokens (linking_data.py:21-23)") {
    assert(removeSpaces("C + +") == "C++")
    assert(removeSpaces("Stata 13.1") == "Stata13.1")
    assert(removeSpaces("IBM SPSS Statistics 21.0") == "IBM SPSS Statistics21.0")
    assert(removeSpaces("scikit-learn 0.24") == "scikit-learn0.24")
    assert(removeSpaces("MATLAB R2019b") == "MATLAB R2019b")
    assert(removeSpaces("The R Project for Statistical Computing") == "The R Project for Statistical Computing")
  }

  test("F3 acronym requires >2 surviving tokens (RE/features.py:39-56)") {
    assert(acronym(Seq("Statistical", "Package", "Social", "Sciences")).contains("spss"))
    assert(acronym(Seq("The", "R", "Project")).isEmpty) // "the" dropped -> 2 left
    assert(acronym(Seq("SPSS")).isEmpty)
    assert(acronym(Seq("Amazon", "Web", "Services")).contains("aws"))
  }

  test("F4 is_substring casefolded containment") {
    assert(isSubstring(Some("spss"), Some("IBM SPSS Statistics")))
    assert(!isSubstring(Some("stata"), Some("SPSS")))
    assert(!isSubstring(None, Some("x")))
  }

  test("F19 get_abbr initials") {
    assert(getAbbr("Amazon Web Services") == "AWS")
    assert(getAbbr("scikit_learn extra") == "sle")
  }

  test("generatedAbbr: '-'->' ', initials iff >2 tokens (feature_calculator.py:348-366)") {
    assert(generatedAbbr("Statistical Package Social Sciences") == "SPSS")
    assert(generatedAbbr("scikit-learn extra") == "sle")
    assert(generatedAbbr("two tokens") == "")
  }
}

class StringSimSpec extends AnyFunSuite {
  import StringSim._
  private def approx(a: Double, b: Double) = math.abs(a - b) < 1e-9

  test("Jaro matches python-Levenshtein jaro on known pairs") {
    assert(approx(jaro("stata", "statas"), 0.9444444444444445))
    assert(approx(jaro("spss", "ibm spss statistics"), 0.7368421052631579))
    assert(approx(jaro("MARTHA", "MARHTA"), 0.9444444444444445))
    assert(approx(jaro("DWAYNE", "DUANE"), 0.8222222222222223))
    assert(approx(jaro("DIXON", "DICKSONX"), 0.7666666666666666))
    assert(jaro("stata", "") == 0.0)
    assert(jaro("", "") == 1.0)
    assert(approx(jaro("r", "r project"), 0.7037037037037036))
    assert(jaro("same", "same") == 1.0)
  }

  test("Levenshtein classic DP") {
    assert(levenshtein("kitten", "sitting") == 3)
    assert(levenshtein("", "abc") == 3)
    assert(levenshtein("stata", "stata") == 0)
    assert(normLevenshtein("stata", "statas") == 1.0 / 6)
    assert(normLevenshtein("", "") == 0.0)
  }

  test("substringDist is 0 iff containment either way (case-sensitive)") {
    assert(substringDist("SPSS", "IBM SPSS") == 0.0)
    assert(substringDist("spss", "IBM SPSS") == 1.0)
    assert(substringDist("abc", "xyz") == 1.0)
  }
}

class TokSpec extends AnyFunSuite {
  test("whitespace tokens carry exact char offsets") {
    val t = Tok.tokens("All analyses used Stata 13.1 .")
    assert(t.map(_.surface) == Seq("All", "analyses", "used", "Stata", "13.1", "."))
    val stata = t(3)
    assert(stata.beg == 18 && stata.end == 23)
    assert("All analyses used Stata 13.1 .".substring(stata.beg, stata.end) == "Stata")
  }

  test("multiple/leading whitespace handled like Python str.split") {
    val t = Tok.tokens("  a  b\tc ")
    assert(t.map(_.surface) == Seq("a", "b", "c"))
    assert(t.map(_.beg) == Seq(2, 5, 7))
  }

  test("pretokenize isolates brackets and final periods, keeps versions") {
    assert(Tok.pretokenize("using Stata 13.1 software [30].") ==
      "using Stata 13.1 software [ 30 ] .")
    assert(Tok.pretokenize("SPSS (IBM Corp., Armonk) was used.") ==
      "SPSS ( IBM Corp. , Armonk ) was used .")
  }
}

class BioSpec extends AnyFunSuite with PropRunner {
  import Bio._

  test("W1 decode: B/I spans with char offsets") {
    val text = "used Stata 13.1 today"
    val spans = decode(text, Vector("O", "B-Application", "I-Application", "O"))
    assert(spans == Vector(Span("Application", 5, 15, "Stata 13.1")))
  }

  test("W1 decode: type change inside I- closes and reopens") {
    val text = "a b c"
    val spans = decode(text, Vector("B-X", "I-Y", "I-Y"))
    assert(spans.map(s => (s.typ, s.surface)) == Vector(("X", "a"), ("Y", "b c")))
  }

  test("W2 fix: orphan I- promoted to B-") {
    assert(fix(Vector("O", "I-App", "I-App"), software = true) ==
      Vector("O", "B-App", "I-App"))
  }

  test("W2 fix: mid-span type change — software starts B-, class inherits") {
    assert(fix(Vector("B-X", "I-Y"), software = true) == Vector("B-X", "B-Y"))
    assert(fix(Vector("B-X", "I-Y"), software = false) == Vector("B-X", "I-X"))
    // inherited type propagates (last_tag updated to inherited)
    assert(fix(Vector("B-X", "I-Y", "I-Y"), software = false) == Vector("B-X", "I-X", "I-X"))
  }

  test("A2 stableMode: first-encountered max wins ties; empty -> Unknown") {
    assert(stableMode(Seq("Usage", "Mention", "Mention", "Usage")) == "Usage")
    assert(stableMode(Seq("Mention", "Usage", "Usage")) == "Usage")
    assert(stableMode(Seq()) == "Unknown")
    assert(stableMode(Seq("A")) == "A")
  }

  test("W3 merge: 3-layer majority vote into combined labels") {
    val sw = Vector("O", "B-Application", "I-Application", "O")
    val mt = Vector("O", "B-Usage", "I-Usage", "O")
    val st = Vector("O", "B-Application", "I-PlugIn", "O")
    assert(merge(sw, mt, st) ==
      Vector("O", "B-Application_Usage", "I-Application_Usage", "O"))
  }

  test("W3 merge: missing layer votes -> Unknown") {
    val sw = Vector("B-Application")
    val mt = Vector("O")
    val st = Vector("O")
    assert(merge(sw, mt, st) == Vector("B-Unknown_Unknown"))
  }

  test("W3 merge: adjacent B-Application closes previous span") {
    val sw = Vector("B-Application", "B-Application")
    val mt = Vector("B-Usage", "B-Mention")
    val st = Vector("B-Application", "B-OperatingSystem")
    assert(merge(sw, mt, st) ==
      Vector("B-Application_Usage", "B-OperatingSystem_Mention"))
  }

  test("property: decode(fix(tags)) never throws and spans are well-formed") {
    val tagGen = Gen.oneOf("O", "B-A", "I-A", "B-B", "I-B")
    val seqGen = Gen.listOfN(8, tagGen)
    check(Prop.forAll(seqGen) { tags =>
      val text = (1 to tags.length).map(i => s"t$i").mkString(" ")
      val fixed = fix(tags.toVector, software = true)
      val spans = decode(text, fixed)
      spans.forall(s => s.beg < s.end && s.end <= text.length &&
        text.substring(s.beg, s.end) == s.surface)
    })
  }

  test("property: round-trip spans->tags->spans is identity for non-adjacent spans") {
    // encode spans as BIO then decode: must recover the same spans
    val text = "aa bb cc dd ee"
    val toks = Tok.tokens(text)
    val spanSets = Seq(Seq((0, 1, "X")), Seq((1, 3, "Y")), Seq((0, 1, "X"), (2, 4, "Y")))
    for (spans <- spanSets) {
      val tags = Array.fill(toks.length)("O")
      for ((b, e, t) <- spans; i <- b until e)
        tags(i) = (if (i == b) "B-" else "I-") + t
      val decoded = decode(text, tags.toVector)
      assert(decoded.map(s => (s.beg, s.end, s.typ)) ==
        spans.map { case (b, e, t) => (toks(b).beg, toks(e - 1).end, t) })
    }
  }
}
