package graft.ner

import graft.core._
import graft.dicts.Dicts
import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.Dataset

/** The per-token custom feature matrix — S4/A4 of the reference
  * (`somenlp/feature_engineering/gen_custom_features.py:15-46`,
  * `encode_sentence`): for every candidate span (lengths 1..6 × positions)
  * matching a rule, every COVERED token's count for that rule increments;
  * dictionary hits likewise per distant-supervision source
  * (`distant_supervision_rules.py:3-10`). Alongside ride the per-token
  * surface/shape/class flags of `sentence_rep.py:48-77`.
  *
  * The reference persists these as per-document `.npz` tensors; here they
  * are computed inline as one shuffle-free `mapPartitions` projection and
  * only materialized when a consumer wants them (SURVEY §2.1 S4).
  *
  * Rule slots follow `FUNCTION_NAMES` (gen_custom_features.py:11-13):
  * pan_top_1..pan_top_8, text_is_in_brackets, developer.
  */
object TokenFeatures {

  val RuleNames: Seq[String] = Seq(
    "pan_top_1", "pan_top_2", "pan_top_3", "pan_top_4", "pan_top_5",
    "pan_top_6", "pan_top_7", "pan_top_8", "text_is_in_brackets", "developer")

  final case class TokenFeatureRow(
      conv_id: String,
      turn_idx: Int,
      pos: Int,
      token: String,
      rule_counts: Seq[Int], // 10 slots, RuleNames order
      dict_counts: Seq[Int], // one slot per source id (Dicts.sourceIds order)
      token_length: Int,
      punct: Boolean,
      math_chars: Boolean,
      hyphen: Boolean,
      slash: Boolean,
      bracket_open: Boolean,
      bracket_close: Boolean,
      digit: Boolean,
      float_num: Boolean,
      float_non_leading: Boolean,
      version_like_num: Boolean,
      long_version_like: Boolean,
      long_num: Boolean,
      citation: Boolean,
      url: Boolean,
      upper: Boolean,
      first_char_upper: Boolean,
      mixed_case: Boolean,
      lower_case: Boolean,
      headwords: Seq[Boolean]) // 17 slots, Lemma.Headwords order

  private val DevMarkers = MentionDetector.DeveloperMarkers

  /** Pure per-turn feature matrix (one row per token). */
  def forTurn(conv_id: String, turn_idx: Int, text: String, d: Dicts): Seq[TokenFeatureRow] = {
    if (text == null) return Seq.empty
    val toks = Tok.tokens(text)
    val n = toks.length
    if (n == 0) return Seq.empty
    val surfaces = Array.tabulate(n)(i => toks(i).surface)
    val lemmas = Array.tabulate(n)(i => Lemma.of(surfaces(i)))
    val nSources = d.sourceIds.size
    val ruleCounts = Array.ofDim[Int](n, RuleNames.length)
    val dictCounts = Array.ofDim[Int](n, nSources)

    def lem(i: Int) = lemmas(i)
    var length = 1
    while (length <= 6) {
      var b = 0
      while (b + length <= n) {
        val e = b + length // exclusive
        // candidate rules, exact contexts of candidate_rules.py:3-113
        val fires = new Array[Boolean](RuleNames.length)
        fires(0) = b >= 1 && e < n && lem(b - 1) == "use" && lem(e) == "software"
        fires(1) = b >= 2 && lem(b - 2) == "perform" && lem(b - 1) == "use"
        fires(2) = b >= 3 && lem(b - 3) == "be" && lem(b - 2) == "perform" && lem(b - 1) == "use"
        fires(3) = b >= 4 && lem(b - 4) == "analysis" && lem(b - 3) == "be" &&
          lem(b - 2) == "perform" && lem(b - 1) == "use"
        fires(4) = b >= 2 && (lem(b - 2) == "analyze" || lem(b - 2) == "analyse") && lem(b - 1) == "use"
        fires(5) = b >= 4 && lem(b - 4) == "analysis" && lem(b - 3) == "be" &&
          lem(b - 2) == "perform" && lem(b - 1) == "with"
        fires(6) = e + 1 < n && lem(e) == "statistical" && lem(e + 1) == "software"
        fires(7) = e + 2 < n && lem(e) == "software" && lem(e + 1) == "be" && lem(e + 2) == "use"
        // span char length != 1 gate of text_is_in_brackets/developer
        val spanCharLen = toks(e - 1).end - toks(b).beg
        fires(8) = spanCharLen != 1 && b >= 1 && e < n &&
          MentionDetector.OpenBrackets(surfaces(b - 1)) && MentionDetector.CloseBrackets(surfaces(e))
        fires(9) = spanCharLen != 1 && b >= 1 && e < n &&
          surfaces(b - 1) == "(" && surfaces(e) == ")" && {
            var i = b; var found = false
            while (i < e && !found) { found = DevMarkers(surfaces(i).toLowerCase(java.util.Locale.ROOT)); i += 1 }
            found
          }
        // distant supervision: exact dictionary membership of the span
        val span = if (length == 1) surfaces(b)
          else if (d.firstTokenMaxLen.getOrElse(surfaces(b), 0) >= length)
            surfaces.slice(b, e).mkString(" ")
          else null
        val srcIds = if (span == null) null else d.inverted.getOrElse(span, null)
        var i = b
        while (i < e) {
          var r = 0
          while (r < fires.length) { if (fires(r)) ruleCounts(i)(r) += 1; r += 1 }
          if (srcIds != null) { var k = 0; while (k < srcIds.length) { dictCounts(i)(srcIds(k)) += 1; k += 1 } }
          i += 1
        }
        b += 1
      }
      length += 1
    }

    (0 until n).map { i =>
      val t = surfaces(i)
      TokenFeatureRow(conv_id, turn_idx, i, t,
        rule_counts = ruleCounts(i).toVector,
        dict_counts = dictCounts(i).toVector,
        token_length = t.length,
        punct = WordShape.isPunct(t),
        math_chars = WordShape.isMathSymbol(t),
        hyphen = t == "-",
        slash = t == "/",
        bracket_open = t == "(",
        bracket_close = t == ")",
        digit = TokenClass.digits(t),
        float_num = TokenClass.floatNum(t),
        float_non_leading = TokenClass.floatNonLeading(t),
        version_like_num = TokenClass.versionLikeNum(t),
        long_version_like = TokenClass.longVersion(t),
        long_num = TokenClass.longNum(t),
        citation = TokenClass.citation(t),
        url = TokenClass.url(lemmas(i)),
        upper = WordShape.upperCased(t),
        first_char_upper = WordShape.firstCharUpper(t),
        mixed_case = WordShape.mixedCase(t),
        lower_case = WordShape.lowerCase(t),
        headwords = Lemma.Headwords.map(_ == lemmas(i)).toVector)
    }
  }

  /** Spark wrapper: shuffle-free projection turns → token features. */
  def matrix(turns: Dataset[Turn], dicts: Broadcast[Dicts]): Dataset[TokenFeatureRow] = {
    val spark = turns.sparkSession
    import spark.implicits._
    turns.mapPartitions(_.flatMap(t => forTurn(t.conv_id, t.turn_idx, t.text, dicts.value)))
  }
}
