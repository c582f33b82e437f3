package graft.core

/** Pure string-normalization functions of the reference pipeline.
  *
  * Semantics mirror `somenlp/entity_disambiguation/linking_data.py:14-23`
  * (normalize / remove_spaces, duplicated at `efficient_prediction.py:30-40`
  * and `feature_calculator.py:244-254`) and `somenlp/RE/features.py:39-56`
  * (acronym). All functions are pure and total; they run inside typed
  * Dataset transforms / `mapPartitions` and are also mirrored 1:1 by SQL
  * snippets in [[graft.SparkEntry]] so a DuckDB oracle can verify them.
  */
object Normalize {

  /** English stopword list (NLTK-style, public). Only alphanumeric-only
    * entries can ever match inside [[normalize]] because the input is
    * squashed to `[0-9a-zA-Z ]` first; apostrophe forms are therefore
    * omitted. Kept sorted for determinism.
    */
  val Stopwords: Set[String] = Set(
    "a", "about", "above", "after", "again", "against", "ain", "all", "am",
    "an", "and", "any", "are", "aren", "as", "at", "be", "because", "been",
    "before", "being", "below", "between", "both", "but", "by", "can",
    "couldn", "d", "did", "didn", "do", "does", "doesn", "doing", "don",
    "down", "during", "each", "few", "for", "from", "further", "had", "hadn",
    "has", "hasn", "have", "haven", "having", "he", "her", "here", "hers",
    "herself", "him", "himself", "his", "how", "i", "if", "in", "into", "is",
    "isn", "it", "its", "itself", "just", "ll", "m", "ma", "me", "mightn",
    "more", "most", "mustn", "my", "myself", "needn", "no", "nor", "not",
    "now", "o", "of", "off", "on", "once", "only", "or", "other", "our",
    "ours", "ourselves", "out", "over", "own", "re", "s", "same", "shan",
    "she", "should", "shouldn", "so", "some", "such", "t", "than", "that",
    "the", "their", "theirs", "them", "themselves", "then", "there", "these",
    "they", "this", "those", "through", "to", "too", "under", "until", "up",
    "ve", "very", "was", "wasn", "we", "were", "weren", "what", "when",
    "where", "which", "while", "who", "whom", "why", "will", "with", "won",
    "wouldn", "y", "you", "your", "yours", "yourself", "yourselves")

  /** Stopword list as a deterministic, sorted sequence (for SQL IN-lists). */
  val StopwordsSorted: Seq[String] = Stopwords.toSeq.sorted

  private val NonAlnum = "[^0-9a-zA-Z]+".r
  private val RstripChars = "0123456789 ,.".toSet

  /** F1 — the ED blocking key (`linking_data.py:14-19`):
    * casefold → non-alnum runs → single space → rstrip digits/space/",." →
    * lstrip spaces → drop stopwords → fallback to the original string when
    * the result is empty.
    */
  def normalize(s: String): String = {
    var t = NonAlnum.replaceAllIn(s.toLowerCase(java.util.Locale.ROOT), " ")
    t = t.reverse.dropWhile(RstripChars.contains).reverse
    t = t.dropWhile(_ == ' ')
    val kept = t.split(' ').iterator.filter(w => w.nonEmpty && !Stopwords(w))
    val norm = kept.mkString(" ")
    if (norm.isEmpty) s else norm
  }

  private val GlueRegex = """\s([+\-#™_/\d]+)\s?""".r

  /** F2 — `remove_spaces` (`linking_data.py:21-23`): glue version/symbol
    * tokens back onto the preceding token ("C + +" → "C++").
    * Matches Python `re.sub` left-to-right non-overlapping semantics.
    */
  def removeSpaces(s: String): String =
    GlueRegex.replaceAllIn(s, m => java.util.regex.Matcher.quoteReplacement(m.group(1)))

  /** F3 — acronym of a token sequence (`RE/features.py:39-56`): casefold,
    * squash non-alnum to spaces, rstrip digits/space/",.", drop stopwords
    * and empties; `None` (here: empty string) unless >2 tokens survive.
    */
  def acronym(tokensIn: Seq[String]): Option[String] = {
    val tokens = tokensIn.iterator
      .map(_.toLowerCase(java.util.Locale.ROOT))
      .map(x => NonAlnum.replaceAllIn(x, " "))
      .map(x => x.reverse.dropWhile(RstripChars.contains).reverse.dropWhile(_ == ' '))
      .filter(x => x.nonEmpty && !Stopwords(x))
      .toVector
    if (tokens.length <= 2) None
    else Some(tokens.map(_.head).mkString)
  }

  /** F4 — casefolded containment (`RE/features.py:58-70`). */
  def isSubstring(e1: Option[String], e2: Option[String]): Boolean = (e1, e2) match {
    case (Some(a), Some(b)) => b.toLowerCase(java.util.Locale.ROOT).contains(a.toLowerCase(java.util.Locale.ROOT))
    case _                  => false
  }

  /** F19 — initials after `_`/space separators (`somenlp/utils/__init__.py:84-91`). */
  def getAbbr(s: String): String =
    s.split("[ _]+").iterator.filter(_.nonEmpty).map(_.head).mkString

  /** Generated abbreviation used by ED features MenGenAbbr/NormGenAbbr
    * (`feature_calculator.py:348-366`): '-'→' ', initials iff >2 tokens.
    */
  def generatedAbbr(s: String): String = {
    val parts = s.replace('-', ' ').split(' ').filter(_.nonEmpty)
    if (parts.length > 2) parts.map(_.head).mkString else ""
  }
}
