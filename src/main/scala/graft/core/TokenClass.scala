package graft.core

/** Allocation-free token-class predicates — the F13 regex classes of
  * `somenlp/feature_engineering/sentence_rep.py:13-21` re-expressed as
  * character scans. The regex forms allocate a `Matcher` per call; the
  * detector evaluates several classes per token over every token of a
  * 10¹²-turn corpus, and measured scaling on allocation-heavy code is
  * catastrophically sub-linear (see BASELINE.md host calibration: 0.22
  * allocation-scaling vs 0.95 register-CPU). Equivalence with the original
  * Java regexes is property-tested in `TokenClassSpec`.
  *
  * Character classes mirror JAVA regex defaults: `\d` = [0-9],
  * `\w` = [a-zA-Z0-9_].
  */
object TokenClass {

  @inline private def isDigit(c: Char): Boolean = c >= '0' && c <= '9'
  @inline private def isWord(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') || isDigit(c) || c == '_'

  /** ^\d+$ */
  def digits(t: String): Boolean = {
    if (t.isEmpty) return false
    var i = 0
    while (i < t.length) { if (!isDigit(t.charAt(i))) return false; i += 1 }
    true
  }

  /** ^\d+\.\d*$ */
  def floatNum(t: String): Boolean = {
    var i = 0
    while (i < t.length && isDigit(t.charAt(i))) i += 1
    if (i == 0 || i >= t.length || t.charAt(i) != '.') return false
    i += 1
    while (i < t.length) { if (!isDigit(t.charAt(i))) return false; i += 1 }
    true
  }

  /** Number of leading maximal `\d+\.` groups and whether the remainder is
    * `\w*` — the deterministic decomposition behind versionLike (= 2
    * groups) and longVersion (3..8 groups): a group's digit run is maximal
    * because `\w` cannot match '.', so no backtracking alternative exists.
    */
  private def dotGroups(t: String): (Int, Boolean) = {
    var i = 0
    var groups = 0
    var scanning = true
    while (scanning) {
      var j = i
      while (j < t.length && isDigit(t.charAt(j))) j += 1
      if (j > i && j < t.length && t.charAt(j) == '.') { groups += 1; i = j + 1 }
      else scanning = false
    }
    var wordRest = true
    var k = i
    while (k < t.length) { if (!isWord(t.charAt(k))) wordRest = false; k += 1 }
    (groups, wordRest)
  }

  /** ^(\d+\.){2}\w*$ */
  def versionLikeNum(t: String): Boolean = { val (g, w) = dotGroups(t); g == 2 && w }

  /** ^(\d+\.){3,8}\w*$ */
  def longVersion(t: String): Boolean = { val (g, w) = dotGroups(t); g >= 3 && g <= 8 && w }

  /** ^[vV]\d+(\.\d+)*$ */
  def vPrefixed(t: String): Boolean = {
    if (t.length < 2 || (t.charAt(0) != 'v' && t.charAt(0) != 'V')) return false
    var i = 1
    var expectDigits = true
    while (expectDigits) {
      val start = i
      while (i < t.length && isDigit(t.charAt(i))) i += 1
      if (i == start) return false // empty digit run
      if (i == t.length) return true
      if (t.charAt(i) != '.') return false
      i += 1
    }
    false
  }

  /** ^\[[0-9\-,\?]+\]$ */
  def citation(t: String): Boolean = {
    if (t.length < 3 || t.charAt(0) != '[' || t.charAt(t.length - 1) != ']') return false
    var i = 1
    while (i < t.length - 1) {
      val c = t.charAt(i)
      if (!(isDigit(c) || c == '-' || c == ',' || c == '?')) return false
      i += 1
    }
    true
  }

  /** ^[0-9\-,\?]+$ */
  def citationNum(t: String): Boolean = {
    if (t.isEmpty) return false
    var i = 0
    while (i < t.length) {
      val c = t.charAt(i)
      if (!(isDigit(c) || c == '-' || c == ',' || c == '?')) return false
      i += 1
    }
    true
  }

  /** ^\.\d+$ (FLOAT_NON_LEADING, sentence_rep.py:17) */
  def floatNonLeading(t: String): Boolean = {
    if (t.length < 2 || t.charAt(0) != '.') return false
    var i = 1
    while (i < t.length) { if (!isDigit(t.charAt(i))) return false; i += 1 }
    true
  }

  /** ^(\d{1,3},){1,8}\d{3}$ (LONG_NUM, sentence_rep.py:20) */
  def longNum(t: String): Boolean = {
    var i = 0
    var groups = 0
    while (groups <= 8) {
      val start = i
      while (i < t.length && isDigit(t.charAt(i)) && i - start < 3) i += 1
      val digits = i - start
      if (i < t.length && t.charAt(i) == ',' && digits >= 1) { groups += 1; i += 1 }
      else return groups >= 1 && groups <= 8 && digits == 3 && i == t.length
    }
    false
  }

  private val UrlRe = ("^(https?\\://[a-zA-Z0-9\\-\\.]+[\\w/\\._\\-\\:~\\?=#%]*[\\w/_\\-\\:~\\?=#%]" +
    "|ftp\\://[a-zA-Z0-9\\-\\.]+[\\w/\\._\\-\\:~\\?=#%]*[\\w/_\\-\\:~\\?=#%]" +
    "|www\\.[a-zA-Z0-9\\-\\.]+[\\w/\\._\\-\\:~\\?=#%]*" +
    "|[a-zA-Z0-9\\-\\.]+\\.(org|edu)/[\\w/_\\-\\:~\\?=#%]*)$").r.pattern

  /** URL class: cheap no-allocation prefilter (every regex alternative
    * requires one of these substrings), full regex only on survivors.
    */
  def url(t: String): Boolean =
    (t.contains("://") || t.startsWith("www.") || t.contains(".org/") || t.contains(".edu/")) &&
      UrlRe.matcher(t).matches()
}
