package graft.core

/** Word-shape and surface-class predicates — F12
  * (`somenlp/feature_engineering/word_rules.py:1-23`) and the F14 subset the
  * round-1 detector lacked (`sentence_rep.py:49-77`: punctuation and
  * Unicode `Sm` math symbols; brackets/digits/hyphen/slash were already in
  * the detector's regex set). Pure total functions, Python-semantics
  * faithful (`str.isalpha`/`isupper`/`islower` over the whole token).
  */
object WordShape {

  private def isAlpha(x: String): Boolean = x.nonEmpty && x.forall(_.isLetter)

  /** word_rules.upper_cased: alphabetic and all-upper. */
  def upperCased(x: String): Boolean = isAlpha(x) && x.forall(_.isUpper)

  /** word_rules.first_char_upper: alphabetic, initial upper, rest lower. */
  def firstCharUpper(x: String): Boolean =
    isAlpha(x) && x.head.isUpper && x.drop(1).forall(_.isLower)

  /** word_rules.mixed_case: alphabetic, an upper AFTER position 0 and a
    * lower anywhere ("FreeSurfer", "scikitLearn"; not "Excel", not "SPSS").
    */
  def mixedCase(x: String): Boolean =
    isAlpha(x) && x.drop(1).exists(_.isUpper) && x.exists(_.isLower)

  /** word_rules.lower_case: alphabetic and all-lower. */
  def lowerCase(x: String): Boolean = isAlpha(x) && x.forall(_.isLower)

  /** sentence_rep 'punct': member of Python string.punctuation. */
  private val Punctuation: Set[Char] = """!"#$%&'()*+,-./:;<=>?@[\]^_`{|}~""".toSet
  def isPunct(x: String): Boolean = x.length == 1 && Punctuation(x.charAt(0))

  /** sentence_rep 'math_chars': single char of Unicode category Sm. */
  def isMathSymbol(x: String): Boolean =
    x.length == 1 && Character.getType(x.charAt(0)) == Character.MATH_SYMBOL

  /** The distinctive-name shape used as detector evidence: CamelCase /
    * internal capitals or an all-caps token of length ≥ 2 — shapes that
    * out-of-gazetteer tool names ("FreeSurfer", "AFNI") take and ordinary
    * sentence-initial words do not (firstCharUpper alone is NOT evidence).
    */
  def distinctiveShape(x: String): Boolean =
    mixedCase(x) || (x.length >= 2 && upperCased(x))
}
