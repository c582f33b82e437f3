package graft.core

/** Token with character offsets into its source turn text (exclusive end). */
final case class Token(beg: Int, end: Int, surface: String)

/** Deterministic tokenizer spec for the rebuild.
  *
  * The reference relies on the external `articlenizer` package for raw-text
  * tokenization (`somenlp/NER/data_handler.py:254-258`) and on whitespace
  * splitting for pre-tokenized `.data.txt` files (`data_handler.py:104-107`).
  * Per SURVEY.md §7.4(1), the rebuild's contract is "per-turn text equality
  * under stable turn ordering" on its *own* transcript input, so the
  * tokenizer spec is defined here, once, and used identically by the engine
  * and by every test oracle:
  *
  *  - `tokens`: whitespace split preserving exact char offsets (the
  *    pre-tokenized path; Python's `str.split()` semantics: any run of
  *    whitespace separates, leading/trailing runs ignored).
  *  - `pretokenize`: raw text → pre-tokenized text by isolating brackets,
  *    commas, semicolons and sentence-final periods as standalone tokens
  *    (the subset of articlenizer behavior the downstream operators rely
  *    on: bracket detection in `candidate_rules.py:101-113`, citation
  *    tokens `[30]` stay glued, version strings `13.1` stay glued).
  */
object Tok {

  /** Whitespace tokens with char offsets into `text`. */
  def tokens(text: String): IndexedSeq[Token] = {
    val out = Vector.newBuilder[Token]
    var i = 0
    val n = text.length
    while (i < n) {
      while (i < n && text.charAt(i).isWhitespace) i += 1
      if (i < n) {
        val beg = i
        while (i < n && !text.charAt(i).isWhitespace) i += 1
        out += Token(beg, i, text.substring(beg, i))
      }
    }
    out.result()
  }

  /** Surfaces only (fast path used in SQL-mirrored queries: `split(text,' ')`
    * after `trim`; single-space-separated inputs give identical results).
    */
  def surfaces(text: String): IndexedSeq[String] = tokens(text).map(_.surface)

  private val Isolate = Set('(', ')', '[', ']', '{', '}', ',', ';')

  /** Abbreviations whose trailing period stays attached. */
  private val Abbrevs = Set("inc", "ltd", "corp", "etc", "vs", "al", "dr", "st")

  /** Raw text → pre-tokenized text (single-space joined). Brackets, commas
    * and semicolons become standalone tokens; a final '.' on a token is
    * split off unless the token matches a version-like number (keeps
    * "13.1" whole, splits "software." → "software ."). Exception: citation
    * brackets like "[30]" are split into "[ 30 ]" so bracket rules fire.
    */
  def pretokenize(raw: String): String = {
    val sb = new StringBuilder(raw.length + 16)
    var i = 0
    val n = raw.length
    while (i < n) {
      val c = raw.charAt(i)
      if (Isolate(c)) { sb.append(' ').append(c).append(' ') }
      else sb.append(c)
      i += 1
    }
    val toks = sb.toString.split("\\s+").iterator.filter(_.nonEmpty).flatMap { t =>
      // split a trailing '.' off words, keep it inside numbers ("13.1." → "13.1 .")
      // and on known abbreviations ("Corp." stays whole — the developer rule
      // at candidate_rules.py:107-113 matches 'inc.'/'ltd.'/'corp.' tokens)
      if (t.length > 1 && t.endsWith(".") && Abbrevs(t.dropRight(1).toLowerCase(java.util.Locale.ROOT)))
        Iterator(t)
      else if (t.length > 1 && t.endsWith(".") && !t.dropRight(1).forall(ch => ch.isDigit || ch == '.'))
        Iterator(t.dropRight(1), ".")
      else if (t.length > 1 && t.endsWith(".") && t.dropRight(1).exists(_.isDigit) && t.count(_ == '.') > 1)
        Iterator(t.dropRight(1), ".")
      else Iterator(t)
    }
    toks.mkString(" ")
  }
}
