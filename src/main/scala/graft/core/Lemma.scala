package graft.core

/** Closed-vocabulary lemma table — the deterministic replacement for the
  * reference's NLTK POS-tag + WordNet lemmatizer (F16,
  * `somenlp/feature_engineering/sentence_rep.py:40-46`).
  *
  * Per SURVEY.md §7.4(3): only lemmas of the closed trigger vocabulary matter
  * — the ~12 verbs/nouns consumed by the contextual trigger rules
  * (`candidate_rules.py:3-113`) plus the 17 headwords
  * (`sentence_rep.py:22`). Everything else lemmatizes to its lowercase form.
  */
object Lemma {

  /** Headwords checked as per-token indicator features (`sentence_rep.py:22`). */
  val Headwords: Seq[String] = Seq(
    "software", "package", "program", "tool", "toolbox", "web", "service",
    "spreadsheet", "database", "registry", "data", "model", "algorithm",
    "kit", "standard", "method", "procedure")

  /** Inflected form → lemma, for the closed trigger vocabulary. */
  val Table: Map[String, String] = {
    def forms(lemma: String, infl: String*): Seq[(String, String)] =
      (lemma +: infl).map(f => f -> lemma)
    (forms("use", "uses", "used", "using", "usage") ++
      forms("perform", "performs", "performed", "performing") ++
      forms("be", "is", "are", "was", "were", "been", "being", "am") ++
      forms("analysis", "analyses") ++
      forms("analyze", "analyzes", "analyzed", "analyzing") ++
      forms("analyse", "analyses2", "analysed", "analysing") ++ // "analyses" maps to analysis (noun) first
      forms("with") ++
      forms("statistical") ++
      forms("develop", "develops", "developed", "developing") ++
      forms("implement", "implements", "implemented", "implementing") ++
      forms("create", "creates", "created", "creating") ++
      forms("write", "writes", "wrote", "written", "writing") ++
      forms("deposit", "deposits", "deposited") ++
      forms("release", "releases", "released") ++
      forms("download", "downloads", "downloaded") ++
      forms("available") ++
      forms("run", "runs", "ran", "running") ++
      forms("compute", "computes", "computed", "computing") ++
      Seq("softwares" -> "software") ++
      Headwords.flatMap(h => Seq(h -> h, plural(h) -> h))).toMap - "analyses2"
  }

  /** English regular pluralization for the headword table: the round-2
    * naive "+s" generated non-words ("toolboxs", "registrys"), so the REAL
    * plurals ("toolboxes", "registries") never lemmatized to their headword
    * and the headword indicator silently missed on es/ies plurals.
    */
  private def plural(w: String): String =
    if (w.endsWith("s") || w.endsWith("x") || w.endsWith("z") ||
        w.endsWith("ch") || w.endsWith("sh")) w + "es"
    else if (w.endsWith("y") && w.length > 1 && !"aeiou".contains(w.charAt(w.length - 2)))
      w.dropRight(1) + "ies"
    else w + "s"

  /** Null-returning table view: `Map.getOrElse` allocates an Option per
    * call and [[of]] runs once per token of the corpus (guide §1.2).
    */
  private val TableJ: java.util.HashMap[String, String] = {
    val m = new java.util.HashMap[String, String](Table.size * 2)
    Table.foreach { case (k, v) => m.put(k, v) }
    m
  }

  /** Lemma of a token: closed-table lookup on the lowercase form, identity
    * (lowercased) otherwise. Deterministic, total. Skips the lowercase COPY
    * when the token has no uppercase chars (the overwhelmingly common case
    * in running text) — this runs once per token of the corpus.
    */
  def of(token: String): String = {
    var i = 0
    var hasUpper = false
    while (i < token.length && !hasUpper) {
      val c = token.charAt(i)
      if (c >= 'A' && c <= 'Z') hasUpper = true
      else hasUpper = c.isUpper // non-ASCII uppercase
      i += 1
    }
    val lower = if (hasUpper) token.toLowerCase(java.util.Locale.ROOT) else token
    val v = TableJ.get(lower)
    if (v == null) lower else v
  }
}
