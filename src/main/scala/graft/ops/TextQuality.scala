package graft.ops

import graft.core.Normalize
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines over a `documents`
  * table: token statistics, quality scoring, language identification, and
  * document fingerprinting. All are single-pass projections (no shuffle) so
  * they stream at scan speed on 100 TB inputs; every formula is also
  * expressible in ANSI SQL for the DuckDB oracle (see SparkEntry).
  */
object TextQuality {

  /** Function words whose density separates English from noise — a small
    * fixed list shared verbatim with the SQL oracle.
    */
  val EnglishMarkers: Seq[String] =
    Seq("a", "an", "the", "of", "and", "or", "to", "in", "is", "was", "for", "with", "on", "that")

  private def toks = split(col("text"), " ")

  /** Token/char statistics: n_tokens, n_unique, avg token length, type-token
    * ratio. Pure projection.
    */
  def tokenStats(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      size(toks).as("n_tokens"),
      size(array_distinct(toks)).as("n_unique"),
      length(col("text")).as("n_chars"),
      round((length(col("text")) - (size(toks) - 1)).cast("double") / size(toks), 4).as("avg_token_len"),
      round(size(array_distinct(toks)).cast("double") / size(toks), 4).as("type_token_ratio"))

  /** Quality score in [0,1]: blend of type-token ratio, stopword presence
    * and length band — the shape of heuristic quality filters used on web
    * corpora (length/punct/stopword ratios). Deterministic arithmetic only.
    */
  def qualityScore(docs: DataFrame): DataFrame = {
    val stopRatio = size(filter(toks, t => t.isin(EnglishMarkers: _*))).cast("double") / size(toks)
    val ttr = size(array_distinct(toks)).cast("double") / size(toks)
    val lenOk = when(size(toks).between(10, 1000), 1.0).otherwise(0.5)
    docs.select(
      col("doc_id"),
      round(stopRatio, 4).as("stopword_ratio"),
      round(ttr, 4).as("type_token_ratio"),
      lenOk.as("length_factor"),
      round((least(stopRatio * lit(4.0), lit(1.0)) * 0.3 + ttr * 0.4 + lenOk * 0.3), 4).as("quality"))
  }

  /** Language ID heuristic: share of tokens that are English function words.
    * ≥ 2% → "en", else "und". (The driver corpus is synthetic word salad;
    * the operator contract is the deterministic scoring pipeline, not a
    * linguistically serious classifier.)
    */
  def langId(docs: DataFrame): DataFrame = {
    val ratio = size(filter(toks, t => t.isin(EnglishMarkers: _*))).cast("double") / size(toks)
    docs.select(col("doc_id"), round(ratio, 4).as("marker_ratio"),
      when(ratio >= 0.02, "en").otherwise("und").as("lang_pred"))
  }

  /** 61-bit rolling content fingerprint: the portable [[graft.core.Hash61]]
    * polynomial over the full character stream — order-sensitive (unlike a
    * bag-of-words hash), one codegen'd pass, and recomputable by the DuckDB
    * oracle (round-1 used xxhash64 folding → `no_oracle`).
    */
  def fingerprint(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      graft.functions.GraftFunctions.hash61(col("text")).as("fingerprint"))

  /** Whitespace + BPE-ish subword token count: whitespace tokens plus extra
    * splits for long tokens (every 6 chars opens a new subword, the shape of
    * byte-pair vocabularies) — a deterministic stand-in for tokenizer cost
    * estimation over a corpus.
    */
  def tokenCount(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      size(toks).as("ws_tokens"),
      aggregate(toks, lit(0L), (acc, t) => acc + ceil(length(t) / lit(6.0)).cast("long"))
        .as("subword_tokens"))
}
