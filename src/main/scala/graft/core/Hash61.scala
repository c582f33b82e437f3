package graft.core

/** Portable 61-bit string hash, computable IDENTICALLY in three places:
  * this JVM implementation (used by operators via [[graft.functions.Hash61Expr]]),
  * ANSI-ish SQL for the DuckDB oracle ([[Hash61.sql]]), and trivially in any
  * other engine with 128-bit integer arithmetic.
  *
  * Purpose: the round-1 fingerprint/simhash/ANN-LSH operators hashed with
  * Spark's `xxhash64`, which no oracle engine implements — leaving their
  * correctness rows `no_oracle`. Every hash-derived operator output now
  * flows from this function so the DuckDB oracle can recompute it exactly.
  *
  * Definition (all mod M = 2^61−1, a Mersenne prime):
  *   poly  = foldLeft(0)((acc, cp) => acc·131 + cp)   over Unicode code points
  *   h1    = (poly xor (poly >>> 31)) · A1
  *   h2    = (h1   xor (h1   >>> 29)) · A2
  * Result ∈ [0, 2^61). Multiplication mod 2^61−1 is a strong mixer (Lehmer
  * generator shape); the xor-shifts break the pure multiplicative structure
  * so low bits of short strings are usable for bucketing/simhash bits.
  *
  * NOT a cryptographic hash; collision probability ~2^-61 per pair, fine for
  * fingerprints/blocking at 10^9 keys (document the birthday bound at 10^10+).
  */
object Hash61 {

  val M: Long = (1L << 61) - 1
  val A1: Long = 1752450205419405103L // 6364136223846793005 mod M (MMIX LCG mult)
  val A2: Long = 1629715991156309894L // 3935559000370003845 mod M

  /** (x·y) mod 2^61−1 for 0 ≤ x,y < 2^61 via 128-bit product folding:
    * 2^64 ≡ 8 and 2^61 ≡ 1 (mod M), so hi·2^64 + lo ≡ hi·8 + (lo>>>61) + (lo&M).
    * The bound is 2^61, NOT 2^62: at 2^62-wide inputs hi reaches 2^60 and
    * hi·8 + the folded terms overflows signed Long (round-5 review — every
    * caller passes reduced values < M, so this documents the real contract).
    */
  def mulmod(x: Long, y: Long): Long = {
    val hi = Math.multiplyHigh(x, y)
    val lo = x * y
    var s = hi * 8 + (lo >>> 61) + (lo & M)
    while (s >= M) s -= M
    s
  }

  def hash(s: String): Long = {
    var acc = 0L
    var i = 0
    val n = s.length
    while (i < n) {
      val cp = s.codePointAt(i)
      var t = mulmod(acc, 131L) + cp
      if (t >= M) t -= M
      acc = t
      i += Character.charCount(cp)
    }
    var h = mulmod(acc ^ (acc >>> 31), A1)
    h = mulmod(h ^ (h >>> 29), A2)
    h
  }

  // ---------------------------------------------------------------------------
  // DuckDB oracle side. Verified char-split semantics on DuckDB 1.0:
  // string_split(s, '') yields per-character strings; ascii() returns the
  // code point; HUGEINT gives exact 128-bit products. Single-element
  // list_transform([x], h -> ...) is the inline let-binding.
  // ---------------------------------------------------------------------------

  private def polySql(e: String): String =
    s"list_reduce(list_prepend(CAST(0 AS HUGEINT), " +
      s"list_transform(string_split($e, ''), c -> CAST(ascii(c) AS HUGEINT))), " +
      s"(a, x) -> (a * 131 + x) % $M)"

  private def mixSql(inner: String, mult: Long, shift: Int): String =
    s"list_transform([CAST($inner AS BIGINT)], h -> " +
      s"CAST((CAST(xor(h, h >> $shift) AS HUGEINT) * $mult) % $M AS BIGINT))[1]"

  /** DuckDB SQL expression computing hash($e) for a string-typed SQL expr. */
  def sql(e: String): String = mixSql(mixSql(polySql(e), A1, 31), A2, 29)
}
