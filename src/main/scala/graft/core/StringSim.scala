package graft.core

/** String-similarity primitives of the ED pair scorer.
  *
  * Jaro follows the standard public definition (matching python-Levenshtein's
  * `jaro`, used at `somenlp/entity_disambiguation/feature_calculator.py:199`);
  * Levenshtein is the classic DP (Spark SQL also has a built-in `levenshtein`
  * used on the SQL surface; this Scala copy serves typed transforms).
  * All distances are in [0,1]; 0 = identical.
  */
object StringSim {

  /** Jaro similarity in [0,1]. Empty-vs-empty = 1.0 (python-Levenshtein
    * convention: jaro("","") == 1.0); empty-vs-nonempty = 0.0.
    */
  def jaro(s1: String, s2: String): Double = {
    val l1 = s1.length
    val l2 = s2.length
    if (l1 == 0 && l2 == 0) return 1.0
    if (l1 == 0 || l2 == 0) return 0.0
    val matchWindow = math.max(math.max(l1, l2) / 2 - 1, 0)
    val m1 = new Array[Boolean](l1)
    val m2 = new Array[Boolean](l2)
    var matches = 0
    var i = 0
    while (i < l1) {
      val lo = math.max(0, i - matchWindow)
      val hi = math.min(l2 - 1, i + matchWindow)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!m2(j) && s1.charAt(i) == s2.charAt(j)) {
          m1(i) = true; m2(j) = true; matches += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (matches == 0) return 0.0
    // transpositions: compare matched chars in order
    var k = 0
    var transpositions = 0
    i = 0
    while (i < l1) {
      if (m1(i)) {
        while (!m2(k)) k += 1
        if (s1.charAt(i) != s2.charAt(k)) transpositions += 1
        k += 1
      }
      i += 1
    }
    val t = transpositions / 2.0
    val m = matches.toDouble
    (m / l1 + m / l2 + (m - t) / m) / 3.0
  }

  /** Jaro distance = 1 - jaro (`feature_calculator.py:199-200`). */
  def jaroDist(s1: String, s2: String): Double = 1.0 - jaro(s1, s2)

  /** Classic Levenshtein edit distance (two-row DP). */
  def levenshtein(s1: String, s2: String): Int = {
    if (s1.isEmpty) return s2.length
    if (s2.isEmpty) return s1.length
    var prev = Array.tabulate(s2.length + 1)(identity)
    var curr = new Array[Int](s2.length + 1)
    var i = 1
    while (i <= s1.length) {
      curr(0) = i
      var j = 1
      while (j <= s2.length) {
        val cost = if (s1.charAt(i - 1) == s2.charAt(j - 1)) 0 else 1
        curr(j) = math.min(math.min(curr(j - 1) + 1, prev(j) + 1), prev(j - 1) + cost)
        j += 1
      }
      val tmp = prev; prev = curr; curr = tmp
      i += 1
    }
    prev(s2.length)
  }

  /** Normalized Levenshtein distance `lev/max(len)`
    * (`feature_calculator.py:202-203`). Both empty → 0.0 (identical).
    */
  def normLevenshtein(s1: String, s2: String): Double = {
    val mx = math.max(s1.length, s2.length)
    if (mx == 0) 0.0 else levenshtein(s1, s2).toDouble / mx
  }

  /** Substring distance: 0 if either contains the other, else 1
    * (`feature_calculator.py:205-206`). Case-sensitive like the reference.
    */
  def substringDist(s1: String, s2: String): Double =
    if (s1.contains(s2) || s2.contains(s1)) 0.0 else 1.0
}
