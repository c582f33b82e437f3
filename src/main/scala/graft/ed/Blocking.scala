package graft.ed

import graft.core._
import graft.dicts.Dicts
import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** ED blocking + blocked pair join — the Spark-native replacement for the
  * reference's triangular row-range sharding of the O(n²) pair space
  * (SURVEY.md §2.3 J7, `bin/efficient_entity_disambiguation:59-77`,
  * `efficient_prediction.py:196-256`).
  *
  * Instead of geometric sharding, pairs are generated only within semantic
  * blocks keyed on the normalized surface form (north_star: "blocking by
  * normalized surface form"). Each sample emits several candidate keys;
  * pairs sharing ≥1 key are scored; edge set is deduplicated on (src,dst).
  *
  * Keys per sample:
  *   - `n:` the full normalize(F1) form — case/punctuation variants collide
  *   - `p:` the first 4 chars of the space-stripped norm — catches tail
  *     typos and version-suffix variants
  *   - `a:` the generated acronym of the norm (>2 tokens) AND, symmetrically,
  *     the norm itself when it is short (≤6 chars, a potential acronym) —
  *     so "SPSS" and "Statistical Package for the Social Sciences" share `a:spss`
  *   - `d:` each DBpedia canonical the surface maps to (label_mapping /
  *     unique_mapping) — known alt names collide regardless of lexical shape
  *
  * Skew control (north_rule): hot blocks (stopword-ish norms, popular
  * surfaces like "python") are capped at `maxBlockSize` samples by
  * deterministic rank (row_number over sample_id); dropped sample-key rows
  * only lose *fuzzy* edges — the exact-match path is the `n:` key, which is
  * never truncated below the cap because identical surfaces were already
  * deduplicated into one sample (G1). AQE skew-join handles residual
  * imbalance.
  */
object Blocking {

  final case class SampleKey(key: String, id: Long)

  /** Blocking keys of `samples` with the deterministic per-key skew cap —
    * the ONE definition of the cap discipline, shared by the in-set join
    * ([[edges]]) and the cross-set compare join ([[EdEval.edgesBetween]])
    * so the two cannot drift. Returns (key, `idName`) rows, at most
    * `maxBlockSize` per key by sample_id rank.
    */
  def keyedCapped(samples: Dataset[LinkingSample], dicts: Broadcast[Dicts],
      idName: String, maxBlockSize: Int): org.apache.spark.sql.DataFrame = {
    val spark = samples.sparkSession
    import spark.implicits._
    val keyed = samples
      .flatMap(s => keysFor(s, dicts.value).map(k => (k, s.sample_id)))
      .toDF("key", idName)
    val w = Window.partitionBy(col("key")).orderBy(col(idName))
    keyed.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= maxBlockSize).drop("rk")
  }

  def keysFor(s: LinkingSample, d: Dicts): Seq[String] = {
    val norm = s.norm
    val noSpace = norm.replace(" ", "")
    val keys = Seq.newBuilder[String]
    keys += s"n:$norm"
    if (noSpace.length >= 4) keys += s"p:${noSpace.substring(0, 4)}"
    val abbr = Normalize.generatedAbbr(norm)
    if (abbr.nonEmpty) keys += s"a:$abbr"
    else if (noSpace.nonEmpty && noSpace.length <= 6) keys += s"a:$noSpace"
    // DBpedia canonical keys (on the glued surface, as the scorer uses it)
    val canonicals =
      if (d.dbpediaUnique.contains(s.string)) Set(s.string)
      else d.dbpediaLabel.getOrElse(s.string, Set.empty)
    canonicals.foreach(c => keys += s"d:$c")
    keys.result().distinct
  }

  /** Candidate pairs (src < dst) within blocks; scored edges ≤ threshold.
    *
    * Shuffle profile: one shuffle to group by block key (hash partitioned),
    * pair generation inside each block (no cross-block work), then a
    * distinct on (src,dst) — both shuffles are on compact (long,long) rows.
    * The candidate join carries ONLY sample ids; features are computed after
    * a broadcast-friendly re-join with the (deduplicated, small) sample set.
    */
  /** Deduplicated-sample-count cutoff below which the whole blocked pair
    * join runs on the driver (same rationale as
    * [[ConnectedComponents.DriverEdgeCutoff]]): a tiny sample set costs
    * more in the ~5 stage barriers of the distributed key/cap/join/dedup/
    * score chain than in memory, and the worst case is bounded — ≤ cutoff
    * samples × ≤ maxBlockSize block members ⇒ ≤ cutoff²/2 scored pairs.
    * Callers opt in by passing the sample count they already know
    * (Pipeline.run counts samples when materializing the cache); with no
    * known count the distributed path is used unconditionally.
    */
  val DriverSampleCutoff = 256L

  def edges(
      samples: Dataset[LinkingSample],
      dicts: Broadcast[Dicts],
      threshold: Double = PairScorer.Threshold,
      maxBlockSize: Int = 1000,
      scoredCounter: Option[org.apache.spark.util.LongAccumulator] = None,
      knownSampleCount: Option[Long] = None): Dataset[Edge] = {
    val spark = samples.sparkSession
    import spark.implicits._

    if (knownSampleCount.exists(_ <= DriverSampleCutoff))
      return edgesOnDriver(samples, dicts, threshold, maxBlockSize, scoredCounter)

    // deterministic per-block cap (O3-style): rank by sample_id
    val capped = keyedCapped(samples, dicts, "id", maxBlockSize)

    // within-block candidate pairs, i<j (J7 bounded θ-join)
    val a = capped.as("a")
    val b = capped.as("b")
    val candidates = a.join(b, col("a.key") === col("b.key") && col("a.id") < col("b.id"))
      .select(col("a.id").as("src"), col("b.id").as("dst"))
      .distinct()

    // re-attach sample payloads and score. The deduplicated sample set is
    // orders of magnitude smaller than the mention table; joining twice on
    // the long id keeps the shuffled width minimal.
    val samplesDF = samples.toDF()
    val withPayload = candidates
      .join(samplesDF.as("sa"), col("src") === col("sa.sample_id"))
      .join(samplesDF.as("sb"), col("dst") === col("sb.sample_id"))
      .select(
        struct(col("sa.*")).as("a"),
        struct(col("sb.*")).as("b"))

    val enc = org.apache.spark.sql.Encoders.product[(LinkingSample, LinkingSample)]
    withPayload.as[(LinkingSample, LinkingSample)](enc)
      .mapPartitions { it =>
        val d = dicts.value
        it.flatMap { case (sa, sb) =>
          scoredCounter.foreach(_.add(1)) // evidence: pair scoring runs ONCE
          val dist = PairScorer.distance(sa, sb, d)
          if (dist <= threshold) Iterator(Edge(sa.sample_id, sb.sample_id, dist)) else Iterator.empty
        }
      }
  }

  /** Driver twin of the distributed path for sample sets below
    * [[DriverSampleCutoff]]: same keys ([[keysFor]]), same deterministic
    * per-key cap (sort by sample_id, take maxBlockSize), same i<j pair
    * space, same (src,dst) dedup BEFORE scoring (the scored-once
    * contract — the accumulator counts identically), same scorer and
    * threshold. Edge-set equality with the distributed path is
    * property-pinned in Round6Spec.
    */
  private def edgesOnDriver(
      samples: Dataset[LinkingSample],
      dicts: Broadcast[Dicts],
      threshold: Double,
      maxBlockSize: Int,
      scoredCounter: Option[org.apache.spark.util.LongAccumulator]): Dataset[Edge] = {
    val spark = samples.sparkSession
    import spark.implicits._
    spark.createDataset(
      edgesLocal(samples.collect(), dicts.value, threshold, maxBlockSize, scoredCounter))
  }

  /** The driver-side pair-join kernel shared by [[edges]]' fast path and
    * Pipeline.run's small-vocabulary route (which already holds the
    * collected samples and so skips even the collect job).
    */
  private[graft] def edgesLocal(
      local: Array[LinkingSample],
      d: Dicts,
      threshold: Double,
      maxBlockSize: Int,
      scoredCounter: Option[org.apache.spark.util.LongAccumulator]): Vector[Edge] = {
    val byId = local.map(s => s.sample_id -> s).toMap
    val blocks = scala.collection.mutable.LinkedHashMap.empty[String, scala.collection.mutable.ArrayBuffer[Long]]
    local.foreach { s =>
      keysFor(s, d).foreach(k =>
        blocks.getOrElseUpdate(k, scala.collection.mutable.ArrayBuffer.empty) += s.sample_id)
    }
    val seen = scala.collection.mutable.HashSet.empty[(Long, Long)]
    val out = Vector.newBuilder[Edge]
    blocks.valuesIterator.foreach { ids =>
      val capped = ids.sorted.take(maxBlockSize)
      var i = 0
      while (i < capped.length) {
        var j = i + 1
        while (j < capped.length) {
          val (src, dst) = (capped(i), capped(j))
          if (src < dst && seen.add((src, dst))) {
            scoredCounter.foreach(_.add(1))
            val dist = PairScorer.distance(byId(src), byId(dst), d)
            if (dist <= threshold) out += Edge(src, dst, dist)
          }
          j += 1
        }
        i += 1
      }
    }
    out.result()
  }
}
