package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (`Array[Float]`) of an `embeddings` table (vec_id, embedding, label).
  *
  * Two paths:
  *  - `bruteForceTopK`: exact cosine top-k via a (queries × candidates)
  *    join. Correctness baseline; at scale only viable with a broadcast
  *    query set (the candidate side streams, no shuffle of the corpus).
  *  - `lshTopK`: random-hyperplane LSH (signed projections onto `nPlanes`
  *    deterministic pseudo-random planes → a bit signature; bucket join on
  *    signature prefix bands). Scale path: candidates shrink to bucket
  *    collisions; exact cosine re-rank inside buckets only.
  *
  * The dot product stays in Catalyst (`aggregate`/`zip_with` over the array
  * column — codegen'd, no UDF); doubles throughout for cross-engine
  * reproducibility.
  */
object SimilaritySearch {

  /** Cosine similarity between two array<float> columns, in double. */
  def cosine(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    def dot(x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column) =
      aggregate(zip_with(x, y, (p, q) => p.cast("double") * q.cast("double")),
        lit(0.0), (acc, v) => acc + v)
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))
  }

  /** Exact top-k neighbors for each query vector (query side broadcast).
    * Output: (query_id, neighbor_id, sim, rank) with rank 1..k by
    * (sim desc, neighbor_id asc) — fully deterministic.
    */
  def bruteForceTopK(embeddings: DataFrame, queries: DataFrame, k: Int = 5,
      roundTo: Int = 6): DataFrame = {
    val q = broadcast(queries.select(col("vec_id").as("query_id"), col("embedding").as("qe")))
    val c = embeddings.select(col("vec_id").as("neighbor_id"), col("embedding").as("ce"))
    val sims = q.join(c, col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(cosine(col("qe"), col("ce")), roundTo).as("sim"))
    val w = Window.partitionBy("query_id").orderBy(col("sim").desc, col("neighbor_id"))
    sims.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Deterministic pseudo-random unit-ish plane component for (plane, dim):
    * splitmix64 mapped to [-1, 1). Pure expression → same signature for the
    * same vector under any partitioning.
    */
  private def planeComponent(plane: Int, dim: org.apache.spark.sql.Column) = {
    val seed = xxhash64(lit(plane), dim)
    (seed.cast("double") / lit(Long.MaxValue.toDouble))
  }

  /** Bit signature of each vector over nPlanes hyperplanes. */
  def signatures(embeddings: DataFrame, nPlanes: Int = 16): DataFrame = {
    val sigBits = (0 until nPlanes).map { p =>
      val proj = aggregate(
        zip_with(col("embedding"), sequence(lit(0), size(col("embedding")) - 1),
          (v, i) => v.cast("double") * planeComponent(p, i)),
        lit(0.0), (acc, v) => acc + v)
      when(proj > 0, shiftleft(lit(1L), p)).otherwise(0L)
    }.reduce(_.bitwiseOR(_))
    embeddings.select(col("vec_id"), col("embedding"), sigBits.as("sig"))
  }

  /** LSH ANN: candidates share a signature band (nBands × bandBits prefix
    * split), re-ranked by exact cosine within buckets. Recall < 1 by design;
    * at 100 TB this is the path — tune nPlanes/nBands for recall targets.
    */
  def lshTopK(embeddings: DataFrame, queries: DataFrame, k: Int = 5,
      nPlanes: Int = 16, nBands: Int = 4): DataFrame = {
    require(nPlanes % nBands == 0)
    val bandBits = nPlanes / nBands
    val mask = (1L << bandBits) - 1
    def banded(df: DataFrame, idCol: String, embCol: String) =
      signatures(df).select(col("vec_id").as(idCol), col("embedding").as(embCol),
          explode(array((0 until nBands).map(b =>
            struct(lit(b).as("band"),
              shiftright(col("sig"), b * bandBits).bitwiseAND(mask).as("bh"))): _*)).as("x"))
        .select(col(idCol), col(embCol), col("x.band"), col("x.bh"))
    val q = banded(queries, "query_id", "qe")
    val c = banded(embeddings, "neighbor_id", "ce")
    val cand = q.join(c, Seq("band", "bh"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select("query_id", "neighbor_id", "qe", "ce")
      .dropDuplicates("query_id", "neighbor_id")
    val sims = cand.select(col("query_id"), col("neighbor_id"),
      round(cosine(col("qe"), col("ce")), 6).as("sim"))
    val w = Window.partitionBy("query_id").orderBy(col("sim").desc, col("neighbor_id"))
    sims.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }
}
