package graft.ed

import graft.core.{Component, Edge}
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Dataset-native connected components — the replacement for the reference's
  * driver-side union-find over the ascending distance list (SURVEY.md §2.9
  * G2, `efficient_prediction.py:319-359`). Single-linkage clustering at a
  * fixed threshold is order-independent, so union-find over `filter(dist ≤
  * thr)` edges ≡ connected components over the same edge set (§2.7 O2) —
  * the ascending sort + early termination of the reference is replaced by a
  * pre-filter.
  *
  * Algorithm: iterated "hash-min" label propagation (the dataframe form of
  * large-star; cf. Kiveris et al., "Connected Components in MapReduce and
  * Beyond", SoCC'14). Each vertex repeatedly adopts the minimum label in its
  * closed neighborhood; converges in O(diameter) rounds — tiny here because
  * similarity clusters are shallow. Each round is two shuffles on compact
  * (long,long) rows; the frontier is checkpointed via persist + count to
  * keep lineage flat (north_rule: CC must tolerate multi-round iteration).
  */
object ConnectedComponents {

  /** @param vertices all sample ids (isolated vertices keep their own id)
    * @param edges undirected similarity edges
    * @return (id, component) where component = min id reachable
    */
  def run(vertices: Dataset[java.lang.Long], edges: Dataset[Edge], maxIter: Int = 50): DataFrame = {
    val spark = vertices.sparkSession
    import spark.implicits._

    // symmetrize once; self-loops are harmless but dropped for size
    val sym = edges.select($"src", $"dst")
      .union(edges.select($"dst".as("src"), $"src".as("dst")))
      .filter($"src" =!= $"dst")
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)

    var labels = vertices.toDF("id").withColumn("component", $"id")
      .persist(StorageLevel.MEMORY_AND_DISK)
    labels.count()

    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      // candidate label per vertex = min(own, min over neighbors' labels)
      val nbrMin = sym.join(labels, sym("dst") === labels("id"))
        .groupBy(sym("src").as("id"))
        .agg(min($"component").as("nbr"))
      val next = labels.join(nbrMin, Seq("id"), "left")
        .select($"id", least($"component", coalesce($"nbr", $"component")).as("component"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      val changed = next.join(labels.withColumnRenamed("component", "old"), "id")
        .filter($"component" =!= $"old").limit(1).count()
      labels.unpersist(false)
      labels = next
      converged = changed == 0
      iter += 1
    }
    sym.unpersist(false)
    labels
  }

  /** Typed convenience. */
  def components(vertices: Dataset[java.lang.Long], edges: Dataset[Edge]): Dataset[Component] = {
    val spark = vertices.sparkSession
    import spark.implicits._
    run(vertices, edges).as[Component]
  }
}
