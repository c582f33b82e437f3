package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scalable global dense ranking (A1 vocabulary ids, SURVEY.md §2.4).
  *
  * `row_number() OVER (ORDER BY key)` with no partition funnels every row
  * through ONE task — a 10⁸-token vocabulary serializes on one core
  * (round-1 shipped exactly that; VERDICT r01 "What's wrong" #4). The
  * scalable shape is the classic two-phase rank:
  *
  *   1. range-partition by the key (parallel shuffle; partition p holds a
  *      contiguous key range, all ranges ordered by p), materialize once
  *      (`localCheckpoint` — pins partition identity for phase 2),
  *   2. per-partition counts → driver prefix sums (#partitions rows — tiny),
  *   3. rank within each partition in parallel + broadcast offset of its
  *      partition.
  *
  * Requires a strictly unique key (ties would make "dense global rank"
  * ill-defined across partition boundaries anyway).
  */
object Ranking {

  /** (all original columns, idName = 1-based contiguous rank by orderCol). */
  def denseIds(df: DataFrame, orderCol: String, idName: String): DataFrame = {
    val parted = df
      .repartitionByRange(col(orderCol))
      .localCheckpoint(true)
      .withColumn("__pid", spark_partition_id())
    val counts = parted.groupBy(col("__pid")).agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    val offsets: Map[Int, Long] = {
      var acc = 0L
      counts.map { case (pid, n) => val o = pid -> acc; acc += n; o }.toMap
    }
    // map literal, not a chained CASE: stays O(1) at thousands of partitions
    val offExpr = coalesce(
      element_at(typedLit(offsets), col("__pid")), lit(0L))
    val w = Window.partitionBy(col("__pid")).orderBy(col(orderCol))
    // LONG ids: the module's motivating size is a 10⁸+ vocabulary and the
    // global rank exceeds Int.MaxValue past 2^31 rows — an int cast would
    // fault under ANSI (or wrap silently without it)
    parted
      .withColumn(idName, row_number().over(w).cast("long") + offExpr)
      .drop("__pid")
  }
}
