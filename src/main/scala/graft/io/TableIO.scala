package graft.io

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Iceberg-shaped table I/O facade (SURVEY.md §7.0). The Iceberg runtime
  * jar is not present in this environment (offline resolver), so the
  * snapshot semantics the pipeline relies on are provided over plain
  * Parquet with an Iceberg-like layout:
  *
  * {{{
  *   <base>/snapshot=<n>/...          committed data files (partitioned)
  *   <base>/_current                  pointer file: the committed snapshot n
  * }}}
  *
  * Writes are ATOMIC at snapshot granularity: data lands in a new
  * `snapshot=<n+1>` directory first, the `_current` pointer flips last (a
  * reader never observes a half-written snapshot — same contract as an
  * Iceberg commit). Readers resolve `_current` and read one snapshot;
  * previous snapshots stay for time travel until vacuumed. When the
  * Iceberg runtime is on the classpath the same call sites bind to
  * `df.writeTo(table).createOrReplace()` — only this facade changes.
  */
object TableIO {

  private def currentPath(base: String) = Paths.get(base, "_current")

  /** The committed snapshot id, or -1 if none. */
  def currentSnapshot(base: String): Long = {
    val p = currentPath(base)
    if (Files.exists(p)) new String(Files.readAllBytes(p), StandardCharsets.UTF_8).trim.toLong
    else -1L
  }

  /** Commit `df` as the next snapshot; returns the new snapshot id.
    * `partitionBy` columns become directory partitions (partition pruning
    * applies on read).
    */
  def writeSnapshot(df: DataFrame, base: String, partitionBy: Seq[String] = Nil): Long = {
    val next = currentSnapshot(base) + 1
    val dir = s"$base/snapshot=$next"
    val w = df.write.mode("overwrite")
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).parquet(dir)
    // pointer flip is the commit point
    Files.createDirectories(Paths.get(base))
    Files.write(currentPath(base), next.toString.getBytes(StandardCharsets.UTF_8))
    next
  }

  /** Read the current committed snapshot (throws if none committed). */
  def read(spark: SparkSession, base: String): DataFrame = {
    val cur = currentSnapshot(base)
    require(cur >= 0, s"no committed snapshot under $base")
    readSnapshot(spark, base, cur)
  }

  /** Time travel: read a specific snapshot. */
  def readSnapshot(spark: SparkSession, base: String, snapshot: Long): DataFrame =
    spark.read.parquet(s"$base/snapshot=$snapshot")

  /** Drop all snapshots older than the current one (vacuum). */
  def vacuum(base: String): Unit = {
    val cur = currentSnapshot(base)
    val d = Paths.get(base)
    if (!Files.exists(d)) return
    val ls = Files.list(d)
    try {
      ls.forEach { p =>
        val name = p.getFileName.toString
        if (name.startsWith("snapshot=") && name.stripPrefix("snapshot=").toLong < cur) {
          val walk = Files.walk(p)
          try walk.sorted(java.util.Comparator.reverseOrder()).forEach(f => Files.delete(f))
          finally walk.close()
        }
      }
    } finally ls.close()
  }
}
