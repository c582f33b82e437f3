package graft.io

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Iceberg-shaped table I/O facade (SURVEY.md §7.0). The Iceberg runtime
  * jar is not present in this environment (offline resolver), so the
  * snapshot semantics the pipeline relies on are provided over plain
  * Parquet with an Iceberg-like layout:
  *
  * {{{
  *   <base>/snapshot=<n>/...          committed data files (partitioned)
  *   <base>/snapshot=<n>/_committed   write-complete marker (last file written)
  *   <base>/_current                  pointer file: the committed snapshot n
  * }}}
  *
  * Writes are ATOMIC at snapshot granularity: data lands in a new
  * `snapshot=<n+1>` directory first, then the `_committed` marker, and the
  * `_current` pointer flips LAST — via write-to-temp + `Files.move` with
  * `ATOMIC_MOVE`, so a reader never observes a half-written pointer either
  * (round 2 truncate-then-wrote the pointer in place: a crash mid-write or
  * a racing reader could see an empty file and wedge every subsequent
  * read/commit on the state dir — ADVICE r02). A corrupt or missing pointer
  * degrades to scanning for the highest snapshot directory whose
  * `_committed` marker exists (never a half-written one). Readers resolve
  * one snapshot; previous snapshots stay for time travel until vacuumed.
  * When the Iceberg runtime is on the classpath the same call sites bind to
  * `df.writeTo(table).createOrReplace()` — only this facade changes.
  *
  * [[writeSnapshotTables]] commits SEVERAL tables plus small metadata
  * markers under ONE snapshot id with ONE pointer flip — the multi-table
  * transaction the incremental streaming KG needs (its samples+components
  * state and the committed-batch watermark must move together; round 2
  * flipped two pointers separately, so a crash between them lost a batch's
  * edges — ADVICE r02).
  */
object TableIO {

  private def currentPath(base: String) = Paths.get(base, "_current")

  private def committedMarker(snapDir: String) = Paths.get(snapDir, "_committed")

  /** Highest snapshot id whose `_committed` marker exists, or -1. */
  private def scanCommitted(base: String): Long = {
    val d = Paths.get(base)
    if (!Files.exists(d)) return -1L
    val ls = Files.list(d)
    try ls.iterator().asScala
      .map(_.getFileName.toString)
      .filter(_.startsWith("snapshot="))
      .flatMap(n => n.stripPrefix("snapshot=").toLongOption)
      .filter(n => Files.exists(committedMarker(s"$base/snapshot=$n")))
      .foldLeft(-1L)(math.max)
    finally ls.close()
  }

  /** The committed snapshot id, or -1 if none. A corrupt/empty/missing
    * pointer falls back to the highest `_committed` snapshot directory.
    */
  def currentSnapshot(base: String): Long = {
    val p = currentPath(base)
    if (!Files.exists(p)) return scanCommitted(base)
    new String(Files.readAllBytes(p), StandardCharsets.UTF_8).trim.toLongOption
      .getOrElse(scanCommitted(base))
  }

  /** The commit point: pointer written to a temp file in the same directory,
    * then atomically moved over `_current`.
    */
  private def flipPointer(base: String, next: Long): Unit = {
    Files.createDirectories(Paths.get(base))
    val tmp = Files.createTempFile(Paths.get(base), "_current", ".tmp")
    Files.write(tmp, next.toString.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, currentPath(base),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
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
    Files.write(committedMarker(dir), Array.emptyByteArray)
    flipPointer(base, next)
    next
  }

  /** Commit several tables + small string markers as ONE snapshot (single
    * pointer flip = single commit point). Layout:
    * `<base>/snapshot=<n>/<tableName>/...` and `<base>/snapshot=<n>/<markerName>`.
    */
  def writeSnapshotTables(base: String, tables: Seq[(String, DataFrame)],
      markers: Map[String, String] = Map.empty): Long = {
    val next = currentSnapshot(base) + 1
    val dir = s"$base/snapshot=$next"
    tables.foreach { case (name, df) =>
      df.write.mode("overwrite").parquet(s"$dir/$name")
    }
    markers.foreach { case (name, v) =>
      Files.write(Paths.get(dir, name), v.getBytes(StandardCharsets.UTF_8))
    }
    Files.write(committedMarker(dir), Array.emptyByteArray)
    flipPointer(base, next)
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

  /** Read one table of the current multi-table snapshot. */
  def readTable(spark: SparkSession, base: String, table: String): DataFrame = {
    val cur = currentSnapshot(base)
    require(cur >= 0, s"no committed snapshot under $base")
    spark.read.parquet(s"$base/snapshot=$cur/$table")
  }

  /** A marker committed with the current snapshot, or None. */
  def marker(base: String, name: String): Option[String] = {
    val cur = currentSnapshot(base)
    if (cur < 0) None
    else {
      val p = Paths.get(s"$base/snapshot=$cur", name)
      if (Files.exists(p)) Some(new String(Files.readAllBytes(p), StandardCharsets.UTF_8).trim)
      else None
    }
  }

  /** Bucketed materialization for CO-LOCATED joins (north_rule partitioning
    * discipline): both sides of a recurring equi-join written with the same
    * bucket count on the join key join WITHOUT any shuffle — the
    * physical plan has no Exchange on either input (asserted in
    * BucketedJoinSpec). This is the storage-level answer for joins that
    * repeat across runs (e.g. samples ⋈ edges, canonical back-joins): pay
    * the bucketing once at write, skip the shuffle every read. Uses the
    * session catalog (`saveAsTable` — bucket metadata has no pure-path
    * form); bucket files are plain parquet under the warehouse dir.
    */
  def writeBucketed(df: DataFrame, table: String, bucketCols: Seq[String],
      nBuckets: Int): Unit = {
    require(bucketCols.nonEmpty)
    df.write.mode("overwrite").format("parquet")
      .bucketBy(nBuckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .saveAsTable(table)
  }

  /** Drop all snapshots older than the current one (vacuum). */
  def vacuum(base: String): Unit = {
    val cur = currentSnapshot(base)
    val d = Paths.get(base)
    if (!Files.exists(d)) return
    val ls = Files.list(d)
    try {
      ls.forEach { p =>
        val name = p.getFileName.toString
        // toLongOption: a stray non-numeric snapshot=* entry (manual backup)
        // is skipped here exactly as the read paths skip it — a throwing
        // vacuum would silently stop ALL retention cleanup
        if (name.startsWith("snapshot=") &&
            name.stripPrefix("snapshot=").toLongOption.exists(_ < cur)) {
          val walk = Files.walk(p)
          try walk.sorted(java.util.Comparator.reverseOrder()).forEach((f: Path) => Files.delete(f))
          finally walk.close()
        }
      }
    } finally ls.close()
  }
}
