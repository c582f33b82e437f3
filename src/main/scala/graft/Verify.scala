package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // reap reliable-checkpoint files as their RDDs are GC'd (VERDICT r04 #5)
      .config("spark.cleaner.referenceTracking.cleanCheckpoints", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // Cache the shared fixture tables ONCE, outside the per-query loop:
    // every query that builds the same `spark.read.parquet(path)` plan gets
    // a cache hit via plan canonicalization instead of re-scanning the
    // files for each of the 48 queries. Lazy marks — a table used by no
    // query costs nothing.
    val fixtures = Option(new java.io.File(sfDir).listFiles()).getOrElse(Array.empty)
      .filter(f => f.getName.endsWith(".parquet"))
      .map(f => spark.read.parquet(f.getPath).cache())
    SparkEntry.queries.foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case scala.util.control.NonFatal(e) =>
        // fatal JVM errors (OOM, LinkageError) must PROPAGATE: continuing 48
        // more queries in a heap-exhausted JVM produces garbage parquet the
        // oracle compare then blames on engine correctness (round-5 review)
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
      // the KG queries persist pipeline intermediates for their own
      // multi-consumer plans; once a query's result is on disk those blocks
      // are dead weight. Release exactly those (not clearCache(), which
      // would also evict the fixture tables above — ADVICE r04) so 48
      // queries' caches don't pile up into LRU churn at larger SFs.
      graft.pipeline.Pipeline.releaseAll()
    }
    fixtures.foreach(_.unpersist())
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
