package graft

import org.apache.spark.sql.SparkSession

/** One shared local SparkSession across all suites (Test / fork := true →
  * single JVM per test run).
  */
object SparkTestSession {
  lazy val spark: SparkSession = {
    val warehouse = java.nio.file.Files.createTempDirectory("graft-warehouse").toString
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.cleaner.referenceTracking.cleanCheckpoints", "true")
      .config("spark.sql.warehouse.dir", warehouse) // bucketed saveAsTable lands in tmp
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
