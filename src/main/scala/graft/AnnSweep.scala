package graft

import graft.ops.SimilaritySearch
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Reproducible (nPlanes, nBands, multiProbe) → recall/latency sweep for
  * the LSH ANN path (VERDICT r03 next-round #4). Prints one line per
  * configuration; the committed table lives in docs/EXPLAIN.md.
  *
  * Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.01 sbt "runMain graft.AnnSweep"
  */
object AnnSweep {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")}]")
      .appName("graft-ann-sweep")
      .config("spark.sql.shuffle.partitions", 16)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.cleaner.referenceTracking.cleanCheckpoints", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet").cache()
    val n = emb.count()
    val q = emb.filter(col("vec_id") < 100).cache()
    q.count()
    val exact = SimilaritySearch.bruteForceTopK(emb, q, k = 5).cache()
    exact.count()
    println(s"ANN_SWEEP corpus=$n queries=100 k=5 sf=$sfDir")
    val grid = for {
      (np, nb) <- Seq((8, 4), (16, 4), (16, 8), (24, 4), (24, 8), (32, 4), (32, 8))
      mp <- Seq(false, true)
    } yield (np, nb, mp)
    grid.foreach { case (np, nb, mp) =>
      val warm = SimilaritySearch.lshTopK(emb, q, k = 5, nPlanes = np, nBands = nb,
        multiProbe = mp)
      warm.count() // JIT/codegen warm-up
      val t0 = System.nanoTime()
      val approx = SimilaritySearch.lshTopK(emb, q, k = 5, nPlanes = np, nBands = nb,
        multiProbe = mp).cache()
      approx.count()
      val sec = (System.nanoTime() - t0) / 1e9
      val recall = SimilaritySearch.recallAtK(approx, exact)
      approx.unpersist()
      println(f"ANN_SWEEP nPlanes=$np%2d nBands=$nb%2d multiProbe=$mp%-5s " +
        f"recall@5=$recall%.4f latency=$sec%.2fs")
    }
    spark.stop()
  }
}
