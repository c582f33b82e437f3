package graft
import org.apache.spark.sql.SparkSession
object EntrySmoke {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      // reap each reliable-checkpoint's files once its RDD is GC'd — a
      // long-running app otherwise accumulates every CC round's files for
      // its whole life (Reliably scaladoc; VERDICT r04 #5)
      .config("spark.cleaner.referenceTracking.cleanCheckpoints", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val n = SparkEntry.entry(s).count()
    println(s"ENTRY_ROWS=$n")
    s.stop()
  }
}
