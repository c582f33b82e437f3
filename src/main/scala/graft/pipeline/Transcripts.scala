package graft.pipeline

import graft.core.Turn
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Transcript-table sources (the `input_hint` shape:
  * conv_id string, turn_idx int, role string, text string, tool string,
  * ts timestamp). Three deterministic sources: a literal golden fixture
  * mirroring `data/minimal_example/` (FIXTURES.md §1), a seeded synthetic
  * generator with a Zipf-skewed software vocabulary for benchmarks, and a
  * derivation from the driver's `documents.parquet` so DuckDB oracles can
  * reproduce the exact same table.
  */
object Transcripts {

  val Epoch = java.sql.Timestamp.valueOf("2025-01-01 00:00:00")

  private def ts(seconds: Long): java.sql.Timestamp =
    new java.sql.Timestamp(Epoch.getTime + seconds * 1000L)

  /** Golden fixture: 2 conversations mirroring the reference's minimal
    * example (`10.1371_journal.pone.0147923.txt`: "All analyses were
    * performed using Stata 13.1 software [30].").
    */
  def fixture(spark: SparkSession): Dataset[Turn] = {
    import spark.implicits._
    val rows = Seq(
      Turn("c1", 0, "user", "Which tool should I use for the regression ?", null, ts(0)),
      Turn("c1", 1, "assistant", "All analyses were performed using Stata 13.1 software [ 30 ] .", null, ts(1)),
      Turn("c1", 2, "assistant", "Data were entered into Excel ( Microsoft Corp. , Redmond ) for cleaning .", null, ts(2)),
      Turn("c1", 3, "tool", "SPSS ( IBM Corp. ) version 21.0 was used for the survival analysis .", "stats", ts(3)),
      Turn("c1", 4, "user", "Thanks , that matches the methods section .", null, ts(4)),
      Turn("c2", 0, "user", "The preprocessing ran in MATLAB with the EEGLAB toolbox for MATLAB .", null, ts(10)),
      Turn("c2", 1, "assistant", "Statistical analyses were performed using STATA and the results exported .", null, ts(11)),
      Turn("c2", 2, "assistant", "We also used the Statistical Package for the Social Sciences [ 12 ] .", null, ts(12)),
      Turn("c2", 3, "tool", "Figures were produced with GraphPad Prism version 5 under Windows .", "plot", ts(13)),
      Turn("c2", 4, "assistant", "Scripts are written in Python 3.8.2 , available at www.example.org/code .", null, ts(14)))
    spark.createDataset(rows)
  }

  /** Seeded synthetic transcripts at arbitrary scale. Pure function of
    * (conv, turn) via splitmix64 — no RNG state, identical under any
    * partitioning (required for resume byte-identity and the scaling bench).
    * Software-name choice is Zipf-skewed so hot keys ("Python", "SPSS")
    * exercise the salting paths (FIXTURES.md §8 bench scale point).
    */
  def synthetic(spark: SparkSession, nConvs: Int, turnsPerConv: Int, seed: Long = 42L): Dataset[Turn] = {
    import spark.implicits._
    val software = Array("Python", "SPSS", "Stata", "MATLAB", "Excel", "SAS",
      "GraphPad Prism", "EEGLAB", "ImageJ", "FreeSurfer", "scikit-learn", "numpy")
    // zipf-ish cumulative weights ~ 1/rank (same arithmetic as rounds 1-5)
    val weights = software.indices.map(i => 1.0 / (i + 1))
    val cum: Array[Double] = weights.scanLeft(0.0)(_ + _).tail.map(_ / weights.sum).toArray
    val templates = Vector(
      (s: String) => s"All analyses were performed using $s software [ 7 ] .",
      (s: String) => s"Data were processed with $s version 2.1 for the main cohort .",
      (s: String) => s"We ran $s on the cluster and exported the tables .",
      (s: String) => s"Results were checked in $s ( IBM Corp. ) afterwards .",
      (s: String) => s"No software was mentioned in this turn at all .",
      (s: String) => s"$s was used for statistical analysis of the cohort .")
    val total = nConvs.toLong * turnsPerConv
    // 4 partitions per core (guide §2.6 stragglers): rows are a pure
    // function of id, so any partitioning yields identical data, and finer
    // tasks let the scheduler route around steal-slowed cores on this
    // shared host instead of waiting on cores-many monolithic tasks.
    // Scale-adaptive (derived from the session's parallelism, never a
    // constant), floored so tiny test corpora keep ≥1 row per partition.
    val slices = math.max(1, spark.sparkContext.defaultParallelism * 4)
    spark.range(0, total, 1, slices).mapPartitions { it =>
      it.map { id =>
        val conv = id / turnsPerConv
        val turn = (id % turnsPerConv).toInt
        var x = id * 0x9E3779B97F4A7C15L + seed
        def next(): Long = { x ^= x >>> 30; x *= 0xBF58476D1CE4E5B9L; x ^= x >>> 27; x *= 0x94D049BB133111EBL; x ^= x >>> 31; x }
        val u = (next() >>> 11).toDouble / (1L << 53).toDouble
        // first index with u <= cum(i), else 0 — identical to the old
        // `cum.indexWhere(u <= _) max 0`, without the boxed closure scan
        var si = 0
        while (si < cum.length && !(u <= cum(si))) si += 1
        val soft = software(if (si < cum.length) si else 0)
        val tpl = templates(((next() >>> 8) % templates.length).toInt)
        val role = turn % 3 match { case 0 => "user"; case 1 => "assistant"; case _ => "tool" }
        Turn(s"conv$conv", turn, role, tpl(soft), if (role == "tool") "search" else null, ts(id))
      }
    }
  }

  /** Derivation from the driver testdata `documents` table — defined so the
    * byte-identical table is constructible in DuckDB SQL (see
    * [[Transcripts.fromDocumentsSql]]). 10 turns per conversation.
    */
  /** The ONE doc→turn column derivation (conv_id/turn_idx/role/tool/ts
    * formulas). `textCol` is parameterized so callers can augment the text
    * (SparkEntry's `turns2` appends version markers) without re-mirroring
    * the other five columns — the hand-sync drift class the round-3 review
    * eliminated for the token CTE (round-5 review for the turn columns).
    */
  private[graft] def turnColumns(textCol: org.apache.spark.sql.Column): Seq[org.apache.spark.sql.Column] = Seq(
    concat(lit("c"), (col("doc_id") / 10).cast("long")).as("conv_id"),
    (col("doc_id") % 10).cast("int").as("turn_idx"),
    when(col("doc_id") % 3 === 0, "user")
      .when(col("doc_id") % 3 === 1, "assistant").otherwise("tool").as("role"),
    textCol.as("text"),
    when(col("doc_id") % 3 === 2, lit("search")).otherwise(lit(null).cast("string")).as("tool"),
    expr("timestampadd(SECOND, doc_id, TIMESTAMP '2025-01-01 00:00:00')").as("ts"))

  def fromDocuments(spark: SparkSession, sfDir: String): Dataset[Turn] = {
    import spark.implicits._
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select(turnColumns(col("text")): _*)
      .as[Turn]
  }

  /** The same derivation as ANSI SQL for the DuckDB oracle, with the text
    * expression parameterized for augmented variants (mirrors
    * [[turnColumns]]).
    */
  private[graft] def fromDocumentsSqlWith(textExpr: String): String =
    s"""SELECT 'c' || CAST(doc_id // 10 AS VARCHAR) AS conv_id,
       |       CAST(doc_id % 10 AS INT) AS turn_idx,
       |       CASE doc_id % 3 WHEN 0 THEN 'user' WHEN 1 THEN 'assistant' ELSE 'tool' END AS role,
       |       $textExpr AS text,
       |       CASE WHEN doc_id % 3 = 2 THEN 'search' ELSE NULL END AS tool,
       |       TIMESTAMP '2025-01-01 00:00:00' + doc_id * INTERVAL 1 SECOND AS ts
       |FROM documents""".stripMargin

  /** The same derivation as ANSI SQL for the DuckDB oracle. */
  def fromDocumentsSql: String = fromDocumentsSqlWith("text")
}
