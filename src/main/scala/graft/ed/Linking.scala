package graft.ed

import graft.core._
import org.apache.spark.sql.{Dataset, DataFrame}
import org.apache.spark.sql.functions._

/** Builds the deduplicated linking-sample set from mentions + relations —
  * the Spark-native ReducedSampleSet (SURVEY.md §2.4 A5/A6,
  * `efficient_prediction.py:42-96`): group mention occurrences by surface,
  * keep ≤5 contexts per unique surface, attach the attribute relations of
  * those contexts as scorer inputs.
  *
  * Determinism (SURVEY.md §7.4(2)): the reference's RNG reservoir
  * (`random.random() ≤ 1/occurrence`) is replaced by the first 5 contexts in
  * stable (conv_id, turn_idx, beg) order.
  *
  * Skew (north_rule): hot surfaces ("Python", "SPSS") would funnel every
  * occurrence into one window partition; the top-5 cap is therefore computed
  * in TWO phases over a salted key — per-(surface, salt) top-5 first (64-way
  * spread, partial-agg friendly), then top-5 of the ≤5·64 survivors. Sample
  * ids are `xxhash64(surface)`: deterministic, shuffle-free, collision-safe
  * at realistic vocabulary sizes.
  */
object Linking {

  val MaxContexts = 5 // efficient_prediction.py:87-95
  val SaltBuckets = 64

  /** Main-entity filter P4 (`bin/somesci_disambiguation_input:25,118-121`). */
  val MainTypePrefixes: Seq[String] =
    Seq("Application", "PlugIn", "OperatingSystem", "ProgrammingEnvironment", "Unknown")

  def isMainLabel(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    MainTypePrefixes.map(p => c.startsWith(p + "_")).reduce(_ || _)

  /** (surface → ≤5 contexts with their relations), as a typed sample set. */
  def samples(mentions: Dataset[Mention], relations: Dataset[Relation]): Dataset[LinkingSample] = {
    val spark = mentions.sparkSession
    import spark.implicits._

    val mains = mentions.filter(isMainLabel($"label"))

    // relations whose OBJECT is this mention occurrence → RelInfo(pred, subj)
    val rels = relations
      .groupBy($"conv_id", $"turn_idx", $"obj_beg")
      .agg(collect_list(struct($"pred".as("typ"), $"subj_surface".as("string"))).as("rels"))

    val ctx = mains
      .join(rels,
        mains("conv_id") === rels("conv_id") && mains("turn_idx") === rels("turn_idx") &&
          mains("beg") === rels("obj_beg"), "left")
      .select(mains("conv_id"), mains("turn_idx"), mains("beg"), mains("label"),
        mains("surface"), coalesce($"rels", array()).as("rels"))

    // two-phase deterministic top-5 per surface, salted against hot keys.
    // Phase 1 ranks within (surface, salt) — 64-way spread of a hot surface —
    // and KEEPS ONLY rank ≤ 5, so no aggregation state ever exceeds 5 rows
    // per group (a collect_list-then-slice would buffer every occurrence of
    // "Python"). Phase 2 ranks the ≤5·64 survivors per surface. Each phase-1
    // top-5 is a superset of the global top-5 restricted to its salt, so the
    // result equals the unsalted global top-5.
    val salted = ctx.withColumn("salt", pmod(xxhash64($"conv_id", $"turn_idx"), lit(SaltBuckets)))
    val w1 = org.apache.spark.sql.expressions.Window
      .partitionBy($"surface", $"salt").orderBy($"conv_id", $"turn_idx", $"beg")
    val w2 = org.apache.spark.sql.expressions.Window
      .partitionBy($"surface").orderBy($"conv_id", $"turn_idx", $"beg")
    val top = salted
      .withColumn("rn1", row_number().over(w1)).filter($"rn1" <= MaxContexts)
      .withColumn("rn2", row_number().over(w2)).filter($"rn2" <= MaxContexts)
    val phase2 = top
      .groupBy($"surface")
      .agg(array_sort(collect_list(struct($"conv_id", $"turn_idx", $"beg", $"label", $"rels")))
        .as("contexts"))

    phase2.select(
      xxhash64($"surface").as("sample_id"),
      $"contexts"(0)("conv_id").as("conv_id"),
      $"contexts"(0)("turn_idx").as("turn_idx"),
      $"contexts"(0)("beg").as("beg"),
      $"surface".as("mention"),
      $"surface".as("string"), // remove_spaces applied below in typed map
      $"surface".as("norm"),
      $"contexts"(0)("label").as("ent_type"),
      flatten($"contexts.rels").as("relations"))
      .as[LinkingSample]
      .map(s => s.copy(
        string = Normalize.removeSpaces(s.mention),
        norm = Normalize.normalize(s.mention)))
  }

  /** J9 canonical back-join: mention surface → component id. */
  def canonicalMap(samples: Dataset[LinkingSample], components: DataFrame): DataFrame = {
    val spark = samples.sparkSession
    import spark.implicits._
    samples.select($"mention", $"sample_id")
      .join(components, $"sample_id" === components("id"))
      .select($"mention", $"component".as("canonical"))
  }
}
