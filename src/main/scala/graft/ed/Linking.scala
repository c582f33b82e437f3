package graft.ed

import graft.core._
import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
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
  * Scale/skew (north_rule): the top-5 selection runs as a typed
  * [[TopKContexts]] Aggregator whose buffer is CAPPED at 5 rows — partial
  * (map-side) aggregation reduces every partition's occurrences of a hot
  * surface ("Python" at 10⁹ rows) to 5 before anything shuffles, so the
  * shuffle volume is O(#unique surfaces × tasks), independent of corpus
  * size. Relations are joined only for the ≤5 chosen contexts per surface,
  * never for the full mention stream. Sample ids are `xxhash64(surface)`:
  * deterministic, shuffle-free, collision-safe at realistic vocabularies.
  */
object Linking {

  val MaxContexts = 5 // efficient_prediction.py:87-95

  /** Main-entity filter P4 (`bin/somesci_disambiguation_input:25,118-121`). */
  val MainTypePrefixes: Seq[String] =
    Seq("Application", "PlugIn", "OperatingSystem", "ProgrammingEnvironment", "Unknown")

  def isMainLabel(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    MainTypePrefixes.map(p => c.startsWith(p + "_")).reduce(_ || _)

  /** One mention occurrence candidate-context (pre-relations). */
  final case class Ctx(conv_id: String, turn_idx: Int, beg: Int, label: String)

  /** Bounded top-k by (conv_id, turn_idx, beg) — the buffer never exceeds
    * k elements, so partial aggregation keeps hot keys cheap.
    *
    * The buffer is maintained SORTED so `reduce` is a bounded insertion:
    * on a hot surface ("Python" at 10⁹ occurrences) almost every row
    * compares once against the current k-th element and returns the buffer
    * unchanged, zero allocation — round 5 re-sorted a freshly-built Seq on
    * EVERY input row (~10 allocations/row on the full mention stream;
    * guide §1.2). Equality with the sort-take form is property-pinned in
    * Round6Spec.
    */
  /** Aggregator input: (surface, conv_id, turn_idx, beg, label) — a flat
    * narrow tuple rather than a pre-built Ctx, so the zero-allocation
    * fast path below never constructs an object for rows that don't make
    * the top k (round 6; the surface rides along because groupByKey keys
    * on it).
    */
  type CtxRow = (String, String, Int, Int, String)

  final class TopKContexts(k: Int) extends Aggregator[CtxRow, Seq[Ctx], Seq[Ctx]] {
    // label participates in the order: two mention rows tied on
    // (conv_id, turn_idx, beg) but carrying different labels (possible via
    // BRAT-sourced or other external mention tables) must be kept/dropped
    // deterministically, and this matches the downstream
    // array_sort(struct(conv_id, turn_idx, beg, label, ...)) whole-struct
    // ordering (round-5 review)
    private def cmp(a: Ctx, b: Ctx): Int = {
      var c = a.conv_id.compareTo(b.conv_id)
      if (c != 0) return c
      c = Integer.compare(a.turn_idx, b.turn_idx)
      if (c != 0) return c
      c = Integer.compare(a.beg, b.beg)
      if (c != 0) return c
      a.label.compareTo(b.label)
    }
    private def cmpRow(a: CtxRow, b: Ctx): Int = {
      var c = a._2.compareTo(b.conv_id)
      if (c != 0) return c
      c = Integer.compare(a._3, b.turn_idx)
      if (c != 0) return c
      c = Integer.compare(a._4, b.beg)
      if (c != 0) return c
      a._5.compareTo(b.label)
    }
    /** Insert `c` into sorted `b`, capped at k; ties keep existing elements
      * first (= stable sortBy of `b :+ c`). No-op fast path when the buffer
      * is full and `c` sorts at or past the k-th element.
      */
    private def insert(b: Seq[Ctx], c: Ctx): Seq[Ctx] = {
      val sz = b.length
      if (sz >= k && (sz == 0 || cmp(c, b(sz - 1)) >= 0)) return b // full (or k<=0) fast path
      val out = Vector.newBuilder[Ctx]
      var i = 0
      var placed = false
      var outLen = 0
      while (i < sz && outLen < k) {
        if (!placed && cmp(c, b(i)) < 0) { out += c; placed = true; outLen += 1 }
        else { out += b(i); i += 1; outLen += 1 }
      }
      if (!placed && outLen < k) out += c
      out.result()
    }
    override def zero: Seq[Ctx] = Vector.empty
    override def reduce(b: Seq[Ctx], a: CtxRow): Seq[Ctx] = {
      // no-object fast path for the hot-key case: compare the raw tuple
      // against the k-th element before ever building a Ctx
      if (b.length >= k && (b.isEmpty || cmpRow(a, b(b.length - 1)) >= 0)) b
      else insert(b, Ctx(a._2, a._3, a._4, a._5))
    }
    override def merge(b1: Seq[Ctx], b2: Seq[Ctx]): Seq[Ctx] = {
      // merge two sorted capped buffers; ties take b1's elements first
      // (= stable sortBy of b1 ++ b2)
      val out = Vector.newBuilder[Ctx]
      var i = 0
      var j = 0
      var outLen = 0
      while (outLen < k && (i < b1.length || j < b2.length)) {
        val takeB2 = i >= b1.length || (j < b2.length && cmp(b2(j), b1(i)) < 0)
        if (takeB2) { out += b2(j); j += 1 } else { out += b1(i); i += 1 }
        outLen += 1
      }
      out.result()
    }
    override def finish(r: Seq[Ctx]): Seq[Ctx] = r
    override def bufferEncoder: Encoder[Seq[Ctx]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Ctx]]()
    override def outputEncoder: Encoder[Seq[Ctx]] = bufferEncoder
  }

  /** (surface → ≤5 contexts with their relations), as a typed sample set. */
  def samples(mentions: Dataset[Mention], relations: Dataset[Relation]): Dataset[LinkingSample] = {
    val spark = mentions.sparkSession
    import spark.implicits._

    val mains = mentions.filter(isMainLabel($"label"))

    // bounded top-5 contexts per surface (map-side partial agg — see
    // scaladoc). The agg input is a NARROW column selection, not a typed
    // map over full Mention objects: one fewer object-boundary round trip
    // per mention row, and the unused mention_id/end columns never
    // deserialize (round 6, guide §2.3 "project before the exchange")
    implicit val ctxSeqEnc: Encoder[Seq[Ctx]] = org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
    val topk = new TopKContexts(MaxContexts).toColumn
    val chosen = mains
      .select($"surface", $"conv_id", $"turn_idx", $"beg", $"label")
      .as[CtxRow]
      .groupByKey(_._1)
      .agg(topk.name("contexts"))
      .toDF("surface", "contexts")

    // relations of JUST the chosen contexts (≤5 per surface): explode, join
    // the (small) context keys against the relation table, re-group.
    val ctxRows = chosen.select($"surface", explode($"contexts").as("c"))
      .select($"surface", $"c.conv_id", $"c.turn_idx", $"c.beg", $"c.label")
    // semi-join BEFORE the aggregate: only relation rows matching one of
    // the <=5 chosen contexts per surface survive the later join, so
    // collect_list-ing the whole corpus-scale relation table first shuffles
    // dead data (Catalyst cannot push the join below the aggregate —
    // round-5 review; the scaladoc's "relations of JUST the chosen
    // contexts" now matches the plan)
    val rels = relations
      .join(ctxRows.select($"conv_id", $"turn_idx", $"beg".as("obj_beg")),
        Seq("conv_id", "turn_idx", "obj_beg"), "left_semi")
      .groupBy($"conv_id", $"turn_idx", $"obj_beg")
      .agg(sort_array(collect_list(struct($"pred".as("typ"), $"subj_surface".as("string"))))
        .as("rels"))
    val withRels = ctxRows
      .join(rels,
        ctxRows("conv_id") === rels("conv_id") && ctxRows("turn_idx") === rels("turn_idx") &&
          ctxRows("beg") === rels("obj_beg"), "left")
      .select(ctxRows("surface"), ctxRows("conv_id"), ctxRows("turn_idx"), ctxRows("beg"),
        ctxRows("label"), coalesce($"rels", array()).as("rels"))

    val grouped = withRels
      .groupBy($"surface")
      .agg(array_sort(collect_list(struct($"conv_id", $"turn_idx", $"beg", $"label", $"rels")))
        .as("contexts")) // ≤5 rows per group — bounded

    grouped.select(
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

  /** Audit for sample_id = xxhash64(surface) collisions: distinct surfaces
    * sharing one id. The 64-bit birthday bound gives ~3% probability of ≥1
    * collision at 10⁹ unique surfaces — run once when onboarding a corpus
    * at that scale; a nonzero count means switching the key to 128 bits
    * (pair of seeded xxhash64 columns). Below 10⁸ surfaces the bound is
    * <0.03% and the check is skippable.
    */
  def sampleIdCollisions(samples: Dataset[LinkingSample]): Long = {
    val spark = samples.sparkSession
    import spark.implicits._
    samples.groupBy($"sample_id").agg(countDistinct($"mention").as("n"))
      .filter($"n" > 1).count()
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
