package graft.sources

import graft.core.{LinkingSample, Normalize, RelInfo}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** S7 — the reference's `.linking` JSON sample format
  * (`bin/somesci_disambiguation_input:35-57` emit,
  * `somenlp/entity_disambiguation/linking_data.py:30-47` load): one JSON
  * object per mention occurrence with
  * `{mention, sentence_id, paper_id, beg, end, ent_key, ent_type,
  * relations: [{type, string}], ...}`. Round-trip: `spark.read.json` in,
  * typed records out; [[toSamples]] re-keys them exactly like
  * `Linking.samples` does for detector output (string/norm recomputed from
  * the mention — the reference also recomputes them at load,
  * `linking_data.py:80-82`).
  */
object LinkingJson {

  final case class LinkingRecord(
      mention: String,
      sentence_id: Int,
      paper_id: String,
      beg: Int,
      end: Int,
      ent_key: String,
      ent_type: String,
      relations: Seq[RelInfo])

  /** Schema-checked JSON load (columns beyond the record shape pruned). */
  def read(spark: SparkSession, path: String): Dataset[LinkingRecord] = {
    import spark.implicits._
    spark.read.json(path)
      .select(
        col("mention").cast("string"),
        col("sentence_id").cast("int"),
        col("paper_id").cast("string"),
        col("beg").cast("int"),
        col("end").cast("int"),
        col("ent_key").cast("string"),
        col("ent_type").cast("string"),
        coalesce(
          expr("transform(relations, r -> struct(r.type AS typ, r.string AS string))"),
          array()).as("relations"))
      .as[LinkingRecord]
  }

  /** JSON emit in the reference field names (`type`, not `typ`). */
  def write(records: Dataset[LinkingRecord], path: String): Unit =
    records.toDF()
      .withColumn("relations",
        expr("transform(relations, r -> struct(r.typ AS type, r.string AS string))"))
      .write.mode("overwrite").json(path)

  /** Records → deduplicated LinkingSample set, the same keying AND the same
    * context/relations semantics as `Linking.samples`: sample_id =
    * xxhash64(mention); the first-ordered occurrence by
    * (paper_id, sentence_id, beg) supplies the context fields; relations are
    * aggregated ACROSS the bounded top-5 contexts, each context's relation
    * list sorted by (typ, string), concatenated in context order — the
    * fused path's `sort_array` + `flatten($"contexts.rels")` shape. (Round-5
    * review: taking relations from only the winning occurrence dropped any
    * relation annotated in a later context, so ED features diverged between
    * the JSON-loaded and fused paths on the same corpus.)
    */
  def toSamples(records: Dataset[LinkingRecord]): Dataset[LinkingSample] = {
    val spark = records.sparkSession
    import spark.implicits._
    val ord = Ordering.by[LinkingRecord, (String, Int, Int)](r => (r.paper_id, r.sentence_id, r.beg))
    val relOrd = Ordering.by[RelInfo, (String, String)](r => (r.typ, r.string))
    val k = graft.ed.Linking.MaxContexts
    records
      .groupByKey(_.mention)
      .mapGroups { (mention, it) =>
        // bounded fold: the buffer never exceeds k+1 records, so a hot
        // surface with millions of occurrences costs O(n·k), not O(n) memory
        var top = Vector.empty[LinkingRecord]
        it.foreach { r => top = (top :+ r).sorted(ord).take(k) }
        val first = top.head
        LinkingSample(
          sample_id = 0L, // filled below via xxhash64 for engine-identical keying
          conv_id = first.paper_id,
          turn_idx = first.sentence_id,
          beg = first.beg,
          mention = mention,
          string = Normalize.removeSpaces(mention),
          norm = Normalize.normalize(mention),
          ent_type = first.ent_type,
          relations = top.flatMap(r => r.relations.sorted(relOrd)))
      }
      .toDF()
      .withColumn("sample_id", xxhash64(col("mention")))
      .as[LinkingSample]
  }
}
