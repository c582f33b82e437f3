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

  /** Records → deduplicated LinkingSample set, the same keying as
    * `Linking.samples` (sample_id = xxhash64(mention); first occurrence by
    * (paper_id, sentence_id, beg) wins the context slot; relations from the
    * winning occurrence).
    */
  def toSamples(records: Dataset[LinkingRecord]): Dataset[LinkingSample] = {
    val spark = records.sparkSession
    import spark.implicits._
    records
      .groupByKey(_.mention)
      .reduceGroups((a, b) =>
        if (Ordering.Tuple3(Ordering.String, Ordering.Int, Ordering.Int)
          .lteq((a.paper_id, a.sentence_id, a.beg), (b.paper_id, b.sentence_id, b.beg))) a else b)
      .map { case (mention, r) =>
        LinkingSample(
          sample_id = 0L, // filled below via xxhash64 for engine-identical keying
          conv_id = r.paper_id,
          turn_idx = r.sentence_id,
          beg = r.beg,
          mention = mention,
          string = Normalize.removeSpaces(mention),
          norm = Normalize.normalize(mention),
          ent_type = r.ent_type,
          relations = r.relations)
      }
      .toDF()
      .withColumn("sample_id", xxhash64(col("mention")))
      .as[LinkingSample]
  }
}
