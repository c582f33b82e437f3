package graft.core

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Entity-level (span, type) P/R/F metrics — the reference's acceptance
  * metric (A7), an exact port of the vendored seqeval semantics:
  * `somenlp/NER/seqeval_custom/metrics/sequence_labeling.py` —
  * `get_entities` (:145-198), `end_of_chunk` (:214-236),
  * `start_of_chunk` (:239-273), `extract_tp_actual_correct` (:108-127).
  *
  * Round-1 shipped only a token-level stand-in; this is the reusable
  * span-set operator: per-class TP/FP/FN from set intersection of
  * (start, end) pairs per type, plus micro and support-weighted averages
  * (`extract_tp_actual_correct` + sklearn-style reduction).
  */
object SpanMetrics {

  /** seqeval `get_entities` for one tag sequence: supports the full IOBES
    * alphabet (B/I/E/S/O + typed `X-T` tags); returns (type, start, end)
    * with INCLUSIVE token offsets, exactly like the reference (e.g.
    * ['B-PER','I-PER','O','B-LOC'] → [(PER,0,1), (LOC,3,3)]).
    */
  def getEntities(seq: Seq[String]): Seq[(String, Int, Int)] = {
    var prevTag = "O"
    var prevType = ""
    var begin = 0
    val chunks = Vector.newBuilder[(String, Int, Int)]
    val padded = seq :+ "O"
    var i = 0
    while (i < padded.length) {
      val chunk = padded(i)
      val tag = chunk.substring(0, 1)
      val typ = {
        val rest = chunk.drop(1)
        val t = rest.split("-", 2) // seqeval: chunk[1:].split('-', maxsplit=1)[-1]
        val last = t(t.length - 1)
        if (last.isEmpty) "_" else last
      }
      if (endOfChunk(prevTag, tag, prevType, typ)) chunks += ((prevType, begin, i - 1))
      if (startOfChunk(prevTag, tag, prevType, typ)) begin = i
      prevTag = tag
      prevType = typ
      i += 1
    }
    chunks.result()
  }

  /** seqeval `end_of_chunk` verbatim. */
  def endOfChunk(prevTag: String, tag: String, prevType: String, typ: String): Boolean =
    prevTag == "E" || prevTag == "S" ||
      (prevTag == "B" && (tag == "B" || tag == "S" || tag == "O")) ||
      (prevTag == "I" && (tag == "B" || tag == "S" || tag == "O")) ||
      (prevTag != "O" && prevTag != "." && prevType != typ)

  /** seqeval `start_of_chunk` verbatim. */
  def startOfChunk(prevTag: String, tag: String, prevType: String, typ: String): Boolean =
    tag == "B" || tag == "S" ||
      (prevTag == "E" && (tag == "E" || tag == "I")) ||
      (prevTag == "S" && (tag == "E" || tag == "I")) ||
      (prevTag == "O" && (tag == "E" || tag == "I")) ||
      (tag != "O" && tag != "." && prevType != typ)

  /** Per-class span-set P/R/F over distributed span tables.
    *
    * `pred`/`gold`: any DataFrame carrying the span identity columns —
    * for NER spans (doc, beg, end), for triples (conv, turn, subj, obj) —
    * plus the class column. Rows are compared as SETS per
    * (identity, class), mirroring `extract_tp_actual_correct`'s
    * `entities_true[type] & entities_pred[type]`. The join is a full outer
    * on the identity — one shuffle on compact keys, no driver collection;
    * classes appearing in either side are reported (target_names = union).
    *
    * Output: (class, tp, fp, fn, precision, recall, f1) rounded to 4.
    */
  def prfByClass(pred: DataFrame, gold: DataFrame, identityCols: Seq[String],
      labelCol: String = "label"): DataFrame = {
    val keys = identityCols :+ labelCol
    val p = pred.select(keys.map(col): _*).distinct().withColumn("p", lit(1))
    val g = gold.select(keys.map(col): _*).distinct().withColumn("g", lit(1))
    val j = p.join(g, keys, "full")
    j.groupBy(col(labelCol).as("class"))
      .agg(
        sum(when(col("p").isNotNull && col("g").isNotNull, 1).otherwise(0)).as("tp"),
        sum(when(col("p").isNotNull && col("g").isNull, 1).otherwise(0)).as("fp"),
        sum(when(col("p").isNull && col("g").isNotNull, 1).otherwise(0)).as("fn"))
      .withColumn("precision",
        when(col("tp") + col("fp") > 0, round(col("tp") / (col("tp") + col("fp")), 4)).otherwise(0.0))
      .withColumn("recall",
        when(col("tp") + col("fn") > 0, round(col("tp") / (col("tp") + col("fn")), 4)).otherwise(0.0))
      .withColumn("f1",
        when(col("tp") * 2 + col("fp") + col("fn") > 0,
          round(col("tp") * 2 / (col("tp") * 2 + col("fp") + col("fn")), 4)).otherwise(0.0))
  }

  /** Micro-averaged (P, R, F1) — the reference's headline number
    * (`average='micro'`, trainer.py:24-47); zero_division → 0.
    */
  def prfMicro(pred: DataFrame, gold: DataFrame, identityCols: Seq[String],
      labelCol: String = "label"): (Double, Double, Double) = {
    val per = prfByClass(pred, gold, identityCols, labelCol)
      .agg(coalesce(sum("tp"), lit(0L)).as("tp"),
        coalesce(sum("fp"), lit(0L)).as("fp"),
        coalesce(sum("fn"), lit(0L)).as("fn")).collect()(0)
    // coalesce: sum over ZERO classes (both sides empty) is null, and the
    // zero_division→0 contract must hold there too, not NPE
    val tp = per.getLong(0).toDouble
    val fp = per.getLong(1).toDouble
    val fn = per.getLong(2).toDouble
    val p = if (tp + fp > 0) tp / (tp + fp) else 0.0
    val r = if (tp + fn > 0) tp / (tp + fn) else 0.0
    val f = if (2 * tp + fp + fn > 0) 2 * tp / (2 * tp + fp + fn) else 0.0
    (p, r, f)
  }
}
