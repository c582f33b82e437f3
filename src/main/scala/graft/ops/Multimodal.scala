package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads ride as opaque
  * `binary` columns with typed metadata structs; decode / feature-extract /
  * resize / frame-sample run as partition-batched functions over the binary
  * column.
  *
  * The actual media codecs are NOT available in this environment, so the
  * decode kernel is a clearly-marked deterministic STUB (`fakeDecode`) — it
  * parses "pixels" from the byte stream by arithmetic. Everything around it
  * is real and tested: the schema contract, the batch shape (mapPartitions
  * over iterators, never row-at-a-time JNI), partitioning (binary payloads
  * never shuffle — metadata-only projections are pushed before any join),
  * and the sink layout.
  */
object Multimodal {

  final case class MediaMeta(width: Int, height: Int, channels: Int, format: String)
  final case class Decoded(doc_id: Long, meta: MediaMeta, luma_mean: Double, n_bytes: Long)

  /** Synthesize a binary media column from a text corpus (deterministic:
    * UTF-8 bytes stand in for an encoded payload).
    */
  def synthesizeBinary(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))

  /** Metadata-only projection — at scale this is the column you join/filter
    * on; the binary column is pruned away by Catalyst (verify with
    * `.explain`: ReadSchema must not contain `payload` when only meta is
    * selected downstream).
    */
  def meta(media: DataFrame): DataFrame =
    media.select(col("doc_id"),
      length(col("payload")).as("n_bytes"),
      // STUB dimensions: derived arithmetically from the payload length the
      // way a header parse would; replace with a real codec header read.
      (length(col("payload")) % 640 + 1).as("width"),
      (length(col("payload")) % 480 + 1).as("height"),
      lit(3).as("channels"),
      lit("fake/raw").as("format"))

  /** Partition-batched decode + feature extraction. The per-batch shape is
    * the real contract (iterator in, iterator out, codec context reused per
    * partition); `fakeDecode` is the stub kernel.
    */
  def decodeFeatures(media: DataFrame): Dataset[Decoded] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition "codec" init happens here, once, not per row
        it.map { case (id, payload) => fakeDecode(id, payload) }
      }
  }

  /** STUB decode kernel — deterministic fake of an image decode: byte mean
    * as luma, dimensions from length. Replace with the real codec call; the
    * signature (one payload in, one Decoded out) is the stable contract.
    * The mean is quantized with INTEGER math — floor(sum·10⁴ / len) / 10⁴ —
    * so any engine (the DuckDB oracle included) reproduces it exactly; a
    * float `round()` would diverge on .5-boundary rationals.
    */
  def fakeDecode(id: Long, payload: Array[Byte]): Decoded = {
    var sum = 0L
    var i = 0
    while (i < payload.length) { sum += payload(i) & 0xFF; i += 1 }
    val mean = if (payload.length == 0) 0.0
      else (sum * 10000L / payload.length).toDouble / 10000.0
    Decoded(id,
      MediaMeta(payload.length % 640 + 1, payload.length % 480 + 1, 3, "fake/raw"),
      mean, payload.length.toLong)
  }

  /** Deterministic frame sampling plan for a "video" payload: every k-th
    * byte-block index — the plan (not pixels) is what schedulers shuffle.
    * Empty payloads contribute ZERO frames (without the filter,
    * sequence(0, floor(-1/k)) = sequence(0,-1) would DESCEND and emit two
    * phantom blocks at offsets 0 and -k — empty docs are normal in real
    * corpora, same defense as Dedup.shingles).
    */
  def frameSamplePlan(media: DataFrame, everyK: Int = 10): DataFrame =
    media.filter(length(col("payload")) > 0)
      .select(col("doc_id"),
        sequence(lit(0L), floor((length(col("payload")) - 1) / lit(everyK)).cast("long")).as("block_idx"))
      .select(col("doc_id"), explode(col("block_idx")).as("frame_block"))
      .select(col("doc_id"), (col("frame_block") * everyK).as("byte_offset"))
}
