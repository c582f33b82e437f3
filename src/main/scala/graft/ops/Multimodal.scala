package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads ride as opaque
  * `binary` columns with typed metadata structs; decode / feature-extract /
  * resize / frame-sample run as partition-batched functions over the binary
  * column.
  *
  * Two decode kernels behind the same batch contract:
  *  - [[decodeImage]] — a REAL image decode via `javax.imageio` (pure-JVM
  *    PNG/BMP/GIF readers ship with the JDK; no native codecs needed),
  *    oracle-verified end-to-end on deterministically synthesized PNGs
  *    (`q_mm_decode_png`: the DuckDB oracle recomputes each image's pixel
  *    sum from the generator formula, so equality holds only if the PNG
  *    bytes actually round-trip through a real codec).
  *  - [[fakeDecode]] — the clearly-marked deterministic STUB for codec
  *    families that need native libraries (video/audio): it parses
  *    "pixels" from the byte stream by arithmetic. The contract around
  *    both is identical and real: the schema, the batch shape
  *    (mapPartitions over iterators, never row-at-a-time JNI), partitioning
  *    (binary payloads never shuffle — metadata-only projections are
  *    pushed before any join), and the sink layout.
  */
object Multimodal {

  final case class MediaMeta(width: Int, height: Int, channels: Int, format: String)
  final case class Decoded(doc_id: Long, meta: MediaMeta, luma_mean: Double, n_bytes: Long)

  /** Synthesize a binary media column from a text corpus (deterministic:
    * UTF-8 bytes stand in for an encoded payload).
    */
  def synthesizeBinary(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))

  // --- container-header field extraction (pure Column expressions) ---------
  // Codegen'd builtins (substring/hex/conv) — no UDF in the metadata path,
  // so the projection stays inside WholeStageCodegen and reads only the
  // header prefix of each payload.

  /** Unsigned byte at 1-indexed `pos1`. */
  private def u8(c: Column, pos1: Int): Column =
    conv(hex(substring(c, pos1, 1)), 16, 10).cast("int")

  /** Big-endian u32 at `pos1` (PNG is network byte order). */
  private def beU32(c: Column, pos1: Int): Column =
    conv(hex(substring(c, pos1, 4)), 16, 10).cast("long")

  /** Little-endian u16 at `pos1` (GIF logical-screen fields). */
  private def leU16(c: Column, pos1: Int): Column =
    u8(c, pos1 + 1) * 256 + u8(c, pos1)

  /** Little-endian SIGNED i32 at `pos1` (BMP dimensions; a negative height
    * means top-down row order — magnitude is the pixel height).
    */
  private def leI32(c: Column, pos1: Int): Column = {
    val u = u8(c, pos1 + 3).cast("long") * 16777216L +
      u8(c, pos1 + 2).cast("long") * 65536L +
      u8(c, pos1 + 1).cast("long") * 256L + u8(c, pos1).cast("long")
    when(u >= 2147483648L, u - 4294967296L).otherwise(u)
  }

  /** Metadata-only projection — at scale this is THE column set a media
    * pipeline joins/filters on before ever touching pixels. Dimensions /
    * channels / format are read from the REAL container headers (a header
    * parse, never a decode):
    *  - PNG — IHDR width/height (big-endian u32 at bytes 16/20) and the
    *    color-type byte (25) → channel count (0 gray=1, 2 rgb=3,
    *    3 palette=1, 4 gray+alpha=2, 6 rgba=4);
    *  - BMP — signed little-endian i32 width/height at bytes 18/22
    *    (|height|: negative = top-down) and bits-per-pixel at 28 →
    *    channels = max(bpp/8, 1) (1/4/8 bpp are palette/gray → 1);
    *  - GIF — logical-screen u16 LE width/height at bytes 6/8; pixels are
    *    palette indices → 1 channel.
    * Unrecognized payloads (the opaque-media stand-in) keep the clearly
    * stubbed arithmetic dimensions + "fake/raw" tag. Everything is
    * `substring`/`hex`/`conv` over the header prefix; Catalyst prunes the
    * payload column away downstream of this select (verify with
    * `.explain`: ReadSchema must not contain `payload` when only meta
    * columns are consumed).
    */
  def meta(media: DataFrame): DataFrame = {
    val p = col("payload")
    val n = length(p)
    // magic + minimum bytes for the fields we read (hex() is uppercase).
    // The BMP/GIF magics alone are 2–3 ASCII bytes — weak enough that an
    // ordinary TEXT payload could collide ("BM…", "GIF…") — so both are
    // corroborated by a second header invariant: BMP's DIB-header-size
    // field must be one of the INFO-family sizes (40/52/56/64/108/124 —
    // the 12-byte BITMAPCOREHEADER is deliberately excluded: its
    // width/height/bpp live at different offsets than we parse, so
    // classifying it would emit garbage metadata; core-header files fall
    // through to the stub), and GIF's version must be "87a"/"89a". PNG's
    // 4-byte \x89PNG magic cannot occur in valid UTF-8 text. A text
    // payload that starts with the LITERAL 6 bytes "GIF89a" is
    // indistinguishable from a GIF header by any header sniffer (file(1)
    // included) and classifies as gif — by design.
    val magicPng = (n >= 26) && (hex(substring(p, 1, 4)) === "89504E47")
    val magicBmp = (n >= 30) && (hex(substring(p, 1, 2)) === "424D") &&
      leU16(p, 15).isin(BmpInfoHeaderSizes.toSeq: _*) && (leU16(p, 17) === 0)
    val magicGif = (n >= 10) && (hex(substring(p, 1, 3)) === "474946") &&
      hex(substring(p, 4, 3)).isin("383761", "383961")
    // Dimension sanity gate, applied BEFORE any int cast: Spark 4 runs ANSI
    // mode by default, where a cast overflow THROWS — one corrupt or
    // adversarial header encoding a dimension outside [1, Int.MaxValue]
    // (e.g. PNG width FFFFFFFF, BMP height 0x80000000 whose |·| is 2³¹)
    // would otherwise abort the whole metadata job (round-5 review). A
    // malformed header of a recognized container falls through to the stub
    // row exactly like an unrecognized payload.
    val pngW = beU32(p, 17); val pngH = beU32(p, 21)
    val bmpW = abs(leI32(p, 19)); val bmpH = abs(leI32(p, 23))
    val gifW = leU16(p, 7).cast("long"); val gifH = leU16(p, 9).cast("long")
    def dimsOk(w: Column, h: Column): Column =
      (w >= 1L) && (w <= 2147483647L) && (h >= 1L) && (h <= 2147483647L)
    val isPng = magicPng && dimsOk(pngW, pngH)
    val isBmp = magicBmp && dimsOk(bmpW, bmpH)
    val isGif = magicGif && dimsOk(gifW, gifH)
    val pngChannels = {
      val colorType = u8(p, 26)
      when(colorType === 2, 3).when(colorType === 4, 2)
        .when(colorType === 6, 4).otherwise(1)
    }
    val bmpChannels = greatest(leU16(p, 29) / 8, lit(1)).cast("int")
    media.select(col("doc_id"),
      n.as("n_bytes"),
      when(isPng, pngW).when(isBmp, bmpW).when(isGif, gifW)
        .otherwise(n % 640 + 1).cast("int").as("width"),
      when(isPng, pngH).when(isBmp, bmpH).when(isGif, gifH)
        .otherwise(n % 480 + 1).cast("int").as("height"),
      when(isPng, pngChannels).when(isBmp, bmpChannels).when(isGif, 1)
        .otherwise(3).cast("int").as("channels"),
      when(isPng, "png").when(isBmp, "bmp").when(isGif, "gif")
        .otherwise("fake/raw").as("format"))
  }

  /** DIB header sizes of the BMP INFO family — the ONE definition both
    * sniffers ([[meta]]'s column form and [[formatOf]]'s JVM form) read, so
    * the two cannot drift apart.
    */
  private[graft] val BmpInfoHeaderSizes: Set[Int] = Set(40, 52, 56, 64, 108, 124)

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

  // --- real image decode (javax.imageio — pure JVM, PNG/BMP/GIF) -----------

  /** Deterministic synthetic image dimensions for doc `id` (shared by the
    * generator, the tests and the SQL oracle).
    */
  private[graft] def pngDims(id: Long): (Int, Int) =
    (((id % 16) + 1).toInt, ((id % 12) + 1).toInt)

  /** Deterministic grayscale test image for doc `id`: sample(x,y) =
    * (id·31 + x·7 + y·13) mod 256 — closed-form, so a SQL oracle can
    * recompute the decoded pixel sum without any codec.
    */
  private[graft] def encodePng(id: Long): Array[Byte] = {
    val (w, h) = pngDims(id)
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        raster.setSample(x, y, 0, ((id * 31 + x * 7 + y * 13) % 256).toInt)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Synthesize a real PNG payload column (deterministic per doc_id). */
  def synthesizePng(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id").cast("long")).as[Long]
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false) // in-memory streams, no temp-file cache
        it.map(id => (id, encodePng(id)))
      }.toDF("doc_id", "payload")
  }

  /** REAL decode kernel: `javax.imageio` (PNG/BMP/GIF readers are pure-JVM
    * and ship with the JDK). Luma = integer-quantized mean of band-0 raster
    * samples — floor(sum·10⁴ / pixels) / 10⁴, same exact-rational
    * discipline as [[fakeDecode]] so any engine reproduces it. Throws on an
    * undecodable payload (a silent fake value defeats the point of a real
    * codec path); route genuinely opaque media through [[fakeDecode]].
    */
  def decodeImage(id: Long, payload: Array[Byte]): Decoded = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
    require(img != null, s"doc $id: payload is not a decodable image")
    val raster = img.getRaster
    val w = raster.getWidth
    val h = raster.getHeight
    var sum = 0L
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { sum += raster.getSample(x, y, 0); x += 1 }
      y += 1
    }
    val pixels = w.toLong * h
    val mean = if (pixels == 0) 0.0 else (sum * 10000L / pixels).toDouble / 10000.0
    Decoded(id, MediaMeta(w, h, raster.getNumBands, formatOf(payload)), mean, payload.length.toLong)
  }

  /** Container format from header bytes (a header parse — never a full
    * decode). EXACTLY the same magic + corroboration rules as [[meta]]'s
    * column sniff (BMP DIB-header size in the INFO family, GIF version
    * 87a/89a), so the two paths can never classify the same bytes
    * differently.
    */
  private[graft] def formatOf(payload: Array[Byte]): String = {
    def u8(i: Int) = payload(i) & 0xFF
    def leU16(i: Int) = u8(i) | (u8(i + 1) << 8)
    if (payload.length >= 26 && u8(0) == 0x89 &&
      payload(1) == 'P' && payload(2) == 'N' && payload(3) == 'G') "png"
    else if (payload.length >= 30 && payload(0) == 'B' && payload(1) == 'M' &&
      BmpInfoHeaderSizes.contains(leU16(14)) && leU16(16) == 0) "bmp"
    else if (payload.length >= 10 && payload(0) == 'G' && payload(1) == 'I' && payload(2) == 'F' &&
      ((payload(3) == '8' && payload(4) == '7' && payload(5) == 'a') ||
        (payload(3) == '8' && payload(4) == '9' && payload(5) == 'a'))) "gif"
    else "unknown"
  }

  /** Partition-batched REAL decode — same iterator contract as
    * [[decodeFeatures]], kernel swapped for the actual codec.
    */
  def decodeImageFeatures(media: DataFrame): Dataset[Decoded] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id").cast("long"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false) // once per partition, not per row
        it.map { case (id, payload) => decodeImage(id, payload) }
      }
  }

  /** REAL resize kernel: nearest-neighbor downsample of a decoded image to
    * `outW`×`outH` — out(x,y) = src(⌊x·w/outW⌋, ⌊y·h/outH⌋), integer index
    * math, so the result is exactly reproducible from the source pixels (a
    * box/area filter would be float-order-dependent). Works for any source
    * size (smaller sources duplicate pixels). Returns the resized band-0
    * sample grid row-major.
    */
  private[graft] def resizeNearest(raster: java.awt.image.Raster,
      outW: Int, outH: Int): Array[Int] = {
    val w = raster.getWidth
    val h = raster.getHeight
    val out = new Array[Int](outW * outH)
    var y = 0
    while (y < outH) {
      val sy = (y.toLong * h / outH).toInt
      var x = 0
      while (x < outW) {
        out(y * outW + x) = raster.getSample((x.toLong * w / outW).toInt, sy, 0)
        x += 1
      }
      y += 1
    }
    out
  }

  /** Partition-batched decode + nearest-neighbor resize + feature extract:
    * (doc_id, out_w, out_h, luma_mean of the RESIZED image, n_bytes).
    * Same integer quantization as the decode kernels.
    */
  def resizeFeatures(media: DataFrame, outW: Int, outH: Int): DataFrame = {
    require(outW > 0 && outH > 0)
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id").cast("long"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false)
        it.map { case (id, payload) =>
          val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
          require(img != null, s"doc $id: payload is not a decodable image")
          val px = resizeNearest(img.getRaster, outW, outH)
          var sum = 0L
          var i = 0
          while (i < px.length) { sum += px(i); i += 1 }
          val mean = (sum * 10000L / px.length).toDouble / 10000.0
          (id, outW, outH, mean, payload.length.toLong)
        }
      }.toDF("doc_id", "out_w", "out_h", "luma_mean", "n_bytes")
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
