package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Multimodal column plumbing: image/audio/video as opaque `binary`
 * columns with typed metadata, plus a decode/feature-extract stage.
 *
 * The real decode (JPEG/PNG/audio codecs) is STUBBED with a
 * deterministic byte-level fake — the image/audio libraries are not in
 * this container — but the Spark-side plumbing is real: schema shape
 * (binary payload + metadata struct), batch-friendly partition-level
 * processing, and a columnar feature extraction that whole-stage
 * codegens.
 *
 * At scale the pattern is: binary payloads live in their own parquet
 * column (column pruning keeps metadata-only queries from reading
 * bytes at all); decode runs per-partition with bounded batch size.
 */
object Multimodal {

  /** Media record schema: payload + typed metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("payload", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("n_bytes", LongType, nullable = false),
      StructField("format", StringType, nullable = false),
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true))), nullable = false)
  ))

  /** Wrap a text table as fake media rows (payload = utf-8 bytes,
    * metadata derived deterministically) — test harness for the
    * pipeline shape. */
  def fromDocuments(docs: DataFrame, idCol: String = "doc_id",
                    textCol: String = "text"): DataFrame =
    docs.select(
      col(idCol).as("media_id"),
      encode(col(textCol), "UTF-8").as("payload"),
      struct(
        octet_length(encode(col(textCol), "UTF-8")).cast("long").as("n_bytes"),
        lit("fake/raw").as("format"),
        (pmod(col(idCol), lit(64)) + 1).cast("int").as("width"),
        (pmod(col(idCol), lit(48)) + 1).cast("int").as("height")).as("meta"))

  /**
   * STUB decode / feature-extract: nFeatures values from the leading
   * payload bytes (hex-pair → [0,1]). A real deployment swaps the
   * expression for a per-partition codec call with the same signature
   * (payload → fixed-width float vector); everything downstream
   * (schema, partitioning, batch shape) is unchanged.
   */
  def decodeFeatures(payload: Column, nFeatures: Int): Column = {
    val hx = hex(payload)
    array((0 until nFeatures).map { i =>
      coalesce(
        conv(substring(hx, i * 2 + 1, 2), 16, 10).cast("double") / 255.0,
        lit(0.0))
    }: _*)
  }

  // ---- real pure-JVM codecs ------------------------------------------
  //
  // The container has no image/audio libraries, but two real formats
  // are parseable with nothing beyond the JVM: binary PPM (P6) and
  // RIFF/WAVE PCM. These make the per-partition decode path a genuine
  // codec exercise — header parse, pixel/sample math, resize — not a
  // byte-peek fake. JPEG/PNG/MP4 would slot into the same decode()
  // signature via a native library.

  /** Decoded-media feature record. */
  case class Decoded(kind: String, width: Int, height: Int,
                     channels: Int, sampleRate: Int, features: Array[Double])

  /** Binary PPM (P6): header `P6 <w> <h> <maxval>` + RGB bytes.
    * Features: mean R/G/B plus a 2×2 nearest-neighbor luma resize —
    * the decode + feature-extract + resize stages of an image
    * pipeline in one pass. */
  def decodePpm(bytes: Array[Byte]): Option[Decoded] = {
    if (bytes == null || bytes.length < 2 ||
        bytes(0) != 'P' || bytes(1) != '6') return None
    var pos = 2
    def token(): Int = {
      while (pos < bytes.length &&
             (bytes(pos).toChar.isWhitespace || bytes(pos) == '#')) {
        if (bytes(pos) == '#') // comment to end of line
          while (pos < bytes.length && bytes(pos) != '\n') pos += 1
        else pos += 1
      }
      var v = 0
      while (pos < bytes.length && bytes(pos).toChar.isDigit) {
        v = v * 10 + (bytes(pos) - '0'); pos += 1
      }
      v
    }
    val (w, h, maxv) = (token(), token(), token())
    pos += 1 // single whitespace after maxval
    // size check in Long: a crafted huge header would overflow w*h*3
    // to a small/negative Int and sail past the bounds guard
    if (w <= 0 || h <= 0 || w > (1 << 20) || h > (1 << 20) || maxv <= 0 ||
        bytes.length.toLong < pos.toLong + w.toLong * h * 3) return None
    var (sr, sg, sb) = (0L, 0L, 0L)
    var i = pos
    val end = pos + w * h * 3
    while (i < end) {
      sr += bytes(i) & 0xff; sg += bytes(i + 1) & 0xff; sb += bytes(i + 2) & 0xff
      i += 3
    }
    val n = (w * h).toDouble
    // 2×2 nearest-neighbor resize on luma
    val resized = for (ry <- 0 until 2; rx <- 0 until 2) yield {
      val px = math.min(w - 1, rx * w / 2); val py = math.min(h - 1, ry * h / 2)
      val o = pos + (py * w + px) * 3
      (0.299 * (bytes(o) & 0xff) + 0.587 * (bytes(o + 1) & 0xff) +
        0.114 * (bytes(o + 2) & 0xff)) / maxv
    }
    Some(Decoded("image/ppm", w, h, 3, 0,
      Array(sr / n / maxv, sg / n / maxv, sb / n / maxv) ++ resized))
  }

  /** RIFF/WAVE PCM: fmt chunk (channels, sample rate, bits) + data
    * chunk; features = duration (s) and mean absolute amplitude of
    * 16-bit samples — the audio feature-extract stage. */
  def decodeWav(bytes: Array[Byte]): Option[Decoded] = {
    def u16(o: Int) = (bytes(o) & 0xff) | ((bytes(o + 1) & 0xff) << 8)
    def u32(o: Int) = (bytes(o) & 0xffL) | ((bytes(o + 1) & 0xffL) << 8) |
      ((bytes(o + 2) & 0xffL) << 16) | ((bytes(o + 3) & 0xffL) << 24)
    if (bytes == null || bytes.length < 44 ||
        new String(bytes, 0, 4, "US-ASCII") != "RIFF" ||
        new String(bytes, 8, 4, "US-ASCII") != "WAVE") return None
    var pos = 12
    var channels = 0; var rate = 0; var bits = 0
    var dataOff = -1; var dataLen = 0L
    var walking = true
    while (walking && pos + 8 <= bytes.length) {
      val id = new String(bytes, pos, 4, "US-ASCII")
      val len = u32(pos + 4)
      if (id == "fmt ") {
        channels = u16(pos + 10); rate = u32(pos + 12).toInt
        bits = u16(pos + 22)
      } else if (id == "data") { dataOff = pos + 8; dataLen = len }
      // advance in Long: a malformed chunk length >= 2^31 truncated to
      // Int advances by <= 0 and spins the walk forever; a length past
      // the buffer means a truncated file — stop either way
      val adv = 8L + len + (len & 1L)
      if (pos + adv > bytes.length) walking = false
      else pos = (pos + adv).toInt
    }
    if (channels == 0 || rate == 0 || dataOff < 0 || bits != 16) return None
    val nSamples = (dataLen / 2).toInt
    var sumAbs = 0.0
    var i = 0
    while (i < nSamples && dataOff + i * 2 + 1 < bytes.length) {
      val s = (u16(dataOff + i * 2) << 16) >> 16 // sign-extend
      sumAbs += math.abs(s / 32768.0)
      i += 1
    }
    val durSec = nSamples.toDouble / channels / rate
    Some(Decoded("audio/wav", 0, 0, channels, rate,
      Array(durSec, if (nSamples == 0) 0.0 else sumAbs / nSamples)))
  }

  /** Windows BMP (BITMAPINFOHEADER, 24-bit uncompressed): little-endian
    * multi-byte fields, rows 4-byte aligned and stored BOTTOM-UP (or
    * top-down when height is negative), pixels in BGR order — the
    * quirks that make it a real codec exercise rather than a byte
    * peek. Features mirror decodePpm: mean R/G/B + 2×2
    * nearest-neighbor luma resize. */
  def decodeBmp(bytes: Array[Byte]): Option[Decoded] = {
    if (bytes == null || bytes.length < 54 ||
        bytes(0) != 'B' || bytes(1) != 'M') return None
    def u16(o: Int) = (bytes(o) & 0xff) | ((bytes(o + 1) & 0xff) << 8)
    def u32(o: Int) = (bytes(o) & 0xffL) | ((bytes(o + 1) & 0xffL) << 8) |
      ((bytes(o + 2) & 0xffL) << 16) | ((bytes(o + 3) & 0xffL) << 24)
    val dataOff = u32(10).toInt
    val hdrSize = u32(14)
    val w = u32(18).toInt
    val hRaw = u32(22).toInt // negative height = top-down row order
    val (planes, bpp, compression) = (u16(26), u16(28), u32(30))
    if (hdrSize < 40 || planes != 1 || bpp != 24 || compression != 0)
      return None
    val topDown = hRaw < 0
    val h = math.abs(hRaw)
    if (w <= 0 || h <= 0 || w > (1 << 20) || h > (1 << 20)) return None
    val stride = ((w * 3 + 3) / 4) * 4 // rows pad to 4-byte boundaries
    if (dataOff < 54 ||
        bytes.length.toLong < dataOff.toLong + stride.toLong * h) return None
    // pixel byte offset for image coordinates (x, y), y = 0 at the TOP
    def pix(x: Int, y: Int): Int = {
      val row = if (topDown) y else h - 1 - y
      dataOff + row * stride + x * 3
    }
    var (sr, sg, sb) = (0L, 0L, 0L)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val o = pix(x, y) // stored B, G, R
        sb += bytes(o) & 0xff; sg += bytes(o + 1) & 0xff; sr += bytes(o + 2) & 0xff
        x += 1
      }
      y += 1
    }
    val n = (w.toLong * h).toDouble
    val resized = for (ry <- 0 until 2; rx <- 0 until 2) yield {
      val px = math.min(w - 1, rx * w / 2); val py = math.min(h - 1, ry * h / 2)
      val o = pix(px, py)
      (0.299 * (bytes(o + 2) & 0xff) + 0.587 * (bytes(o + 1) & 0xff) +
        0.114 * (bytes(o) & 0xff)) / 255.0
    }
    Some(Decoded("image/bmp", w, h, 3, 0,
      Array(sr / n / 255.0, sg / n / 255.0, sb / n / 255.0) ++ resized))
  }

  private val PNG_SIG =
    Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  /**
   * PNG (RFC 2083): signature + IHDR/IDAT/IEND chunk walk, zlib
   * inflate via java.util.zip, per-scanline unfiltering (None/Sub/Up/
   * Average/Paeth); 8-bit greyscale/RGB/RGBA, non-interlaced.
   * Ancillary chunks are skipped and CRCs are not re-verified — this
   * is the decode path, integrity checking belongs to fsck-style
   * tooling. Features match the other image codecs: mean R/G/B + 2×2
   * nearest-neighbor luma resize.
   */
  def decodePng(bytes: Array[Byte]): Option[Decoded] = {
    if (bytes == null || bytes.length < 8 + 25 ||
        !bytes.take(8).sameElements(PNG_SIG)) return None
    def u32(o: Int) = ((bytes(o) & 0xffL) << 24) | ((bytes(o + 1) & 0xffL) << 16) |
      ((bytes(o + 2) & 0xffL) << 8) | (bytes(o + 3) & 0xffL)
    var pos = 8
    var w = 0; var h = 0; var colorType = -1
    val idat = new java.io.ByteArrayOutputStream()
    var done = false
    while (!done && pos + 8 <= bytes.length) {
      val len = u32(pos).toInt
      val dataOff = pos + 8
      if (len < 0 || dataOff.toLong + len + 4 > bytes.length) return None
      new String(bytes, pos + 4, 4, "US-ASCII") match {
        case "IHDR" =>
          if (len < 13) return None
          w = u32(dataOff).toInt; h = u32(dataOff + 4).toInt
          colorType = bytes(dataOff + 9) & 0xff
          val (depth, interlace) =
            (bytes(dataOff + 8) & 0xff, bytes(dataOff + 12) & 0xff)
          // 8-bit gray (0), truecolor (2), truecolor+alpha (6); no
          // palette/interlace — the formats a feature pipeline emits
          if (depth != 8 || interlace != 0 ||
              !Seq(0, 2, 6).contains(colorType)) return None
        case "IDAT" => idat.write(bytes, dataOff, len)
        case "IEND" => done = true
        case _ => () // ancillary chunk
      }
      pos = dataOff + len + 4 // skip CRC
    }
    if (w <= 0 || h <= 0 || w > (1 << 14) || h > (1 << 14) ||
        colorType < 0 || idat.size == 0) return None
    val ch = colorType match { case 0 => 1; case 2 => 3; case _ => 4 }
    val rowBytes = w * ch
    val raw = new Array[Byte]((rowBytes + 1) * h)
    val inf = new java.util.zip.Inflater()
    inf.setInput(idat.toByteArray)
    var off = 0
    try {
      while (off < raw.length && !inf.finished()) {
        val n = inf.inflate(raw, off, raw.length - off)
        if (n == 0 && inf.needsInput()) return None // truncated stream
        off += n
      }
    } catch { case _: java.util.zip.DataFormatException => return None }
    finally inf.end()
    if (off < raw.length) return None
    // unfilter scanlines: each row carries a filter-type byte; Sub/Up/
    // Average/Paeth reconstruct from left (a), above (b), upper-left (c)
    val pix = new Array[Byte](rowBytes * h)
    var y = 0
    while (y < h) {
      val ft = raw(y * (rowBytes + 1)) & 0xff
      if (ft > 4) return None
      val src = y * (rowBytes + 1) + 1
      val dst = y * rowBytes
      var i = 0
      while (i < rowBytes) {
        val x = raw(src + i) & 0xff
        val a = if (i >= ch) pix(dst + i - ch) & 0xff else 0
        val b = if (y > 0) pix(dst - rowBytes + i) & 0xff else 0
        val c = if (y > 0 && i >= ch) pix(dst - rowBytes + i - ch) & 0xff else 0
        val v = ft match {
          case 0 => x
          case 1 => x + a
          case 2 => x + b
          case 3 => x + (a + b) / 2
          case _ =>
            val p = a + b - c
            val (pa, pb, pc) =
              (math.abs(p - a), math.abs(p - b), math.abs(p - c))
            x + (if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c)
        }
        pix(dst + i) = (v & 0xff).toByte
        i += 1
      }
      y += 1
    }
    def rgb(o: Int): (Int, Int, Int) =
      if (ch == 1) { val g = pix(o) & 0xff; (g, g, g) }
      else (pix(o) & 0xff, pix(o + 1) & 0xff, pix(o + 2) & 0xff)
    var (sr, sg, sb) = (0L, 0L, 0L)
    val n = w.toLong * h
    var idx = 0
    while (idx < n) {
      val (r, g, b) = rgb(idx.toInt * ch)
      sr += r; sg += g; sb += b; idx += 1
    }
    val resized = for (ry <- 0 until 2; rx <- 0 until 2) yield {
      val px = math.min(w - 1, rx * w / 2); val py = math.min(h - 1, ry * h / 2)
      val (r, g, b) = rgb((py * w + px) * ch)
      (0.299 * r + 0.587 * g + 0.114 * b) / 255.0
    }
    Some(Decoded("image/png", w, h, ch, 0,
      Array(sr / n.toDouble / 255.0, sg / n.toDouble / 255.0,
        sb / n.toDouble / 255.0) ++ resized))
  }

  /** Format sniff + dispatch — the codec-manager shape. */
  def decode(bytes: Array[Byte]): Option[Decoded] =
    decodePpm(bytes).orElse(decodeWav(bytes)).orElse(decodeBmp(bytes))
      .orElse(decodePng(bytes))

  /** Byte length of one P6 frame at `bytes(pos)` (header + pixels), or
    * -1 when no valid frame starts there. Mirrors decodePpm's header
    * walk without decoding pixels. */
  private def ppmFrameLength(bytes: Array[Byte], pos0: Int): Int = {
    if (pos0 + 2 > bytes.length || bytes(pos0) != 'P' || bytes(pos0 + 1) != '6')
      return -1
    var pos = pos0 + 2
    def token(): Int = {
      while (pos < bytes.length &&
             (bytes(pos).toChar.isWhitespace || bytes(pos) == '#')) {
        if (bytes(pos) == '#')
          while (pos < bytes.length && bytes(pos) != '\n') pos += 1
        else pos += 1
      }
      var v = 0
      while (pos < bytes.length && bytes(pos).toChar.isDigit) {
        v = v * 10 + (bytes(pos) - '0'); pos += 1
      }
      v
    }
    val (w, h, maxv) = (token(), token(), token())
    pos += 1
    if (w <= 0 || h <= 0 || w > (1 << 20) || h > (1 << 20) || maxv <= 0 ||
        bytes.length.toLong < pos.toLong + w.toLong * h * 3) -1
    else (pos - pos0) + w * h * 3
  }

  /**
   * Video-as-frame-stream: split a payload of CONCATENATED P6 frames
   * (motion-PPM — the raw output shape of `ffmpeg -f image2pipe`) into
   * per-frame byte slices. Every real container (MP4/MKV) needs a
   * native demuxer with exactly this signature: payload → ordered frame
   * payloads.
   */
  def splitPpmFrames(bytes: Array[Byte]): Seq[Array[Byte]] = {
    if (bytes == null) return Seq.empty
    val out = Seq.newBuilder[Array[Byte]]
    var pos = 0
    var len = ppmFrameLength(bytes, pos)
    while (len > 0) {
      out += java.util.Arrays.copyOfRange(bytes, pos, pos + len)
      pos += len
      len = ppmFrameLength(bytes, pos)
    }
    out.result()
  }

  /** Decoded frame record: frame index + per-frame features. */
  private val frameType = StructType(Seq(
    StructField("frame_idx", IntegerType),
    StructField("width", IntegerType), StructField("height", IntegerType),
    StructField("features", ArrayType(DoubleType))))

  /**
   * Frame sampling over multi-frame media: demux the payload, keep
   * every `every`-th frame (the I-frame-ish sampling a training
   * pipeline uses to bound per-video cost), decode each kept frame, and
   * explode to one output row per sampled frame.
   *
   * Runs per-partition (codec init amortizes across rows) and emits a
   * bounded number of frames per video regardless of input length when
   * `maxFrames` is set — at 100 TB, per-record output bounds are what
   * keep a single pathological 10-hour video from skewing a partition.
   */
  def frameSample(df: DataFrame, every: Int, maxFrames: Int = Int.MaxValue,
                  payloadCol: String = "payload"): DataFrame = {
    require(every >= 1, s"every=$every")
    val spark = df.sparkSession
    val keptCols = df.schema.fields.filterNot(_.name == payloadCol)
    val outSchema = StructType(keptCols :+
      StructField("frame", frameType, nullable = true))
    val pIdx = df.schema.fieldIndex(payloadCol)
    val keptIdx = df.schema.fields.indices.filter(_ != pIdx)
    val rdd = df.rdd.mapPartitions { rows =>
      // per-partition demuxer/codec init would run here, once
      rows.flatMap { r =>
        val kept = keptIdx.map(r.get)
        val frames = splitPpmFrames(r.get(pIdx).asInstanceOf[Array[Byte]])
        frames.iterator.zipWithIndex
          .filter { case (_, i) => i % every == 0 }
          .take(maxFrames)
          .map { case (fb, i) =>
            val d = decodePpm(fb).orNull
            val fRow = if (d == null) null
              else Row(i, d.width, d.height, d.features.toSeq)
            Row.fromSeq(kept :+ fRow)
          }
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /**
   * Per-partition media decode: payload column → `decoded` struct
   * (null when no codec matches). mapPartitions is deliberate — real
   * codecs have per-batch setup (native contexts, scratch buffers)
   * that must amortize across a partition, exactly this shape.
   */
  def decodeMedia(df: DataFrame, payloadCol: String = "payload"): DataFrame = {
    val spark = df.sparkSession
    val decodedType = StructType(Seq(
      StructField("kind", StringType), StructField("width", IntegerType),
      StructField("height", IntegerType), StructField("channels", IntegerType),
      StructField("sample_rate", IntegerType),
      StructField("features", ArrayType(DoubleType))))
    val outSchema = StructType(df.schema.fields :+
      StructField("decoded", decodedType, nullable = true))
    val idx = df.schema.fieldIndex(payloadCol)
    val rdd = df.rdd.mapPartitions { rows =>
      // per-partition codec init would run here, once
      rows.map { r =>
        val d = decode(r.get(idx).asInstanceOf[Array[Byte]]).orNull
        val dRow = if (d == null) null
          else Row(d.kind, d.width, d.height, d.channels, d.sampleRate,
            d.features.toSeq)
        Row.fromSeq(r.toSeq :+ dRow)
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Partition-level batch decode demonstrating the mapPartitions
    * shape used when the codec is a native library with per-batch
    * setup cost. Deterministic fake: mean byte value. */
  def decodeBatch(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val outSchema = StructType(df.schema.fields :+
      StructField("mean_byte", DoubleType, nullable = true))
    val rdd = df.rdd.mapPartitions { rows =>
      // per-partition "codec init" would happen here
      rows.map { r =>
        val payload = r.getAs[Array[Byte]]("payload")
        val mean =
          if (payload == null || payload.isEmpty) null
          else java.lang.Double.valueOf(
            payload.map(b => (b & 0xff).toDouble).sum / payload.length)
        Row.fromSeq(r.toSeq :+ mean)
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }
}
