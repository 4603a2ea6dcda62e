package graft

import graft.pipeline.Multimodal
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import java.nio.{ByteBuffer, ByteOrder}

/** Real-codec decode over the per-partition media path: binary PPM and
  * RIFF/WAVE PCM parsed from actual bytes (no external libraries). */
class MultimodalSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  /** 2×2 P6 PPM: red, green / blue, white. */
  private def ppmBytes: Array[Byte] =
    "P6\n2 2\n255\n".getBytes("US-ASCII") ++ Array[Int](
      255, 0, 0, 0, 255, 0,
      0, 0, 255, 255, 255, 255).map(_.toByte)

  /** Mono 16-bit PCM WAV at 8 kHz with samples [16384, -16384]. */
  private def wavBytes: Array[Byte] = {
    val data = ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN)
      .putShort(16384.toShort).putShort((-16384).toShort).array()
    val bb = ByteBuffer.allocate(44 + data.length).order(ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + data.length)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1).putInt(8000).putInt(16000)
      .putShort(2).putShort(16)
      .put("data".getBytes("US-ASCII")).putInt(data.length).put(data)
    bb.array()
  }

  test("PPM codec: header, mean RGB, 2x2 luma resize") {
    val d = Multimodal.decodePpm(ppmBytes).get
    assert(d.kind == "image/ppm" && d.width == 2 && d.height == 2)
    assert(d.features.take(3).forall(v => math.abs(v - 0.5) < 1e-9))
    val luma = d.features.drop(3)
    assert(math.abs(luma(0) - 0.299) < 1e-9) // red
    assert(math.abs(luma(1) - 0.587) < 1e-9) // green
    assert(math.abs(luma(2) - 0.114) < 1e-9) // blue
    assert(math.abs(luma(3) - 1.0) < 1e-9)   // white
  }

  test("WAV codec: fmt chunk and mean amplitude") {
    val d = Multimodal.decodeWav(wavBytes).get
    assert(d.kind == "audio/wav" && d.channels == 1 && d.sampleRate == 8000)
    assert(math.abs(d.features(0) - 2.0 / 8000) < 1e-12) // duration
    assert(math.abs(d.features(1) - 0.5) < 1e-9)         // mean |amp|
  }

  /** 2×2 24-bit BMP: red, green / blue, white — stored with the BMP
    * quirks: little-endian header, BGR pixels, rows 4-byte padded and
    * bottom-up (bottom image row first in the file). */
  private def bmpBytes(topDown: Boolean): Array[Byte] = {
    val bb = ByteBuffer.allocate(70).order(ByteOrder.LITTLE_ENDIAN)
    bb.put('B'.toByte).put('M'.toByte).putInt(70).putInt(0).putInt(54)
    bb.putInt(40).putInt(2).putInt(if (topDown) -2 else 2)
      .putShort(1).putShort(24).putInt(0).putInt(16)
    bb.putInt(0).putInt(0).putInt(0).putInt(0)
    val top = Array[Int](0, 0, 255, 0, 255, 0, 0, 0)    // red, green + pad
    val bottom = Array[Int](255, 0, 0, 255, 255, 255, 0, 0) // blue, white + pad
    val rows = if (topDown) top ++ bottom else bottom ++ top
    rows.foreach(v => bb.put(v.toByte))
    bb.array()
  }

  test("BMP codec: bottom-up BGR rows with stride padding decode correctly") {
    for (topDown <- Seq(false, true)) {
      val d = Multimodal.decodeBmp(bmpBytes(topDown)).get
      assert(d.kind == "image/bmp" && d.width == 2 && d.height == 2)
      // means: each channel lit in exactly 2 of 4 pixels at 255
      assert(math.abs(d.features(0) - 0.5) < 1e-12)
      assert(math.abs(d.features(1) - 0.5) < 1e-12)
      assert(math.abs(d.features(2) - 0.5) < 1e-12)
      // luma resize in image order TL,TR,BL,BR regardless of file order
      val luma = d.features.drop(3)
      assert(math.abs(luma(0) - 0.299) < 1e-12) // red
      assert(math.abs(luma(1) - 0.587) < 1e-12) // green
      assert(math.abs(luma(2) - 0.114) < 1e-12) // blue
      assert(math.abs(luma(3) - 1.0) < 1e-12)   // white
    }
  }

  test("PNG codec: ImageIO-encoded RGB and RGBA decode to exact pixel stats") {
    import java.awt.image.BufferedImage
    // 5x3 deterministic gradient — wide enough that the encoder's
    // filter choices (Sub/Up/Paeth) actually vary across rows
    def img(kind: Int): BufferedImage = {
      val im = new BufferedImage(5, 3, kind)
      for (y <- 0 until 3; x <- 0 until 5) {
        val (r, g, b) = ((x * 50 + y) % 256, (255 - x * 40 + y) % 256,
          (x * x * 11 + y * 90) % 256)
        im.setRGB(x, y, (0xff << 24) | (r << 16) | (g << 8) | b)
      }
      im
    }
    def encode(im: BufferedImage): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(im, "png", bos)
      bos.toByteArray
    }
    for (kind <- Seq(BufferedImage.TYPE_INT_RGB, BufferedImage.TYPE_INT_ARGB)) {
      val im = img(kind)
      val d = Multimodal.decodePng(encode(im)).get
      assert(d.kind == "image/png" && d.width == 5 && d.height == 3)
      assert(d.channels == (if (kind == BufferedImage.TYPE_INT_ARGB) 4 else 3))
      // reference stats straight from the BufferedImage
      val px = for (y <- 0 until 3; x <- 0 until 5) yield im.getRGB(x, y)
      def mean(shift: Int) =
        px.map(p => (p >> shift) & 0xff).sum / 15.0 / 255.0
      assert(math.abs(d.features(0) - mean(16)) < 1e-12, "mean R")
      assert(math.abs(d.features(1) - mean(8)) < 1e-12, "mean G")
      assert(math.abs(d.features(2) - mean(0)) < 1e-12, "mean B")
      // 2x2 luma resize samples px = min(w-1, rx*w/2), py = min(h-1,
      // ry*h/2) for rx,ry in 0..1 — same grid as the other codecs
      val samples = for (ry <- 0 until 2; rx <- 0 until 2) yield {
        val sx = math.min(4, rx * 5 / 2); val sy = math.min(2, ry * 3 / 2)
        val p = im.getRGB(sx, sy)
        (0.299 * ((p >> 16) & 0xff) + 0.587 * ((p >> 8) & 0xff) +
          0.114 * (p & 0xff)) / 255.0
      }
      samples.zipWithIndex.foreach { case (s, i) =>
        assert(math.abs(d.features(3 + i) - s) < 1e-12, s"resize $i")
      }
    }
    // greyscale path
    val grey = img(BufferedImage.TYPE_BYTE_GRAY)
    val dg = Multimodal.decodePng(encode(grey)).get
    assert(dg.channels == 1 && dg.width == 5)
  }

  test("PNG codec: randomized round-trip vs ImageIO across edge sizes") {
    import java.awt.image.BufferedImage
    val rnd = new scala.util.Random(7)
    val sizes = Seq((1, 1), (1, 7), (9, 1), (2, 2), (17, 5), (31, 33))
    for ((w, h) <- sizes; kind <- Seq(BufferedImage.TYPE_INT_RGB,
        BufferedImage.TYPE_INT_ARGB)) {
      val im = new BufferedImage(w, h, kind)
      for (y <- 0 until h; x <- 0 until w)
        im.setRGB(x, y, (0xff << 24) | rnd.nextInt(1 << 24))
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(im, "png", bos)
      val d = Multimodal.decodePng(bos.toByteArray)
        .getOrElse(fail(s"decode failed ${w}x$h kind=$kind"))
      assert(d.width == w && d.height == h, s"dims ${w}x$h")
      val px = for (y <- 0 until h; x <- 0 until w) yield im.getRGB(x, y)
      def mean(shift: Int) =
        px.map(p => (p >> shift) & 0xff).sum.toDouble / px.size / 255.0
      assert(math.abs(d.features(0) - mean(16)) < 1e-12, s"R ${w}x$h")
      assert(math.abs(d.features(1) - mean(8)) < 1e-12, s"G ${w}x$h")
      assert(math.abs(d.features(2) - mean(0)) < 1e-12, s"B ${w}x$h")
    }
  }

  test("codecs reject malformed payloads instead of hanging or throwing") {
    // RIFF chunk with length 0xFFFFFFF8: Int-truncated advance would be
    // <= 0 and spin the chunk walk forever
    val evilWav = ByteBuffer.allocate(24).order(ByteOrder.LITTLE_ENDIAN)
      .put("RIFF".getBytes("US-ASCII")).putInt(16)
      .put("WAVE".getBytes("US-ASCII"))
      .put("junk".getBytes("US-ASCII")).putInt(0xFFFFFFF8).array()
    assert(Multimodal.decodeWav(evilWav).isEmpty)
    // PPM header whose w*h*3 overflows Int past the bounds guard
    val evilPpm = "P6\n100000 100000\n255\n".getBytes("US-ASCII") ++
      Array[Byte](1, 2, 3)
    assert(Multimodal.decodePpm(evilPpm).isEmpty)
    assert(Multimodal.decode(Array[Byte]()).isEmpty)
    assert(Multimodal.decode(null).isEmpty)
  }

  test("frameSample demuxes concatenated PPM frames and keeps every k-th") {
    import spark.implicits._
    // 5-frame "video": frame i is the 2×2 ppm with all-red replaced by
    // a per-frame marker in the first byte of pixel 0
    def frame(i: Int): Array[Byte] = {
      val f = ppmBytes.clone(); f("P6\n2 2\n255\n".length) = i.toByte; f
    }
    val video = (0 until 5).flatMap(frame).toArray
    val frames = Multimodal.splitPpmFrames(video)
    assert(frames.length == 5 && frames.forall(_.length == ppmBytes.length))
    // trailing garbage stops the demux cleanly instead of throwing
    assert(Multimodal.splitPpmFrames(video ++ Array[Byte](9, 9)).length == 5)

    val df = Seq((7L, video), (8L, Array[Byte](1, 2, 3))).toDF("media_id", "payload")
    val out = Multimodal.frameSample(df, every = 2)
      .select($"media_id", $"frame.frame_idx".as("idx")).collect()
    // unknown format → no frames at all; 5 frames sampled at 2 → 0,2,4
    assert(out.map(r => (r.getLong(0), r.getInt(1))).sorted.toSeq ==
      Seq((7L, 0), (7L, 2), (7L, 4)))
    // maxFrames bounds per-video output
    assert(Multimodal.frameSample(df, every = 1, maxFrames = 2).count() == 2)
  }

  test("patchify tiles PPM pixels, crops remainders, bounds per image") {
    import spark.implicits._
    // 5×3 image: 2×2 patches tile to a 2×1 grid (row 2 and col 4 crop
    // away); pixel (x,y) has r=g=b = y*5+x so patch means are exact
    val px = (0 until 15).flatMap(p => Seq(p, p, p)).map(_.toByte).toArray
    val img = "P6\n5 3\n255\n".getBytes("US-ASCII") ++ px
    val df = Seq((1L, img), (2L, "not an image".getBytes)).toDF("media_id", "payload")
    val out = Multimodal.patchify(df, patch = 2).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getDouble(3)))
    // non-PPM payload contributes no rows; patch (0,0) covers pixels
    // {0,1,5,6} mean 3, patch (0,1) covers {2,3,7,8} mean 5
    assert(out.map(t => (t._1, t._2, t._3)).toSet ==
      Set((1L, 0, 0), (1L, 0, 1)))
    assert(out.find(t => t._2 == 0 && t._3 == 0).get._4 == 3.0 / 255)
    assert(out.find(t => t._2 == 0 && t._3 == 1).get._4 == 5.0 / 255)
    // maxPatches caps the per-image output (frameSample discipline)
    assert(Multimodal.patchify(df, patch = 2, maxPatches = 1).count() == 1)
  }

  test("decodeMedia dispatches per partition and nulls unknown formats") {
    import spark.implicits._
    val df = Seq(
      (1L, ppmBytes), (2L, wavBytes), (3L, Array[Byte](1, 2, 3)))
      .toDF("media_id", "payload")
    val out = Multimodal.decodeMedia(df).orderBy("media_id").collect()
    assert(out(0).getStruct(2).getString(0) == "image/ppm")
    assert(out(1).getStruct(2).getString(0) == "audio/wav")
    assert(out(2).isNullAt(2))
  }

  test("JPEG codec: uniform-gray round-trip is bit-exact") {
    // all-ones quant table + constant block = DC-only spectrum that
    // quantizes exactly, so decode must return every pixel == g
    for (g <- Seq(0, 1, 127, 128, 200, 255)) {
      val d = Multimodal.decodeJpeg(Multimodal.encodeGrayJpeg(g)).get
      assert(d.kind == "image/jpeg" && d.width == 8 && d.height == 8)
      assert(d.channels == 1)
      assert(d.features(0) == g / 255.0, s"mean R at g=$g")
      assert(d.features(1) == g / 255.0 && d.features(2) == g / 255.0)
      assert(d.features(3) ==
        (0.299 * g + 0.587 * g + 0.114 * g) / 255.0, s"luma at g=$g")
    }
    // multi-block: differential DC (first block codes 8(g-128), the
    // rest code diff 0) across a 24x16 image
    val d = Multimodal.decodeJpeg(
      Multimodal.encodeGrayJpeg(77, w = 24, h = 16)).get
    assert(d.width == 24 && d.height == 16 && d.features(0) == 77 / 255.0)
  }

  test("JPEG codec: ImageIO-encoded color images decode to matching stats") {
    import java.awt.image.BufferedImage
    // gradient image wide enough to span several MCUs and exercise the
    // 4:2:0 chroma subsampling + upsampling + YCbCr→RGB path
    val (w, h) = (40, 24)
    val im = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val (r, g, b) = ((x * 6 + y) % 256, (255 - x * 5 + y * 2) % 256,
        (x * x + y * 9) % 256)
      im.setRGB(x, y, (0xff << 24) | (r << 16) | (g << 8) | b)
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(im, "jpg", bos)
    val bytes = bos.toByteArray
    val d = Multimodal.decodeJpeg(bytes).get
    assert(d.kind == "image/jpeg" && d.width == w && d.height == h &&
      d.channels == 3)
    // compare against ImageIO's OWN decode of the same lossy bytes —
    // the decoders may differ by ±1/255 per pixel in IDCT rounding, so
    // means get a small tolerance
    val ref = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(bytes))
    val px = for (y <- 0 until h; x <- 0 until w) yield ref.getRGB(x, y)
    def mean(shift: Int) =
      px.map(p => (p >> shift) & 0xff).sum.toDouble / px.size / 255.0
    assert(math.abs(d.features(0) - mean(16)) < 2.0 / 255, "mean R")
    assert(math.abs(d.features(1) - mean(8)) < 2.0 / 255, "mean G")
    assert(math.abs(d.features(2) - mean(0)) < 2.0 / 255, "mean B")
    // grayscale ImageIO jpeg exercises the 1-component scan
    val gim = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until h; x <- 0 until w)
      gim.getRaster.setSample(x, y, 0, (x * 7 + y * 3) % 256)
    val gbos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(gim, "jpg", gbos)
    val gd = Multimodal.decodeJpeg(gbos.toByteArray).get
    assert(gd.channels == 1 && gd.width == w)
    val gref = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(gbos.toByteArray))
    // raster samples, not getRGB — getRGB on a gray image routes
    // through gray→sRGB color conversion and gamma-shifts the values
    val gmean = (for (y <- 0 until h; x <- 0 until w)
      yield gref.getRaster.getSample(x, y, 0)).sum.toDouble / (w * h) / 255.0
    assert(math.abs(gd.features(0) - gmean) < 2.0 / 255, "gray mean")
    // malformed payloads: truncated entropy data and bare SOI → None
    assert(Multimodal.decodeJpeg(bytes.take(bytes.length / 2)).isEmpty)
    assert(Multimodal.decodeJpeg(Array(0xff, 0xd8).map(_.toByte)).isEmpty)
  }

  test("withMediaMeta: typed metadata derives from the DECODED " +
       "container; unrecognized payloads keep a row with unknown/null " +
       "meta") {
    import spark.implicits._
    val df = Seq(
      (1L, ppmBytes),
      (2L, wavBytes),
      (3L, "not a media file".getBytes("US-ASCII")),
      (4L, null.asInstanceOf[Array[Byte]])).toDF("media_id", "payload")
    val got = Multimodal.withMediaMeta(df)
      .select("media_id", "meta.n_bytes", "meta.format", "meta.width",
        "meta.height")
      .collect().sortBy(_.getLong(0))
    assert(got(0).getLong(1) == ppmBytes.length &&
      got(0).getString(2) == "image/ppm" &&
      got(0).getInt(3) == 2 && got(0).getInt(4) == 2)
    assert(got(1).getLong(1) == wavBytes.length &&
      got(1).getString(2) == "audio/wav")
    assert(got(2).getString(2) == "unknown" && got(2).isNullAt(3))
    assert(got(3).getLong(1) == 0L && got(3).getString(2) == "unknown")
  }

  test("decode paths stay inside the SQL engine (no RDD scan barrier)") {
    import spark.implicits._
    val df = Seq((1L, ppmBytes)).toDF("media_id", "payload")
    for (decoded <- Seq(Multimodal.decodeMedia(df),
        Multimodal.frameSample(df, every = 1),
        Multimodal.decodeBatch(df))) {
      val plan = decoded.queryExecution.executedPlan.toString
      // Dataset.mapPartitions plans as a MapPartitions node over the
      // original scan; a df.rdd hop would surface as Scan ExistingRDD
      // and fence off schema, pruning, and downstream codegen
      assert(plan.contains("MapPartitions"), plan)
      assert(!plan.contains("ExistingRDD"), plan)
    }
  }
}
