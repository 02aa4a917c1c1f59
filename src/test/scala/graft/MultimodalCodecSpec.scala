package graft

import java.io.ByteArrayOutputStream
import java.awt.image.BufferedImage

import org.apache.spark.sql.functions._

import graft.operators.Multimodal

/** The REAL codec path ([[Multimodal.JvmImageCodec]]): generated PNG,
  * BMP, and binary-PPM images decoded through the identical operator the
  * stub-mode registered query uses. */
class MultimodalCodecSpec extends SparkSpec {

  /** A w x h image whose pixel (x, y) is a solid gray ramp: left half
    * dark (intensity 40), right half light (intensity 200) — grid means
    * are then known exactly. */
  private def testImage(w: Int, h: Int): BufferedImage = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val v = if (x < w / 2) 40 else 200
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    img
  }

  private def encode(img: BufferedImage, format: String): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, format, bos), s"no $format writer")
    bos.toByteArray
  }

  private def encodePpm(img: BufferedImage): Array[Byte] = {
    val (w, h) = (img.getWidth, img.getHeight)
    val header = s"P6\n# test comment\n$w $h\n255\n".getBytes("US-ASCII")
    val body = new Array[Byte](3 * w * h)
    for (y <- 0 until h; x <- 0 until w) {
      val rgb = img.getRGB(x, y)
      val off = 3 * (y * w + x)
      body(off) = ((rgb >> 16) & 0xff).toByte
      body(off + 1) = ((rgb >> 8) & 0xff).toByte
      body(off + 2) = (rgb & 0xff).toByte
    }
    header ++ body
  }

  test("JvmImageCodec decodes PNG, BMP, and PPM with exact dims and grid means") {
    val img = testImage(64, 32)
    for (bytes <- Seq(encode(img, "png"), encode(img, "bmp"), encodePpm(img))) {
      val Some((w, h, c, f)) = Multimodal.JvmImageCodec.decode(bytes)
      assert(w == 64 && h == 32 && c == 3)
      assert(f.length == 8)
      // left two grid columns are solid 40, right two solid 200 — means
      // are exact (integer sums, one division)
      for (row <- 0 until 2) {
        assert(f(row * 4) == 40.0 / 255.0 && f(row * 4 + 1) == 40.0 / 255.0)
        assert(f(row * 4 + 2) == 200.0 / 255.0 && f(row * 4 + 3) == 200.0 / 255.0)
      }
    }
  }

  test("decodeFeaturesReal runs the operator end-to-end over real images") {
    import spark.implicits._
    val assets = Seq(
      (1L, encode(testImage(64, 32), "png")),
      (2L, encode(testImage(8, 8), "bmp")),
      (3L, encodePpm(testImage(16, 4))),
      (4L, "not an image at all".getBytes("UTF-8"))) // quarantined
      .toDF("asset_id", "media")
    val out = Multimodal.decodeFeaturesReal(assets).collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L),
      "undecodable bytes must be dropped, decodable kept in id order")
    val byId = out.map(r => r.getLong(0) -> r).toMap
    assert(byId(1L).getLong(1) == 64 && byId(1L).getLong(2) == 32)
    assert(byId(2L).getLong(1) == 8 && byId(2L).getLong(2) == 8)
    assert(byId(3L).getLong(1) == 16 && byId(3L).getLong(2) == 4)
    // schema identical to the stub-mode operator (codec-seam contract)
    val stubCols = Multimodal.decodeFeatures(
      Multimodal.assetTable(Tables.documents(spark, sf).limit(1))).columns.toSeq
    assert(Multimodal.decodeFeaturesReal(assets).columns.toSeq == stubCols)
  }

  /** A 16-bit PCM mono WAV with the given samples. */
  private def wav(samples: Array[Short], sampleRate: Int = 8000): Array[Byte] = {
    val dataLen = samples.length * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1).putInt(sampleRate)
      .putInt(sampleRate * 2).putShort(2).putShort(16)
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(bb.putShort)
    bb.array()
  }

  test("JvmAudioCodec decodes PCM WAV with exact window means and crossings") {
    // 800 samples of constant +16384: every window mean = 16384/32768 = 0.5
    val flat = wav(Array.fill[Short](800)(16384))
    val Some((sr, ch, n, zc, f)) = Multimodal.JvmAudioCodec.decode(flat)
    assert(sr == 8000 && ch == 1 && n == 800 && zc == 0)
    assert(f.forall(_ == 0.5), f.mkString(","))
    // alternating +/-8192: mean |amp| = 0.25 per window, 799 crossings
    val sq = wav(Array.tabulate[Short](800)(i => if (i % 2 == 0) 8192 else -8192))
    val Some((_, _, _, zc2, f2)) = Multimodal.JvmAudioCodec.decode(sq)
    assert(zc2 == 799 && f2.forall(_ == 0.25))
    // non-WAV bytes rejected
    assert(Multimodal.JvmAudioCodec.decode("plain text".getBytes("UTF-8")).isEmpty)
    assert(Multimodal.JvmAudioCodec.decode(flat.take(30)).isEmpty)
  }

  test("decodeAudioFeaturesReal runs end-to-end, quarantining non-WAV rows") {
    import spark.implicits._
    val assets = Seq(
      (1L, wav(Array.fill[Short](160)(-4096))),
      (2L, "not audio".getBytes("UTF-8")),
      (3L, wav(Array.tabulate[Short](160)(i => (i * 100).toShort), sampleRate = 16000)))
      .toDF("asset_id", "media")
    val out = Multimodal.decodeAudioFeaturesReal(assets).collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 3L))
    val byId = out.map(r => r.getLong(0) -> r).toMap
    assert(byId(1L).getLong(1) == 8000 && byId(1L).getLong(3) == 160)
    assert(byId(1L).getDouble(5) == 4096.0 / 32768.0) // f0: constant amplitude
    assert(byId(3L).getLong(1) == 16000)
  }

  test("PPM parser rejects truncated and non-255-maxval inputs") {
    val good = encodePpm(testImage(4, 4))
    assert(Multimodal.JvmImageCodec.decode(good.dropRight(1)).isEmpty,
      "truncated body must not decode")
    val maxval1000 = new String(good.take(24), "US-ASCII")
    assert(Multimodal.JvmImageCodec.decode(
      s"P6\n4 4\n1000\n".getBytes("US-ASCII") ++ good.drop(maxval1000.length)).isEmpty,
      "maxval != 255 unsupported")
  }
}
