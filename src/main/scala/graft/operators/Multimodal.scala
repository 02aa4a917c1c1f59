package graft.operators

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing for a training-data pipeline: opaque media
  * stored as `BINARY` columns with typed metadata, processed by batched
  * per-partition decoders.
  *
  * The Spark side is real — schema, partitioning, batch shape, feature
  * extraction contract — and TWO codecs sit behind the same seam:
  * [[JvmImageCodec]], a real pure-JVM decoder (PNG/BMP/GIF/JPEG via
  * javax.imageio + a binary-PPM parser), and [[StubCodec]], which
  * derives deterministic fake dimensions/features from md5 of the bytes.
  * The REGISTERED queries use the stub, because only the stub is
  * SQL-replayable (full DuckDB value-hash oracle); the real codec runs
  * the identical operator in MultimodalCodecSpec. Swapping in a heavier
  * decoder (ffmpeg, turbo-jpeg) changes ONLY the codec object — operator
  * signatures, schemas, and execution shape stay identical.
  *
  * The md5 basis is deliberate: DuckDB can replay the whole pseudo-decode
  * in SQL (see [[OracleSql]]), so both mm_* queries carry full value-hash
  * oracles — the plumbing is verified end-to-end even though the codec is
  * fake.
  *
  * Scale notes:
  *  - media bytes ride in parquet binary columns; the decode is a narrow
  *    `mapPartitions` (no shuffle) reusing one digest/codec instance per
  *    partition, so throughput scales with executors and decode cost
  *    dominates — exactly the regime a real pipeline has;
  *  - `spark.sql.files.maxPartitionBytes` is the knob that sizes decode
  *    tasks when media blobs make rows heavy; the operators never collect
  *    media to the driver.
  */
object Multimodal {

  /** ======= STUB: deterministic fake codec (clearly marked) =======
    * Derives pseudo-metadata and a feature vector from md5 of the raw
    * bytes. A real implementation would decode the container format here. */
  object StubCodec {
    private val hexChars = "0123456789abcdef".toCharArray

    def md5Hex(md: MessageDigest, bytes: Array[Byte]): String = {
      md.reset()
      val d = md.digest(bytes)
      val sb = new java.lang.StringBuilder(32)
      d.foreach { b => sb.append(hexChars((b >> 4) & 0xf)).append(hexChars(b & 0xf)) }
      sb.toString
    }

    private def hexInt(hex: String, from: Int, len: Int): Int =
      Integer.parseInt(hex.substring(from, from + len), 16)

    /** NOT a real decoder: dimensions/features are a deterministic
      * function of md5(bytes) so tests are stable, the plumbing is real,
      * and DuckDB can replay it. Features are byte-values/255.0 — exact
      * IEEE doubles, identical in any engine. */
    def decode(md: MessageDigest, bytes: Array[Byte]): (Int, Int, Int, Array[Double]) = {
      val hex = md5Hex(md, bytes)
      val width = 64 + hexInt(hex, 0, 3) % 1024
      val height = 64 + hexInt(hex, 3, 3) % 1024
      val channels = 1 + hexInt(hex, 6, 1) % 4
      val features = Array.tabulate(8)(j => hexInt(hex, 16 + 2 * j, 2) / 255.0)
      (width, height, channels, features)
    }

    /** Fake frame sampler: fixed-size CODEPOINT windows stand in for
      * frames (a real codec would window bytes/containers). Codepoints,
      * not UTF-16 units: the DuckDB replay windows with substr()/length()
      * which count codepoints, so a surrogate-pair emoji must not shift
      * the frame boundary in one engine only. */
    def sampleFrames(text: String, frameChars: Int, everyN: Int): Seq[(Long, String)] = {
      val out = Seq.newBuilder[(Long, String)]
      // count codepoints ONCE and decrement — per-window recounting of
      // the remaining string is O(len^2/frameChars) per document
      var remaining = text.codePointCount(0, text.length)
      var idx = 0
      var start = 0
      while (start < text.length) {
        val take = math.min(frameChars, remaining)
        val end = text.offsetByCodePoints(start, take)
        if (idx % everyN == 0) out += (((idx / everyN).toLong, text.substring(start, end)))
        idx += 1
        start = end
        remaining -= take
      }
      out.result()
    }
  }

  /** ======= REAL codec: pure-JVM image decode =======
    * Decodes the formats the JDK itself can read — PNG, BMP, GIF, JPEG,
    * WBMP via `javax.imageio` (headless-safe, no native libs) — plus
    * binary PPM (P6), which ImageIO lacks. This is the production seam
    * [[StubCodec]] stands in for: same (width, height, channels,
    * features) contract, so [[decodeFeatures]] runs identically over
    * either. Features are the per-cell mean RGB intensity of a 2x4 grid,
    * accumulated in integer space and divided once — exact IEEE, the
    * same on every JVM.
    *
    * The stub stays the REGISTERED query's codec: a real decode is not
    * SQL-replayable, and the oracle discipline (DuckDB replays the full
    * operator) matters more for the driver gate than decoding bytes that
    * are text anyway. Real-format coverage is asserted in
    * MultimodalCodecSpec over generated PNG/BMP/PPM images. */
  object JvmImageCodec {
    /** (width, height, channels, 8 grid-mean features in [0,1]), or None
      * if the bytes decode in no supported format. */
    def decode(bytes: Array[Byte]): Option[(Int, Int, Int, Array[Double])] =
      decodePpm(bytes).orElse(decodeImageIo(bytes)).map { case (w, h, c, px) =>
        (w, h, c, gridFeatures(w, h, px))
      }

    /** 2x4 grid of mean RGB intensity: px(y)(x) = r+g+b summed per cell,
      * divided by 3*255*cellArea. Integer sums -> one division: exact. */
    private def gridFeatures(w: Int, h: Int, px: (Int, Int) => Int): Array[Double] = {
      val sums = new Array[Long](8)
      val counts = new Array[Long](8)
      var y = 0
      while (y < h) {
        val gy = if (h == 1) 0 else math.min(2 * y / h, 1)
        var x = 0
        while (x < w) {
          val gx = if (w == 1) 0 else math.min(4 * x / w, 3)
          val cell = gy * 4 + gx
          sums(cell) += px(x, y)
          counts(cell) += 1
          x += 1
        }
        y += 1
      }
      Array.tabulate(8)(i =>
        if (counts(i) == 0) 0.0 else sums(i).toDouble / (3.0 * 255.0 * counts(i)))
    }

    private def decodeImageIo(bytes: Array[Byte]): Option[(Int, Int, Int, (Int, Int) => Int)] =
      try {
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
        if (img == null) None
        else {
          val c = img.getColorModel.getNumComponents
          Some((img.getWidth, img.getHeight, c, (x: Int, y: Int) => {
            val rgb = img.getRGB(x, y)
            ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
          }))
        }
      } catch { case _: Exception => None }

    /** Binary PPM (P6): `P6 <w> <h> <maxval>` header (whitespace/#comment
      * separated) followed by w*h raw RGB triples. maxval must be 255. */
    private def decodePpm(bytes: Array[Byte]): Option[(Int, Int, Int, (Int, Int) => Int)] = {
      if (bytes.length < 2 || bytes(0) != 'P' || bytes(1) != '6') return None
      var pos = 2
      def skipWs(): Unit = {
        var go = true
        while (go && pos < bytes.length) {
          val b = bytes(pos)
          if (b == '#') { while (pos < bytes.length && bytes(pos) != '\n') pos += 1 }
          else if (b == ' ' || b == '\t' || b == '\n' || b == '\r') pos += 1
          else go = false
        }
      }
      def readInt(): Int = {
        skipWs()
        var v = 0; var any = false
        while (pos < bytes.length && bytes(pos) >= '0' && bytes(pos) <= '9') {
          v = v * 10 + (bytes(pos) - '0'); pos += 1; any = true
        }
        if (!any) -1 else v
      }
      val w = readInt(); val h = readInt(); val maxVal = readInt()
      pos += 1 // single whitespace after maxval, per spec
      if (w <= 0 || h <= 0 || maxVal != 255 ||
        bytes.length - pos < 3L * w * h) return None
      val base = pos
      Some((w, h, 3, (x: Int, y: Int) => {
        val off = base + 3 * (y * w + x)
        (bytes(off) & 0xff) + (bytes(off + 1) & 0xff) + (bytes(off + 2) & 0xff)
      }))
    }
  }

  /** ======= REAL codec: pure-JVM WAV (RIFF PCM) audio decode =======
    * The audio twin of [[JvmImageCodec]], same seam philosophy: a real
    * container parse (RIFF header walk, `fmt `/`data` chunks, 16-bit or
    * 8-bit PCM) with deterministic integer-accumulated features — the
    * per-window MEAN ABSOLUTE AMPLITUDE over 8 equal sample windows,
    * normalized to [0,1] by one exact IEEE divide, plus the
    * zero-crossing count (the classic cheap speech/music discriminator).
    * Spec-tested over generated WAV bytes (MultimodalCodecSpec); not
    * oracle-registered for the same reason as the image codec — a real
    * decode has no SQL replay, and the stub carries the plumbing oracle. */
  object JvmAudioCodec {
    /** (sampleRate, channels, nSamples, zeroCrossings, 8 window means
      * in [0,1]), or None if the bytes are not a supported PCM WAV. */
    def decode(bytes: Array[Byte]): Option[(Int, Int, Long, Long, Array[Double])] = {
      if (bytes.length < 44) return None
      def ascii(off: Int, s: String): Boolean =
        s.indices.forall(i => bytes(off + i) == s.charAt(i))
      def u16(off: Int): Int =
        (bytes(off) & 0xff) | ((bytes(off + 1) & 0xff) << 8)
      def u32(off: Int): Long =
        (bytes(off) & 0xffL) | ((bytes(off + 1) & 0xffL) << 8) |
          ((bytes(off + 2) & 0xffL) << 16) | ((bytes(off + 3) & 0xffL) << 24)
      if (!ascii(0, "RIFF") || !ascii(8, "WAVE")) return None
      // chunk walk: fmt then data, tolerating extra chunks between
      var pos = 12
      var sampleRate = -1; var channels = -1; var bits = -1
      var dataOff = -1; var dataLen = 0L
      while (pos + 8 <= bytes.length && (dataOff < 0 || sampleRate < 0)) {
        val id = new String(bytes, pos, 4, StandardCharsets.US_ASCII)
        val size = u32(pos + 4)
        if (size < 0 || size > bytes.length) return None // malformed header
        if (id == "fmt " && pos + 24 <= bytes.length) {
          val fmt = u16(pos + 8)
          if (fmt != 1) return None // PCM only
          channels = u16(pos + 10)
          sampleRate = u32(pos + 12).toInt
          bits = u16(pos + 22)
        } else if (id == "data") {
          dataOff = pos + 8
          dataLen = math.min(size, (bytes.length - dataOff).toLong)
        }
        pos += 8 + size.toInt + (size.toInt & 1) // chunks are word-aligned
      }
      if (sampleRate <= 0 || channels <= 0 || dataOff < 0) return None
      if (bits != 16 && bits != 8) return None
      val bytesPerSample = bits / 8
      val n = dataLen / bytesPerSample
      if (n == 0) return None
      def sample(i: Long): Int = {
        val off = dataOff + i * bytesPerSample
        if (bits == 16)
          ((bytes(off.toInt) & 0xff) | (bytes(off.toInt + 1) << 8)) // sign-extended
        else (bytes(off.toInt) & 0xff) - 128 // 8-bit WAV is unsigned
      }
      val full = if (bits == 16) 32768.0 else 128.0
      val sums = new Array[Long](8)
      val counts = new Array[Long](8)
      var crossings = 0L
      var prevSign = 0
      var i = 0L
      while (i < n) {
        val s = sample(i)
        val win = math.min((8 * i / n).toInt, 7)
        sums(win) += math.abs(s)
        counts(win) += 1
        val sign = if (s > 0) 1 else if (s < 0) -1 else 0
        if (sign != 0 && prevSign != 0 && sign != prevSign) crossings += 1
        if (sign != 0) prevSign = sign
        i += 1
      }
      val feats = Array.tabulate(8)(w =>
        if (counts(w) == 0) 0.0 else sums(w).toDouble / (full * counts(w)))
      Some((sampleRate, channels, n, crossings, feats))
    }
  }

  /** [[decodeFeatures]] with the REAL audio codec: WAV assets ->
    * (asset_id, sample_rate, channels, n_samples, zero_crossings,
    * f0..f7). Non-WAV rows are dropped (quarantine in production). Same
    * narrow mapPartitions shape; not oracle-registered (see codec doc). */
  def decodeAudioFeaturesReal(assets: DataFrame): DataFrame = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.select(col("asset_id"), col("media")).as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        JvmAudioCodec.decode(bytes).map { case (sr, c, n, zc, f) =>
          (id, sr.toLong, c.toLong, n, zc,
            f(0), f(1), f(2), f(3), f(4), f(5), f(6), f(7))
        }
      }
      .toDF(Seq("asset_id", "sample_rate", "channels", "n_samples",
        "zero_crossings") ++ featCols: _*)
      .orderBy("asset_id")
  }

  /** [[decodeFeatures]] with the REAL codec: same schema, real decode;
    * rows whose bytes decode in no supported format are dropped (a
    * production pipeline quarantines them). Not oracle-registered — a
    * real decode has no SQL replay; see JvmImageCodec scaladoc. */
  def decodeFeaturesReal(assets: DataFrame): DataFrame = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.select(col("asset_id"), col("media")).as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        JvmImageCodec.decode(bytes).map { case (w, h, c, f) =>
          (id, w.toLong, h.toLong, c.toLong, bytes.length.toLong,
            f(0), f(1), f(2), f(3), f(4), f(5), f(6), f(7))
        }
      }
      .toDF(Seq("asset_id", "width", "height", "channels", "n_bytes") ++ featCols: _*)
      .orderBy("asset_id")
  }

  /** Build a media-asset table from the documents table: text bytes stand
    * in for media blobs; metadata is a typed struct. (In production the
    * binary column comes straight from the lakehouse.) */
  def assetTable(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("asset_id"),
      col("text").cast("binary").as("media"),
      struct(
        col("source").as("origin"),
        col("n_chars").as("declared_size"),
        lit("image/stub").as("media_type")).as("meta"))

  private val featCols = (0 until 8).map(j => s"f$j")

  /** Decode + featurize: batched per-partition map over binary media,
    * one codec (digest) instance reused per partition. Output schema is
    * scalar-flat so the oracle harness can hash it:
    * (asset_id, width, height, channels, n_bytes, f0..f7 DOUBLE). */
  def decodeFeatures(assets: DataFrame): DataFrame = {
    val spark = assets.sparkSession
    import spark.implicits._
    // a NULL payload is an undecodable asset, not a zero-byte one: it is
    // dropped here, and every oracle derives its rows from non-null text
    // the same way (md5(NULL) is NULL in both engines)
    assets.select(col("asset_id"), col("media"))
      .filter(col("media").isNotNull).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val md = MessageDigest.getInstance("MD5") // reused across the batch
        it.map { case (id, bytes) =>
          val (w, h, c, f) = StubCodec.decode(md, bytes)
          (id, w.toLong, h.toLong, c.toLong, bytes.length.toLong,
            f(0), f(1), f(2), f(3), f(4), f(5), f(6), f(7))
        }
      }
      .toDF(Seq("asset_id", "width", "height", "channels", "n_bytes") ++ featCols: _*)
  }

  /** DuckDB replay of decodeFeatures over the documents table. */
  def decodeFeaturesSql: String = {
    def hv(pos: Int, len: Int) = OracleSql.hexVal("hex", pos, len)
    val fs = (0 until 8)
      .map(j => s"CAST(${hv(17 + 2 * j, 2)} AS DOUBLE)/255.0 AS f$j").mkString(", ")
    s"""WITH h AS (SELECT doc_id AS asset_id, md5(text) AS hex,
       |                  octet_length(encode(text)) AS n_bytes
       |           FROM documents WHERE text IS NOT NULL)
       |SELECT asset_id, CAST(64 + ${hv(1, 3)} % 1024 AS BIGINT) AS width,
       |       CAST(64 + ${hv(4, 3)} % 1024 AS BIGINT) AS height,
       |       CAST(1 + ${hv(7, 1)} % 4 AS BIGINT) AS channels, n_bytes, $fs
       |FROM h ORDER BY asset_id""".stripMargin
    // CASTs: the hex-derived integer arithmetic types as HUGEINT in
    // DuckDB (-> pandas float64), failing the driver's dtype-sensitive
    // hash even though every value equals the Spark LONG output.
  }

  /** Frame sampling for video-like media: explode sampled frames with
    * per-frame features; one row per (asset, frame). Same flat scalar
    * schema discipline as decodeFeatures. */
  def sampleFrameFeatures(assets: DataFrame, frameChars: Int = 64,
      everyN: Int = 2): DataFrame = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.select(col("asset_id"), col("media"))
      .filter(col("media").isNotNull).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val md = MessageDigest.getInstance("MD5")
        it.flatMap { case (id, bytes) =>
          val text = new String(bytes, StandardCharsets.UTF_8)
          StubCodec.sampleFrames(text, frameChars, everyN).map { case (idx, frame) =>
            val fb = frame.getBytes(StandardCharsets.UTF_8)
            val (w, h, _, f) = StubCodec.decode(md, fb)
            // codepoint count, not String.length: DuckDB's length() —
            // the oracle's frame_chars — counts codepoints
            (id, idx, w.toLong, h.toLong,
              frame.codePointCount(0, frame.length).toLong,
              f(0), f(1), f(2), f(3), f(4), f(5), f(6), f(7))
          }
        }
      }
      .toDF(Seq("asset_id", "frame_idx", "width", "height", "frame_chars") ++ featCols: _*)
  }

  /** DuckDB replay of sampleFrameFeatures over the documents table. */
  def sampleFrameFeaturesSql(frameChars: Int = 64, everyN: Int = 2): String = {
    def hv(pos: Int, len: Int) = OracleSql.hexVal("hex", pos, len)
    val fs = (0 until 8)
      .map(j => s"CAST(${hv(17 + 2 * j, 2)} AS DOUBLE)/255.0 AS f$j").mkString(", ")
    s"""WITH chunks AS (
       |  SELECT doc_id AS asset_id, i // $everyN AS frame_idx,
       |         substr(text, CAST(i*$frameChars+1 AS INTEGER), $frameChars) AS frame
       |  FROM (SELECT doc_id, text,
       |          unnest(range(0, CAST(ceil(length(text)/$frameChars.0) AS BIGINT))) AS i
       |        FROM documents WHERE text IS NOT NULL)
       |  WHERE i % $everyN = 0
       |), h AS (SELECT asset_id, frame_idx, md5(frame) AS hex,
       |                CAST(length(frame) AS BIGINT) AS frame_chars FROM chunks)
       |SELECT asset_id, frame_idx, CAST(64 + ${hv(1, 3)} % 1024 AS BIGINT) AS width,
       |       CAST(64 + ${hv(4, 3)} % 1024 AS BIGINT) AS height, frame_chars, $fs
       |FROM h ORDER BY asset_id, frame_idx""".stripMargin
    // width/height CASTs: same HUGEINT->float64 dtype artifact as
    // decodeFeaturesSql.
  }

  /** Decoded features as an `ARRAY<FLOAT>` embedding column — the typed
    * handoff from the multimodal path into the ANN operators. */
  def featureEmbeddings(assets: DataFrame): DataFrame =
    decodeFeatures(assets).select(
      col("asset_id").as("vec_id"),
      array(featCols.map(c => col(c).cast("float")): _*).as("embedding"))

  /** Embedding-similarity over decoded features: joins the multimodal
    * path into the ANN operators (features -> near-dup), proving the
    * column flows end-to-end.
    *
    * EXACT all-pairs spelling (guarded by cosineNearDupExact's row cap):
    * it is the oracle carrier — the stub feature space's near-dup pairs
    * sit on a continuous similarity tail (measured: pairs in [0.99,
    * 0.998] with background up to 0.9898 at sf0.1), so no candidate
    * generator has recall 1 and only exact scoring hash-matches the SQL
    * replay. The at-scale spelling is [[featureNearDupLsh]]. */
  def featureNearDup(assets: DataFrame, tau: Double = 0.99): DataFrame = {
    // persisted: the guard count plus both sides of the pair join would
    // otherwise re-run the full decode (the dominant cost) 3x; left to
    // LRU (small: n x 8 floats)
    val feats = featureEmbeddings(assets).persist().transform(graft.CacheScope.register)
    SimilaritySearch.cosineNearDupExact(feats, tau)
      .select(col("vec_a").as("asset_a"), col("vec_b").as("asset_b"))
  }

  /** DuckDB replay of featureNearDup: features recomputed in SQL, exact
    * all-pairs cosine at the same threshold (float-cast before the
    * double-accumulated cosine, matching the Spark path bit-for-bit). */
  def featureNearDupSql(tau: Double = 0.99): String = {
    def hv(pos: Int) = OracleSql.hexVal("md5(text)", pos, 2)
    val vec = (0 until 8).map(j => s"CAST(${hv(17 + 2 * j)} AS DOUBLE)/255.0").mkString("[", ", ", "]")
    s"""WITH f AS (SELECT doc_id AS asset_id, CAST($vec AS FLOAT[]) AS v
       |           FROM documents WHERE text IS NOT NULL)
       |SELECT a.asset_id AS asset_a, b.asset_id AS asset_b
       |FROM f a JOIN f b ON a.asset_id < b.asset_id
       |WHERE list_cosine_similarity(CAST(a.v AS DOUBLE[]), CAST(b.v AS DOUBLE[])) >= $tau
       |ORDER BY asset_a, asset_b""".stripMargin
  }

  /** At-scale near-dup over decoded features: mean-CENTERED hyperplane
    * LSH candidates + exact cosine verify on the original vectors
    * (equi-join candidate generation, never a cartesian). Centering is
    * load-bearing here: the stub features are all-positive, so uncentered
    * sign-pattern buckets collide for 61% of random pairs (measured) —
    * centered, the background collapses to ~0 while close pairs keep
    * colliding. Recall < 1 by construction (pairs near the corpus mean
    * lose angular resolution), yet the operator is still fully
    * hash-oracled: the deterministic integer bucketing lets
    * [[featureNearDupLshSql]] replay the SAME candidates in DuckDB; the
    * exact twin above carries the recall comparison. */
  def featureNearDupLsh(assets: DataFrame, tau: Double = 0.99): DataFrame = {
    // persisted: dim lookup, centering mean, bucket build, and both
    // verify join sides all read the decoded features — uncached that is
    // ~5 full decode passes; left to LRU (small: n x 8 floats)
    val feats = featureEmbeddings(assets).persist().transform(graft.CacheScope.register)
    SimilaritySearch.cosineNearDupLsh(feats, tau, center = true)
      .select(col("vec_a").as("asset_a"), col("vec_b").as("asset_b"))
  }

  /** DuckDB replay of [[featureNearDupLsh]]: stub features recomputed in
    * SQL, then the SAME centered integer LSH candidates
    * (OracleSql.lshCandidatesSql) + exact cosine verify at tau. */
  def featureNearDupLshSql(tau: Double = 0.99): String = {
    def hv(pos: Int) = OracleSql.hexVal("md5(text)", pos, 2)
    val vec = (0 until 8).map(j => s"CAST(${hv(17 + 2 * j)} AS DOUBLE)/255.0").mkString("[", ", ", "]")
    s"""WITH vecs AS (SELECT doc_id AS vec_id, CAST($vec AS FLOAT[]) AS v
       |              FROM documents WHERE text IS NOT NULL),
       |${OracleSql.lshCandidatesSql(dim = 8, nTables = 8, bitsPerTable = 16, seed = 42L, center = true)}
       |SELECT c.vec_a AS asset_a, c.vec_b AS asset_b
       |FROM cands c
       |JOIN vecs a ON a.vec_id = c.vec_a
       |JOIN vecs b ON b.vec_id = c.vec_b
       |WHERE list_cosine_similarity(CAST(a.v AS DOUBLE[]),
       |                             CAST(b.v AS DOUBLE[])) >= $tau
       |ORDER BY asset_a, asset_b""".stripMargin
  }
}
