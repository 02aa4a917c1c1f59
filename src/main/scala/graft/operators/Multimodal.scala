package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing for a training-data pipeline: opaque media
  * stored as `BINARY` columns with typed metadata, processed by batched
  * per-partition decoders.
  *
  * The Spark side is real — schema, partitioning, batch shape, feature
  * extraction contract; the codec itself is a STUB (no image/audio
  * libraries in this container): `StubCodec.decode` derives deterministic
  * fake dimensions/features from the bytes. Swapping in a real decoder
  * (JPEG/PNG/ffmpeg) changes ONLY the codec object — the operator
  * signatures, schemas, and execution shape stay identical.
  *
  * Scale notes:
  *  - media bytes ride in parquet binary columns; the decode is a narrow
  *    `mapPartitions` (no shuffle), so throughput scales with executors
  *    and decode cost dominates — exactly the regime a real pipeline has;
  *  - `spark.sql.files.maxPartitionBytes` is the knob that sizes decode
  *    tasks when media blobs make rows heavy; the operators never collect
  *    media to the driver.
  */
object Multimodal {

  /** ======= STUB: deterministic fake codec (clearly marked) =======
    * Derives pseudo-metadata and a feature vector from the raw bytes.
    * A real implementation would decode the container format here. */
  object StubCodec {
    def decode(bytes: Array[Byte]): (Int, Int, Int, Array[Float]) = {
      // NOT a real decoder: dimensions/features are a deterministic
      // function of the bytes so tests are stable and plumbing is real.
      var h = 0xcbf29ce484222325L
      var i = 0
      while (i < bytes.length) { h ^= bytes(i); h *= 0x100000001b3L; i += 1 }
      val width = 64 + (math.abs(h % 1024)).toInt
      val height = 64 + (math.abs((h >>> 16) % 1024)).toInt
      val channels = 1 + (math.abs((h >>> 32) % 4)).toInt
      val features = Array.tabulate(8) { j =>
        (((h >>> (8 * (j % 8))) & 0xFF).toFloat / 255.0f)
      }
      (width, height, channels, features)
    }

    /** Fake frame sampler: fixed-size byte windows stand in for frames. */
    def sampleFrames(bytes: Array[Byte], frameBytes: Int, everyN: Int): Seq[Array[Byte]] =
      bytes.grouped(frameBytes).zipWithIndex
        .collect { case (chunk, idx) if idx % everyN == 0 => chunk }
        .toSeq
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

  /** Decode + featurize: batched per-partition map over binary media.
    * Output schema is the real one a downstream trainer would consume:
    * (asset_id, width, height, channels, n_bytes, features ARRAY<FLOAT>).
    */
  def decodeFeatures(assets: DataFrame): DataFrame = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.select(col("asset_id"), col("media")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // batch loop: a real codec would reuse native buffers across the
        // partition — the iterator shape already supports that
        it.map { case (id, bytes) =>
          val (w, h, c, feat) = StubCodec.decode(bytes)
          (id, w, h, c, bytes.length.toLong, feat)
        }
      }
      .toDF("asset_id", "width", "height", "channels", "n_bytes", "features")
      .orderBy("asset_id")
  }

  /** Frame sampling for video-like media: explode sampled frames with
    * per-frame features; one row per (asset, frame). */
  def sampleFrameFeatures(assets: DataFrame, frameBytes: Int = 64,
      everyN: Int = 2): DataFrame = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.select(col("asset_id"), col("media")).as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        StubCodec.sampleFrames(bytes, frameBytes, everyN).zipWithIndex.map {
          case (frame, idx) =>
            val (w, h, _, feat) = StubCodec.decode(frame)
            (id, idx.toLong, w, h, frame.length.toLong, feat)
        }
      }
      .toDF("asset_id", "frame_idx", "width", "height", "frame_bytes", "features")
      .orderBy("asset_id", "frame_idx")
  }

  /** Embedding-similarity over decoded features: joins the multimodal
    * path into the ANN operators (features -> near-dup), proving the
    * column flows end-to-end. */
  def featureNearDup(assets: DataFrame, tau: Double = 0.99): DataFrame = {
    val feats = decodeFeatures(assets)
      .select(col("asset_id").as("vec_id"), col("features").as("embedding"))
    SimilaritySearch.cosineNearDupExact(feats, tau)
      .select(col("vec_a").as("asset_a"), col("vec_b").as("asset_b"))
  }
}
