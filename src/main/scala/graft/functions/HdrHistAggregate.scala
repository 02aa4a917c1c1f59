package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{DataType, LongType}

/** Integer HDR-histogram quantile as a native Catalyst
  * `TypedImperativeAggregate` — the quantile member of the sketch family
  * (HLL for distincts, CMS for frequencies, top-k for heavy hitters...
  * and this for distributions).
  *
  * Why a sketch and not exact quantiles: the repo's exact spelling
  * (CorpusStats.lengthQuantiles) shuffles one row per DISTINCT VALUE per
  * group — bounded only by the value domain. This aggregate keeps a
  * FIXED 7.5 KB bucket table per group regardless of domain: non-negative
  * longs bucket into HDR buckets — exact below 2^k, then one bucket per
  * (exponent, top-k mantissa bits) — so the relative error of a reported
  * quantile is < 2^-k (k=4: 6.25%) at ANY scale, and buffers merge by
  * element-wise add (map-side partials through ObjectHashAggregate, the
  * HllSketchAgg discipline).
  *
  * Everything is integer arithmetic on the VALUES (the only double is
  * the `ceil(q*n)` rank target, correctly-rounded IEEE ops), so the
  * DuckDB oracle replays the EXACT bucket assignment and the exact
  * reported quantile: bucket = ((e-k+1)<<k) | topBits via
  * `length(printf('%b', x)) - 1`, the same formula in SQL.
  *
  * Result: the LOWER BOUND of the bucket containing the type-1 quantile
  * (rank ceil(q*n)) — a deterministic BIGINT, never an interpolation.
  */
object HdrHist {
  /** Sub-bucket precision bits: 2^K linear buckets per octave. */
  val K = 4
  /** Bucket count: values < 2^K map to themselves; e in [K, 62] maps to
    * ((e-K+1)<<K) | m, so the top bucket is ((62-K+1)<<K) + (2^K-1). */
  val NBuckets: Int = ((62 - K + 1) << K) + (1 << K)

  def bucketOf(x0: Long): Int = {
    val x = if (x0 < 0L) 0L else x0
    if (x < (1L << K)) x.toInt
    else {
      val e = 63 - java.lang.Long.numberOfLeadingZeros(x)
      val m = ((x >>> (e - K)) & ((1L << K) - 1L)).toInt
      ((e - K + 1) << K) + m
    }
  }

  def lowerBound(b: Int): Long =
    if (b < (1 << K)) b.toLong
    else {
      val e = (b >> K) + K - 1
      val m = (b & ((1 << K) - 1)).toLong
      (1L << e) | (m << (e - K))
    }
}

case class HdrQuantileAgg(
    child: Expression,
    q: Double,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]]
  with UnaryLike[Expression] {

  require(q > 0.0 && q <= 1.0, s"hdr_quantile requires q in (0, 1], got $q")

  override def prettyName: String = "hdr_quantile"
  override def dataType: DataType = LongType
  override def nullable: Boolean = true // empty group -> null

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a BIGINT argument, got ${child.dataType.simpleString}")

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](HdrHist.NBuckets)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) buf(HdrHist.bucketOf(v.asInstanceOf[Long])) += 1L
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < b1.length) { b1(i) += b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any = {
    var n = 0L
    var i = 0
    while (i < buf.length) { n += buf(i); i += 1 }
    if (n == 0L) null
    else {
      val target = math.ceil(q * n.toDouble).toLong
      var cum = 0L
      var b = 0
      while (b < buf.length && cum + buf(b) < target) { cum += buf(b); b += 1 }
      HdrHist.lowerBound(b)
    }
  }

  override def serialize(buffer: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buffer.length * 8)
    bb.asLongBuffer().put(buffer)
    bb.array()
  }

  override def deserialize(storage: Array[Byte]): Array[Long] = {
    val out = new Array[Long](storage.length / 8)
    java.nio.ByteBuffer.wrap(storage).asLongBuffer().get(out)
    out
  }

  override def withNewMutableAggBufferOffset(offset: Int): HdrQuantileAgg =
    copy(mutableAggBufferOffset = offset)

  override def withNewInputAggBufferOffset(offset: Int): HdrQuantileAgg =
    copy(inputAggBufferOffset = offset)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
