package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** KMV (k-minimum-values / bottom-k theta) sketch as a native Catalyst
  * `TypedImperativeAggregate`: per group, retain the k smallest DISTINCT
  * 52-bit md5-derived hashes of the value column, emitted as a sorted
  * ascending LongArray.
  *
  * Why a third sketch next to HLL: HLL estimates per-group cardinality
  * but its registers cannot intersect — union is max-merge, intersection
  * has no estimator. A KMV sketch is a uniform theta-SAMPLE of the
  * distinct-value hash space (everything below the kth smallest hash),
  * so two groups' sketches support distinct-INTERSECTION estimation
  * (Beyer et al., SIGMOD 2007; the DataSketches theta family): clip both
  * to the shared theta = min(theta_A, theta_B), count common hashes,
  * scale by the sampled fraction. That is the "how many users did both
  * X and Y" question at 100 TB, answerable from two 2 KB sketches.
  *
  * Scale shape: the buffer is a bounded sorted set (<= k longs, k=256
  * default => 2 KB), partially aggregated MAP-SIDE through
  * ObjectHashAggregate and merged by set-union-then-clip — the shuffle
  * moves one <=2 KB buffer per group per map partition, independent of
  * cardinality. Sketches are mergeable across days/shards the same way
  * (union of bottom-k sets is the bottom-k of the union).
  *
  * Determinism/oracle: the hash is the repo-standard md5 hex prefix —
  * chars [1,13] as a 52-bit non-negative BIGINT — so DuckDB replays the
  * exact retained set with `row_number() OVER (ORDER BY hash) <= k`
  * (see [[graft.operators.Sketches.kmvDistinctSql]]); estimates are
  * integer divisions of exact integers. No engine-private hashing ever
  * enters the sketch, which is what `theta_sketch` built-ins can never
  * offer across engines.
  */
case class KmvSketchAgg(
    child: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]]
  with UnaryLike[Expression] {

  require(k >= 2 && k <= 65536, s"kmv_sketch k must be in [2, 65536], got $k")

  override def prettyName: String = "kmv_sketch"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a STRING argument, got ${child.dataType.simpleString}")

  @transient private lazy val md = MessageDigest.getInstance("MD5")

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  /** 52-bit hash = md5 hex chars [1,13] (4+48 bits parsed in two chunks
    * to stay in Long range) — the same hex-prefix discipline as the HLL
    * register layout, replayed in SQL by [[graft.operators.OracleSql]]. */
  private def hash52(bytes: Array[Byte]): Long = {
    md.reset()
    val d = md.digest(bytes)
    // first 6.5 bytes big-endian: 13 hex chars = 52 bits
    ((d(0) & 0xffL) << 44) | ((d(1) & 0xffL) << 36) | ((d(2) & 0xffL) << 28) |
      ((d(3) & 0xffL) << 20) | ((d(4) & 0xffL) << 12) | ((d(5) & 0xffL) << 4) |
      ((d(6) & 0xf0L) >> 4)
  }

  override def update(buf: java.util.TreeSet[java.lang.Long],
      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = hash52(v.asInstanceOf[UTF8String].getBytes)
      if (buf.size < k) buf.add(h)
      else if (h < buf.last()) { buf.add(h); if (buf.size > k) buf.pollLast() }
    }
    buf
  }

  override def merge(b1: java.util.TreeSet[java.lang.Long],
      b2: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = b2.iterator()
    while (it.hasNext) {
      val h = it.next()
      if (b1.size < k) b1.add(h)
      else if (h < b1.last()) { b1.add(h); if (b1.size > k) b1.pollLast() }
    }
    b1
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
    val out = new Array[Any](buf.size)
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next().longValue(); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + 8 * buf.size)
    bb.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next().longValue())
    bb.array()
  }

  override def deserialize(storage: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val bb = java.nio.ByteBuffer.wrap(storage)
    val n = bb.getInt
    val s = new java.util.TreeSet[java.lang.Long]()
    var i = 0
    while (i < n) { s.add(bb.getLong); i += 1 }
    s
  }

  override def withNewMutableAggBufferOffset(offset: Int): KmvSketchAgg =
    copy(mutableAggBufferOffset = offset)

  override def withNewInputAggBufferOffset(offset: Int): KmvSketchAgg =
    copy(inputAggBufferOffset = offset)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
