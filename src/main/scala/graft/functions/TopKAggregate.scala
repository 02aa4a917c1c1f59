package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Grouped top-k as a native Catalyst `TypedImperativeAggregate` — the
  * direct spelling of "top k rows per group".
  *
  * This aggregate keeps a bounded k-pair buffer per group, partially
  * aggregated MAP-SIDE (ObjectHashAggregate partial): the shuffle moves
  * at most k (ord, id) pairs per group per map partition, independent
  * of group size; the final merge keeps the overall top k.
  *
  * Vs the window spelling (`row_number() OVER (...) <= k`,
  * q6_window_rank): Spark 4's InferWindowGroupLimit already bounds that
  * plan's shuffle (a partial WindowGroupLimit keeps <= k rows per group
  * per map partition), so the shuffle volumes are comparable. What this
  * aggregate removes is the per-partition SORT the group-limit requires
  * beneath it — O(rows log rows) map-side, and again after the
  * exchange — replaced by one sortless single-pass hash aggregation
  * with O(k) buffer work per row; and it expresses top-k directly in
  * aggregations where no rank-filter pattern exists for the optimizer
  * to infer from (e.g. streaming state, see stream_top_users).
  *
  * Ordering contract: descending by `ord`, ties broken ascending by
  * `id` — integer-only and total, so any engine (and any partitioning,
  * merge order, or retry) lands on the identical result; the DuckDB
  * window replay is a full hash oracle. Buffer entries are compared the
  * same way during update and merge; `eval` emits the sorted
  * ARRAY<STRUCT<ord, id>>.
  */
case class TopKPairsAgg(
    left: Expression,  // ord: BIGINT — ranking value, descending
    right: Expression, // id:  BIGINT — unique tie-break, ascending
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.ArrayList[Array[Long]]]
  with BinaryLike[Expression] {

  require(k > 0, s"topk_pairs requires k > 0, got $k")

  override def prettyName: String = "topk_pairs"
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("ord", LongType, nullable = false),
      StructField("id", LongType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (BIGINT, BIGINT) arguments, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")

  /** (ord desc, id asc): true iff a ranks strictly ahead of b. */
  private def ahead(aOrd: Long, aId: Long, bOrd: Long, bId: Long): Boolean =
    aOrd > bOrd || (aOrd == bOrd && aId < bId)

  // buffer: up to k (ord, id) pairs, UNSORTED; the worst entry is found
  // by scan on insert-when-full (k is small — the scan beats heap
  // bookkeeping at these sizes and keeps serialization trivial)
  override def createAggregationBuffer(): java.util.ArrayList[Array[Long]] =
    new java.util.ArrayList[Array[Long]](k)

  private def insert(buf: java.util.ArrayList[Array[Long]],
      ord: Long, id: Long): Unit = {
    if (buf.size < k) {
      buf.add(Array(ord, id))
    } else {
      // index of the WORST retained pair
      var worst = 0
      var i = 1
      while (i < buf.size) {
        val w = buf.get(worst); val c = buf.get(i)
        if (ahead(w(0), w(1), c(0), c(1))) worst = i
        i += 1
      }
      val w = buf.get(worst)
      if (ahead(ord, id, w(0), w(1))) { w(0) = ord; w(1) = id }
    }
  }

  override def update(buf: java.util.ArrayList[Array[Long]],
      input: InternalRow): java.util.ArrayList[Array[Long]] = {
    val o = left.eval(input)
    val d = right.eval(input)
    if (o != null && d != null) {
      insert(buf, o.asInstanceOf[Long], d.asInstanceOf[Long])
    }
    buf
  }

  override def merge(b1: java.util.ArrayList[Array[Long]],
      b2: java.util.ArrayList[Array[Long]]): java.util.ArrayList[Array[Long]] = {
    var i = 0
    while (i < b2.size) { insert(b1, b2.get(i)(0), b2.get(i)(1)); i += 1 }
    b1
  }

  override def eval(buf: java.util.ArrayList[Array[Long]]): Any = {
    val arr = new Array[Array[Long]](buf.size)
    buf.toArray(arr)
    java.util.Arrays.sort(arr, new java.util.Comparator[Array[Long]] {
      override def compare(a: Array[Long], b: Array[Long]): Int =
        if (a(0) != b(0)) java.lang.Long.compare(b(0), a(0))
        else java.lang.Long.compare(a(1), b(1))
    })
    new GenericArrayData(arr.map(p => InternalRow(p(0), p(1))))
  }

  override def serialize(buf: java.util.ArrayList[Array[Long]]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + buf.size * 16)
    bb.putInt(buf.size)
    var i = 0
    while (i < buf.size) { bb.putLong(buf.get(i)(0)); bb.putLong(buf.get(i)(1)); i += 1 }
    bb.array()
  }

  override def deserialize(storage: Array[Byte]): java.util.ArrayList[Array[Long]] = {
    val bb = java.nio.ByteBuffer.wrap(storage)
    val n = bb.getInt
    val buf = new java.util.ArrayList[Array[Long]](math.max(n, k))
    var i = 0
    while (i < n) { buf.add(Array(bb.getLong, bb.getLong)); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): TopKPairsAgg =
    copy(mutableAggBufferOffset = offset)

  override def withNewInputAggBufferOffset(offset: Int): TopKPairsAgg =
    copy(inputAggBufferOffset = offset)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
