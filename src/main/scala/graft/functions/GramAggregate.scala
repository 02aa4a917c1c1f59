package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** Lower-triangle Gram matrix of quantized embedding vectors as ONE
  * native aggregate: `gram_lower(vec, d)` returns the d*(d+1)/2 exact
  * integer sums  G[i][j] = Σ_rows q_i * q_j  (i >= j) over
  * `q = floor(x * 2^20)` — the repo-standard integer quantization, so
  * the matrix replays bit-for-bit in DuckDB.
  *
  * This is THE distributed primitive under PCA/covariance/whitening: at
  * 100 TB the only data-scale work is this single aggregation — a fixed
  * 16 KB (d=64) buffer per partition, map-side partials through
  * ObjectHashAggregate, merged by element-wise add. Everything
  * downstream (eigensolve, component selection) happens on the d x d
  * result on the driver. The naive spelling (explode d^2 cells per row,
  * shuffle, group) moves d^2/2 rows PER INPUT ROW; this moves one
  * buffer per partition regardless of input size.
  *
  * Overflow budget: |q| <= 2^20 * max|x|; with unit-scale embeddings a
  * product is ~2^40, so ~2^23 rows fit a partial sum comfortably —
  * beyond that, shard the aggregation (e.g. by id range) and add the
  * integer partials, which stays exact. */
case class GramLowerAgg(
    child: Expression,
    d: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]]
  with UnaryLike[Expression] {

  require(d >= 1 && d <= 512, s"gram_lower d must be in [1, 512], got $d")

  private val cells = d * (d + 1) / 2

  override def prettyName: String = "gram_lower"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<FLOAT>, got ${other.simpleString}")
  }

  override def createAggregationBuffer(): Array[Long] = new Array[Long](cells)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      val n = math.min(d, arr.numElements())
      val q = new Array[Long](d)
      var i = 0
      while (i < n) {
        q(i) = math.floor(arr.getFloat(i).toDouble * 1048576.0).toLong
        i += 1
      }
      var p = 0
      i = 0
      while (i < d) {
        val qi = q(i)
        var j = 0
        while (j <= i) { buf(p) += qi * q(j); j += 1; p += 1 }
        i += 1
      }
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < cells) { b1(i) += b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any =
    new GenericArrayData(buf.map(l => l: Any))

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 * cells)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(storage: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(storage)
    Array.fill(cells)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(offset: Int): GramLowerAgg =
    copy(mutableAggBufferOffset = offset)

  override def withNewInputAggBufferOffset(offset: Int): GramLowerAgg =
    copy(inputAggBufferOffset = offset)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
