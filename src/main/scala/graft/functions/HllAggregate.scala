package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.operators.Sketches

/** HyperLogLog distinct-count estimate as a native Catalyst
  * `TypedImperativeAggregate` — the production shape of
  * `Sketches.hllDistinct`'s register table.
  *
  * The relational spelling shuffles one (grp, bucket, max-rank) row per
  * FILLED REGISTER per group (bounded, but still a register-table
  * shuffle); this aggregate keeps the full m=4096-register sketch as a
  * 4 KB byte-array buffer that is partially aggregated MAP-SIDE and
  * merged by element-wise max — the shuffle moves exactly ONE 4 KB
  * buffer per group per map partition, independent of cardinality AND
  * of register fill. This is how `approx_count_distinct` works
  * internally; the difference is that this sketch is the repo's
  * deterministic md5-derived one (`Sketches.hllRegisterRows` layout:
  * hex[1,3] -> 12-bit register index, hex[4,16] -> 52-bit tail, rank =
  * 53 - bitlen), so it lands on the SAME estimates as the relational
  * spelling and shares its DuckDB oracle — an engine-replayable
  * approximate aggregate, which `approx_count_distinct` can never be.
  *
  * Physical plan: `ObjectHashAggregate` (TypedImperativeAggregate's
  * exec), partial + final, asserted in PlanSpec.
  */
case class HllSketchAgg(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]]
  with UnaryLike[Expression] {

  override def prettyName: String = "hll_sketch"
  override def dataType: DataType = LongType
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a STRING argument, got ${child.dataType.simpleString}")

  @transient private lazy val md = MessageDigest.getInstance("MD5")

  override def createAggregationBuffer(): Array[Byte] =
    new Array[Byte](Sketches.HllM)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      val hex = {
        md.reset()
        val d = md.digest(v.asInstanceOf[UTF8String].getBytes)
        val sb = new java.lang.StringBuilder(32)
        var i = 0
        while (i < d.length) {
          sb.append(Character.forDigit((d(i) >> 4) & 0xf, 16))
          sb.append(Character.forDigit(d(i) & 0xf, 16))
          i += 1
        }
        sb.toString
      }
      // Sketches.hllRegisterRows layout (1-based SQL substring positions):
      // chars [1,3] register index; [4,8]+[12,5] -> 32+20-bit tail
      val bucket = Integer.parseInt(hex.substring(0, 3), 16)
      val tail = java.lang.Long.parseLong(hex.substring(3, 11), 16) * 1048576L +
        java.lang.Long.parseLong(hex.substring(11, 16), 16)
      val rank =
        (if (tail == 0L) 53 else 53 - (64 - java.lang.Long.numberOfLeadingZeros(tail))).toByte
      if (rank > buf(bucket)) buf(bucket) = rank
    }
    buf
  }

  override def merge(b1: Array[Byte], b2: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < b1.length) {
      if (b2(i) > b1(i)) b1(i) = b2(i)
      i += 1
    }
    b1
  }

  override def eval(buf: Array[Byte]): Any = {
    // identical formula (and register iteration order) to
    // Sketches.hllEstimate; the final round absorbs summation-order noise
    val m = Sketches.HllM
    var zFilled = 0.0
    var nRegs = 0
    var i = 0
    while (i < m) {
      val r = buf(i)
      if (r > 0) { zFilled += math.pow(2.0, -r.toDouble); nRegs += 1 }
      i += 1
    }
    val vEmpty = m - nRegs
    val z = zFilled + vEmpty.toDouble
    val eRaw = Sketches.HllAlpha * m.toDouble * m.toDouble / z
    val e =
      if (eRaw <= 2.5 * m && vEmpty > 0) m.toDouble * math.log(m.toDouble / vEmpty.toDouble)
      else eRaw
    math.round(e)
  }

  override def serialize(buffer: Array[Byte]): Array[Byte] = buffer

  override def deserialize(storage: Array[Byte]): Array[Byte] = storage

  override def withNewMutableAggBufferOffset(offset: Int): HllSketchAgg =
    copy(mutableAggBufferOffset = offset)

  override def withNewInputAggBufferOffset(offset: Int): HllSketchAgg =
    copy(inputAggBufferOffset = offset)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
