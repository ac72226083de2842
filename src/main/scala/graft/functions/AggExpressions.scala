package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** `collect_list` over a LONG column with a hard per-group element cap: the
  * buffer keeps at most `cap + 1` elements and silently drops the rest, so a
  * pathological group (10⁸ rows behind one key) costs O(cap) memory instead
  * of materializing the whole group in one row — the reason plain
  * `collect_list` cannot be used for LSH bucket grouping on duplicate-heavy
  * corpora. A result of size ≤ cap is the COMPLETE group (in arrival order,
  * as with collect_list — callers normalize with sort_array); a result of
  * exactly cap + 1 elements means "overflowed: the group has more than cap
  * rows" and carries an arbitrary cap + 1 of them (callers treat it as a
  * marker and re-fetch the group's rows relationally). Skips nulls. Runs in
  * ObjectHashAggregate — hash aggregation, no sort, unlike a
  * count-over-window bucket-size pass.
  */
case class CappedLongCollect(
    child: Expression,
    cap: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ArrayBuffer[Long]] with UnaryLike[Expression] {
  require(cap >= 1, "cap must be >= 1")

  override def createAggregationBuffer(): ArrayBuffer[Long] = ArrayBuffer.empty

  override def update(buffer: ArrayBuffer[Long], input: InternalRow): ArrayBuffer[Long] = {
    if (buffer.length <= cap) {
      val v = child.eval(input)
      if (v != null) buffer += v.asInstanceOf[Long]
    }
    buffer
  }

  override def merge(buffer: ArrayBuffer[Long], other: ArrayBuffer[Long]): ArrayBuffer[Long] = {
    var i = 0
    while (buffer.length <= cap && i < other.length) {
      buffer += other(i)
      i += 1
    }
    buffer
  }

  override def eval(buffer: ArrayBuffer[Long]): Any =
    new GenericArrayData(buffer.toArray)

  override def serialize(buffer: ArrayBuffer[Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream(4 + 8 * buffer.length)
    val out = new DataOutputStream(bos)
    out.writeInt(buffer.length)
    buffer.foreach(out.writeLong)
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): ArrayBuffer[Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val b = new ArrayBuffer[Long](n)
    var i = 0
    while (i < n) { b += in.readLong(); i += 1 }
    b
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "capped_long_collect"

  override def withNewMutableAggBufferOffset(newOffset: Int): CappedLongCollect =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CappedLongCollect =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): CappedLongCollect =
    copy(child = newChild)
}
