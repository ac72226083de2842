package graft.functions

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType}

/** `collect_list` with a hard per-group element cap: the buffer keeps at
  * most `cap + 1` elements and silently drops the rest, so a pathological
  * group (10⁸ rows behind one key) costs O(cap) memory instead of
  * materializing the whole group in one row — the reason plain
  * `collect_list` cannot be used for LSH bucket grouping on duplicate-heavy
  * corpora. A result of size ≤ cap is the COMPLETE group (in arrival order,
  * as with collect_list — callers normalize with sort_array); a result of
  * exactly cap + 1 elements means "overflowed: the group has more than cap
  * rows" and carries an arbitrary cap + 1 of them (callers treat it as a
  * marker and re-fetch the group's rows relationally). Skips nulls. Runs in
  * ObjectHashAggregate — hash aggregation, no sort, unlike a
  * count-over-window bucket-size pass.
  *
  * Type-generic like collect_list itself: values are kept as Catalyst
  * values of the child's type and (de)serialized through an
  * UnsafeProjection over `array<childType>` — long doc ids and string doc
  * ids both work, with no runtime cast to fail mid-job.
  */
case class CappedCollect(
    child: Expression,
    cap: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ArrayBuffer[Any]] with UnaryLike[Expression] {
  require(cap >= 1, "cap must be >= 1")

  override def createAggregationBuffer(): ArrayBuffer[Any] = ArrayBuffer.empty

  override def update(buffer: ArrayBuffer[Any], input: InternalRow): ArrayBuffer[Any] = {
    if (buffer.length <= cap) {
      val v = child.eval(input)
      // copy: non-primitive Catalyst values (UTF8String, arrays) can be
      // views over a reused input buffer
      if (v != null) buffer += InternalRow.copyValue(v)
    }
    buffer
  }

  override def merge(buffer: ArrayBuffer[Any], other: ArrayBuffer[Any]): ArrayBuffer[Any] = {
    var i = 0
    while (buffer.length <= cap && i < other.length) {
      buffer += other(i)
      i += 1
    }
    buffer
  }

  override def eval(buffer: ArrayBuffer[Any]): Any =
    new GenericArrayData(buffer.toArray)

  @transient private lazy val projection = UnsafeProjection.create(
    Array[DataType](ArrayType(child.dataType, containsNull = false)))

  override def serialize(buffer: ArrayBuffer[Any]): Array[Byte] =
    projection.apply(InternalRow.apply(new GenericArrayData(buffer.toArray))).getBytes

  override def deserialize(bytes: Array[Byte]): ArrayBuffer[Any] = {
    val buffer = ArrayBuffer.empty[Any]
    val row = new UnsafeRow(1)
    row.pointTo(bytes, bytes.length)
    row.getArray(0).foreach(child.dataType, (_, v: Any) => buffer += v)
    buffer
  }

  override def dataType: DataType = ArrayType(child.dataType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "capped_collect"

  override def withNewMutableAggBufferOffset(newOffset: Int): CappedCollect =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CappedCollect =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): CappedCollect =
    copy(child = newChild)
}
