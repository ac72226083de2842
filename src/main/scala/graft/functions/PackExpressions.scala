package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/**
 * Lossless int-array <-> binary codec used to shrink shuffle payloads
 * (optimization-guide §2.3 "shuffle fewer bytes"): token arrays cross
 * exchanges as zigzag-delta-varint bytes instead of 4-byte-per-element
 * UnsafeArrayData. LLM token streams sit in a <= 2^17 vocabulary, so plain
 * values need <= 3 varint bytes and locally-correlated streams delta down
 * to ~1 byte/token; worst case is 5 bytes/element (arbitrary int32), still
 * bounded. The same family as parquet's DELTA_BINARY_PACKED — applied to
 * the exchange, where Spark has no columnar re-encoding of its own.
 *
 * Codegen'd expressions (never UDFs) so pack/unpack stay inside
 * whole-stage codegen on both sides of the exchange.
 */
object TokenCodec {

  /** Exact varint byte length of an already-zigzagged value. */
  @inline private def vlen(z: Long): Int = {
    var v = z; var n = 1
    while ((v & ~0x7fL) != 0) { v >>>= 7; n += 1 }
    n
  }

  @inline private def zigzag(v: Long): Long = (v << 1) ^ (v >> 63)

  /** Encode: [varint (n<<1 | hasNulls)] then, with nulls, a bitmap of
    * ceil(n/8) bytes; then zigzag-varint of first value and deltas over the
    * non-null elements. Null-safe for arbitrary array<int> input. */
  def pack(arr: ArrayData): Array[Byte] = {
    val n = arr.numElements()
    var hasNulls = false
    var i = 0
    while (i < n && !hasNulls) { if (arr.isNullAt(i)) hasNulls = true; i += 1 }
    val header = (n.toLong << 1) | (if (hasNulls) 1L else 0L)
    // pass 1: exact output size
    var size = vlen(header) + (if (hasNulls) (n + 7) / 8 else 0)
    var prev = 0L
    i = 0
    while (i < n) {
      if (!hasNulls || !arr.isNullAt(i)) {
        val v = arr.getInt(i).toLong
        size += vlen(zigzag(v - prev))
        prev = v
      }
      i += 1
    }
    // pass 2: fill
    val out = new Array[Byte](size)
    var p = writeVarint(out, 0, header)
    if (hasNulls) {
      val base = p
      i = 0
      while (i < n) {
        if (arr.isNullAt(i)) out(base + (i >> 3)) = (out(base + (i >> 3)) | (1 << (i & 7))).toByte
        i += 1
      }
      p += (n + 7) / 8
    }
    prev = 0L
    i = 0
    while (i < n) {
      if (!hasNulls || !arr.isNullAt(i)) {
        val v = arr.getInt(i).toLong
        p = writeVarint(out, p, zigzag(v - prev))
        prev = v
      }
      i += 1
    }
    out
  }

  @inline private def writeVarint(out: Array[Byte], pos: Int, z: Long): Int = {
    var v = z; var p = pos
    while ((v & ~0x7fL) != 0) { out(p) = ((v & 0x7f) | 0x80).toByte; p += 1; v >>>= 7 }
    out(p) = v.toByte
    p + 1
  }

  /** Decode back to an array (UnsafeArrayData for the dense common case —
    * no per-element boxing). */
  def unpack(bytes: Array[Byte]): ArrayData = {
    var p = 0
    var shift = 0
    var header = 0L
    var b = 0L
    do {
      b = bytes(p) & 0xffL; header |= (b & 0x7f) << shift; shift += 7; p += 1
    } while ((b & 0x80) != 0)
    val n = (header >>> 1).toInt
    val hasNulls = (header & 1) != 0
    if (!hasNulls) {
      val vals = new Array[Int](n)
      var prev = 0L
      var i = 0
      while (i < n) {
        var z = 0L; shift = 0
        do { b = bytes(p) & 0xffL; z |= (b & 0x7f) << shift; shift += 7; p += 1 } while ((b & 0x80) != 0)
        prev += (z >>> 1) ^ -(z & 1)
        vals(i) = prev.toInt
        i += 1
      }
      org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(vals)
    } else {
      val base = p
      p += (n + 7) / 8
      val vals = new Array[Any](n)
      var prev = 0L
      var i = 0
      while (i < n) {
        if ((bytes(base + (i >> 3)) & (1 << (i & 7))) == 0) {
          var z = 0L; shift = 0
          do { b = bytes(p) & 0xffL; z |= (b & 0x7f) << shift; shift += 7; p += 1 } while ((b & 0x80) != 0)
          prev += (z >>> 1) ^ -(z & 1)
          vals(i) = prev.toInt
        }
        i += 1
      }
      new org.apache.spark.sql.catalyst.util.GenericArrayData(vals)
    }
  }
}

/** array<int> -> binary (see [[TokenCodec]]). */
case class PackTokens(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override protected def nullSafeEval(input: Any): Any =
    TokenCodec.pack(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TokenCodec.pack($c)")
  override protected def withNewChildInternal(newChild: Expression): PackTokens =
    copy(child = newChild)
}

/** binary -> array<int> (inverse of [[PackTokens]]). */
case class UnpackTokens(child: Expression, elementsNullable: Boolean = true)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = elementsNullable)
  override protected def nullSafeEval(input: Any): Any =
    TokenCodec.unpack(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TokenCodec.unpack($c)")
  override protected def withNewChildInternal(newChild: Expression): UnpackTokens =
    copy(child = newChild)
}
