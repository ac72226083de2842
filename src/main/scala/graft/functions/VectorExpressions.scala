package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/**
 * Native dot product for embedding columns. The pure-column formulation
 * (`aggregate(zip_with(a, b, x*y), 0.0, +)` in [[graft.text.AnnOps]])
 * stays as the semantic reference the DuckDB oracle mirrors, but Catalyst
 * interprets higher-order-function lambdas — three tree-walks of 2×dim
 * element visits per cosine made the pair-verify stage the measured cost
 * center of embedding dedup and ANN scoring. This computes the identical
 * value (left-to-right double summation over ascending indexes, the
 * aggregate fold's order, so rounded-to-6dp oracle outputs cannot move) in
 * one tight JVM loop per row, and generates real code — the projection
 * stays inside whole-stage codegen (a CodegenFallback would box an
 * InternalRow per row on the corpus-scan path). Interpreted eval and the
 * generated call share [[dotInto]], so the two paths cannot diverge.
 *
 * zip_with semantics preserved exactly: mismatched lengths pad the shorter
 * side with null, and `acc + null` nulls the whole fold — so any length
 * mismatch or null element yields null, like the columnar form. That also
 * means the result is nullable EVEN IF both inputs are non-nullable
 * (lengths are data, not schema), hence the unconditional nullable=true.
 */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "vec_dot"

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def numericArray(e: Expression): Boolean = e.dataType match {
      case ArrayType(t, _) => t.isInstanceOf[NumericType]
      case _               => false
    }
    if (numericArray(left) && numericArray(right))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects two numeric arrays, got " +
          s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  @transient private lazy val leftType = elemType(left)
  @transient private lazy val rightType = elemType(right)

  private def get(a: ArrayData, i: Int, t: DataType): Double = t match {
    case FloatType   => a.getFloat(i).toDouble
    case DoubleType  => a.getDouble(i)
    case IntegerType => a.getInt(i).toDouble
    case LongType    => a.getLong(i).toDouble
    case ShortType   => a.getShort(i).toDouble
    case ByteType    => a.getByte(i).toDouble
    case other       => sys.error(s"vec_dot: unsupported element type $other")
  }

  /** The one kernel both eval and generated code call. Writes the dot into
    * `out(0)` and returns true, or returns false when the fold is null
    * (length mismatch or null element). Caller owns the scratch buffer —
    * the generated class holds one per operator instance, so the hot path
    * allocates nothing per row. */
  def dotInto(a: ArrayData, b: ArrayData, out: Array[Double]): Boolean = {
    val n = a.numElements()
    if (n != b.numElements()) return false
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return false
      acc += get(a, i, leftType) * get(b, i, rightType)
      i += 1
    }
    out(0) = acc
    true
  }

  protected override def nullSafeEval(l: Any, r: Any): Any = {
    val out = new Array[Double](1)
    if (dotInto(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData], out)) out(0)
    else null
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val l = left.genCode(ctx)
    val r = right.genCode(ctx)
    val ref = ctx.addReferenceObj("dotExpr", this, "graft.functions.DotProduct")
    val buf = ctx.addMutableState("double[]", "dotBuf", v => s"$v = new double[1];")
    ev.copy(code = code"""
      ${l.code}
      ${r.code}
      boolean ${ev.isNull} = true;
      double ${ev.value} = 0.0;
      if (!${l.isNull} && !${r.isNull} && $ref.dotInto(
          (org.apache.spark.sql.catalyst.util.ArrayData) ${l.value},
          (org.apache.spark.sql.catalyst.util.ArrayData) ${r.value}, $buf)) {
        ${ev.isNull} = false;
        ${ev.value} = $buf[0];
      }
    """)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/**
 * Native random-hyperplane LSH signature (see
 * [[graft.text.AnnOps.lshSignature]] for the integer-math design and the
 * columnar reference the DuckDB oracle mirrors). One JVM loop computes all
 * `planes` projections instead of `planes` interpreted
 * aggregate/zip_with/sequence folds per row — the corpus-scan cost center
 * of LSH bucketing at corpus scale. Generates real code (the bucketing
 * projection stays inside whole-stage codegen); interpreted eval and the
 * generated call share [[sigOf]], so the two paths cannot diverge.
 *
 * Exactness vs the columnar form, including its null algebra: a NULL
 * vector or any NULL element nulls every plane's fold, and each plane's
 * `when(proj > 0, bit).otherwise(0)` turns that null into 0 — so the
 * signature is 0L, never NULL. A non-finite element would ANSI-throw in
 * the columnar `floor(x*1e6)::long` cast; this throws the same class.
 */
case class LshSignature(child: Expression, planes: Int)
    extends UnaryExpression {

  require(planes >= 1 && planes <= 62, s"planes out of range: $planes")

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "lsh_signature"

  private val M = 1000003L
  @transient private lazy val mulA: Array[Long] =
    Array.tabulate(planes)(p => (2654435761L * (p + 1)) % M)
  @transient private lazy val mulB: Array[Long] =
    Array.tabulate(planes)(p => (179426549L * (p + 1) + 97L) % M)

  /** Plane weights depend only on (plane, element index), so for the
    * fixed-dim embedding corpora this path scans they are computed once per
    * task, not once per row (the floorMod per element per plane otherwise
    * dominates the fold). Single-reference holder: reads/writes are atomic,
    * a racing task at worst recomputes. */
  @transient private var weightCache: (Int, Array[Array[Long]]) = _
  private def planeWeights(n: Int): Array[Array[Long]] = {
    val c = weightCache
    if (c != null && c._1 == n) return c._2
    val half = (M - 1) / 2
    val w = Array.ofDim[Long](planes, n)
    var p = 0
    while (p < planes) {
      val aa = mulA(p); val bb = mulB(p)
      var j = 0
      while (j < n) {
        val idx = (j + 1).toLong
        w(p)(j) = java.lang.Math.floorMod(idx * aa + idx * idx * bb, M) - half
        j += 1
      }
      p += 1
    }
    weightCache = (n, w)
    w
  }

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = child.dataType match {
    case ArrayType(t, _) if t.isInstanceOf[NumericType] =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    case other =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects a numeric array, got ${other.simpleString}")
  }

  @transient private lazy val elemType =
    child.dataType.asInstanceOf[ArrayType].elementType

  private def get(a: ArrayData, i: Int): Double = elemType match {
    case FloatType   => a.getFloat(i).toDouble
    case DoubleType  => a.getDouble(i)
    case IntegerType => a.getInt(i).toDouble
    case LongType    => a.getLong(i).toDouble
    case ShortType   => a.getShort(i).toDouble
    case ByteType    => a.getByte(i).toDouble
    case other       => sys.error(s"lsh_signature: unsupported element type $other")
  }

  /** The one kernel both eval and generated code call (null vector handled
    * by the caller — a null child evaluates to signature 0L). */
  def sigOf(a: ArrayData): Long = {
    val n = a.numElements()
    val vq = new Array[Long](n)
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) return 0L // null element nulls every fold
      val d = get(a, i) * 1000000.0
      if (d.isNaN || d.isInfinite)
        throw new ArithmeticException(s"lsh_signature: non-finite element $d")
      vq(i) = math.floor(d).toLong
      i += 1
    }
    val w = planeWeights(n)
    var sig = 0L
    var p = 0
    while (p < planes) {
      val wp = w(p)
      var acc = 0L
      var j = 0
      while (j < n) {
        acc += vq(j) * wp(j)
        j += 1
      }
      if (acc > 0) sig |= 1L << p
      p += 1
    }
    sig
  }

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) 0L // null vector -> every plane folds to null -> bit 0
    else sigOf(v.asInstanceOf[ArrayData])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val ref = ctx.addReferenceObj("lshExpr", this, "graft.functions.LshSignature")
    ev.copy(
      code = code"""
        ${c.code}
        long ${ev.value} = ${c.isNull} ? 0L : $ref.sigOf(
          (org.apache.spark.sql.catalyst.util.ArrayData) ${c.value});
      """,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): LshSignature =
    copy(child = newChild)
}
