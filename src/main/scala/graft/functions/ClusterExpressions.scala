package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.CatalystTypeConverters
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.graftbridge.{ColumnBridge => ExpressionUtils}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

/**
 * Native Catalyst expressions for the clustering keys — the custom surface
 * SURVEY.md §4 calls out: Spark has no z-order/hilbert scalar, so these are
 * code-generated `Expression`s (not UDFs) that stay inside whole-stage
 * codegen. Reference analogue: the "migration-op reduction" class of
 * engine-owned optimizations (reference
 * nodestream/schema/migrations/operations.py:94-149) — work Catalyst cannot
 * do for us.
 */

/** Range-partition id: bucket index of `child` within sorted `bounds`
  * (exclusive uppers, internal Catalyst values), multiplied by `scale`.
  * Nulls sort to bucket 0. `scale` spreads low-cardinality dimensions
  * (e.g. 4 sources) across the full curve bit-range so they carry real
  * weight in the interleave instead of only the lowest bits. */
case class RangeBucket(child: Expression, bounds: Array[AnyRef], scale: Int = 1)
    extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = false

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) 0
    else Curves.bucketOf(v.asInstanceOf[Comparable[Any]], bounds) * scale
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bounds", bounds, "java.lang.Object[]")
    val c = child.genCode(ctx)
    ev.copy(
      code = code"""
        ${c.code}
        int ${ev.value} = ${c.isNull} ? 0 :
          graft.functions.Curves.bucketOf((java.lang.Comparable) ${c.value}, $ref) * $scale;
      """,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): RangeBucket =
    copy(child = newChild)
}

/** Morton (z-order) or Hilbert index over integer bucket coordinates. */
case class CurveIndex(children: Seq[Expression], bits: Int, hilbert: Boolean)
    extends Expression {
  require(children.nonEmpty && children.size * bits <= 63,
    s"curve needs dims*bits<=63, got ${children.size}*$bits")
  override def dataType: DataType = LongType
  override def nullable: Boolean = false

  override def eval(input: InternalRow): Any = {
    val coords = new Array[Int](children.length)
    var i = 0
    while (i < children.length) {
      val v = children(i).eval(input)
      coords(i) = if (v == null) 0 else v.asInstanceOf[Int]
      i += 1
    }
    if (hilbert) Curves.hilbertValue(coords, bits) else Curves.zValue(coords, bits)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val evals = children.map(_.genCode(ctx))
    val arr = ctx.freshName("coords")
    val assigns = evals.zipWithIndex.map { case (e, i) =>
      s"""${e.code}
         |$arr[$i] = ${e.isNull} ? 0 : ${e.value};""".stripMargin
    }.mkString("\n")
    val fn = if (hilbert) "hilbertValue" else "zValue"
    ev.copy(
      code = code"""
        int[] $arr = new int[${children.length}];
        $assigns
        long ${ev.value} = graft.functions.Curves.$fn($arr, $bits);
      """,
      isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CurveIndex = copy(children = newChildren)
}

/**
 * Driver-side planner for clustering keys: computes per-column range bounds
 * from a bounded sample (the same trick `repartitionByRange` uses, but
 * shared across all curve dimensions and reusable across jobs), then builds
 * the codegen'd key column.
 */
object Clustering {

  val DefaultBits = 12 // 3 dims * 12 bits = 36-bit keys, 4096 buckets/dim

  def zorderKey(df: DataFrame, cols: Seq[String], bits: Int = DefaultBits): Column =
    curveKey(df, cols, bits, hilbert = false)

  def hilbertKey(df: DataFrame, cols: Seq[String], bits: Int = DefaultBits): Column =
    curveKey(df, cols, bits, hilbert = true)

  def curveKey(df: DataFrame, cols: Seq[String], bits: Int, hilbert: Boolean): Column = {
    val bucketExprs = cols.map { c =>
      val bounds = sampleBounds(df, c, 1 << bits)
      val nBuckets = bounds.length + 1
      val scale = math.max(1, (1 << bits) / math.max(1, nBuckets))
      RangeBucket(ExpressionUtils.expression(col(c)), bounds, scale): Expression
    }
    ExpressionUtils.column(CurveIndex(bucketExprs, bits, hilbert))
  }

  /** Sorted exclusive-upper bounds (internal values) splitting the column's
    * sampled distribution into <= `buckets` ranges. */
  def sampleBounds(df: DataFrame, colName: String, buckets: Int, maxSample: Int = 200000): Array[AnyRef] = {
    val field = df.schema(colName)
    val sampled = df.select(col(colName)).na.drop()
      .sample(withReplacement = false, 0.5, seed = 42)
      .limit(maxSample).collect().map(_.get(0))
    val full =
      if (sampled.length >= 1000) sampled
      else df.select(col(colName)).na.drop().limit(maxSample).collect().map(_.get(0))
    val conv = CatalystTypeConverters.createToCatalystConverter(field.dataType)
    val sorted = full.map(v => conv(v)).sortWith { (a, b) =>
      a.asInstanceOf[Comparable[Any]].compareTo(b) < 0
    }
    if (sorted.isEmpty) return Array.empty
    val n = math.min(buckets - 1, sorted.length)
    val out = (1 to n).map(i => sorted((i.toLong * sorted.length / (n + 1)).toInt))
      .distinct.toArray
    out.map(_.asInstanceOf[AnyRef])
  }
}
