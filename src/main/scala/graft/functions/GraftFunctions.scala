package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.graftbridge.{ColumnBridge => ExpressionUtils}

/**
 * SQL-facing registration of the engine's custom Catalyst expressions, so
 * `spark.sql("SELECT zorder_key(a, b, 12)")` works alongside the Column API
 * — the pattern SURVEY.md §4 reserves for semantics Catalyst lacks. The
 * bucket coordinates are the caller's responsibility here (ints in
 * [0, 2^bits)); the table-maintenance path plans bucket bounds from samples
 * (see [[Clustering.planCurveShuffle]]).
 */
object GraftFunctions {

  /** Column API: interleave pre-bucketed int coordinates into a z-order key. */
  def zorder_key(bits: Int, coords: Column*): Column =
    ExpressionUtils.column(
      CurveIndex(coords.map(ExpressionUtils.expression), bits, hilbert = false))

  /** Column API: Hilbert index of pre-bucketed int coordinates. */
  def hilbert_key(bits: Int, coords: Column*): Column =
    ExpressionUtils.column(
      CurveIndex(coords.map(ExpressionUtils.expression), bits, hilbert = true))

  private def curveBuilder(hilbert: Boolean)(exprs: Seq[Expression]): Expression = {
    require(exprs.size >= 2, "usage: <fn>(bits, coord1, coord2, ...)")
    val bits = exprs.head match {
      case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
      case other => sys.error(s"bits must be an int literal, got $other")
    }
    CurveIndex(exprs.tail, bits, hilbert)
  }

  /** Column API: JMESPath-subset extraction (see [[JmesPath]]). */
  def json_path(json: Column, path: String): Column = JmesPath.jsonPath(json, path)

  /** Column API: the portable polynomial char hash (native [[CharPolyHash]]
    * expression) — shared by fingerprinting, bucket partitioning and salt
    * derivation so no call site repeats the Column↔Expression bridging. */
  def char_poly_hash(c: Column, base: Long, mod: Long): Column =
    ExpressionUtils.column(CharPolyHash(ExpressionUtils.expression(c), base, mod))

  /** Register zorder_key / hilbert_key / json_path for SQL. */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.registerFunction(
      FunctionIdentifier("zorder_key"),
      new ExpressionInfo(classOf[CurveIndex].getName, "zorder_key"),
      exprs => curveBuilder(hilbert = false)(exprs))
    reg.registerFunction(
      FunctionIdentifier("hilbert_key"),
      new ExpressionInfo(classOf[CurveIndex].getName, "hilbert_key"),
      exprs => curveBuilder(hilbert = true)(exprs))
    reg.registerFunction(
      FunctionIdentifier("json_path"),
      new ExpressionInfo(classOf[JsonPathExtract].getName, "json_path"),
      exprs => {
        require(exprs.size == 2, "usage: json_path(json, 'path')")
        val path = exprs(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(s, _) if s != null =>
            s.toString
          case other => sys.error(s"json_path: path must be a string literal, got $other")
        }
        JsonPathExtract(exprs.head, path)
      })
  }
}
