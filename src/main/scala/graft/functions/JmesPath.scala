package graft.functions

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{ArrayNode, JsonNodeFactory}
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graftbridge.{ColumnBridge => ExpressionUtils}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Dynamic JMESPath-style document querying — the reference's most-used value
 * provider compiles arbitrary JMESPath against each record
 * (reference nodestream/pipeline/value_providers/jmespath_value_provider.py:20-99);
 * `get_json_object` only covers static JsonPath. This is a small engine for
 * the JMESPath subset that covers the reference's pipeline usage:
 *
 *   - field access:         `a.b.c`
 *   - array index:          `a[0]`, `a[-1]` (negative = from end)
 *   - list projection:      `a[*].b`   (maps the remaining path over the
 *                            array, dropping missing results — JMESPath
 *                            projection semantics, not JsonPath's)
 *   - flatten projection:   `a[].b`    (one level of array flattening)
 *   - pipe:                 `a[*].b | [0]` (stops the projection)
 *
 * The compiled path evaluates inside a Catalyst expression over Jackson
 * nodes (no UDF serialization overhead; `CodegenFallback` — JSON parsing
 * dominates the cost, and the parse itself is the same work
 * `get_json_object` does). Scalars return unquoted text, containers return
 * compact JSON text, missing paths return null — `get_json_object`'s
 * conventions, so the two interoperate.
 */
object JmesPath {

  sealed trait Op
  final case class Field(name: String) extends Op
  final case class Index(i: Int) extends Op
  case object Wild extends Op
  case object Flatten extends Op
  case object Pipe extends Op

  /** Parse a path into ops. Throws IllegalArgumentException on syntax errors
    * (at expression-construction time, i.e. plan time — not per row). */
  def parse(path: String): List[Op] = {
    val ops = scala.collection.mutable.ListBuffer[Op]()
    var i = 0
    val n = path.length
    def isIdent(c: Char) = c.isLetterOrDigit || c == '_' || c == '-'
    var expectField = true // at start and after '.' an identifier must follow
    while (i < n) {
      path.charAt(i) match {
        case c if c.isWhitespace => i += 1
        case '.' =>
          require(!expectField, s"jmespath: unexpected '.' at $i in '$path'")
          expectField = true; i += 1
        case '|' =>
          ops += Pipe; expectField = true; i += 1
        case '[' =>
          val close = path.indexOf(']', i)
          require(close > 0, s"jmespath: unclosed '[' at $i in '$path'")
          val inner = path.substring(i + 1, close).trim
          ops += (inner match {
            case ""  => Flatten
            case "*" => Wild
            case s   => Index(
              try s.toInt
              catch { case _: NumberFormatException =>
                throw new IllegalArgumentException(s"jmespath: bad index '$s' in '$path'") })
          })
          expectField = false
          i = close + 1
        case c if isIdent(c) =>
          val start = i
          while (i < n && isIdent(path.charAt(i))) i += 1
          ops += Field(path.substring(start, i))
          expectField = false
        case c => throw new IllegalArgumentException(s"jmespath: unexpected '$c' at $i in '$path'")
      }
    }
    require(!expectField || ops.isEmpty, s"jmespath: dangling '.' in '$path'")
    ops.toList
  }

  /** Evaluate ops against a node; null = missing (JMESPath's `null`). */
  def eval(node: JsonNode, ops: List[Op]): JsonNode = ops match {
    case Nil => node
    case _ if node == null => null
    case Pipe :: rest => eval(node, rest)
    case Field(f) :: rest =>
      if (node.isObject && node.has(f)) eval(node.get(f), rest) else null
    case Index(i) :: rest =>
      if (!node.isArray) null
      else {
        val idx = if (i < 0) node.size + i else i
        if (idx >= 0 && idx < node.size) eval(node.get(idx), rest) else null
      }
    case Wild :: rest =>
      if (!node.isArray) null
      else project(iter(node), rest)
    case Flatten :: rest =>
      if (!node.isArray) null
      else project(iter(node).flatMap(e => if (e.isArray) iter(e) else Iterator(e)), rest)
  }

  /** JMESPath projection: map the path-up-to-the-next-pipe over the
    * elements, drop missing/null results, then continue after the pipe. */
  private def project(elems: Iterator[JsonNode], rest: List[Op]): JsonNode = {
    val (inside, after) = rest.span(_ != Pipe)
    val arr = new ArrayNode(JsonNodeFactory.instance)
    elems.foreach { e =>
      val r = eval(e, inside)
      if (r != null && !r.isNull) arr.add(r)
    }
    eval(arr, after)
  }

  private def iter(n: JsonNode): Iterator[JsonNode] = {
    val it = n.elements()
    new Iterator[JsonNode] {
      def hasNext = it.hasNext
      def next() = it.next()
    }
  }

  /** `json_path(col, path)` — the public column helper. */
  def jsonPath(json: Column, path: String): Column =
    ExpressionUtils.column(JsonPathExtract(ExpressionUtils.expression(json), path))
}

/** Catalyst expression: evaluate a compiled JMESPath-subset path against a
  * JSON string column. Scalar results are unquoted text; containers are
  * compact JSON; missing/unparseable input yields null. */
case class JsonPathExtract(child: Expression, path: String)
    extends UnaryExpression with CodegenFallback {

  private val ops: List[JmesPath.Op] = JmesPath.parse(path) // plan-time validation

  @transient private lazy val mapper = new ObjectMapper()

  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "json_path"

  override def nullSafeEval(input: Any): Any = {
    val root =
      try mapper.readTree(input.asInstanceOf[UTF8String].toString)
      catch { case _: Exception => null }
    val r = JmesPath.eval(root, ops)
    if (r == null || r.isNull) null
    else UTF8String.fromString(if (r.isTextual) r.textValue else r.toString)
  }

  override protected def withNewChildInternal(newChild: Expression): JsonPathExtract =
    copy(child = newChild)
}
