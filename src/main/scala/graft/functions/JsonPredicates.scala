package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal, UnaryExpression}
import org.apache.spark.sql.types.{BooleanType, DataType, NullType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The SQL:2016 IS JSON predicate family (SURVEY.md §2.8 — the
  * reference exposes Calcite's IS_JSON_VALUE / IS_JSON_OBJECT /
  * IS_JSON_ARRAY / IS_JSON_SCALAR and their NOT forms,
  * FlinkSqlOperatorTable.java; semantics pinned by the reference's
  * JsonFunctionsTest.scala: `'{}'` is value+object, `'[]'` is
  * value+array, `'100'` is value+scalar, malformed text is false on
  * all four — not an error — and a NON-STRING operand is rejected at
  * plan time). Spark has no IS JSON; [[graft.sources.GraftSqlParser]]
  * rewrites the predicate text onto these functions.
  */
object GraftJson {
  import com.fasterxml.jackson.core.{JsonFactory, JsonToken}

  private val factory = new JsonFactory()

  final val INVALID = -1
  final val SCALAR = 0
  final val OBJECT = 1
  final val ARRAY = 2

  /** Root classification of a JSON text, strict parse with trailing
    * content rejected. */
  def jsonRoot(s: UTF8String): Int =
    try {
      val p = factory.createParser(s.toString)
      try {
        val t = p.nextToken()
        if (t == null) return INVALID
        val kind = t match {
          case JsonToken.START_OBJECT => p.skipChildren(); OBJECT
          case JsonToken.START_ARRAY => p.skipChildren(); ARRAY
          case JsonToken.VALUE_STRING | JsonToken.VALUE_NUMBER_INT |
               JsonToken.VALUE_NUMBER_FLOAT | JsonToken.VALUE_TRUE |
               JsonToken.VALUE_FALSE | JsonToken.VALUE_NULL => SCALAR
          case _ => return INVALID
        }
        if (p.nextToken() != null) INVALID else kind // trailing junk
      } finally p.close()
    } catch { case _: Exception => INVALID }

  def isJsonValue(s: UTF8String): Boolean = jsonRoot(s) != INVALID
  def isJsonObject(s: UTF8String): Boolean = jsonRoot(s) == OBJECT
  def isJsonArray(s: UTF8String): Boolean = jsonRoot(s) == ARRAY
  def isJsonScalar(s: UTF8String): Boolean = jsonRoot(s) == SCALAR
}

/** Shared shape: string → boolean, non-string operands rejected at
  * analysis (the reference's ValidationException), null in → null out —
  * including a bare NULL operand (NullType), which short-circuits to
  * constant null like `CAST(NULL AS STRING) IS JSON` would, instead of
  * failing analysis. */
abstract class JsonPredicate extends UnaryExpression {
  override def dataType: DataType = BooleanType
  protected def helper: String
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType || child.dataType == NullType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a STRING operand, got ${child.dataType.simpleString}")
  override protected def nullSafeEval(v: Any): Any =
    evalImpl(v.asInstanceOf[UTF8String])
  protected def evalImpl(s: UTF8String): Boolean
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    if (child.dataType == NullType)
      // the helper takes UTF8String — a NullType operand would not
      // even compile in codegen; emit the constant-null result
      Literal.create(null, BooleanType).genCode(ctx)
    else defineCodeGen(ctx, ev, c => s"graft.functions.GraftJson.$helper($c)")
}

case class IsJsonValue(child: Expression) extends JsonPredicate {
  override protected def helper = "isJsonValue"
  override protected def evalImpl(s: UTF8String): Boolean = GraftJson.isJsonValue(s)
  override protected def withNewChildInternal(c: Expression): IsJsonValue = copy(c)
}

case class IsJsonObject(child: Expression) extends JsonPredicate {
  override protected def helper = "isJsonObject"
  override protected def evalImpl(s: UTF8String): Boolean = GraftJson.isJsonObject(s)
  override protected def withNewChildInternal(c: Expression): IsJsonObject = copy(c)
}

case class IsJsonArray(child: Expression) extends JsonPredicate {
  override protected def helper = "isJsonArray"
  override protected def evalImpl(s: UTF8String): Boolean = GraftJson.isJsonArray(s)
  override protected def withNewChildInternal(c: Expression): IsJsonArray = copy(c)
}

case class IsJsonScalar(child: Expression) extends JsonPredicate {
  override protected def helper = "isJsonScalar"
  override protected def evalImpl(s: UTF8String): Boolean = GraftJson.isJsonScalar(s)
  override protected def withNewChildInternal(c: Expression): IsJsonScalar = copy(c)
}
