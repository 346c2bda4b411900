package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.GraftSqlBridge.{column, expression}
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Runtime helpers for the codegen'd string expressions below.
  * Kept as a plain object so generated code can call them statically.
  *
  * Semantics follow the reference's scalar function gaps relative to
  * Spark (SURVEY.md §2.8): IS_ALPHA / IS_DECIMAL / IS_DIGIT and
  * SPLIT_INDEX from
  * flink-table-runtime-blink/.../functions/SqlFunctionUtils.java.
  */
object GraftStrings {
  def isAlpha(s: UTF8String): Boolean = {
    val str = s.toString
    str.nonEmpty && str.forall(Character.isLetter)
  }

  def isDigit(s: UTF8String): Boolean = {
    val str = s.toString
    str.nonEmpty && str.forall(c => c >= '0' && c <= '9')
  }

  private val decimalRe = "^[+-]?(\\d+(\\.\\d*)?|\\.\\d+)$".r

  def isDecimal(s: UTF8String): Boolean =
    decimalRe.findFirstIn(s.toString).isDefined

  /** KEYVALUE: first pair (split by psep) whose prefix before its
    * first ksep equals key → the remainder; null otherwise
    * (SqlFunctionUtils.keyValue semantics). */
  def keyValue(s: UTF8String, psep: UTF8String, ksep: UTF8String,
               key: UTF8String): UTF8String = {
    if (s == null || s.numBytes == 0 || psep == null || ksep == null ||
        key == null) return null
    val ps = psep.toString
    val ks = ksep.toString
    if (ps.isEmpty || ks.isEmpty) return null
    val k = key.toString
    s.toString.split(java.util.regex.Pattern.quote(ps), -1).foreach { pair =>
      if (pair.nonEmpty) {
        val i = pair.indexOf(ks)
        if (i >= 0 && pair.substring(0, i) == k)
          return UTF8String.fromString(pair.substring(i + ks.length))
      }
    }
    null
  }

  /** Calcite SqlFunctions.struncate for doubles: decimal-string
    * truncation toward zero (BigDecimal.valueOf keeps the shortest
    * round-trip representation, so 0.29 truncates to 0.29 at d=2, not
    * 0.28 as a binary-scaled floor would). */
  def struncate(v: Double, d: Int): Double =
    if (v.isNaN || v.isInfinite) v
    else BigDecimal.valueOf(v)
      .setScale(d, BigDecimal.RoundingMode.DOWN).toDouble

  /** 0-based split element, null when index is out of range. */
  def splitIndex(s: UTF8String, sep: UTF8String, idx: Int): UTF8String = {
    if (idx < 0) return null
    val parts = s.toString.split(java.util.regex.Pattern.quote(sep.toString), -1)
    if (idx < parts.length) UTF8String.fromString(parts(idx)) else null
  }

  /** SQL:2003 SIMILAR TO pattern → anchored Java regex (the reference
    * exposes Calcite's SqlStdOperatorTable.SIMILAR_TO,
    * FlinkSqlOperatorTable.java:1032; Spark has no SIMILAR TO).
    * Translation: `%` → `.*`, `_` → `.`; the regex metacharacters
    * SIMILAR treats as LITERALS (`.` `^` `$` `\`) are escaped;
    * SIMILAR's own operators (`|` `*` `+` `?` `{n,m}` `(...)`
    * `[class]`) pass through; inside a character class `%`/`_` are
    * literal; the optional ESCAPE character makes the next char
    * literal. Matching is whole-string (`matches()`), per the
    * standard. */
  def similarRegex(pat: String, esc: Int): String = {
    val sb = new StringBuilder
    var inClass = false
    var i = 0
    val n = pat.length
    while (i < n) {
      val c = pat.charAt(i)
      if (esc >= 0 && c == esc.toChar && i + 1 < n) {
        val nxt = pat.charAt(i + 1)
        if ("\\^$.|?*+()[]{}".indexOf(nxt) >= 0) sb.append('\\')
        sb.append(nxt)
        i += 2
      } else {
        if (inClass) {
          if (c == ']') inClass = false
          sb.append(c)
        } else c match {
          case '%' => sb.append(".*")
          case '_' => sb.append('.')
          case '.' | '^' | '$' | '\\' => sb.append('\\').append(c)
          case '[' => inClass = true; sb.append(c)
          case other => sb.append(other)
        }
        i += 1
      }
    }
    sb.toString
  }

  private val similarCache =
    new java.util.concurrent.ConcurrentHashMap[(String, Int), java.util.regex.Pattern]()

  /** Whole-string SIMILAR TO match; compiled patterns cached (the
    * pattern side is almost always a literal). A pathological
    * pattern-per-row query stops INSERTING once the cache holds 1024
    * entries, but lookups always run first — patterns cached before
    * the cap (the constant ones) keep hitting forever. */
  def similarTo(s: UTF8String, pat: UTF8String, esc: Int): Boolean = {
    val key = (pat.toString, esc)
    val cached = similarCache.get(key)
    val p =
      if (cached != null) cached
      else if (similarCache.size >= 1024)
        java.util.regex.Pattern.compile(similarRegex(key._1, esc))
      else similarCache.computeIfAbsent(key,
        k => java.util.regex.Pattern.compile(similarRegex(k._1, k._2)))
    p.matcher(s.toString).matches()
  }
}

/** KEYVALUE(str, pairSep, kvSep, key) — the reference's kv-string
  * extractor (SqlFunctionUtils.keyValue:403): split on pairSep, the
  * FIRST pair whose text before its first kvSep equals key yields the
  * remainder; null when absent, when str is empty, or when any input
  * is null. */
case class KeyValue(first: Expression, second: Expression,
                    third: Expression, fourth: Expression)
    extends org.apache.spark.sql.catalyst.expressions.QuaternaryExpression
    with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] =
    Seq(StringType, StringType, StringType, StringType)
  override def dataType: DataType = StringType
  override protected def nullSafeEval(s: Any, p: Any, k: Any, key: Any): Any =
    GraftStrings.keyValue(s.asInstanceOf[UTF8String],
      p.asInstanceOf[UTF8String], k.asInstanceOf[UTF8String],
      key.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (s, p, k, key) => {
      s"""${ev.value} = graft.functions.GraftStrings.keyValue($s, $p, $k, $key);
         |${ev.isNull} = ${ev.value} == null;""".stripMargin
    })
  override def nullable: Boolean = true
  override protected def withNewChildrenInternal(
      a: Expression, b: Expression, c: Expression, d: Expression): KeyValue =
    copy(a, b, c, d)
}

/** TRUNCATE(x[, d]) — numeric truncation toward zero at d decimals
  * (FlinkSqlOperatorTable TRUNCATE → Calcite SqlFunctions.struncate:
  * BigDecimal.valueOf(x).setScale(d, DOWN); negative d zeroes integer
  * digits). Spark has date trunc only. Double-typed here (the builder
  * casts numeric inputs); silent under ANSI. */
case class NumericTruncate(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(DoubleType, IntegerType)
  override def dataType: DataType = DoubleType
  override protected def nullSafeEval(v: Any, d: Any): Any =
    GraftStrings.struncate(v.asInstanceOf[Double], d.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (v, d) => s"graft.functions.GraftStrings.struncate($v, $d)")
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): NumericTruncate = copy(l, r)
}

/** HASH_CODE(s) — the reference's deterministic 32-bit string hash
  * (FlinkSqlOperatorTable HASH_CODE → Java String.hashCode: the
  * 31-polynomial over UTF-16 code units with silent int wraparound).
  * A native expression rather than a built-in composition because the
  * wraparound must stay silent under ANSI mode. */
case class HashCode(child: Expression) extends UnaryExpression
    with ImplicitCastInputTypes {
  // misuse (non-castable input) is an ANALYSIS error, not a codegen
  // crash (advisor r10); integral/numeric inputs cast to their string
  // rendering first, the reference's implicit-cast behavior
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = IntegerType
  override protected def nullSafeEval(v: Any): Any =
    v.asInstanceOf[UTF8String].toString.hashCode
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"$c.toString().hashCode()")
  override protected def withNewChildInternal(c: Expression): HashCode = copy(c)
}

abstract class StringPredicate extends UnaryExpression
    with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = BooleanType
  protected def helper: String
  override protected def nullSafeEval(v: Any): Any = evalImpl(v.asInstanceOf[UTF8String])
  protected def evalImpl(s: UTF8String): Boolean
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.GraftStrings.$helper($c)")
}

/** IS_ALPHA(s) — true iff s is non-empty and all-letters. */
case class IsAlpha(child: Expression) extends StringPredicate {
  override protected def helper = "isAlpha"
  override protected def evalImpl(s: UTF8String): Boolean = GraftStrings.isAlpha(s)
  override protected def withNewChildInternal(c: Expression): IsAlpha = copy(c)
}

/** IS_DIGIT(s) — true iff s is non-empty and all-digits. */
case class IsDigit(child: Expression) extends StringPredicate {
  override protected def helper = "isDigit"
  override protected def evalImpl(s: UTF8String): Boolean = GraftStrings.isDigit(s)
  override protected def withNewChildInternal(c: Expression): IsDigit = copy(c)
}

/** IS_DECIMAL(s) — true iff s parses as a plain decimal number. */
case class IsDecimal(child: Expression) extends StringPredicate {
  override protected def helper = "isDecimal"
  override protected def evalImpl(s: UTF8String): Boolean = GraftStrings.isDecimal(s)
  override protected def withNewChildInternal(c: Expression): IsDecimal = copy(c)
}

/** SPLIT_INDEX(s, sep, i) — 0-based element of the split, or null. */
case class SplitIndex(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override protected def nullSafeEval(s: Any, sep: Any, idx: Any): Any =
    GraftStrings.splitIndex(s.asInstanceOf[UTF8String], sep.asInstanceOf[UTF8String],
      idx.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val code = nullSafeCodeGen(ctx, ev, (a, b, c) =>
      s"""${ev.value} = graft.functions.GraftStrings.splitIndex($a, $b, $c);
         |if (${ev.value} == null) { ${ev.isNull} = true; }""".stripMargin)
    code
  }
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): SplitIndex = copy(f, s, t)
}

/** `s SIMILAR TO pattern [ESCAPE e]` (SqlStdOperatorTable.SIMILAR_TO
  * via FlinkSqlOperatorTable.java:1032): whole-string SQL:2003 regex
  * match. GraftSqlParser rewrites the infix operator text to this
  * function; escape = -1 means no ESCAPE clause. */
case class SimilarTo(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {
  override def dataType: DataType = BooleanType
  override def nullable: Boolean =
    first.nullable || second.nullable || third.nullable
  override protected def nullSafeEval(s: Any, pat: Any, esc: Any): Any =
    GraftStrings.similarTo(s.asInstanceOf[UTF8String],
      pat.asInstanceOf[UTF8String], esc.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (s, p, e) =>
      s"graft.functions.GraftStrings.similarTo($s, $p, $e)")
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): SimilarTo = copy(f, s, t)
}

/** `(s1, e1) OVERLAPS (s2, e2)` — the SQL-standard period-overlap
  * predicate (SqlStdOperatorTable.OVERLAPS via FlinkSqlOperatorTable;
  * runtime vectors pinned by the reference's
  * ScalarFunctionsTest.testOverlaps:3212): each period's second
  * element may be a point or an INTERVAL (end = start + interval),
  * endpoints normalize with least/greatest, and the test is the
  * closed-interval intersection `max(start1, start2) <=
  * min(end1, end2)` — so zero-length periods sharing only an endpoint
  * DO overlap, exactly the reference's expected values. Built as a
  * composition the analyzer finishes resolving (timestamp + interval
  * lands on Spark's TimeAdd via ResolveBinaryArithmetic). */
object TemporalOverlapsBuilder {
  import org.apache.spark.sql.catalyst.expressions._
  import org.apache.spark.sql.types._
  def apply(es: Seq[Expression]): Expression = {
    require(es.length == 4,
      s"temporal_overlaps takes (start1, end1, start2, end2), got ${es.length}")
    val Seq(s1, e1r, s2, e2r) = es
    def endOf(s: Expression, e: Expression): Expression = e.dataType match {
      case _: DayTimeIntervalType | _: YearMonthIntervalType |
           CalendarIntervalType => Add(s, e)
      case _ => e
    }
    val e1 = endOf(s1, e1r)
    val e2 = endOf(s2, e2r)
    val st1 = Least(Seq(s1, e1)); val en1 = Greatest(Seq(s1, e1))
    val st2 = Least(Seq(s2, e2)); val en2 = Greatest(Seq(s2, e2))
    LessThanOrEqual(Greatest(Seq(st1, st2)), Least(Seq(en1, en2)))
  }
}

/** `ELEMENT(array)` — Calcite's sole-element extractor
  * (SqlStdOperatorTable.ELEMENT via FlinkSqlOperatorTable): null for
  * an empty collection, the single element for cardinality 1, a
  * runtime error otherwise. Composed at analysis time so the error
  * branch rides Spark's raise_error. */
object ElementBuilder {
  import org.apache.spark.sql.catalyst.expressions._
  import org.apache.spark.sql.types.ArrayType
  def apply(es: Seq[Expression]): Expression = {
    require(es.length == 1, s"element takes one array argument, got ${es.length}")
    val a = es.head
    val elemType = a.dataType match {
      case ArrayType(t, _) => t
      case t => sys.error(s"element requires an ARRAY operand, got ${t.simpleString}")
    }
    // null-in → null-out FIRST: If treats a null Size(a) condition as
    // false, so without this guard a NULL array would fall through to
    // the error branch instead of returning NULL
    If(IsNull(a), Literal.create(null, elemType),
      If(EqualTo(Size(a), Literal(0)), Literal.create(null, elemType),
        If(EqualTo(Size(a), Literal(1)), GetArrayItem(a, Literal(0)),
          org.apache.spark.sql.catalyst.analysis.UnresolvedFunction(
            "raise_error",
            Seq(Literal("ELEMENT(): collection has more than one element")),
            isDistinct = false))))
  }
}

/** `RAND_INTEGER([seed,] bound)` → uniform int in [0, bound)
  * (FlinkSqlOperatorTable RAND_INTEGER / RandCallGen.scala:27):
  * composed over Spark's own rand so the generator distributes and
  * seeds exactly like RAND. */
object RandIntegerBuilder {
  import org.apache.spark.sql.catalyst.analysis.UnresolvedFunction
  import org.apache.spark.sql.catalyst.expressions._
  import org.apache.spark.sql.types._
  def apply(es: Seq[Expression]): Expression = {
    val (seedArgs, bound) = es match {
      case Seq(b) => (Nil, b)
      case Seq(seed, b) => (Seq(seed), b)
      case _ => sys.error(s"rand_integer takes (bound) or (seed, bound), got ${es.length}")
    }
    Cast(Floor(Multiply(
      UnresolvedFunction("rand", seedArgs, isDistinct = false),
      Cast(bound, DoubleType))), IntegerType)
  }
}

/** Column-API + SQL registration facade for the gap functions. */
object GraftFunctions {
  def is_alpha(c: Column): Column = column(IsAlpha(expression(c)))
  def is_digit(c: Column): Column = column(IsDigit(expression(c)))
  def is_decimal(c: Column): Column = column(IsDecimal(expression(c)))
  def split_index(c: Column, sep: Column, i: Column): Column =
    column(SplitIndex(expression(c), expression(sep), expression(i)))
  def similar_to(c: Column, pat: Column): Column =
    column(GraftFunctions.similarToExpr(Seq(expression(c), expression(pat))))

  /** similar_to(s, p) / similar_to(s, p, 'e'): the 3-arg ESCAPE form
    * takes a one-char string whose code point feeds the matcher. */
  private[graft] def similarToExpr(es: Seq[Expression]): Expression = es match {
    case Seq(s, p) =>
      SimilarTo(s, p, org.apache.spark.sql.catalyst.expressions.Literal(-1))
    case Seq(s, p, e) =>
      SimilarTo(s, p, org.apache.spark.sql.catalyst.expressions.Ascii(e))
    case _ => sys.error(s"similar_to takes 2 or 3 arguments, got ${es.length}")
  }

  def hash_code(c: Column): Column = column(HashCode(expression(c)))

  /** SHA224/SHA384/SHA512 by the reference's NAMED spellings
    * (FlinkSqlOperatorTable) — thin builders over Spark's sha2. */
  private[graft] def shaN(bits: Int)(es: Seq[Expression]): Expression = {
    require(es.length == 1, s"sha$bits takes one argument, got ${es.length}")
    org.apache.spark.sql.catalyst.expressions.Sha2(es.head,
      org.apache.spark.sql.catalyst.expressions.Literal(bits))
  }

  /** TRUNCATE(x[, d]): numeric inputs cast to double, d defaults 0. */
  private[graft] def truncateBuilder(es: Seq[Expression]): Expression = {
    import org.apache.spark.sql.catalyst.expressions.{Cast, Literal}
    es match {
      case Seq(x) => NumericTruncate(Cast(x, DoubleType), Literal(0))
      case Seq(x, d) => NumericTruncate(Cast(x, DoubleType), Cast(d, IntegerType))
      case _ => sys.error(s"truncate takes (x) or (x, d), got ${es.length}")
    }
  }

  /** Register SQL names (the reference's FlinkSqlOperatorTable gaps). */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("keyvalue",
      es => KeyValue(es(0), es(1), es(2), es(3)), "built-in")
    reg.createOrReplaceTempFunction("truncate", truncateBuilder, "built-in")
    reg.createOrReplaceTempFunction("hash_code", es => HashCode(es.head), "built-in")
    reg.createOrReplaceTempFunction("sha224", shaN(224), "built-in")
    reg.createOrReplaceTempFunction("sha384", shaN(384), "built-in")
    reg.createOrReplaceTempFunction("sha512", shaN(512), "built-in")
    reg.createOrReplaceTempFunction("is_alpha", es => IsAlpha(es.head), "built-in")
    reg.createOrReplaceTempFunction("is_digit", es => IsDigit(es.head), "built-in")
    reg.createOrReplaceTempFunction("is_decimal", es => IsDecimal(es.head), "built-in")
    reg.createOrReplaceTempFunction("split_index",
      es => SplitIndex(es(0), es(1), es(2)), "built-in")
    reg.createOrReplaceTempFunction("similar_to", similarToExpr, "built-in")
    reg.createOrReplaceTempFunction("is_json_value",
      es => IsJsonValue(es.head), "built-in")
    reg.createOrReplaceTempFunction("is_json_object",
      es => IsJsonObject(es.head), "built-in")
    reg.createOrReplaceTempFunction("is_json_array",
      es => IsJsonArray(es.head), "built-in")
    reg.createOrReplaceTempFunction("is_json_scalar",
      es => IsJsonScalar(es.head), "built-in")
    reg.createOrReplaceTempFunction("temporal_overlaps",
      TemporalOverlapsBuilder.apply, "built-in")
    reg.createOrReplaceTempFunction("element", ElementBuilder.apply, "built-in")
    reg.createOrReplaceTempFunction("rand_integer", RandIntegerBuilder.apply, "built-in")
  }
}
