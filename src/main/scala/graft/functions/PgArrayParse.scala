package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Parses a Postgres array literal (`{a,"b,c",NULL}`) into
 * `ARRAY<STRING>` with SQL NULL for the uppercase `NULL` token.
 *
 * Spark-native replacement for the reference's string-munging list
 * transforms (`internal/app/type_converter.go:36-212`): one proper scanner
 * instead of 9 per-type string functions; element typing is applied
 * afterwards with `transform` + `cast` (see [[PgValueDecoder]]).
 *
 * Semantics:
 *  - quoted elements may contain commas/braces; `\"` and `\\` escapes are
 *    unescaped (covers the json[]/bytea[] fixtures in FIXTURES.md §4);
 *  - bare `NULL` (uppercase, PG's array null token,
 *    `type_converter.go:10`) → null element;
 *  - multi-dimensional arrays (`{{1,2},{3,4}}`) raise, matching the
 *    reference's replay-time failure (`internal/app/db_test.go:654-676`).
 */
case class PgArrayParse(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"pg_array_parse requires STRING input, got ${child.dataType.sql}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "pg_array_parse"

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    PgArrayParse.parse(s) match {
      case Right(elems) =>
        new GenericArrayData(elems.map(e => if (e == null) null else UTF8String.fromString(e)))
      case Left(err) => throw new IllegalArgumentException(err)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val cls = PgArrayParse.getClass.getName.stripSuffix("$")
      s"${ev.value} = (${classOf[ArrayData].getName}) $cls.parseOrThrow($c.toString());"
    })

  override protected def withNewChildInternal(newChild: Expression): PgArrayParse =
    copy(child = newChild)
}

object PgArrayParse {
  /** Codegen entry point. */
  def parseOrThrow(s: String): ArrayData = parse(s) match {
    case Right(elems) =>
      new GenericArrayData(elems.map(e => if (e == null) null else UTF8String.fromString(e)))
    case Left(err) => throw new IllegalArgumentException(err)
  }

  def parse(raw: String): Either[String, Array[String]] = {
    val s = raw.trim
    if (s.length < 2 || s.charAt(0) != '{' || s.charAt(s.length - 1) != '}')
      return Left(s"malformed pg array literal: $raw")
    val body = s.substring(1, s.length - 1)
    if (body.isEmpty) return Right(Array.empty)

    val out = Array.newBuilder[String]
    val cur = new java.lang.StringBuilder
    var quoted = false        // element was quoted → never NULL token
    var inQuotes = false
    var i = 0
    def flush(): Unit = {
      val tok = cur.toString
      out += (if (!quoted && tok == "NULL") null else tok)
      cur.setLength(0); quoted = false
    }
    while (i < body.length) {
      val c = body.charAt(i)
      if (inQuotes) {
        if (c == '\\' && i + 1 < body.length) { cur.append(body.charAt(i + 1)); i += 1 }
        else if (c == '"') inQuotes = false
        else cur.append(c)
      } else c match {
        case '"' => inQuotes = true; quoted = true
        case ',' => flush()
        case '{' => return Left("unsupported type: multi-dimensional arrays are not supported")
        case _   => cur.append(c)
      }
      i += 1
    }
    if (inQuotes) return Left(s"malformed pg array literal (unterminated quote): $raw")
    flush()
    Right(out.result())
  }
}
