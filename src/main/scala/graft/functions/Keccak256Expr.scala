package graft.functions

import graft.crypto.Keccak256
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{BinaryType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * `keccak256(col)` as a native Catalyst expression (C1 exposed to SQL):
 * binary/string → 32-byte digest. Codegen'd via a static helper call, so
 * it stays inside whole-stage codegen (no UDF serialization overhead).
 */
case class Keccak256Expr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "keccak256"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case BinaryType | StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"keccak256 requires BINARY or STRING input, got ${other.sql}")
    }

  override protected def nullSafeEval(input: Any): Any = input match {
    case s: UTF8String => Keccak256.hash(s.getBytes)
    case b: Array[Byte] => Keccak256.hash(b)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper = Keccak256Expr.getClass.getName.stripSuffix("$")
    child.dataType match {
      case StringType =>
        nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $helper.hashUtf8($c);")
      case _ =>
        nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $helper.hashBytes($c);")
    }
  }

  override protected def withNewChildInternal(newChild: Expression): Keccak256Expr =
    copy(child = newChild)
}

object Keccak256Expr {
  def hashUtf8(s: UTF8String): Array[Byte] = Keccak256.hash(s.getBytes)
  def hashBytes(b: Array[Byte]): Array[Byte] = Keccak256.hash(b)

  def apply(c: Column): Column = Bridge.column(Keccak256Expr(Bridge.expression(c)))
}

/** Column-function surface for graft's custom expressions. */
object GraftFunctions {
  def keccak256(c: Column): Column = Keccak256Expr(c)
  def pgArrayParse(c: Column): Column =
    Bridge.column(PgArrayParse(Bridge.expression(c)))
  def ecmhDigest(c: Column): Column = graft.crypto.EcmhAggregator.digest(c)
}
