package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/**
 * `zorder_key(x, y)`: 64-bit Morton (Z-order) curve key — the bits of
 * two 32-bit coordinates interleaved (x even positions, y odd).
 *
 * This is a data-LAYOUT operator for 100 TB scan pruning: sorting or
 * range-partitioning a table by the Z-key clusters rows so every output
 * file covers a narrow range of BOTH dimensions, so parquet min/max
 * row-group stats prune scans filtered on either column (a single-column
 * sort only prunes its own column; see `LayoutSpec`'s locality
 * assertion). The curve key is computed with six shift/mask steps per
 * coordinate (no loop), codegen'd straight into the generated row
 * projection.
 */
case class ZOrderKey(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "zorder_key"

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(e =>
      e.dataType == LongType || e.dataType == IntegerType ||
      e.dataType == ShortType || e.dataType == ByteType)
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure("zorder_key requires integral inputs")
  }

  private def asLong(v: Any): Long = v match {
    case l: Long => l
    case i: Int => i.toLong
    case s: Short => s.toLong
    case b: Byte => b.toLong
  }

  override protected def nullSafeEval(x: Any, y: Any): Any =
    ZOrderKey.interleave(asLong(x), asLong(y))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper = ZOrderKey.getClass.getName.stripSuffix("$")
    defineCodeGen(ctx, ev, (a, b) => s"$helper.interleave((long)$a, (long)$b)")
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): ZOrderKey =
    copy(left = newLeft, right = newRight)
}

object ZOrderKey {
  /** Spread the low 32 bits of `v` to the even bit positions of a long. */
  def spread(v: Long): Long = {
    var x = v & 0xFFFFFFFFL
    x = (x | (x << 16)) & 0x0000FFFF0000FFFFL
    x = (x | (x << 8))  & 0x00FF00FF00FF00FFL
    x = (x | (x << 4))  & 0x0F0F0F0F0F0F0F0FL
    x = (x | (x << 2))  & 0x3333333333333333L
    x = (x | (x << 1))  & 0x5555555555555555L
    x
  }

  /** Morton key of the low 32 bits of (x, y): x even bits, y odd bits. */
  def interleave(x: Long, y: Long): Long = spread(x) | (spread(y) << 1)

  def apply(x: Column, y: Column): Column =
    Bridge.column(ZOrderKey(Bridge.expression(x), Bridge.expression(y)))
}
