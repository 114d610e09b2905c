package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * `simhash64(text)`: the 64-bit SimHash signature as ONE narrow
 * codegen'd expression — per token (single-space split), a 64-bit value
 * from the first 8 bytes of md5(token); per bit, a ±1 vote across
 * tokens; signature bit set where votes are positive.
 *
 * Value-identical to the explode + 64-column bit-vote aggregation
 * (`Dedup.withSimhash`'s original form, and the SQL oracle): that shape
 * shuffles every token row and folds 64 wide columns; this one computes
 * the signature where the document already is — no explode, no shuffle,
 * no agg. Token hashing works directly on the UTF8 bytes (no String
 * round trip); the md5 instance is reused across tokens and rows via a
 * thread-local.
 */
case class SimhashExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "simhash64"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure("simhash64 requires STRING input")

  override protected def nullSafeEval(input: Any): Any =
    SimhashExpr.simhash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper = SimhashExpr.getClass.getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $helper.simhash($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): SimhashExpr =
    copy(child = newChild)
}

object SimhashExpr {
  private val md5Local = ThreadLocal.withInitial[java.security.MessageDigest](() =>
    java.security.MessageDigest.getInstance("MD5"))

  def simhash(text: UTF8String): Long = {
    val bytes = text.getBytes
    val len = bytes.length
    val votes = new Array[Int](64)
    val md = md5Local.get()
    var start = 0
    var i = 0
    while (i <= len) {
      if (i == len || bytes(i) == ' '.toByte) {
        md.reset()
        md.update(bytes, start, i - start)
        val d = md.digest()
        // first 8 digest bytes, big-endian — identical to
        // conv(substring(hex,1,8),16,10)<<32 | conv(substring(hex,9,8),16,10)
        var h = 0L
        var b = 0
        while (b < 8) { h = (h << 8) | (d(b) & 0xffL); b += 1 }
        var bit = 0
        while (bit < 64) {
          votes(bit) += (if (((h >>> bit) & 1L) != 0L) 1 else -1)
          bit += 1
        }
        start = i + 1
      }
      i += 1
    }
    var sig = 0L
    var bit = 0
    while (bit < 64) {
      if (votes(bit) > 0) sig |= (1L << bit)
      bit += 1
    }
    sig
  }

  def apply(c: Column): Column = Bridge.column(SimhashExpr(Bridge.expression(c)))
}
