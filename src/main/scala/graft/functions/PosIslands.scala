package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/**
 * `pos_islands(positions, L)`: merge one document's surviving window
 * START positions into maximal spans — starts p < p' belong to one span
 * iff p' − p <= L (contiguous or overlapping length-L windows) — as one
 * codegen'd per-row call. Output: array of
 * `struct<span_start:long, span_end:long, n_windows:long>` where
 * span_end = last start + L − 1, n_windows = #starts merged.
 *
 * This replaces the dup-span pipeline's per-doc ISLAND window pass
 * (`partitionBy(doc).orderBy(pos)` + lag + running sum + a second
 * aggregate): the relational form sorts the ENTIRE survivor table inside
 * one exchange — on the all-duplicate extreme (the uniform amplified
 * bench fixture, where every window survives) that is a 10^8-row
 * sort-based window — while this form reaches the same exchange through
 * a hash aggregate (`collect_list` per doc, map-side partial, no global
 * sort) and then spends O(k log k) per document on arrays bounded by the
 * document's own window count. Per-doc memory is O(windows/doc), the
 * same bound `split(text)` already imposes upstream.
 *
 * The input need not be sorted (collect_list order is
 * partition-nondeterministic); the expression sorts internally so the
 * operator's output is deterministic.
 */
case class PosIslands(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("span_start", LongType, nullable = false),
      StructField("span_end", LongType, nullable = false),
      StructField("n_windows", LongType, nullable = false))),
    containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "pos_islands"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(IntegerType | LongType, _) if n >= 1 =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      "pos_islands requires ARRAY<INT|BIGINT> input and window length >= 1")
  }

  // lazy: dataType is only legal on a RESOLVED child (construction
  // happens pre-analysis when Column-built)
  private lazy val childIsInt =
    child.dataType.asInstanceOf[ArrayType].elementType == IntegerType

  override protected def nullSafeEval(input: Any): Any =
    PosIslands.islands(input.asInstanceOf[ArrayData], n, childIsInt)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper = PosIslands.getClass.getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (${classOf[ArrayData].getName}) $helper.islands($c, $n, $childIsInt);")
  }

  override protected def withNewChildInternal(newChild: Expression): PosIslands =
    copy(child = newChild)
}

object PosIslands {
  /** Codegen entry point. */
  def islands(arr: ArrayData, n: Int, elemIsInt: Boolean): ArrayData = {
    val k = arr.numElements()
    if (k == 0) return new GenericArrayData(Array.empty[Any])
    val ps = new Array[Long](k)
    var i = 0
    while (i < k) {
      ps(i) = if (elemIsInt) arr.getInt(i).toLong else arr.getLong(i)
      i += 1
    }
    java.util.Arrays.sort(ps)
    val out = new java.util.ArrayList[Any](4)
    var start = ps(0)
    var last = ps(0)
    var cnt = 1L
    i = 1
    while (i < k) {
      val p = ps(i)
      if (p - last > n) {
        out.add(new GenericInternalRow(Array[Any](start, last + n - 1, cnt)))
        start = p; cnt = 0L
      }
      last = p; cnt += 1L
      i += 1
    }
    out.add(new GenericInternalRow(Array[Any](start, last + n - 1, cnt)))
    new GenericArrayData(out.toArray)
  }

  def apply(c: Column, n: Int): Column =
    Bridge.column(PosIslands(Bridge.expression(c), n))
}
