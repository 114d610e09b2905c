package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * As-of join: for each left row, the latest right row with
 * `right.ts <= left.ts` on the same key (classic event-attribution /
 * point-in-time lookup). Spark has no built-in; the scalable
 * formulation here is union + single window pass:
 *
 *   tag sides → union → window last_value(right cols, ignoreNulls) over
 *   (partition by key order by ts, side rows unbounded preceding..current)
 *   → keep left rows
 *
 * ONE shuffle on the key (the window sort), versus a naive range join's
 * quadratic per-key blowup. Ties (right.ts == left.ts) match, like SQL
 * `ASOF JOIN ... ON l.ts >= r.ts` (right sorts before left at equal ts).
 * Left rows with no prior right row keep NULLs (left-join semantics).
 */
object AsofJoin {

  def asofJoin(left: DataFrame, right: DataFrame, key: String, tsCol: String,
               rightValueCols: Seq[String], suffix: String = "_right"): DataFrame = {
    val leftCols = left.columns.toSeq
    val l = left
      .withColumn("__side", lit(1))
      .select(Seq(col(key), col(tsCol), col("__side")) ++
        leftCols.filterNot(c => c == key || c == tsCol).map(col) ++
        rightValueCols.map(c => lit(null).cast(right.schema(c).dataType).as(s"$c$suffix")): _*)
    val r = right
      .withColumn("__side", lit(0))
      .select(Seq(col(key), col(tsCol), col("__side")) ++
        leftCols.filterNot(c => c == key || c == tsCol)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        rightValueCols.map(c => col(c).as(s"$c$suffix")): _*)

    val w = Window.partitionBy(key).orderBy(col(tsCol).asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = l.unionByName(r).select(
      (Seq(col(key), col(tsCol), col("__side")) ++
        leftCols.filterNot(c => c == key || c == tsCol).map(col) ++
        rightValueCols.map(c =>
          last(col(s"$c$suffix"), ignoreNulls = true).over(w).as(s"$c$suffix"))): _*)
    filled.where(col("__side") === 1).drop("__side")
  }
}
