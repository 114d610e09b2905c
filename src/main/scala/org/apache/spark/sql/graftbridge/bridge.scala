package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/**
 * Bridge into Spark's `private[sql]` Column↔Expression conversion
 * (Spark 4 moved Column to a ColumnNode representation; this is the
 * supported internal hop for libraries that define Catalyst expressions).
 */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** ASCII-table rendering (Dataset.showString is private[sql]). */
  def showString(df: org.apache.spark.sql.DataFrame, numRows: Int, truncate: Int): String =
    df.asInstanceOf[org.apache.spark.sql.classic.Dataset[org.apache.spark.sql.Row]]
      .showString(numRows, truncate)
}
