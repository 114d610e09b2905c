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

  /** `numFiles` metric of every file scan in an EXECUTED plan (run an
    * action first; AQE subtrees are unwrapped). Lets specs assert
    * partition pruning by files actually touched, not plan text. */
  def scannedFileCounts(df: org.apache.spark.sql.DataFrame): Seq[Long] =
    scanMetric(df, "numFiles")

  /** `numOutputRows` of every file scan in an EXECUTED plan: rows that
    * SURVIVED parquet pushdown (row-group min/max skipping + column-
    * index page skipping — record-level filtering is off by default).
    * Scan rows ≪ file rows is the direct evidence that a sorted
    * layout's chunk stats pruned the read. */
  def scannedOutputRows(df: org.apache.spark.sql.DataFrame): Seq[Long] =
    scanMetric(df, "numOutputRows")

  /** (root paths, read-schema field names) of every file scan in a
    * plan — lets specs assert WHICH paths a serve reads and how WIDE
    * each scan is (columnar pruning: a scan of a file that also holds
    * a vector column must not list it in ReadSchema unless that stage
    * needs it). Works on an unexecuted plan. */
  def scanReads(df: org.apache.spark.sql.DataFrame): Seq[(Seq[String], Seq[String])] = {
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
    def walk(p: SparkPlan): Seq[(Seq[String], Seq[String])] = p match {
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
      case s: QueryStageExec => walk(s.plan)
      case r: ReusedExchangeExec => walk(r.child)
      case f: FileSourceScanExec =>
        Seq((f.relation.location.rootPaths.map(_.toString).toSeq,
          f.requiredSchema.fieldNames.toSeq))
      case other =>
        (other.children ++ other.subqueries).flatMap(walk)
    }
    walk(df.queryExecution.executedPlan)
  }

  private def scanMetric(df: org.apache.spark.sql.DataFrame,
                         metric: String): Seq[Long] = {
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
    def walk(p: SparkPlan): Seq[Long] = p match {
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
      case s: QueryStageExec => walk(s.plan)
      case r: ReusedExchangeExec => walk(r.child)
      case f: FileSourceScanExec => Seq(f.metrics(metric).value)
      case other =>
        (other.children ++ other.subqueries).flatMap(walk)
    }
    walk(df.queryExecution.executedPlan)
  }
}
