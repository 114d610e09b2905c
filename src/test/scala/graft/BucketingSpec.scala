package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._

/**
 * Bucketed co-located join: pre-bucketing both sides of a recurring join
 * key eliminates the per-query shuffle — THE layout lever for repeated
 * large-scale joins (SURVEY §7.2 M7 / 100 TB design). At scale the vault
 * layout `partitionBy(vault) + bucketBy(orderkey)` makes fact-fact joins
 * exchange-free; this spec proves the property on the driver tables:
 * the bucketed join plan contains NO shuffle Exchange, and results equal
 * the plain (shuffling) join.
 */
class BucketingSpec extends SparkSpec {

  test("bucketed fact-fact join runs without a shuffle exchange") {
    val dir = "/root/testdata/sf0.001"
    // external tables with explicit paths — the (static) warehouse dir
    // is never written to
    val wh = Files.createTempDirectory("graft-buckets").toString
    val nBuckets = 8

    val lineitem = Tables(spark, dir, "lineitem")
    val orders = Tables(spark, dir, "orders")
    lineitem.write.mode("overwrite")
      .bucketBy(nBuckets, "l_orderkey").sortBy("l_orderkey")
      .option("path", s"$wh/lineitem_b").saveAsTable("lineitem_b")
    orders.write.mode("overwrite")
      .bucketBy(nBuckets, "o_orderkey").sortBy("o_orderkey")
      .option("path", s"$wh/orders_b").saveAsTable("orders_b")

    // disable auto-broadcast so the join would otherwise shuffle both sides
    withSQLConf("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val joined = spark.table("lineitem_b")
        .join(spark.table("orders_b"), col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n"))
      val plan = joined.queryExecution.executedPlan.toString
      // bucket-aware scan: join reads co-located buckets, no exchange
      // before the join (the single exchange is the 3-row final agg)
      val exchanges = "ShuffleExchange|Exchange hashpartitioning".r.findAllIn(plan).size
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
        s"expected a non-broadcast join:\n$plan")
      assert(exchanges <= 1, s"expected no pre-join shuffle, got $exchanges:\n$plan")

      val bucketed = joined.orderBy("o_orderstatus").collect().map(_.toSeq)
      val plain = lineitem.join(orders, col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))
        .orderBy("o_orderstatus").collect().map(_.toSeq)
      assert(bucketed.toSeq == plain.toSeq)
    }
    spark.sql("DROP TABLE IF EXISTS lineitem_b")
    spark.sql("DROP TABLE IF EXISTS orders_b")
  }

  private def withSQLConf(pairs: (String, String)*)(f: => Unit): Unit = {
    val old = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try f finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
