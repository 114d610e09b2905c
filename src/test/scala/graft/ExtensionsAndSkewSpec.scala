package graft

import graft.ops.SkewJoin
import org.apache.spark.sql.functions._

/** SQL function registration + salted-join correctness. */
class ExtensionsAndSkewSpec extends SparkSpec {
  import spark.implicits._

  test("keccak256 and pg_array_parse callable from SQL after register") {
    GraftExtensions.register(spark)
    Seq(("data to be signed", "{1,2,NULL}")).toDF("s", "arr")
      .createOrReplaceTempView("ext_t")
    val r = spark.sql(
      "SELECT hex(keccak256(s)) AS k, pg_array_parse(arr) AS a FROM ext_t").collect()(0)
    // SQL path must agree with the (golden-vector-validated) library path
    assert(r.getString(0).toLowerCase ==
      graft.crypto.Keccak256.hashHex("data to be signed".getBytes("UTF-8")))
    assert(r.getSeq[String](1) == Seq("1", "2", null))
  }

  test("vec_dot and winnow_fingerprints callable from SQL") {
    GraftExtensions.register(spark)
    Seq((Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f), "some document text here"))
      .toDF("a", "b", "t").createOrReplaceTempView("ext_v")
    val r = spark.sql(
      "SELECT vec_dot(a, b) AS d, size(winnow_fingerprints(t)) AS nf FROM ext_v").collect()(0)
    assert(r.getDouble(0) == 32.0) // 4 + 10 + 18
    assert(r.getInt(1) > 0)
  }

  test("salted equi-join equals plain join under extreme skew") {
    val large = (1 to 10000).map(i => (if (i % 10 == 0) 1L else i.toLong, i))
      .toDF("k", "v") // 10% of rows share key 1
    val small = Seq((1L, "hot"), (2L, "a"), (30L, "b")).toDF("k", "name")
    val plain = large.join(small, "k").agg(count(lit(1)), sum("v")).collect()(0)
    val salted = SkewJoin.saltedEquiJoin(large, small, "k", buckets = 8)
      .agg(count(lit(1)), sum("v")).collect()(0)
    assert(salted.getLong(0) == plain.getLong(0))
    assert(salted.getLong(1) == plain.getLong(1))
  }

  test("salted join: left variants supported, right/full outer rejected") {
    val large = (1 to 100).map(i => (i.toLong, i)).toDF("k", "v")
    val small = Seq((1L, "a"), (999L, "unmatched")).toDF("k", "name")
    // left outer keeps each unmatched LARGE row exactly once
    val left = SkewJoin.saltedEquiJoin(large, small, "k", buckets = 4, joinType = "left")
    assert(left.count() == 100)
    assert(left.where(col("name").isNull).count() == 99)
    // small-side-preserving types would replicate unmatched small rows
    intercept[IllegalArgumentException](
      SkewJoin.saltedEquiJoin(large, small, "k", buckets = 4, joinType = "right_outer"))
    intercept[IllegalArgumentException](
      SkewJoin.saltedEquiJoin(large, small, "k", buckets = 4, joinType = "full"))
  }

  test("salted two-phase aggregation equals direct aggregation") {
    val df = (1 to 5000).map(i => (if (i % 2 == 0) "hot" else s"k$i", i.toLong))
      .toDF("k", "v")
    val direct = df.groupBy("k").agg(count(lit(1)).cast("long").as("n"), sum("v").as("s"))
      .orderBy("k").collect().map(_.toSeq).toSeq
    val salted = SkewJoin.saltedCountSum(df, "k", col("v"), buckets = 8)
      .orderBy("k").collect().map(_.toSeq).toSeq
    assert(salted == direct)
  }
}
