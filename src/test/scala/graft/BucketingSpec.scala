package graft

import org.apache.spark.sql.execution.SimpleMode
import org.apache.spark.sql.functions._

/** Bucketing — the pre-shuffle co-location lever for repeated large-large
  * joins: both sides written with `bucketBy(n, key)` share a partitioning,
  * so the join needs NO exchange at read time. At 100 TB this converts the
  * dominant recurring shuffle of a fact-fact join into a one-time write
  * cost; this spec proves the mechanism on the engine's own session
  * (tmp-dir warehouse). */
class BucketingSpec extends SparkSpec {

  test("bucketed co-located join plans with ZERO exchanges") {
    val db = "graft_buckets"
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $db")
    Tables.lineitem(spark, sf).select("l_orderkey", "l_quantity")
      .write.mode("overwrite")
      .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable(s"$db.lineitem_b")
    Tables.orders(spark, sf).select("o_orderkey", "o_totalprice")
      .write.mode("overwrite")
      .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable(s"$db.orders_b")

    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val li = spark.table(s"$db.lineitem_b")
      val o = spark.table(s"$db.orders_b")
      val joined = li.join(o, li("l_orderkey") === o("o_orderkey"))
      val plan = joined.queryExecution.explainString(SimpleMode)
      assert(!plan.contains("Exchange"),
        s"bucketed-bucketed join must not shuffle:\n$plan")
      // and it actually runs: every lineitem row has its order
      assert(joined.count() == Tables.lineitem(spark, sf).count())

      // contrast: the same join over the UNBUCKETED parquet shuffles both
      val plain = Tables.lineitem(spark, sf).select("l_orderkey", "l_quantity")
        .join(Tables.orders(spark, sf).select("o_orderkey", "o_totalprice"),
          col("l_orderkey") === col("o_orderkey"))
      assert(plain.queryExecution.explainString(SimpleMode).contains("Exchange"))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
