package graft

import graft.queries.Relational

class RelationalSpec extends SparkSpec {

  test("every relational query runs and returns rows on sf0.001") {
    Relational.queries.foreach { case (name, fn) =>
      val df = fn(spark, sf)
      assert(df.count() > 0, s"$name returned no rows")
    }
  }

  test("q33_scd2_join: every event matches exactly one dim version, boundaries honored") {
    import org.apache.spark.sql.functions._
    val out = Relational.q33Scd2Join(spark, sf)
    // exactly-once: the [from, to) versions partition the timeline
    assert(out.count() == Tables.events(spark, sf).count())
    assert(out.select("event_id").distinct().count() == out.count())
    // versions advance with time within each user
    val rows = out.collect().map(r =>
      (r.getLong(1), r.getLong(2), r.getString(3).stripPrefix("seg").toInt))
    rows.groupBy(_._1).foreach { case (u, es) =>
      val byDay = es.sortBy(_._2)
      assert(byDay.map(_._3).sliding(2).forall(p => p.length < 2 || p(0) <= p(1)),
        s"user $u: segment regressed over time")
      // hand-replay the change days for this user
      val b1 = 19726 + u % 7; val b2 = 19737 + u % 11
      es.foreach { case (_, day, v) =>
        val want = if (day >= b2) 2 else if (day >= b1) 1 else 0
        assert(v == want, s"user $u day $day: got seg$v want seg$want")
      }
    }
  }

  test("q34_latest_by_key equals the window row_number spelling") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val got = Relational.q34LatestByKey(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val w = Window.partitionBy("user_id", "event_type")
      .orderBy(col("tsm").desc, col("event_id").asc)
    val want = Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"), expr("unix_micros(ts)").as("tsm"),
        col("event_id"),
        (col("value").cast("decimal(18,2)") * 100).cast("long").as("value_cents"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select("user_id", "event_type", "tsm", "event_id", "value_cents")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.toSet == want.toSet)
    assert(got.length == want.length)
  }

  test("q1_agg: groups are the flag x status combinations") {
    val rows = Relational.q1Agg(spark, sf).collect()
    assert(rows.length >= 3 && rows.length <= 8)
    val qty = rows.map(_.getAs[Double]("sum_qty")).sum
    assert(qty > 0)
  }

  test("q2_union_distinct: keys are unique and sorted") {
    val keys = Relational.q2UnionDistinct(spark, sf).collect().map(_.getLong(0))
    assert(keys.distinct.length == keys.length)
    assert(keys.sorted.sameElements(keys))
  }

  test("q4 anti join complements the F-status customer set") {
    import org.apache.spark.sql.functions._
    val noF = Relational.q4AntiJoin(spark, sf).count()
    val nCust = Tables.customer(spark, sf).count()
    val withF = Tables.orders(spark, sf)
      .filter(col("o_orderstatus") === "F")
      .select("o_custkey").distinct().count()
    assert(noF == nCust - withF)
  }

  test("q6_window_rank: at most 3 per customer, rn in 1..3") {
    val df = Relational.q6WindowRank(spark, sf)
    import org.apache.spark.sql.functions._
    val bad = df.groupBy("o_custkey").count().filter(col("count") > 3).count()
    assert(bad == 0)
    assert(df.filter(col("rn") < 1 || col("rn") > 3).count() == 0)
  }

  test("salted join equals the plain join for any salt factor") {
    import org.apache.spark.sql.functions._
    val li = Tables.lineitem(spark, sf).select(col("l_partkey").as("k"), col("l_quantity"))
    val p = Tables.part(spark, sf).select(col("p_partkey").as("k"), col("p_brand"))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.groupBy("p_brand").count().collect()
        .map(r => (r.getString(0), r.getLong(1))).toSet
    val plain = rows(li.join(p, "k"))
    Seq(1, 3, 8).foreach { s =>
      assert(rows(graft.operators.SkewJoin.saltedJoin(li, p, "k", s)) == plain,
        s"salt=$s changed the join result")
    }
  }

  test("q8_dict_encode: ids dense 0..n-1") {
    val ids = Relational.q8DictEncode(spark, sf).collect().map(_.getAs[Long]("id"))
    assert(ids.sorted.sameElements(ids.indices.map(_.toLong)))
  }

  test("q9_topk: descending prices, 10 rows") {
    val p = Relational.q9TopK(spark, sf).collect().map(_.getAs[Double]("o_totalprice"))
    assert(p.length == 10)
    assert(p.zip(p.tail).forall { case (a, b) => a >= b })
  }

  test("q26_grouped_topk equals the window row_number spelling") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val got = Relational.q26GroupedTopK(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    val cents = (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long")
    val w = Window.partitionBy("o_orderstatus")
      .orderBy(col("price_cents").desc, col("o_orderkey").asc)
    val want = Tables.orders(spark, sf)
      .select(col("o_orderstatus"), col("o_orderkey"), cents.as("price_cents"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= 3)
      .select("o_orderstatus", "rn", "o_orderkey", "price_cents")
      .orderBy("o_orderstatus", "rn").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == want)
  }

  test("topk_pairs equals the window spelling on randomized data (100 groups, ties, k sweep)") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    graft.functions.VectorFunctions.ensureRegistered(spark)
    import spark.implicits._
    // deterministic fixture: heavy tie mass (ord mod 7) to stress the
    // (ord desc, id asc) tie-break through buffer insert/merge paths
    val rnd = new scala.util.Random(20260813L)
    val rows = (0 until 5000).map { i =>
      (s"g${rnd.nextInt(100)}", (rnd.nextInt(1000) % 7).toLong * 10 + rnd.nextInt(3), i.toLong)
    }
    val df = rows.toDF("g", "ord", "id").repartition(7).cache()
    for (k <- Seq(1, 2, 5)) {
      val got = df.groupBy("g")
        .agg(call_function("topk_pairs", col("ord"), col("id"), lit(k)).as("top"))
        .select(col("g"), posexplode(col("top")))
        .select(col("g"), (col("pos") + 1).cast("long").as("rn"),
          col("col.ord"), col("col.id"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet
      val w = Window.partitionBy("g").orderBy(col("ord").desc, col("id").asc)
      val want = df.withColumn("rn", row_number().over(w).cast("long"))
        .filter(col("rn") <= k)
        .select("g", "rn", "ord", "id")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet
      assert(got == want, s"k=$k diverged: extra=${got -- want}, missing=${want -- got}")
    }
    df.unpersist()
  }

  test("topk_pairs: k larger than group, ties broken by min id, null ord dropped") {
    import org.apache.spark.sql.functions._
    graft.functions.VectorFunctions.ensureRegistered(spark)
    import spark.implicits._
    val df = Seq(
      ("a", Some(5L), 1L), ("a", Some(5L), 2L), ("a", Some(7L), 3L),
      ("a", None, 0L), // null ord: skipped, never ranked
      ("b", Some(1L), 9L)).toDF("g", "ord", "id")
    val out = df.groupBy("g")
      .agg(call_function("topk_pairs", col("ord"), col("id"), lit(10)).as("top"))
      .select(col("g"), posexplode(col("top")))
      .select(col("g"), col("pos"), col("col.ord"), col("col.id"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(out == Set(
      ("a", 0, 7L, 3L), ("a", 1, 5L, 1L), ("a", 2, 5L, 2L),
      ("b", 0, 1L, 9L)))
  }
}
