package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Relational operator pack.
  *
  * Covers the reference's relational surface (SURVEY.md §2): scan/projection
  * (S1/P1), union+distinct vocabulary build (A1/A2/U1, `utils.py:13-15`),
  * broadcast dictionary-encode join (J1/A7, `utils.py:18-26`), anti-join
  * membership rejection (J2/U2, `TransE.py:237-244` semantics), semi-join
  * keep-known filter (P4, `test.py:7-11`), grouped + conditional aggregation
  * (A3/A4, `test.py:16-23`), window ranking (W1, `test.py:51-52`), sort/top-k
  * (O5) — each spelled against the driver testdata tables with a DuckDB
  * oracle.
  *
  * Numeric discipline: double columns are cast to exact DECIMAL before
  * arithmetic/aggregation so Spark and the DuckDB oracle agree bit-for-bit,
  * then rounded and cast back to DOUBLE in both engines.
  */
object Relational {

  /** Exact-decimal view of a double column (money-ish testdata values have
    * <= 2 fractional digits, so DECIMAL(18,2) is lossless). */
  private def dec(c: String) = col(c).cast("decimal(18,2)")

  // ---------------------------------------------------------------- q1_agg
  /** Grouped aggregation with map-side partial agg (SURVEY A3; TPC-H Q1
    * shape). Plan: parquet scan (pruned to 6 cols) -> partial hash agg ->
    * shuffle on 2 low-cardinality keys -> final agg. Scales: shuffle moves
    * only |groups| * partitions rows. */
  def q1Agg(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum(dec("l_quantity")).cast("double").as("sum_qty"),
        sum(dec("l_extendedprice")).cast("double").as("sum_base_price"),
        sum(dec("l_extendedprice") * (lit(1).cast("decimal(18,2)") - dec("l_discount")))
          .cast("double").as("sum_disc_price"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  val q1Sql: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
      |  COUNT(*) AS count_order
      |FROM lineitem GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  // ------------------------------------------------------ q2_union_distinct
  /** Vocabulary build: union two key projections, dedup (SURVEY A1/A2/U1 —
    * the `head.union(tail).distinct()` shape of `utils.py:13`). Plan: two
    * pruned scans -> union -> partial distinct (map-side) -> shuffle ->
    * final distinct. */
  def q2UnionDistinct(spark: SparkSession, dir: String): DataFrame = {
    val a = Tables.orders(spark, dir).select(col("o_custkey").as("key"))
    val b = Tables.customer(spark, dir).select(col("c_custkey").as("key"))
    a.union(b).distinct().orderBy("key")
  }

  val q2Sql: String =
    """SELECT key FROM (
      |  SELECT o_custkey AS key FROM orders
      |  UNION
      |  SELECT c_custkey AS key FROM customer
      |) ORDER BY key""".stripMargin

  // ----------------------------------------------------- q3_broadcast_join
  /** Star join: fact x two small dims, both broadcast (SURVEY J1 — the
    * dictionary-encode join of `utils.py:26` spelled relationally).
    * `broadcast()` hints guarantee BroadcastHashJoinExec: zero shuffle of
    * the fact table at any scale as long as dims stay small. */
  def q3BroadcastJoin(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val p  = Tables.part(spark, dir).select("p_partkey", "p_brand")
    val s  = Tables.supplier(spark, dir).select("s_suppkey", "s_name")
    li.join(broadcast(p), li("l_partkey") === p("p_partkey"))
      .join(broadcast(s), li("l_suppkey") === s("s_suppkey"))
      .groupBy("p_brand")
      .agg(
        count(lit(1)).as("n_items"),
        sum(dec("l_extendedprice")).cast("double").as("brand_revenue"))
      .orderBy("p_brand")
  }

  val q3Sql: String =
    """SELECT p_brand, COUNT(*) AS n_items,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS brand_revenue
      |FROM lineitem
      |JOIN part ON l_partkey = p_partkey
      |JOIN supplier ON l_suppkey = s_suppkey
      |GROUP BY p_brand ORDER BY p_brand""".stripMargin

  // ----------------------------------------------------------- q4_anti_join
  /** Left-anti join: customers with no completed ('F') order (SURVEY J2/U2 —
    * the negative-sample rejection of `TransE.py:243` as a relational op).
    * The filter is applied on the build side BEFORE the anti join, so it is
    * pushed to the parquet scan; Catalyst picks a hash anti join. */
  def q4AntiJoin(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val o = Tables.orders(spark, dir)
      .filter(col("o_orderstatus") === "F")
      .select(col("o_custkey"))
    c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")
  }

  val q4Sql: String =
    """SELECT c_custkey, c_name FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders
      |                  WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
      |ORDER BY c_custkey""".stripMargin

  // ----------------------------------------------------------- q5_semi_join
  /** Left-semi join: orders whose customer is in a segment (SURVEY P4 — the
    * keep-known membership filter of `test.py:7-11`). */
  def q5SemiJoin(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val c = Tables.customer(spark, dir)
      .filter(col("c_mktsegment") === "BUILDING")
      .select("c_custkey")
    o.join(broadcast(c), o("o_custkey") === c("c_custkey"), "left_semi")
      .select("o_orderkey", "o_custkey", "o_orderstatus")
      .orderBy("o_orderkey")
  }

  val q5Sql: String =
    """SELECT o_orderkey, o_custkey, o_orderstatus FROM orders
      |WHERE EXISTS (SELECT 1 FROM customer
      |              WHERE c_custkey = o_custkey AND c_mktsegment = 'BUILDING')
      |ORDER BY o_orderkey""".stripMargin

  // -------------------------------------------------------- q6_window_rank
  /** Window ranking: top-3 orders per customer by price (SURVEY W1 — the
    * link-prediction rank of `test.py:51-52` as a window function).
    * row_number with a full tiebreak keeps it deterministic. */
  def q6WindowRank(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    Tables.orders(spark, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("o_custkey"), col("o_orderkey"), col("rn").cast("long").as("rn"))
      .orderBy("o_custkey", "rn")
  }

  val q6Sql: String =
    """SELECT o_custkey, o_orderkey, CAST(rn AS BIGINT) AS rn FROM (
      |  SELECT o_custkey, o_orderkey,
      |    ROW_NUMBER() OVER (PARTITION BY o_custkey
      |                       ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
      |  FROM orders)
      |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin

  // -------------------------------------------------- q7_conditional_ratio
  /** Conditional aggregate ratio (SURVEY A4/P6 — the hits@10 `rank <= 10`
    * ratio of `test.py:17-23`): share of small-quantity line items per
    * return flag, as an exact ratio of counts. */
  def q7ConditionalRatio(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy("l_returnflag")
      .agg(
        sum(when(col("l_quantity") <= 10, 1L).otherwise(0L)).as("n_small"),
        count(lit(1)).as("n_total"))
      // parts-per-million in INTEGER space: n_small*1e6 and n_total are both
      // < 2^53, so the IEEE division and floor are bit-identical across
      // engines (decimal division scale/rounding is NOT — round 1's only
      // hash mismatch)
      .withColumn("small_ratio_ppm",
        floor(col("n_small") * lit(1000000L) / col("n_total")).cast("long"))
      .orderBy("l_returnflag")

  val q7Sql: String =
    """SELECT l_returnflag,
      |  CAST(SUM(CASE WHEN l_quantity <= 10 THEN 1 ELSE 0 END) AS BIGINT) AS n_small,
      |  COUNT(*) AS n_total,
      |  CAST(FLOOR(SUM(CASE WHEN l_quantity <= 10 THEN 1 ELSE 0 END) * 1000000 / COUNT(*)) AS BIGINT) AS small_ratio_ppm
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  // -------------------------------------------------------- q8_dict_encode
  /** Dense dictionary-id assignment (SURVEY A7 — `zipWithIndex` at
    * `utils.py:18-19`): contiguous ids 0..n-1 over the distinct vocabulary,
    * deterministic via sort order. Uses DictionaryEncoder.buildDictionary
    * (sorted zipWithIndex): dense + deterministic with only the sort
    * shuffle — a global `row_number()` window would funnel the whole
    * vocabulary through ONE task, the exact trap DictionaryEncoder's
    * scaladoc names. Ids MUST be dense (they index an embedding matrix),
    * which rules out monotonically_increasing_id. */
  def q8DictEncode(spark: SparkSession, dir: String): DataFrame = {
    val vocab = Tables.customer(spark, dir).select(col("c_mktsegment").as("name"))
    val ids = graft.transe.DictionaryEncoder.buildDictionary(vocab)
      .select(col("name"), col("id").cast("long").as("id"))
    val c = Tables.customer(spark, dir)
    c.join(broadcast(ids), c("c_mktsegment") === ids("name"))
      .groupBy("id", "name")
      .agg(count(lit(1)).as("n_customers"))
      .orderBy("id")
  }

  val q8Sql: String =
    """SELECT id, name, COUNT(*) AS n_customers
      |FROM customer
      |JOIN (SELECT name, CAST(ROW_NUMBER() OVER (ORDER BY name NULLS FIRST) - 1 AS BIGINT) AS id
      |      FROM (SELECT DISTINCT c_mktsegment AS name FROM customer)) d
      |  ON c_mktsegment = d.name
      |GROUP BY id, name ORDER BY id""".stripMargin

  // -------------------------------------------------------------- q9_topk
  /** Global top-k by sort (SURVEY O5 — argsort at `test.py:51`): Spark
    * plans orderBy+limit as TakeOrderedAndProject (per-partition top-k +
    * driver merge), no full sort shuffle — the scalable spelling. */
  def q9TopK(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(10)
      .select(col("o_orderkey"), col("o_custkey"),
        dec("o_totalprice").cast("double").as("o_totalprice"))

  val q9Sql: String =
    """SELECT o_orderkey, o_custkey,
      |  CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS o_totalprice
      |FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10""".stripMargin

  // -------------------------------------------------------- q10_time_bucket
  /** Event-time tumbling window aggregation over the events table (batch
    * spelling of the Structured Streaming windowed agg; SURVEY §2.9 is
    * net-new capability). Bucket exposed as epoch seconds so the oracle
    * comparison is precision-agnostic. */
  def q10TimeBucket(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(
        window(col("ts"), "1 hour").getField("start").as("bucket_ts"),
        col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(dec("value")).cast("double").as("sum_value"))
      .select(
        unix_timestamp(col("bucket_ts")).as("bucket"),
        col("event_type"), col("n_events"), col("sum_value"))
      .orderBy("bucket", "event_type")

  val q10Sql: String =
    """SELECT CAST(epoch(time_bucket(INTERVAL '1 hour', ts)) AS BIGINT) AS bucket,
      |  event_type, COUNT(*) AS n_events,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      |FROM events GROUP BY 1, 2 ORDER BY bucket, event_type""".stripMargin

  // ------------------------------------------------------------ q13_rollup
  /** ROLLUP aggregation (SURVEY §2.11 lists grouping sets as absent from
    * the reference — included here because Spark SQL provides it and an
    * engine user expects it): revenue by (returnflag, linestatus) with
    * subtotals and grand total. grouping_id disambiguates NULL-as-subtotal
    * from NULL data in both engines. */
  def q13Rollup(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .rollup("l_returnflag", "l_linestatus")
      .agg(
        count(lit(1)).as("n"),
        sum(dec("l_extendedprice")).cast("double").as("revenue"),
        grouping_id().cast("long").as("gid"))
      .orderBy(col("gid"), col("l_returnflag").asc_nulls_first,
        col("l_linestatus").asc_nulls_first)

  val q13Sql: String =
    """SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
      |  CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid
      |FROM lineitem
      |GROUP BY ROLLUP (l_returnflag, l_linestatus)
      |ORDER BY gid, l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin

  // ------------------------------------------------------------ q14_except
  /** EXCEPT set operator (SURVEY §2.11: absent from the reference; free
    * from Spark SQL): customer keys that ordered in 'O' status but never
    * in 'F'. */
  def q14Except(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val open = o.filter(col("o_orderstatus") === "O").select(col("o_custkey"))
    val done = o.filter(col("o_orderstatus") === "F").select(col("o_custkey"))
    open.except(done).orderBy("o_custkey")
  }

  val q14Sql: String =
    """SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
      |EXCEPT
      |SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
      |ORDER BY o_custkey""".stripMargin

  // -------------------------------------------------------- q15_salted_join
  /** Skew-salted join (SURVEY §2 has no skew machinery; a 100 TB pipeline
    * needs it): probe side salted by content hash, build side replicated,
    * join keyed on (key, salt) — a hot key spreads across `salt` reducers
    * instead of serializing on one (operators/SkewJoin). The oracle is the
    * PLAIN join: salting must not change the result set, and that
    * equivalence is exactly what the DuckDB comparison certifies. */
  def q15SaltedJoin(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .select(col("l_partkey").as("k"), col("l_quantity"))
    val p = Tables.part(spark, dir)
      .select(col("p_partkey").as("k"), col("p_brand"))
    graft.operators.SkewJoin.saltedJoin(li, p, "k", salt = 8)
      .groupBy("p_brand")
      .agg(
        count(lit(1)).as("n_items"),
        sum(dec("l_quantity")).cast("double").as("sum_qty"))
      .orderBy("p_brand")
  }

  val q15Sql: String =
    """SELECT p_brand, COUNT(*) AS n_items,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |GROUP BY p_brand ORDER BY p_brand""".stripMargin

  // ------------------------------------------------ q17_shipping_priority
  /** TPC-H Q3 shape — the classic 3-way selective join + revenue top-k:
    * BUILDING customers' orders placed before the cutoff with items shipped
    * after it. All three filters push to their parquet scans; the filtered
    * customer key set broadcasts; orderBy+limit plans as
    * TakeOrderedAndProject (no global sort shuffle). Revenue ties broken by
    * orderkey so the top-10 is engine-deterministic. */
  def q17ShippingPriority(spark: SparkSession, dir: String): DataFrame = {
    val cutoff = lit("1996-07-01").cast("timestamp")
    val c = Tables.customer(spark, dir)
      .filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
    val o = Tables.orders(spark, dir)
      .filter(col("o_orderdate") < cutoff)
      .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    val l = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") > cutoff)
      .select(col("l_orderkey"),
        (dec("l_extendedprice") * (lit(1).cast("decimal(18,2)") - dec("l_discount")))
          .as("rev"))
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
      .agg(sum(col("rev")).cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("o_orderkey").asc)
      .limit(10)
      .select(col("o_orderkey"),
        unix_timestamp(col("o_orderdate")).as("o_date"),
        col("o_orderpriority"), col("revenue"))
  }

  val q17Sql: String =
    """SELECT o_orderkey, CAST(epoch(o_orderdate) AS BIGINT) AS o_date,
      |  o_orderpriority,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND o_orderdate < TIMESTAMP '1996-07-01'
      |  AND l_shipdate > TIMESTAMP '1996-07-01'
      |GROUP BY o_orderkey, o_orderdate, o_orderpriority
      |ORDER BY revenue DESC, o_orderkey ASC LIMIT 10""".stripMargin

  // ----------------------------------------------------- q18_moving_avg
  /** Sliding-frame window (SURVEY §2.11 lists frame-spec windows as absent
    * from the reference; engine users expect them): 3-row trailing moving
    * average of order totals per customer. Partitioned by customer — skew
    * bounded by orders-per-customer, never a global window. The average is
    * spelled as exact-decimal frame SUM (cast to double) over the frame
    * COUNT — one IEEE divide in identical order in both engines — because
    * DECIMAL division scale rules differ across engines (q7's round-1
    * lesson). */
  def q18MovingAvg(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
      .rowsBetween(-2, 0)
    Tables.orders(spark, dir)
      .withColumn("mv_sum", sum(dec("o_totalprice")).over(w).cast("double"))
      .withColumn("mv_n", count(lit(1)).over(w))
      .select(col("o_custkey"), col("o_orderkey"),
        round(col("mv_sum") / col("mv_n"), 6).as("moving_avg"))
      .orderBy("o_custkey", "o_orderkey")
  }

  val q18Sql: String =
    """SELECT o_custkey, o_orderkey,
      |  ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DOUBLE)
      |        / COUNT(*) OVER w, 6) AS moving_avg
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey
      |             ORDER BY o_orderdate ASC, o_orderkey ASC
      |             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
      |ORDER BY o_custkey, o_orderkey""".stripMargin

  // -------------------------------------------------------- q19_exists
  /** Correlated EXISTS subquery (TPC-H Q4 shape; SURVEY §2.11 lists
    * subqueries as absent from the reference — an engine user expects the
    * SQL surface). Catalyst rewrites the EXISTS into a left-semi hash join
    * on l_orderkey, so the plan is the q5 semi-join shape: one shuffle on
    * the join key, lineitem pruned to (l_orderkey, l_returnflag) at the
    * scan. */
  def q19Exists(spark: SparkSession, dir: String): DataFrame = {
    Tables.orders(spark, dir).createOrReplaceTempView("g_orders")
    Tables.lineitem(spark, dir).createOrReplaceTempView("g_lineitem")
    spark.sql(
      """SELECT o_orderpriority, COUNT(*) AS n_orders
        |FROM g_orders
        |WHERE o_orderstatus = 'O' AND EXISTS (
        |  SELECT 1 FROM g_lineitem
        |  WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin)
  }

  val q19Sql: String =
    """SELECT o_orderpriority, COUNT(*) AS n_orders
      |FROM orders
      |WHERE o_orderstatus = 'O' AND EXISTS (
      |  SELECT 1 FROM lineitem
      |  WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  // ---------------------------------------------------------- q20_cube
  /** CUBE aggregation (all four grouping sets of two dims; completes the
    * grouping-sets family next to q13's ROLLUP). Same engine shape as
    * ROLLUP: Expand multiplies rows by |grouping sets| BEFORE the shuffle,
    * so the shuffle moves 4x the group rows — fine for low-cardinality
    * dims, the documented trap for high-cardinality ones. grouping_id
    * disambiguates NULL-as-subtotal from NULL data. */
  def q20Cube(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .cube("o_orderstatus", "o_orderpriority")
      .agg(
        count(lit(1)).as("n"),
        sum(dec("o_totalprice")).cast("double").as("revenue"),
        grouping_id().cast("long").as("gid"))
      .orderBy(col("gid"), col("o_orderstatus").asc_nulls_first,
        col("o_orderpriority").asc_nulls_first)

  val q20Sql: String =
    """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
      |  CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT) AS gid
      |FROM orders
      |GROUP BY CUBE (o_orderstatus, o_orderpriority)
      |ORDER BY gid, o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin

  // ----------------------------------------------------- q21_intersect
  /** INTERSECT set operator (SURVEY §2.11: absent from the reference;
    * completes the set-op family with q2's UNION and q14's EXCEPT):
    * customers who ordered in BOTH 'O' and 'F' status. Plan: Catalyst
    * rewrites INTERSECT DISTINCT to an aggregate + left-semi join — one
    * shuffle per side on the key, no row explosion. */
  def q21Intersect(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val open = o.filter(col("o_orderstatus") === "O").select(col("o_custkey"))
    val done = o.filter(col("o_orderstatus") === "F").select(col("o_custkey"))
    open.intersect(done).orderBy("o_custkey")
  }

  val q21Sql: String =
    """SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
      |INTERSECT
      |SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
      |ORDER BY o_custkey""".stripMargin

  // --------------------------------------------------------- q22_pivot
  /** PIVOT: events long -> wide, one column per event type, daily counts.
    * The pivot values are an explicit literal list — NOT inferred — which
    * (a) skips the extra distinct-collect job Spark otherwise runs and
    * (b) keeps the output schema fixed at 100 TB regardless of data
    * drift (an unexpected new event type cannot explode the column
    * count). Plan: single partial+final hash agg on day; the pivot is a
    * conditional-aggregation Expand, no extra shuffle. */
  def q22Pivot(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(to_date(col("ts")).as("day"), col("event_type"))
      .groupBy("day")
      .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
      .agg(count(lit(1)))
      .na.fill(0L)
      .select(col("day").cast("string").as("day"), col("click"), col("error"),
        col("purchase"), col("signup"), col("view"))
      .orderBy("day")

  val q22Sql: String =
    """SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS day,
      |  CAST(COALESCE(SUM(CASE WHEN event_type = 'click' THEN 1 END), 0) AS BIGINT) AS click,
      |  CAST(COALESCE(SUM(CASE WHEN event_type = 'error' THEN 1 END), 0) AS BIGINT) AS error,
      |  CAST(COALESCE(SUM(CASE WHEN event_type = 'purchase' THEN 1 END), 0) AS BIGINT) AS purchase,
      |  CAST(COALESCE(SUM(CASE WHEN event_type = 'signup' THEN 1 END), 0) AS BIGINT) AS signup,
      |  CAST(COALESCE(SUM(CASE WHEN event_type = 'view' THEN 1 END), 0) AS BIGINT) AS view
      |FROM events GROUP BY 1 ORDER BY day""".stripMargin

  // ------------------------------------------------------ q23_lead_lag
  /** LAG/LEAD window functions (completes the window family: q6 rank,
    * q18 frame spec): per-user inter-event gap in seconds and the next
    * event's type. Partitioned by user_id — state is bounded by a user's
    * events, never a global window. Epoch-seconds integers cross the
    * engine boundary, not timestamps. */
  def q23LeadLag(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts").asc, col("event_id").asc)
    Tables.events(spark, dir)
      .withColumn("sec", unix_timestamp(col("ts")))
      .select(
        col("user_id"), col("event_id"),
        (col("sec") - lag(col("sec"), 1).over(w)).as("gap_sec"),
        lead(col("event_type"), 1).over(w).as("next_type"))
      .orderBy("user_id", "event_id")
  }

  val q23Sql: String =
    """SELECT user_id, event_id,
      |  CAST(floor(epoch(ts)) AS BIGINT)
      |    - LAG(CAST(floor(epoch(ts)) AS BIGINT), 1) OVER w AS gap_sec,
      |  LEAD(event_type, 1) OVER w AS next_type
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
      |ORDER BY user_id, event_id""".stripMargin

  // ------------------------------------------------ q24_scalar_subquery
  /** Scalar subquery in a predicate (completes the subquery family with
    * q19's EXISTS): orders above the global average price, counted per
    * status. Catalyst plans the scalar subquery as an independent
    * one-row aggregate broadcast into the filter — ONE extra pass, never
    * a per-row re-execution. "Above average" is spelled in EXACT
    * arithmetic — `price * n > sum` — because AVG's result type differs
    * across engines (Spark: widened DECIMAL; DuckDB: DOUBLE) and a
    * boundary row could land on different sides of an inexact mean (the
    * q7 lesson applied to subqueries). */
  def q24ScalarSubquery(spark: SparkSession, dir: String): DataFrame = {
    Tables.orders(spark, dir).createOrReplaceTempView("g_orders24")
    spark.sql(
      """SELECT o_orderstatus, COUNT(*) AS n_above
        |FROM g_orders24
        |WHERE CAST(o_totalprice AS DECIMAL(18,2)) * (SELECT COUNT(*) FROM g_orders24) >
        |  (SELECT SUM(CAST(o_totalprice AS DECIMAL(18,2))) FROM g_orders24)
        |GROUP BY o_orderstatus
        |ORDER BY o_orderstatus""".stripMargin)
  }

  val q24Sql: String =
    """SELECT o_orderstatus, COUNT(*) AS n_above
      |FROM orders
      |WHERE CAST(o_totalprice AS DECIMAL(18,2)) * (SELECT COUNT(*) FROM orders) >
      |  (SELECT SUM(CAST(o_totalprice AS DECIMAL(18,2))) FROM orders)
      |GROUP BY o_orderstatus
      |ORDER BY o_orderstatus""".stripMargin

  // ---------------------------------------------------- q25_unpivot
  /** UNPIVOT (wide -> long; the inverse of q22): the pivoted daily
    * counts melted back to (day, event_type, n) rows — one narrow
    * Expand over the wide table, no shuffle beyond q22's own. Zero-count
    * cells are kept: unpivot emits every (day, type) cell, which is the
    * lossless inverse; consumers filter if they want sparsity. */
  def q25Unpivot(spark: SparkSession, dir: String): DataFrame = {
    val types = Seq("click", "error", "purchase", "signup", "view")
    q22Pivot(spark, dir)
      .unpivot(Array(col("day")), types.map(col).toArray, "event_type", "n")
      .orderBy("day", "event_type")
  }

  val q25Sql: String =
    """WITH days AS (SELECT DISTINCT CAST(CAST(ts AS DATE) AS VARCHAR) AS day FROM events),
      |types AS (SELECT unnest(['click','error','purchase','signup','view']) AS event_type),
      |counts AS (
      |  SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS day, event_type, COUNT(*) AS n
      |  FROM events GROUP BY 1, 2)
      |SELECT d.day AS day, t.event_type AS event_type, COALESCE(c.n, 0) AS n
      |FROM days d CROSS JOIN types t
      |LEFT JOIN counts c ON c.day = d.day AND c.event_type = t.event_type
      |ORDER BY d.day, t.event_type""".stripMargin

  // ------------------------------------------------ q26_grouped_topk
  /** Top 3 orders per status via the native `topk_pairs`
    * TypedImperativeAggregate ([[graft.functions.TopKPairsAgg]]) — the
    * sortless twin of q6_window_rank's window spelling: bounded k-pair
    * buffers partially aggregated map-side (ObjectHashAggregate,
    * asserted in PlanSpec), one hash pass with O(k) work per row where
    * the window plan sorts each partition below its WindowGroupLimit
    * and again after the exchange (see TopKPairsAgg's scaladoc for the
    * honest Spark-4 comparison — shuffle volumes are comparable, the
    * sorts are the difference).
    * Prices ride as exact integer cents (the q7 decimal lesson); the
    * oracle replays the window spelling, which equals the aggregate by
    * the total (ord DESC, id ASC) order. */
  def q26GroupedTopK(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.VectorFunctions.ensureRegistered(spark)
    Tables.orders(spark, dir)
      .groupBy(col("o_orderstatus"))
      .agg(call_function("topk_pairs",
        (dec("o_totalprice") * 100).cast("long"), col("o_orderkey"), lit(3)).as("top"))
      .select(col("o_orderstatus"), posexplode(col("top")))
      .select(col("o_orderstatus"), (col("pos") + 1).cast("long").as("rn"),
        col("col.id").as("o_orderkey"), col("col.ord").as("price_cents"))
      .orderBy("o_orderstatus", "rn")
  }

  val q26Sql: String =
    """SELECT o_orderstatus, rn, o_orderkey, price_cents FROM (
      |  SELECT o_orderstatus, o_orderkey,
      |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS price_cents,
      |    ROW_NUMBER() OVER (PARTITION BY o_orderstatus
      |      ORDER BY CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) DESC,
      |               o_orderkey ASC) AS rn
      |  FROM orders)
      |WHERE rn <= 3 ORDER BY o_orderstatus, rn""".stripMargin

  // ------------------------------------------------ q27_runtime_filter
  /** Shuffle join pruned by a RUNTIME Bloom filter — Catalyst's
    * InjectRuntimeFilter, the 100 TB counterpart of a broadcast join:
    * when NEITHER side broadcasts, the selective (creation) side builds a
    * `bloom_filter_agg` subquery whose `might_contain` probe is pushed
    * onto the big (application) side, so most lineitem rows drop BEFORE
    * the join shuffle instead of after it. Runs in a CLONED session
    * (`newSession`: shared SparkContext, session-local SQLConf) so the
    * thresholds that make injection fire at testdata scale — at 100 TB
    * the DEFAULTS (creation < 10 MB, scan > 10 GB) fire on their own —
    * never leak into other queries' plans. autoBroadcastJoinThreshold=-1
    * models the at-scale regime where the dim side exceeds the driver's
    * broadcast budget. The optimized plan is forced eagerly (and
    * plan-asserted in PlanSpec) while the tuned conf is active; the
    * filter is semantically transparent, so the ORACLE is the plain
    * join — false positives only cost time, never rows. */
  def q27RuntimeFilter(spark: SparkSession, dir: String): DataFrame = {
    val s = spark.newSession()
    s.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    s.conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val o = Tables.orders(s, dir)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select("o_orderkey")
    val l = Tables.lineitem(s, dir)
      .select(col("l_orderkey"), col("l_returnflag"), dec("l_quantity").as("qty"),
        dec("l_extendedprice").as("price"))
    val out = l.join(o, l("l_orderkey") === o("o_orderkey"))
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n_items"),
        sum(col("qty")).cast("double").as("sum_qty"),
        sum(col("price")).cast("double").as("sum_price"))
      .orderBy("l_returnflag")
    out.queryExecution.optimizedPlan // inject now, under the tuned conf
    out
  }

  val q27Sql: String =
    """SELECT l_returnflag, COUNT(*) AS n_items,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |WHERE o_orderpriority = '1-URGENT'
      |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  // ------------------------------------------------ q30_range_frame
  /** RANGE-framed window — completes the frame family (q18 is ROWS):
    * per-user trailing-hour event count and value mass BY EVENT TIME,
    * `RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW` over epoch seconds.
    * Unlike a ROWS frame, the bound is a VALUE distance: peers at the
    * same second are all in-frame, so the result is deterministic under
    * any tie order — and unlike q10's tumbling buckets this is a sliding
    * per-row trailing aggregate. Partitioned by user — frame state is
    * bounded by one user's events inside the hour, never a global
    * window. */
  def q30RangeFrame(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id")
      .orderBy(col("sec"))
      .rangeBetween(-3600L, 0L)
    Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"),
        unix_timestamp(col("ts")).as("sec"), dec("value").as("v"))
      .withColumn("trailing_n", count(lit(1)).over(w))
      .withColumn("trailing_sum", sum(col("v")).over(w).cast("double"))
      .select("user_id", "event_id", "trailing_n", "trailing_sum")
      .orderBy("user_id", "event_id")
  }

  val q30Sql: String =
    """SELECT user_id, event_id, COUNT(*) OVER w AS trailing_n,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS trailing_sum
      |FROM (SELECT user_id, event_id, CAST(floor(epoch(ts)) AS BIGINT) AS sec, value
      |      FROM events)
      |WINDOW w AS (PARTITION BY user_id ORDER BY sec
      |             RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
      |ORDER BY user_id, event_id""".stripMargin

  // ------------------------------------------------ q29_grouping_sets
  /** Explicit GROUPING SETS — completes the grouping family (q13 ROLLUP,
    * q20 CUBE): exactly the per-status and per-priority marginals, no
    * cross combinations and no grand total — the shape reporting
    * pipelines actually want, at half a CUBE's Expand width. One
    * partial+final aggregate pair over the Expand, like rollup/cube. */
  def q29GroupingSets(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupingSets(
        Seq(Seq(col("o_orderstatus")), Seq(col("o_orderpriority"))),
        col("o_orderstatus"), col("o_orderpriority"))
      .agg(
        count(lit(1)).as("n"),
        sum(dec("o_totalprice")).cast("double").as("revenue"),
        grouping_id().cast("long").as("gid"))
      .orderBy(col("gid"), col("o_orderstatus").asc_nulls_first,
        col("o_orderpriority").asc_nulls_first)

  val q29Sql: String =
    """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
      |  CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT) AS gid
      |FROM orders
      |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
      |ORDER BY gid, o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin

  // ------------------------------------------------ q28_json_props
  /** Semi-structured extraction: the events table's `props` column is a
    * JSON document; parse it ONCE per row with a declared schema
    * (`from_json` — schema-on-read, null on malformed input, the standard
    * Spark shape for event-property bags) and aggregate the extracted
    * field. At 100 TB the parse is a narrow per-row map fused into the
    * scan stage; the only shuffle is the 5-group aggregate. A declared
    * schema beats `get_json_object` path probing when several fields are
    * read — one parse, many field accesses. */
  def q28JsonProps(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(col("event_type"),
        from_json(col("props"),
          org.apache.spark.sql.types.StructType.fromDDL("k INT"))
          .getField("k").cast("long").as("k"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"),
        sum(col("k")).as("sum_k"),
        max(col("k")).as("max_k"))
      .orderBy("event_type")

  val q28Sql: String =
    """SELECT event_type, COUNT(*) AS n_events,
      |  CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
      |  MAX(CAST(json_extract(props, '$.k') AS BIGINT)) AS max_k
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  // ------------------------------------------- q31_rank_distribution
  /** Distribution-ranking windows — completes the ranking family next to
    * q6's dense rank and q26's top-k: NTILE deciles, PERCENT_RANK and
    * CUME_DIST of order value within each priority class. Partitioned by
    * priority (5 bounded partitions — never the q8 single-partition
    * global window); the order is TOTAL ((price, orderkey)) so every
    * rank-derived value is deterministic, and the percent/cume divisions
    * are single IEEE divides of exact integers — correctly rounded
    * identically in both engines. */
  def q31RankDistribution(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_orderpriority")
      .orderBy(col("o_totalprice").asc, col("o_orderkey").asc)
    Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_orderpriority"), col("o_totalprice"))
      .withColumn("decile", ntile(10).over(w).cast("long"))
      .withColumn("pr", percent_rank().over(w))
      .withColumn("cd", cume_dist().over(w))
      .select("o_orderkey", "o_orderpriority", "decile", "pr", "cd")
      .orderBy("o_orderkey")
  }

  val q31Sql: String =
    """SELECT o_orderkey, o_orderpriority,
      |  CAST(NTILE(10) OVER w AS BIGINT) AS decile,
      |  PERCENT_RANK() OVER w AS pr,
      |  CUME_DIST() OVER w AS cd
      |FROM orders
      |WINDOW w AS (PARTITION BY o_orderpriority
      |             ORDER BY o_totalprice ASC, o_orderkey ASC)
      |ORDER BY o_orderkey""".stripMargin

  // ------------------------------------------------ q33_scd2_join
  /** Slowly-changing-dimension (SCD type 2) join: effective-date a
    * dimension CHANGELOG into `[valid_from, valid_to)` versions with a
    * per-key `lead` window, then attach each fact row to the version
    * valid at its event time — the standard "join facts to the dim as it
    * was THEN" shape of every warehouse.
    *
    * The changelog here is derived deterministically from the event
    * log's user set (both engines replay the identical construction:
    * three versions per user with mod-offset change days, guaranteed
    * non-overlapping), because the testdata has no dimension-history
    * table; the operator shape is what's exercised.
    *
    * Scale: the lead window partitions by dim KEY — dim-sized, bounded
    * partitions (versions per key), never the q8 global window. The fact
    * join is an EQUI-join on the key with the validity range as residual
    * filter; dims broadcast (they almost always fit — |keys| * versions),
    * so the fact table never shuffles: PlanSpec asserts broadcast + no
    * BNLJ. Exactly one version matches per fact row: v0 opens at day 0
    * and the last version closes at Long.MaxValue, so the versions
    * partition the whole timeline regardless of the fixture's day span. */
  def q33Scd2Join(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"),
        expr("unix_micros(ts) div 1000000 div 86400").as("day_id"))
    val chg = ev.select("user_id").distinct()
      .select(col("user_id"), explode(array(
        // v0 opens at day 0, not the first change day: standard SCD2
        // practice (the initial version is valid "since forever"), and
        // immune to testdata day-range drift — a fact earlier than the
        // first recorded change still matches v0 instead of silently
        // dropping out of the inner join on BOTH engines (which the hash
        // oracle could never catch)
        struct(lit(0L).as("v"), lit(0L).as("valid_from")),
        struct(lit(1L).as("v"), (lit(19726L) + col("user_id") % 7).as("valid_from")),
        struct(lit(2L).as("v"), (lit(19737L) + col("user_id") % 11).as("valid_from")))).as("c"))
      .select(col("user_id"), col("c.v").as("v"), col("c.valid_from").as("valid_from"))
    val w = Window.partitionBy("user_id").orderBy("valid_from", "v")
    // alias both sides: dim derives from ev, so bare column refs would be
    // an ambiguous self-join lineage
    val dim = chg.withColumn("valid_to",
        coalesce(lead("valid_from", 1).over(w), lit(Long.MaxValue)))
      .as("dm")
    ev.as("e").join(broadcast(dim),
        col("e.user_id") === col("dm.user_id") &&
          col("e.day_id") >= col("dm.valid_from") &&
          col("e.day_id") < col("dm.valid_to"))
      .select(col("e.event_id").as("event_id"), col("e.user_id").as("user_id"),
        col("e.day_id").as("day_id"),
        concat(lit("seg"), col("dm.v").cast("string")).as("segment"))
      .orderBy("event_id")
  }

  val q33Sql: String =
    """WITH users AS (SELECT DISTINCT user_id FROM events),
      |chg AS (
      |  SELECT user_id, CAST(0 AS BIGINT) AS v, CAST(0 AS BIGINT) AS valid_from FROM users
      |  UNION ALL SELECT user_id, 1, 19726 + user_id % 7 FROM users
      |  UNION ALL SELECT user_id, 2, 19737 + user_id % 11 FROM users
      |), dim AS (
      |  SELECT user_id, v, valid_from,
      |    COALESCE(LEAD(valid_from) OVER (PARTITION BY user_id ORDER BY valid_from, v),
      |             9223372036854775807) AS valid_to
      |  FROM chg
      |), ev AS (
      |  SELECT event_id, user_id,
      |    CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day_id
      |  FROM events
      |)
      |SELECT e.event_id, e.user_id, e.day_id,
      |  'seg' || CAST(d.v AS VARCHAR) AS segment
      |FROM ev e JOIN dim d ON e.user_id = d.user_id
      |  AND e.day_id >= d.valid_from AND e.day_id < d.valid_to
      |ORDER BY e.event_id""".stripMargin

  // ------------------------------------------------ q34_latest_by_key
  /** Latest row per key — the CDC/changelog compaction primitive ("keep
    * the newest version of every (user, event_type)"), spelled SORTLESS
    * as `topk_pairs(ts, id, 1)` — the bounded native aggregate at k=1:
    * ObjectHashAggregate with map-side partials, the shuffle moves ONE
    * (ts, id) pair per key per map partition, no per-partition sort.
    * The payload then attaches by a BROADCAST fetch-back join on the
    * unique event_id (the winner set is keys-sized), so the events
    * table itself neither sorts nor shuffles — the ANN family's
    * "vectors fetched by id" discipline.
    *
    * Rejected spellings, both measured in the plan: the window
    * (`row_number DESC = 1`) sorts every partition under a
    * WindowGroupLimit; `max(struct(...))` looks sortless but structs
    * have no mutable agg buffer, so Catalyst silently plans
    * SortAggregate — per-partition sorts on both sides of the exchange.
    *
    * Tie contract: latest ts, ties to the SMALLEST event_id
    * (topk_pairs' total order), replayed by the oracle's window. */
  def q34LatestByKey(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.VectorFunctions.ensureRegistered(spark)
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"),
        expr("unix_micros(ts)").as("tsm"), col("event_id"),
        (dec("value") * 100).cast("long").as("value_cents"))
    val latest = ev.groupBy("user_id", "event_type")
      .agg(call_function("topk_pairs", col("tsm"), col("event_id"), lit(1)).as("top"))
      .select(col("user_id"), col("event_type"),
        element_at(col("top"), 1).getField("ord").as("ts_micros"),
        element_at(col("top"), 1).getField("id").as("event_id"))
    ev.select(col("event_id"), col("value_cents"))
      .join(broadcast(latest), Seq("event_id"))
      .select(col("user_id"), col("event_type"), col("ts_micros"),
        col("event_id"), col("value_cents"))
      .orderBy("user_id", "event_type")
  }

  val q34Sql: String =
    """SELECT user_id, event_type, ts_micros, event_id, value_cents FROM (
      |  SELECT user_id, event_type,
      |    CAST(epoch_us(ts) AS BIGINT) AS ts_micros, event_id,
      |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS value_cents,
      |    ROW_NUMBER() OVER (PARTITION BY user_id, event_type
      |      ORDER BY epoch_us(ts) DESC, event_id ASC) AS rn
      |  FROM events)
      |WHERE rn = 1 ORDER BY user_id, event_type""".stripMargin

  /** Registry consumed by SparkEntry. */
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_agg"             -> (q1Agg _),
    "q2_union_distinct"  -> (q2UnionDistinct _),
    "q3_broadcast_join"  -> (q3BroadcastJoin _),
    "q4_anti_join"       -> (q4AntiJoin _),
    "q5_semi_join"       -> (q5SemiJoin _),
    "q6_window_rank"     -> (q6WindowRank _),
    "q7_conditional_ratio" -> (q7ConditionalRatio _),
    "q8_dict_encode"     -> (q8DictEncode _),
    "q9_topk"            -> (q9TopK _),
    "q10_time_bucket"    -> (q10TimeBucket _),
    "q13_rollup"         -> (q13Rollup _),
    "q14_except"         -> (q14Except _),
    "q15_salted_join"    -> (q15SaltedJoin _),
    "q17_shipping_priority" -> (q17ShippingPriority _),
    "q18_moving_avg"     -> (q18MovingAvg _),
    "q19_exists"         -> (q19Exists _),
    "q20_cube"           -> (q20Cube _),
    "q21_intersect"      -> (q21Intersect _),
    "q22_pivot"          -> (q22Pivot _),
    "q23_lead_lag"       -> (q23LeadLag _),
    "q24_scalar_subquery" -> (q24ScalarSubquery _),
    "q25_unpivot"        -> (q25Unpivot _),
    "q26_grouped_topk"   -> (q26GroupedTopK _),
    "q27_runtime_filter" -> (q27RuntimeFilter _),
    "q28_json_props"     -> (q28JsonProps _),
    "q29_grouping_sets"  -> (q29GroupingSets _),
    "q30_range_frame"    -> (q30RangeFrame _),
    "q31_rank_distribution" -> (q31RankDistribution _),
    "q33_scd2_join"      -> (q33Scd2Join _),
    "q34_latest_by_key"  -> (q34LatestByKey _))

  val oracles: Map[String, String] = Map(
    "q1_agg"             -> q1Sql,
    "q2_union_distinct"  -> q2Sql,
    "q3_broadcast_join"  -> q3Sql,
    "q4_anti_join"       -> q4Sql,
    "q5_semi_join"       -> q5Sql,
    "q6_window_rank"     -> q6Sql,
    "q7_conditional_ratio" -> q7Sql,
    "q8_dict_encode"     -> q8Sql,
    "q9_topk"            -> q9Sql,
    "q10_time_bucket"    -> q10Sql,
    "q13_rollup"         -> q13Sql,
    "q14_except"         -> q14Sql,
    "q15_salted_join"    -> q15Sql,
    "q17_shipping_priority" -> q17Sql,
    "q18_moving_avg"     -> q18Sql,
    "q19_exists"         -> q19Sql,
    "q20_cube"           -> q20Sql,
    "q21_intersect"      -> q21Sql,
    "q22_pivot"          -> q22Sql,
    "q23_lead_lag"       -> q23Sql,
    "q24_scalar_subquery" -> q24Sql,
    "q25_unpivot"        -> q25Sql,
    "q26_grouped_topk"   -> q26Sql,
    "q27_runtime_filter" -> q27Sql,
    "q28_json_props"     -> q28Sql,
    "q29_grouping_sets"  -> q29Sql,
    "q30_range_frame"    -> q30Sql,
    "q31_rank_distribution" -> q31Sql,
    "q33_scd2_join"      -> q33Sql,
    "q34_latest_by_key"  -> q34Sql)
}
