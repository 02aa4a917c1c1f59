package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Product/event analytics over the events stream's batch view — the
  * engagement-side counterpart to the funnel query (CorpusPipeline.funnel):
  * classic cohort retention, the "week 0..N" triangle every analytics
  * stack computes over its event log.
  *
  * Determinism contract: activity buckets are pure integer arithmetic on
  * epoch seconds (`unix_micros DIV 1e6 DIV bucketSec`) — no date_trunc /
  * calendar semantics to drift between engines — and every output is a
  * BIGINT count, so the DuckDB oracle replays hash-exactly.
  *
  * Scale design: ONE wide shuffle, keyed on user_id, aggregating each
  * user's distinct activity buckets as a set (collect_set — bounded by
  * the timeline length in buckets, ~tens to hundreds, NOT by event
  * count); cohort (= min bucket) and per-bucket offsets then derive
  * narrowly from the set (array_min + explode), and the final
  * (cohort, offset) cells aggregate is over cardinality
  * O(timeline^2 / 2) — tiny at any corpus size. The naive spelling
  * (distinct -> self-join activity to cohort -> re-aggregate) is three
  * wide shuffles of event-scale data; this is one.
  */
object EventAnalytics {

  /** Retention triangle: for each cohort (bucket of first activity) and
    * offset (buckets since first activity), the number of distinct users
    * active. `bucketSec` defaults to daily cohorts. */
  def cohortRetention(events: DataFrame, bucketSec: Long = 86400L): DataFrame = {
    val byUser = events
      .select(col("user_id"),
        expr(s"unix_micros(ts) DIV 1000000 DIV $bucketSec").as("bk"))
      .groupBy("user_id")
      .agg(collect_set(col("bk")).as("bks"))
    byUser
      .select(array_min(col("bks")).as("cohort_day"),
        explode(col("bks")).as("bk"))
      .groupBy(col("cohort_day"),
        (col("bk") - col("cohort_day")).as("day_offset"))
      .agg(count(lit(1)).as("n_users"))
  }

  /** DuckDB replay of [[cohortRetention]] — the readable
    * distinct/join/re-aggregate spelling of the same contract. */
  def cohortRetentionSql(bucketSec: Long = 86400L): String =
    s"""WITH act AS (
       |  SELECT DISTINCT user_id,
       |    CAST(floor(epoch(ts)) AS BIGINT) // $bucketSec AS bk
       |  FROM events
       |), coh AS (
       |  SELECT user_id, MIN(bk) AS cohort_day FROM act GROUP BY user_id
       |)
       |SELECT c.cohort_day, a.bk - c.cohort_day AS day_offset,
       |  COUNT(*) AS n_users
       |FROM act a JOIN coh c USING (user_id)
       |GROUP BY 1, 2
       |ORDER BY cohort_day, day_offset""".stripMargin
}
