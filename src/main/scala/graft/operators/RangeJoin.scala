package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bucketed range (interval) join — points matched into intervals.
  *
  * Spark has no native range-join optimization: `P JOIN I ON t BETWEEN
  * start AND end` has no equi-key, so Catalyst plans a
  * BroadcastNestedLoopJoin — every point against every interval, O(|P|·|I|),
  * the same cartesian failure mode VERDICT r1 flagged on the all-pairs
  * near-dup queries. The scale-correct spelling buckets time into
  * fixed-width bins:
  *
  *   intervals explode into the bins they cover (amplification =
  *   interval_length/bin + 1, bounded for bounded intervals) -> points map
  *   to ONE bin -> equi-join on bin -> residual `t BETWEEN start AND end`
  *   filter removes same-bin non-overlaps.
  *
  * Cost: one shuffle keyed by bin over |P| + |I|·amplification rows —
  * linear, partition-parallel, skew-safe as long as bins are sized near
  * the typical interval length (too-fine bins amplify intervals; too-coarse
  * bins put many points per bin against many intervals). Matches appear
  * once: a point's bin is covered exactly once by each interval containing
  * it, and intervals never contain duplicate bins.
  */
object RangeJoin {

  /** Join `points` (epoch-seconds column `tCol`) into `intervals`
    * ([startCol, endCol] inclusive, epoch seconds) via `binSeconds`-wide
    * buckets. Returns matched rows (point columns + interval columns);
    * the `__bin` key is dropped. */
  def pointInInterval(points: DataFrame, intervals: DataFrame, tCol: String,
      startCol: String, endCol: String, binSeconds: Long): DataFrame = {
    def binOf(c: Column): Column = floor(c / lit(binSeconds)).cast("long")
    val binned = intervals.withColumn("__bin",
      explode(sequence(binOf(col(startCol)), binOf(col(endCol)))))
    points.withColumn("__bin", binOf(col(tCol)))
      .join(binned, "__bin")
      .filter(col(tCol) >= col(startCol) && col(tCol) <= col(endCol))
      .drop("__bin")
  }

  /** Query surface: per error event, how many user sessions (any user)
    * were active at that instant — the classic concurrency-by-interval
    * question. Sessions come from the same gaps-and-islands derivation as
    * q11_sessionize; every error sits inside its own user's session, so
    * each count is >= 1. Bin = 1 hour (sessions are 30-min-gap bounded,
    * typically shorter than a few bins). */
  def concurrentSessions(events: DataFrame, binSeconds: Long = 3600L): DataFrame = {
    val sessions = graft.streaming.EventStreams.sessionizeBatch(events)
      .select("user_id", "session_start", "session_end")
    val errors = events.filter(col("event_type") === "error")
      .select(col("event_id"), unix_timestamp(col("ts")).as("t"))
    pointInInterval(errors, sessions, "t", "session_start", "session_end", binSeconds)
      .groupBy("event_id")
      .agg(count(lit(1)).as("n_concurrent"))
      .orderBy("event_id")
  }

  /** The NATURAL spelling of [[concurrentSessions]] — a bare
    * `t BETWEEN session_start AND session_end` join — relying on
    * [[graft.plans.RangeJoinRewrite]] to produce the bucketed plan. What
    * a user who never read this file would write; the optimizer owes them
    * the linear join. Shares the oracle with the hand-bucketed form. */
  def concurrentSessionsAuto(events: DataFrame): DataFrame = {
    val spark = events.sparkSession
    graft.plans.RangeJoinRewrite.ensureInstalled(spark)
    val sessions = graft.streaming.EventStreams.sessionizeBatch(events)
      .select("user_id", "session_start", "session_end")
    val errors = events.filter(col("event_type") === "error")
      .select(col("event_id"), unix_timestamp(col("ts")).as("t"))
    errors.join(sessions,
        col("t") >= col("session_start") && col("t") <= col("session_end"))
      .groupBy("event_id")
      .agg(count(lit(1)).as("n_concurrent"))
      .orderBy("event_id")
  }

  /** DuckDB oracle: the same sessions, joined with the range predicate
    * directly (closure-by-inequality is fine at oracle scale; the Spark
    * side exists because it is not fine at corpus scale). */
  def concurrentSessionsSql(gapMinutes: Int = 30): String =
    s"""WITH sessions AS (
       |  SELECT user_id, session_start, session_end
       |  FROM (${graft.streaming.EventStreams.sessionizeBatchSql(gapMinutes)})),
       |errors AS (
       |  SELECT event_id, CAST(floor(epoch(ts)) AS BIGINT) AS t
       |  FROM events WHERE event_type = 'error')
       |SELECT e.event_id, COUNT(*) AS n_concurrent
       |FROM errors e
       |JOIN sessions s ON e.t BETWEEN s.session_start AND s.session_end
       |GROUP BY e.event_id
       |ORDER BY e.event_id""".stripMargin
}
