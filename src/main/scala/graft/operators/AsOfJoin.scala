package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — for each left row, the most recent right row with
  * right.time <= left.time within the same key. Spark has no native ASOF
  * operator; the scalable composition here is the union-merge spelling:
  *
  *   tag both sides -> union -> one shuffle on the key -> per-key
  *   event-time order -> running `last(right_payload, ignoreNulls)` over
  *   rows-unbounded-preceding -> keep left rows.
  *
  * That is ONE shuffle + ONE sort over |L|+|R| rows — the same cost
  * profile as a sort-merge join, with no range-explosion. (The naive
  * spelling — join on key with time inequality + max — is a quadratic
  * range join; this is the plan you actually want at scale.)
  * DuckDB's native ASOF JOIN serves as the oracle.
  */
object AsOfJoin {

  /** Generic as-of join.
    *
    * @param left      left (probe) side
    * @param right     right (reference) side
    * @param key       equi-join column present on both sides
    * @param time      event-time column present on both sides
    * @param rightCols right columns to carry (exposed as matched_<name>)
    */
  def asOf(left: DataFrame, right: DataFrame, key: String, time: String,
      rightCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val l = left.withColumn("__side", lit(0))
      .withColumn("__payload", lit(null).cast(
        org.apache.spark.sql.types.StructType(
          right.select(rightCols.map(col): _*).schema.fields)))
    val r = right.select((Seq(col(key), col(time)) :+
      struct(rightCols.map(col): _*).as("__payload")): _*)
      .withColumn("__side", lit(1))
    // align schemas: left keeps its own columns; right contributes only
    // key/time/payload — fill the rest with nulls via unionByName
    val unioned = l.unionByName(r, allowMissingColumns = true)

    // right rows sort BEFORE left rows at equal timestamps (side 1 first
    // would break "most recent <= t"; we want right-at-same-ts to match,
    // so order right (side desc) before left at ties)
    val w = Window.partitionBy(key)
      .orderBy(col(time).asc, col("__side").desc)
      .rowsBetween(Window.unboundedPreceding, 0)
    unioned
      .withColumn("__match", last(col("__payload"), ignoreNulls = true).over(w))
      .filter(col("__side") === 0)
      .select(leftCols.map(col) :+ col("__match"): _*)
  }

  /** Query surface: each 'error' event matched to the same user's most
    * recent prior (or simultaneous) 'click'. Output: integer ids + whole-
    * second gap, engine-stable against DuckDB's native ASOF JOIN. */
  def errorToLastClick(events: DataFrame): DataFrame = {
    val errors = events.filter(col("event_type") === "error")
      .select(col("event_id"), col("user_id"), col("ts"))
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"),
        col("event_id").as("click_event_id"),
        unix_timestamp(col("ts")).as("click_sec"))
    asOf(errors, clicks, key = "user_id", time = "ts",
      rightCols = Seq("click_event_id", "click_sec"))
      .select(
        col("event_id"),
        col("__match.click_event_id").as("matched_click"),
        (unix_timestamp(col("ts")) - col("__match.click_sec"))
          .cast("long").as("gap_sec"))
      .orderBy("event_id")
  }

  val errorToLastClickSql: String =
    """SELECT e.event_id,
      |  c.event_id AS matched_click,
      |  CAST(floor(epoch(e.ts)) - floor(epoch(c.ts)) AS BIGINT) AS gap_sec
      |FROM (SELECT * FROM events WHERE event_type = 'error') e
      |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      |  ON e.user_id = c.user_id AND c.ts <= e.ts
      |ORDER BY e.event_id""".stripMargin

  /** FORWARD as-of: for each left row, the EARLIEST right row with
    * right.time >= left.time on the same key — the "what happened next"
    * direction (error -> next recovery click, quote -> next trade). Same
    * union-merge shape and cost as [[asOf]], with the per-key window
    * ordered time-DESCENDING so the running `last` sees the smallest
    * time >= t (right rows sort before left at ties, so a simultaneous
    * right row matches). */
  def asOfForward(left: DataFrame, right: DataFrame, key: String, time: String,
      rightCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val l = left.withColumn("__side", lit(0))
      .withColumn("__payload", lit(null).cast(
        org.apache.spark.sql.types.StructType(
          right.select(rightCols.map(col): _*).schema.fields)))
    val r = right.select((Seq(col(key), col(time)) :+
      struct(rightCols.map(col): _*).as("__payload")): _*)
      .withColumn("__side", lit(1))
    val unioned = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(key)
      .orderBy(col(time).desc, col("__side").desc)
      .rowsBetween(Window.unboundedPreceding, 0)
    unioned
      .withColumn("__match", last(col("__payload"), ignoreNulls = true).over(w))
      .filter(col("__side") === 0)
      .select(leftCols.map(col) :+ col("__match"): _*)
  }

  /** Query surface: each 'error' matched to the same user's NEXT 'click'
    * WITHIN `tolSec` — the forward + tolerance as-of (a match farther
    * than the tolerance reports null, exactly like production as-of
    * tolerances). Oracle: DuckDB's native forward ASOF + the same
    * tolerance CASE. */
  def errorToNextClick(events: DataFrame, tolSec: Long = 3600L): DataFrame = {
    val errors = events.filter(col("event_type") === "error")
      .select(col("event_id"), col("user_id"), col("ts"))
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"),
        col("event_id").as("click_event_id"),
        unix_timestamp(col("ts")).as("click_sec"))
    asOfForward(errors, clicks, key = "user_id", time = "ts",
      rightCols = Seq("click_event_id", "click_sec"))
      .select(
        col("event_id"),
        (col("__match.click_sec") - unix_timestamp(col("ts")))
          .cast("long").as("gap_sec"),
        col("__match.click_event_id").as("matched_click"))
      .select(
        col("event_id"),
        when(col("gap_sec") <= tolSec, col("matched_click")).as("matched_click"),
        when(col("gap_sec") <= tolSec, col("gap_sec")).as("gap_sec"))
      .orderBy("event_id")
  }

  def errorToNextClickSql(tolSec: Long = 3600L): String =
    s"""SELECT event_id,
       |  CASE WHEN gap_sec <= $tolSec THEN matched_click END AS matched_click,
       |  CASE WHEN gap_sec <= $tolSec THEN gap_sec END AS gap_sec
       |FROM (
       |  SELECT e.event_id,
       |    c.event_id AS matched_click,
       |    CAST(floor(epoch(c.ts)) - floor(epoch(e.ts)) AS BIGINT) AS gap_sec
       |  FROM (SELECT * FROM events WHERE event_type = 'error') e
       |  ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
       |    ON e.user_id = c.user_id AND c.ts >= e.ts
       |) ORDER BY event_id""".stripMargin
}
