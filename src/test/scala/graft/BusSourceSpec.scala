package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.sources.BusSource
import graft.streaming.EventStreams

/** The custom DSv2 bus connector (offset-tracked, admission-controlled,
  * out-of-order): restart recovery, generator parity, and the
  * source-seam claim. */
class BusSourceSpec extends SparkSpec {

  private def busStream(rows: Long, batchRows: Long) =
    spark.readStream.format(classOf[BusSource].getName)
      .option("rows", rows.toString)
      .option("batchrows", batchRows.toString)
      .load()

  test("offsets recover across a mid-stream restart: exactly-once output") {
    // phase 1: stop the query mid-stream (after >= 2 of 4 data batches);
    // phase 2: a NEW query on the same checkpoint resumes from the
    // committed offset. Any offset loss duplicates a whole batch, any
    // premature commit drops one — either breaks the exact row census.
    val rows = 40000L
    val batchRows = 10000L
    val out = Files.createTempDirectory("graft_bus_out").toString
    val chk = Files.createTempDirectory("graft_bus_chk").toString
    def start() = busStream(rows, batchRows).writeStream
      .format("parquet").option("path", out)
      .option("checkpointLocation", chk)
      .outputMode(OutputMode.Append()).start()

    val q1 = start()
    try {
      val deadline = System.currentTimeMillis() + 60000
      while (q1.recentProgress.length < 2 && System.currentTimeMillis() < deadline)
        Thread.sleep(100)
      assert(q1.recentProgress.length >= 2, "first run made no progress")
    } finally q1.stop()

    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()

    val got = spark.read.parquet(out)
    assert(got.count() == rows + 2, s"row census: ${got.count()} != ${rows + 2}")
    assert(got.select("event_id").distinct().count() == rows + 2,
      "duplicate event_ids — offset recovery re-served a batch")
    assert(got.filter(col("user_id") < 0).count() == 2,
      "expected exactly the two sentinel rows")
  }

  test("Trigger.AvailableNow drains the whole bus (engine ReadLimit honored)") {
    // the AvailableNow wrapper passes its own ReadLimit to
    // latestOffset(start, limit); a source that ignores it in favor of
    // its captured batchRows under-admits and the wrapper declares the
    // stream caught up after one batch — the census then comes up short
    val rows = 30000L
    val out = Files.createTempDirectory("graft_bus_an_out").toString
    val chk = Files.createTempDirectory("graft_bus_an_chk").toString
    val q = busStream(rows, 7000L).writeStream
      .format("parquet").option("path", out)
      .option("checkpointLocation", chk)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .outputMode(OutputMode.Append()).start()
    try {
      val deadline = System.currentTimeMillis() + 120000
      while (q.isActive && System.currentTimeMillis() < deadline)
        Thread.sleep(200)
      assert(!q.isActive, "AvailableNow query did not terminate")
    } finally q.stop()
    val got = spark.read.parquet(out)
    assert(got.count() == rows + 2,
      s"AvailableNow under-drained: ${got.count()} != ${rows + 2}")
  }

  test("bus rows equal the integer-arithmetic generator (disorder is bounded)") {
    import spark.implicits._
    val rows = 20000L
    // stream the bus to completion through a stateless passthrough
    val sink = EventStreams.runToCompletionForTest(
      busStream(rows, 5000L), OutputMode.Append())
    val streamed = sink.filter(col("user_id") >= 0)
      .select(col("event_id"), unix_micros(col("ts")).as("tsm"),
        col("user_id"), col("event_type"), col("value"))
      .as[(Long, Long, Long, String, Double)].collect().sortBy(_._1)
    assert(streamed.length == rows)
    streamed.foreach { case (i, tsm, u, t, v) =>
      assert(tsm == BusSource.tsMicros(i, rows), s"ts drift at $i")
      assert(u == i % 64, s"user drift at $i")
      assert(t == BusSource.Types((i % 4).toInt), s"type drift at $i")
      assert(v == BusSource.value(i), s"value drift at $i")
    }
    // disorder is REAL and BOUNDED: within the arrival order (event_id),
    // event time regresses somewhere (the permutation scrambled it), but
    // never by more than one block span
    val regressions = streamed.sliding(2).count {
      case Array(a, b) => b._2 < a._2
      case _ => false
    }
    assert(regressions > 0, "bus delivered in-order — disorder fixture broken")
    streamed.sliding(2).foreach {
      case Array(a, b) =>
        assert(a._2 - b._2 <= BusSource.Block.toLong * BusSource.StepMicros,
          s"lateness exceeded one block span at ${b._1}")
      case _ =>
    }
  }

  test("buffered PIT features over the bus equal the relational window replay") {
    // the capstone composition: the offset-tracked OOO connector feeding
    // the watermark-buffered fold must equal the batch window spelling
    // computed from the same integer generator
    import org.apache.spark.sql.expressions.Window
    val rows = 50000L
    val streamRes = EventStreams.busPitFeatures(spark, rows).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toSet
    val ev = spark.range(rows).toDF("i").selectExpr(
      "i AS event_id",
      s"(${BusSource.Epoch0Micros}L + ((i div ${BusSource.Block}) * ${BusSource.Block} " +
        s"+ ((i % ${BusSource.Block}) * ${BusSource.Mult}L) % ${BusSource.Block}) " +
        s"* ${BusSource.StepMicros}L) AS tsm",
      "i % 64 AS user_id",
      "CASE CAST(i % 4 AS INT) WHEN 0 THEN 'view' WHEN 1 THEN 'click' " +
        "WHEN 2 THEN 'purchase' ELSE 'error' END AS event_type",
      "(i * 37) % 10000 AS cents")
    val w = Window.partitionBy("user_id").orderBy("tsm", "event_id")
    val prior = w.rowsBetween(Window.unboundedPreceding, -1)
    val batch = ev
      .withColumn("n_prior", count(lit(1)).over(prior))
      .withColumn("n_prior_views", coalesce(
        sum(when(col("event_type") === "view", 1L).otherwise(0L)).over(prior), lit(0L)))
      .withColumn("sum_prior_cents", coalesce(sum("cents").over(prior), lit(0L)))
      .withColumn("sec_since_prev", coalesce(
        floor((col("tsm") - lag("tsm", 1).over(w)) / 1000000L).cast("long"), lit(-1L)))
      .filter(col("event_type") === "purchase")
      .select("event_id", "user_id", "tsm", "n_prior", "n_prior_views",
        "sum_prior_cents", "sec_since_prev")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toSet
    assert(streamRes.nonEmpty && streamRes == batch,
      s"stream-only=${(streamRes -- batch).take(3)} batch-only=${(batch -- streamRes).take(3)}")
  }

  test("windowed counts over the bus equal the batch aggregate (seam claim)") {
    // the same aggregation computed from a batch range() with the same
    // integer formulas — the in-JVM twin of the DuckDB oracle
    val rows = 100000L
    val streamRes = EventStreams.busWindowedCounts(spark, rows).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    val batch = spark.range(rows).toDF("i").selectExpr(
      s"(${BusSource.Epoch0Micros}L + ((i div ${BusSource.Block}) * ${BusSource.Block} " +
        s"+ ((i % ${BusSource.Block}) * ${BusSource.Mult}L) % ${BusSource.Block}) " +
        s"* ${BusSource.StepMicros}L) AS tsm",
      "CASE CAST(i % 4 AS INT) WHEN 0 THEN 'view' WHEN 1 THEN 'click' " +
        "WHEN 2 THEN 'purchase' ELSE 'error' END AS event_type",
      "((i * 37) % 10000) / 100.0 AS value")
      .groupBy(expr("(tsm div 3600000000L) * 3600").as("bucket"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    assert(streamRes.nonEmpty && streamRes == batch,
      s"stream-only=${(streamRes -- batch).take(3)} batch-only=${(batch -- streamRes).take(3)}")
  }
}
