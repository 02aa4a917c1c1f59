package graft.streaming

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Structured Streaming operators over the events table — net-new
  * capability relative to the reference (SURVEY §2.9: absent there).
  *
  * Each streaming query also has a batch spelling so correctness is
  * checkable against the DuckDB oracle: on a static input, a completed
  * stream must produce exactly the batch answer (windowed counts, dedup)
  * or a deterministic subset governed by the watermark (sessionization).
  *
  * Scale notes: all state here is keyed and watermark-bounded — windowed
  * aggs expire by event time, dedup state is per first-seen key,
  * session state evicts on event-time timeout; nothing accumulates
  * unboundedly on a real stream.
  */
object EventStreams {

  /** Raw parquet schema of events (ts stored as TIMESTAMP(NANOS), which
    * Spark surfaces as LongType nanos under nanosAsLong). */
  private val rawSchema = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  private val sinkId = new AtomicInteger(0)

  /** File-source stream over the static events parquet (one micro-batch
    * per file by default — the standard replay harness for testing
    * streaming semantics on deterministic input). The file source needs a
    * DIRECTORY; the testdata is a single read-only file, so stage a temp
    * dir with a symlink (no data copy). */
  def readEventStream(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val streamDir = stagedDir(sfDir)
    spark.readStream
      .schema(rawSchema)
      .parquet(streamDir)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }

  private def stagedDir(sfDir: String): String = {
    import java.nio.file.{Files, Paths}
    val target = Paths.get(sfDir, "events.parquet").toAbsolutePath.normalize
    // collision-free key (SHA-256 of the absolute path — String.hashCode
    // can collide across sfDirs, silently reusing the wrong symlink)
    val key = java.security.MessageDigest.getInstance("SHA-256")
      .digest(target.toString.getBytes("UTF-8"))
      .take(8).map("%02x".format(_)).mkString
    val dir = Paths.get(sys.props("java.io.tmpdir"), s"graft_events_$key")
    val link = dir.resolve("events.parquet")
    Files.createDirectories(dir)
    // verify an existing link still points at the requested file; recreate
    // stale links from deleted/replaced prior targets
    if (Files.isSymbolicLink(link)) {
      if (Files.readSymbolicLink(link) != target) {
        Files.delete(link)
        Files.createSymbolicLink(link, target)
      }
    } else if (!Files.exists(link)) {
      Files.createSymbolicLink(link, target)
    }
    dir.toString
  }

  /** Run a streaming DataFrame to completion against the static input and
    * return the sink contents as a DataFrame. */
  private def runToCompletion(df: DataFrame, mode: OutputMode): DataFrame = {
    val spark = df.sparkSession
    val name = s"graft_sink_${sinkId.incrementAndGet()}"
    val q = df.writeStream
      .format("memory")
      .queryName(name)
      .outputMode(mode)
      .start()
    try {
      q.processAllAvailable()
    } finally {
      q.stop()
    }
    spark.table(name)
  }

  // ------------------------------------------------- windowed aggregation
  /** Tumbling 1h event-time windows x event_type with a 1h watermark —
    * the streaming spelling of Relational.q10. Complete mode: on static
    * input the final answer equals the batch aggregation, so the same
    * oracle applies. */
  def windowedCounts(spark: SparkSession, sfDir: String): DataFrame = {
    val agg = readEventStream(spark, sfDir)
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
    runToCompletion(agg, OutputMode.Complete())
      .select(
        unix_timestamp(col("window.start")).as("bucket"),
        col("event_type"), col("n_events"), col("sum_value"))
      .orderBy("bucket", "event_type")
  }

  val windowedCountsSql: String =
    """SELECT CAST(epoch(time_bucket(INTERVAL '1 hour', ts)) AS BIGINT) AS bucket,
      |  event_type, COUNT(*) AS n_events,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      |FROM events GROUP BY 1, 2 ORDER BY bucket, event_type""".stripMargin

  // ------------------------------------------------------ streaming dedup
  /** Streaming exact dedup on (user_id, event_type): emits the first
    * occurrence of each key. WHICH row wins depends on arrival order, so
    * the engine-stable surface is the key SET — identical to batch
    * DISTINCT, which is the oracle. */
  def streamingDedup(spark: SparkSession, sfDir: String): DataFrame = {
    val deduped = readEventStream(spark, sfDir)
      .select("user_id", "event_type")
      .dropDuplicates("user_id", "event_type")
    runToCompletion(deduped, OutputMode.Append())
      .orderBy("user_id", "event_type")
  }

  val streamingDedupSql: String =
    """SELECT DISTINCT user_id, event_type FROM events
      |ORDER BY user_id, event_type""".stripMargin

  // -------------------------------------------------------- sessionization
  final case class Event(user_id: Long, ts: java.sql.Timestamp, value: Double)
  final case class SessionState(start: Long, last: Long, n: Int, sum: Double)
  final case class Session(user_id: Long, session_start: Long, session_end: Long,
      n_events: Long, sum_value: Double)

  /** Stateful sessionization via flatMapGroupsWithState: per-user sessions
    * closed after `gapMinutes` of event-time silence. Sessions are emitted
    * when the gap is observed in-stream; the final open session per user
    * is emitted on event-time timeout once the watermark passes it.
    * (SURVEY §2.10's mapPartitions trainer is the reference's only custom
    * state — this is the Structured Streaming shape of keyed state.) */
  def sessionize(spark: SparkSession, sfDir: String, gapMinutes: Int = 30): DataFrame = {
    import spark.implicits._
    val gapMs = gapMinutes * 60L * 1000L

    def update(userId: Long, events: Iterator[Event],
        state: GroupState[SessionState]): Iterator[Session] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[Session]
      if (state.hasTimedOut) {
        val s = state.get
        out += Session(userId, s.start / 1000, s.last / 1000, s.n, s.sum)
        state.remove()
      } else {
        val sorted = events.toArray.sortBy(_.ts.getTime)
        var cur = state.getOption.orNull
        sorted.foreach { e =>
          val t = e.ts.getTime
          if (cur == null) cur = SessionState(t, t, 1, e.value)
          else if (t - cur.last > gapMs) {
            out += Session(userId, cur.start / 1000, cur.last / 1000, cur.n, cur.sum)
            cur = SessionState(t, t, 1, e.value)
          } else {
            cur = SessionState(cur.start, t, cur.n + 1, cur.sum + e.value)
          }
        }
        if (cur != null) {
          state.update(cur)
          state.setTimeoutTimestamp(cur.last + gapMs)
        }
      }
      out.iterator
    }

    val sessions = readEventStream(spark, sfDir)
      .select(col("user_id"), col("ts"), col("value"))
      .withWatermark("ts", "0 seconds")
      .as[Event]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(update)

    runToCompletion(sessions.toDF(), OutputMode.Append())
      .orderBy("user_id", "session_start")
  }

  // ------------------------------------------- batch sessionization (oracle)
  /** Batch gaps-and-islands sessionization — the relational spelling of
    * `sessionize`, fully SQL-expressible, used as its own oracled query:
    * lag -> new-session flag -> running sum = session id -> aggregate. */
  def sessionizeBatch(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    val gapSec = gapMinutes * 60L
    val byUser = Window.partitionBy("user_id").orderBy("t")
    events
      .select(col("user_id"), unix_timestamp(col("ts")).as("t"),
        col("value").cast("decimal(18,2)").as("v"))
      .withColumn("prev_t", lag(col("t"), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_t").isNull || col("t") - col("prev_t") > gapSec, 1L).otherwise(0L))
      .withColumn("session_seq",
        sum(col("new_session")).over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy("user_id", "session_seq")
      .agg(
        min(col("t")).as("session_start"),
        max(col("t")).as("session_end"),
        count(lit(1)).as("n_events"),
        sum(col("v")).cast("double").as("sum_value"))
      .select("user_id", "session_start", "session_end", "n_events", "sum_value")
      .orderBy("user_id", "session_start")
  }

  def sessionizeBatchSql(gapMinutes: Int = 30): String = {
    val gapSec = gapMinutes * 60
    // floor(epoch(ts)): Spark's unix_timestamp floors to whole seconds,
    // DuckDB's epoch() keeps fractions — both sides must flag gaps on the
    // SAME truncated values or boundary events split sessions differently.
    s"""WITH base AS (
       |  SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS t,
       |    CAST(value AS DECIMAL(18,2)) AS v
       |  FROM events
       |), flagged AS (
       |  SELECT user_id, t, v,
       |    CASE WHEN lag(t) OVER (PARTITION BY user_id ORDER BY t) IS NULL
       |           OR t - lag(t) OVER (PARTITION BY user_id ORDER BY t) > $gapSec
       |         THEN 1 ELSE 0 END AS new_session
       |  FROM base
       |), numbered AS (
       |  SELECT *, SUM(new_session) OVER (PARTITION BY user_id ORDER BY t
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
       |  FROM flagged
       |)
       |SELECT user_id, MIN(t) AS session_start, MAX(t) AS session_end,
       |  COUNT(*) AS n_events, CAST(SUM(v) AS DOUBLE) AS sum_value
       |FROM numbered GROUP BY user_id, session_seq
       |ORDER BY user_id, session_start""".stripMargin
  }
}
