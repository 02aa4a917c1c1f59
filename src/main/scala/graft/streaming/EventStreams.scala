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
  * Scale notes: dedup state is per first-seen key, session and as-of
  * state are keyed and bounded (event-time timeout / one ClickState per
  * user); windowedCounts runs COMPLETE mode for finite-replay equality
  * with the batch oracle — the production unbounded-stream spelling is
  * Append with the watermark doing eviction (the sessionize sentinel
  * pattern shows how finite replays stay oracle-exact in Append mode).
  */
object EventStreams {

  private val sinkId = new AtomicInteger(0)

  /** Peak stateful-operator row count of the LAST [[runToCompletion]]
    * run (-1 if the query was stateless) — lets StreamingSpec assert a
    * state-store configuration actually carried state. */
  private[graft] val lastStateRowsPeak =
    new java.util.concurrent.atomic.AtomicLong(-1L)

  /** Stateful-operator row count AFTER the last micro-batch of the LAST
    * [[runToCompletion]] run (-1 if stateless). On the staged replays the
    * final sentinel pushes the watermark past every real row, so working
    * eviction leaves ~0 rows here while a broken watermark leaves the
    * whole corpus — the invariant the PEAK cannot see on a short replay
    * where everything legitimately buffers before the flush. */
  private[graft] val lastStateRowsFinal =
    new java.util.concurrent.atomic.AtomicLong(-1L)

  /** Micro-batches with input rows in the LAST [[runToCompletion]] run —
    * a deterministic function of the staged replay (files + sentinels),
    * so a gate on it catches trigger/staging drift that seconds cannot
    * (VERDICT r10 #2). Always recorded (free: derived from progress). */
  private[graft] val lastMicroBatchCount =
    new java.util.concurrent.atomic.AtomicLong(-1L)

  /** Total shuffle-write records during the LAST probed run (-1 when the
    * probe was off). Only measured when [[structuralProbe]] is set —
    * the listener drain adds ~0.2 s per run, which would distort bench
    * seconds if always on. */
  private[graft] val lastShuffleRecords =
    new java.util.concurrent.atomic.AtomicLong(-1L)

  /** Opt-in switch for the shuffle-record listener (StreamingSpec's
    * structural gates set it around their calls; bench leaves it off). */
  private[graft] val structuralProbe =
    new java.util.concurrent.atomic.AtomicBoolean(false)

  private final class ShuffleProbe extends org.apache.spark.scheduler.SparkListener {
    val records = new java.util.concurrent.atomic.AtomicLong(0L)
    override def onStageCompleted(
        e: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
      records.addAndGet(
        e.stageInfo.taskMetrics.shuffleWriteMetrics.recordsWritten)
      ()
    }
  }

  /** File-source stream over the static events parquet (one micro-batch
    * per file by default — the standard replay harness for testing
    * streaming semantics on deterministic input). The file source needs a
    * DIRECTORY; the testdata is a single read-only file, so stage a temp
    * dir with a symlink (no data copy).
    *
    * The schema is PROBED from the file via [[graft.Tables.eventsRawSchema]]
    * (readStream requires an explicit schema) and `ts` normalized by the
    * SAME [[graft.Tables.normalizeEventTs]] the batch reader uses — batch
    * and stream cannot diverge on the source's timestamp unit again
    * (round-4 regression: the file flipped TIMESTAMP(NANOS) → MICROS and a
    * hardcoded nanos schema here collapsed the 720 h event span to 0.72 h). */
  def readEventStream(spark: SparkSession, sfDir: String,
      sentinelGapMs: Option[Long] = None): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val rawSchema = graft.Tables.eventsRawSchema(spark, sfDir)
    val streamDir = stagedDir(spark, sfDir, sentinelGapMs, rawSchema)
    val reader = spark.readStream
      .schema(rawSchema)
      // one file per micro-batch so a staged sentinel file lands AFTER
      // the data batch and advances the watermark past it
      .option("maxFilesPerTrigger", "1")
    graft.Tables.normalizeEventTs(reader.parquet(streamDir))
  }

  // ------------------------------------------------- source abstraction
  /** Source seam (VERDICT r5 #7): every streaming transform in this file
    * consumes a DataFrame with the events schema (event_id, ts, user_id,
    * event_type, value, props), so the transforms are source-agnostic.
    * The FILE REPLAY source is the deterministic oracle harness; the RATE
    * source proves the same transform runs on an unbounded, non-file,
    * continuously-arriving source (StreamingSpec); a Kafka source would
    * be one more implementation — `readStream.format("kafka")` +
    * `from_json(value)` projected to the same schema (not constructible
    * in this zero-egress sandbox, but nothing in the transforms would
    * know the difference — that is the point of the seam). */
  sealed trait EventSource { def load(spark: SparkSession): DataFrame }

  /** Deterministic file replay over the static events table (one
    * micro-batch per file; optional far-future watermark sentinels). */
  final case class FileReplaySource(sfDir: String,
      sentinelGapMs: Option[Long] = None) extends EventSource {
    def load(spark: SparkSession): DataFrame =
      readEventStream(spark, sfDir, sentinelGapMs)
  }

  /** Synthetic unbounded events from Spark's built-in rate source mapped
    * to the events schema — the Kafka-shaped stand-in for proving
    * source-agnosticism: unbounded, continuously arriving, never
    * file-backed, processing-time event times. */
  final case class RateEventSource(rowsPerSecond: Int = 200,
      nUsers: Int = 16) extends EventSource {
    def load(spark: SparkSession): DataFrame =
      spark.readStream.format("rate")
        .option("rowsPerSecond", rowsPerSecond.toString).load()
        .select(
          col("value").as("event_id"),
          col("timestamp").as("ts"),
          pmod(col("value"), lit(nUsers.toLong)).as("user_id"),
          element_at(
            array(lit("view"), lit("click"), lit("purchase"), lit("error")),
            (pmod(col("value"), lit(4L)) + 1).cast("int")).as("event_type"),
          (pmod(col("value"), lit(1000L)) / lit(10.0)).as("value"),
          lit("{}").as("props"))
  }

  /** The OFFSET-TRACKED custom connector ([[graft.sources.BusSource]])
    * behind the same seam: unbounded-shaped, admission-controlled,
    * checkpoint-recoverable, delivering bounded out-of-order event time.
    * The third source proof after file replay and rate. */
  final case class BusEventSource(rows: Long = 100000L, nUsers: Int = 64)
      extends EventSource {
    def load(spark: SparkSession): DataFrame =
      spark.readStream.format(classOf[graft.sources.BusSource].getName)
        .option("rows", rows.toString)
        .option("users", nUsers.toString)
        .load()
  }

  /** Windowed counts over the bus connector, Append mode with a
    * lateness-covering watermark (one permutation-block span): the
    * scrambled arrival order must still produce the exact per-hour
    * aggregate, and the bus's integer-arithmetic payload gives DuckDB a
    * full hash oracle over `range(n)` — an END-TO-END correctness gate
    * for a from-scratch DSv2 connector (offsets, admission control,
    * partition readers, watermark interplay), not just a unit test. */
  def busWindowedCounts(spark: SparkSession, rows: Long = 100000L,
      nUsers: Int = 64): DataFrame = {
    val agg = BusEventSource(rows, nUsers).load(spark)
      .withWatermark("ts", s"${graft.sources.BusSource.Block} seconds")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
    runToCompletion(agg, OutputMode.Append())
      .filter(col("event_type") =!= "__sentinel__")
      .select(unix_timestamp(col("window.start")).as("bucket"),
        col("event_type"), col("n_events"), col("sum_value"))
      .orderBy("bucket", "event_type")
  }

  def busWindowedCountsSql(rows: Long = 100000L, nUsers: Int = 64): String =
    s"""WITH ${graft.sources.BusSource.oracleCte(rows, nUsers)}
       |SELECT (ts_micros // 3600000000) * 3600 AS bucket, event_type,
       |  COUNT(*) AS n_events,
       |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
       |FROM bus GROUP BY 1, 2 ORDER BY bucket, event_type""".stripMargin

  /** Stage a temp directory for the file source. With `sentinelGapMs`
    * set, additionally writes a one-row far-future sentinel file (user_id
    * -1, ts = max(ts) + gap + 1s): once that batch is processed the
    * event-time watermark passes EVERY real session's timeout, so
    * stateful operators flush all final state — on static input the
    * stream then equals the batch answer exactly instead of a
    * watermark-governed subset. Callers filter user_id >= 0. */
  private def stagedDir(spark: SparkSession, sfDir: String,
      sentinelGapMs: Option[Long], rawSchema: StructType): String = {
    import java.nio.file.{Files, Paths}
    val target = Paths.get(sfDir, "events.parquet").toAbsolutePath.normalize
    // collision-free key (SHA-256 of the absolute path — String.hashCode
    // can collide across sfDirs, silently reusing the wrong symlink)
    val suffix = sentinelGapMs.map(g => s"_s$g").getOrElse("")
    val key = java.security.MessageDigest.getInstance("SHA-256")
      .digest(target.toString.getBytes("UTF-8"))
      .take(8).map("%02x".format(_)).mkString + suffix
    val dir = Paths.get(sys.props("java.io.tmpdir"), s"graft_events_$key")
    val link = dir.resolve("events.parquet")
    Files.createDirectories(dir)
    // verify an existing link still points at the requested file; recreate
    // stale links from deleted/replaced prior targets — and repair a
    // REGULAR file squatting on the link path (stale content would
    // silently stream as the events table)
    if (Files.isSymbolicLink(link)) {
      if (Files.readSymbolicLink(link) != target) {
        Files.delete(link)
        Files.createSymbolicLink(link, target)
      }
    } else if (Files.exists(link)) {
      Files.delete(link)
      Files.createSymbolicLink(link, target)
    } else {
      Files.createSymbolicLink(link, target)
    }
    sentinelGapMs.foreach { gapMs =>
      // TWO sentinel files, one batch each (maxFilesPerTrigger=1): the
      // watermark a batch observes comes from the PREVIOUS batch, so the
      // second sentinel batch is what processes timeouts under the first
      // sentinel's watermark (> every real session timeout). Relying on a
      // trailing no-data micro-batch instead is racy with
      // processAllAvailable (measured: the very last session stayed
      // unflushed).
      import spark.implicits._
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      // the sentinel files must carry `ts` in the FILE's exact raw type
      // (they share the data file's probed schema) — compute the max in
      // micros via the shared normalizer, convert back at write time
      val rawTsType = rawSchema("ts").dataType
      val maxTsMicros = graft.Tables.normalizeEventTs(
          spark.read.schema(rawSchema).parquet(target.toString))
        .agg(max(unix_micros(col("ts")))).head().getLong(0)
      // Sentinels are valid only for the CURRENT target file: keyed on
      // max(ts) AND the target's mtime. The mtime matters because the
      // file source processes files in modification-time order — a
      // REGENERATED data file (same content, fresh mtime) would sort
      // AFTER cached sentinels, the sentinel batches would run first,
      // and the far-future watermark would drop every real event as
      // late (empty output). Regenerating the sentinels restores
      // data-before-sentinel ordering. Both sentinel files must exist:
      // with only the second, its batch would run under the data
      // watermark and no batch would flush the final sessions.
      val targetMtime = Files.getLastModifiedTime(target).toMillis
      val stamp = s"$maxTsMicros:$targetMtime:${rawTsType.simpleString}"
      val marker = dir.resolve("_graft_sentinel_maxts")
      val fresh = Files.exists(marker) &&
        Files.readString(marker).trim == stamp &&
        Files.exists(dir.resolve("zz_sentinel1.parquet")) &&
        Files.exists(dir.resolve("zz_sentinel2.parquet"))
      if (!fresh) {
        (1 to 2).foreach { k =>
          val sentinel = dir.resolve(s"zz_sentinel$k.parquet")
          val sentinelMicros = maxTsMicros + k * (gapMs + 1000L) * 1000L
          val tmp = Files.createTempDirectory("graft_sentinel")
          val tsCol = rawTsType match {
            case LongType => col("us") * 1000L // micros -> raw nanos long
            case TimestampNTZType =>
              timestamp_micros(col("us")).cast(TimestampNTZType)
            case _ => timestamp_micros(col("us"))
          }
          Seq((-k.toLong, sentinelMicros, -1L, "__sentinel__", 0.0, ""))
            .toDF("event_id", "us", "user_id", "event_type", "value", "props")
            .withColumn("ts", tsCol)
            .select("event_id", "ts", "user_id", "event_type", "value", "props")
            .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
          val listing = Files.list(tmp)
          val part = try listing.filter(_.toString.endsWith(".parquet"))
            .findFirst().get()
          finally listing.close()
          Files.move(part, sentinel,
            java.nio.file.StandardCopyOption.REPLACE_EXISTING)
          // clean the scratch dir (leftover _SUCCESS/.crc files)
          val rest = Files.list(tmp)
          try rest.forEach(p => Files.deleteIfExists(p)) finally rest.close()
          Files.deleteIfExists(tmp)
        }
        Files.writeString(marker, stamp)
      }
    }
    dir.toString
  }

  private val liveSinks = new java.util.concurrent.ConcurrentLinkedQueue[String]()

  /** Run a streaming DataFrame to completion against the static input and
    * return the sink contents as a DataFrame. Memory-sink views from
    * PREVIOUS invocations are dropped first — each pins its full result
    * set in driver memory, and the harness consumes every result before
    * starting the next query. */
  /** State-partition count for the finite replay runs. Profiled r13
    * (tools/StreamProfile, sf0.1 interval-join-outer): with the session's
    * 32 shuffle partitions, EVERY micro-batch pays a per-partition
    * state-store load/commit across all stateful operators — the three
    * ~empty sentinel/trailing batches cost 10.6 s of the query's 17 s,
    * and aggregate state commitMs was 67 s. At 8 partitions the same
    * run is 7.3 s wall (commitMs 3 s) with bit-identical output (state
    * hash-partitioning is invisible to results; the oracles pin it).
    * Production sizing: state partitions follow STATE VOLUME (target
    * rows-per-store), not CPU count — these replays hold < 10^5 state
    * rows, where 8 stores is already more than enough parallelism. */
  private val StateParts =
    sys.env.getOrElse("SPARK_GRAFT_STREAM_PARTITIONS", "8")

  private def runToCompletion(df: DataFrame, mode: OutputMode): DataFrame = {
    val spark = df.sparkSession
    var prev = liveSinks.poll()
    while (prev != null) {
      spark.catalog.dropTempView(prev)
      prev = liveSinks.poll()
    }
    val name = s"graft_sink_${sinkId.incrementAndGet()}"
    liveSinks.add(name)
    val shuffleProbe =
      if (structuralProbe.get()) {
        val p = new ShuffleProbe
        spark.sparkContext.addSparkListener(p)
        Some(p)
      } else None
    // shuffle-partition override is read at STREAM START and baked into
    // the run's state layout; the first batch is planned ASYNCHRONOUSLY
    // after start(), so the restore waits for the drained run (the
    // sink's batch read-back below runs under the restored conf)
    val prevParts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", StateParts)
    // start() can throw synchronously (bad source dir, analysis error) —
    // restore the conf and drop the probe listener on that path too
    // (ADVICE r13: a failed start previously left the session's shuffle
    // partitions at the streaming override for its remaining lifetime)
    val q = try {
      df.writeStream
        .format("memory")
        .queryName(name)
        .outputMode(mode)
        .start()
    } catch { case e: Throwable =>
      spark.conf.set("spark.sql.shuffle.partitions", prevParts)
      shuffleProbe.foreach(spark.sparkContext.removeSparkListener(_))
      throw e
    }
    try {
      q.processAllAvailable()
      spark.conf.set("spark.sql.shuffle.partitions", prevParts)
      // state observability for tests (RocksDB/HDFS provider parity):
      // peak stateful-operator rows across the run's micro-batches
      val st = q.recentProgress.flatMap(_.stateOperators).map(_.numRowsTotal)
      lastStateRowsPeak.set(if (st.isEmpty) -1L else st.max)
      val fin = q.recentProgress.lastOption.toSeq
        .flatMap(_.stateOperators).map(_.numRowsTotal)
      lastStateRowsFinal.set(if (fin.isEmpty) -1L else fin.sum)
      lastMicroBatchCount.set(q.recentProgress.count(_.numInputRows > 0).toLong)
      shuffleProbe.foreach { p =>
        // the listener bus is async — poll until the counter goes quiet
        var last = -1L
        var cur = p.records.get()
        var i = 0
        while (cur != last && i < 100) {
          Thread.sleep(100); last = cur; cur = p.records.get(); i += 1
        }
        lastShuffleRecords.set(cur)
      }
      if (sys.env.contains("GRAFT_STREAM_DEBUG")) {
        q.recentProgress.foreach { p =>
          System.err.println(s"[stream-debug] batch=${p.batchId} rows=${p.numInputRows} " +
            s"watermark=${p.eventTime.get("watermark")} max=${p.eventTime.get("max")}")
        }
      }
    } finally {
      q.stop()
      spark.conf.set("spark.sql.shuffle.partitions", prevParts)
      shuffleProbe.foreach(spark.sparkContext.removeSparkListener(_))
    }
    spark.table(name)
  }

  /** Test seam: run an arbitrary streaming frame through the shared
    * memory-sink completion harness (BusSourceSpec's passthrough). */
  private[graft] def runToCompletionForTest(df: DataFrame,
      mode: OutputMode): DataFrame = runToCompletion(df, mode)

  // ---------------------------------------------------- ts-span canary
  /** Canary: the event-time span and row count as seen by the STREAMING
    * source, oracle-checked against the batch table. The round-4 testdata
    * regeneration flipped `ts` from TIMESTAMP(NANOS) to MICROS and the
    * then-hardcoded stream schema silently compressed the 720 h span to
    * 0.72 h, corrupting six stateful queries at once. With this one-row
    * query in the sweep, the NEXT source-format drift fails loudly here
    * (min/max/count are unit-sensitive) instead of surfacing as six
    * confusing stateful-query mismatches. */
  def tsSpanCanary(spark: SparkSession, sfDir: String): DataFrame = {
    val agg = readEventStream(spark, sfDir)
      .agg(
        min(unix_timestamp(col("ts"))).as("min_sec"),
        max(unix_timestamp(col("ts"))).as("max_sec"),
        count(lit(1)).as("n_events"))
    runToCompletion(agg, OutputMode.Complete())
  }

  val tsSpanCanarySql: String =
    """SELECT CAST(floor(epoch(MIN(ts))) AS BIGINT) AS min_sec,
      |  CAST(floor(epoch(MAX(ts))) AS BIGINT) AS max_sec,
      |  COUNT(*) AS n_events FROM events""".stripMargin

  // ------------------------------------------------- windowed aggregation
  /** Tumbling 1h event-time windows x event_type with a 1h watermark —
    * the streaming spelling of Relational.q10. Complete mode: on static
    * input the final answer equals the batch aggregation, so the same
    * oracle applies. */
  /** [[windowedCounts]]'s transform against ANY [[EventSource]] output —
    * factored so source-agnosticism is structural, not claimed
    * (StreamingSpec runs it on [[RateEventSource]]). */
  def windowedCountsTransform(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))

  def windowedCounts(spark: SparkSession, sfDir: String): DataFrame = {
    val agg = windowedCountsTransform(FileReplaySource(sfDir).load(spark))
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

  /** The PRODUCTION unbounded-stream spelling of [[windowedCounts]]:
    * Append mode, where the 1h watermark EVICTS each window's state once
    * the window closes — state is bounded by open windows x event types,
    * never by stream length (Complete mode's result table grows forever).
    *
    * Finite-replay equality (same oracle as windowedCounts): the staged
    * far-future sentinels (see [[stagedDir]]) push the watermark past
    * every real window's end, so Append emits ALL real windows before the
    * replay drains. The 2h sentinel gap makes the FIRST sentinel's
    * watermark (gap - 1h delay = 1h past max ts) clear the last real
    * window's end, so real windows flush while a sentinel batch is still
    * queued behind them to trigger the emission. Sentinel rows are
    * removed AFTER the sink: a pre-aggregation filter on user_id/
    * event_type would be pushed down to the parquet scan and prune the
    * sentinel FILES before the watermark operator ever saw their event
    * times (the sessionize update function documents the same trap). */
  def windowedCountsAppend(spark: SparkSession, sfDir: String): DataFrame = {
    val agg = windowedCountsTransform(
      FileReplaySource(sfDir, sentinelGapMs = Some(7200000L)).load(spark))
    runToCompletion(agg, OutputMode.Append())
      .filter(col("event_type") =!= "__sentinel__")
      .select(
        unix_timestamp(col("window.start")).as("bucket"),
        col("event_type"), col("n_events"), col("sum_value"))
      .orderBy("bucket", "event_type")
  }

  // ----------------------------------------------- streaming HLL sketch
  /** Streaming HyperLogLog distinct users per event_type: the stream
    * maintains the REGISTER table (one stateful max-aggregation whose
    * state is bounded by groups x 4096 rows — the whole point of a
    * sketch on an unbounded stream: no watermark needed, state never
    * grows with cardinality); the estimate is a cheap batch read over
    * the completed registers. That split is the production shape — the
    * stream keeps sketch state current, queries read it — and register
    * maintenance is ORDER-INSENSITIVE (max of per-row ranks), so on a
    * finite replay the result equals batch [[graft.operators.Sketches
    * .hllDistinct]] exactly and shares its DuckDB oracle. */
  def streamingHllDistinct(spark: SparkSession, sfDir: String): DataFrame = {
    val registers = graft.operators.Sketches
      .hllRegisterRows(readEventStream(spark, sfDir), "event_type", "user_id")
      .groupBy("grp", "bucket").agg(max("rank").as("r"))
    val regs = runToCompletion(registers, OutputMode.Complete())
    graft.operators.Sketches.withExactYardstick(
      graft.Tables.events(spark, sfDir), "event_type", "user_id",
      graft.operators.Sketches.hllEstimate(regs))
  }

  // ------------------------------------------------ streaming grouped top-k
  /** Streaming grouped top-k: the stream maintains per-(hour window,
    * user) event counts — keyed state bounded by active windows x users
    * seen in them, evictable by the watermark in Append-mode production;
    * the bounded `topk_pairs` aggregate ([[graft.functions.TopKPairsAgg]])
    * then ranks the COMPLETED counts per window — the same
    * maintain-state-then-read split as the streaming HLL/CMS sketches.
    * Counting aggregation is order-insensitive, so on a finite replay the
    * counts equal batch exactly and the deterministic (count DESC, id ASC)
    * ranking shares the batch window-replay oracle. */
  def streamingTopUsers(spark: SparkSession, sfDir: String, k: Int = 3): DataFrame = {
    graft.functions.VectorFunctions.ensureRegistered(spark)
    val counts = readEventStream(spark, sfDir)
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
    runToCompletion(counts, OutputMode.Complete())
      .select(unix_timestamp(col("window.start")).as("bucket"),
        col("user_id"), col("n_events"))
      .groupBy("bucket")
      .agg(call_function("topk_pairs",
        col("n_events"), col("user_id"), lit(k)).as("top"))
      .select(col("bucket"), posexplode(col("top")))
      .select(col("bucket"), (col("pos") + 1).cast("long").as("rn"),
        col("col.id").as("user_id"), col("col.ord").as("n_events"))
      .orderBy("bucket", "rn")
  }

  def streamingTopUsersSql(k: Int = 3): String =
    s"""SELECT bucket, rn, user_id, n_events FROM (
       |  SELECT bucket, user_id, n_events,
       |    ROW_NUMBER() OVER (PARTITION BY bucket
       |      ORDER BY n_events DESC, user_id ASC) AS rn
       |  FROM (SELECT CAST(epoch(time_bucket(INTERVAL '1 hour', ts)) AS BIGINT) AS bucket,
       |          user_id, COUNT(*) AS n_events
       |        FROM events GROUP BY 1, 2))
       |WHERE rn <= $k ORDER BY bucket, rn""".stripMargin

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

  /** [[streamingDedup]] with WATERMARK-BOUNDED state — the production
    * unbounded-stream spelling: `dropDuplicatesWithinWatermark` lets the
    * engine EVICT a key's dedup state once the event-time watermark
    * passes its ts + delay, where plain `dropDuplicates` keys state
    * forever (the stream_dedup registration's documented ceiling). The
    * guarantee weakens to "duplicates arriving within the delay are
    * dropped; later re-occurrences may re-emit" — on this harness the
    * replay ships all real events in ONE micro-batch (single-file
    * source, maxFilesPerTrigger=1), which is trivially within any delay,
    * so the emitted set still equals the batch DISTINCT and shares its
    * oracle. At scale the delay is the knob trading state size against
    * re-emission of long-gap duplicates. */
  def streamingDedupWatermark(spark: SparkSession, sfDir: String): DataFrame = {
    val deduped = readEventStream(spark, sfDir)
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("user_id", "event_type")
      .select("user_id", "event_type")
    runToCompletion(deduped, OutputMode.Append())
      .orderBy("user_id", "event_type")
  }

  // -------------------------------------------------------- sessionization
  // value is Option[Double]: the source column is nullable, and SQL SUM
  // semantics must survive the typed fold — a session whose every value
  // is NULL reports sum_value NULL (like the batch/oracle SUM), which a
  // coalesce-to-0 at the source could not distinguish from a genuine 0.0
  // (found by AdversarialEventsSpec)
  final case class Event(user_id: Long, ts: java.sql.Timestamp,
      value: Option[Double])
  final case class SessionState(start: Long, last: Long, n: Int,
      cents: Long, nVals: Long)
  final case class Session(user_id: Long, session_start: Long, session_end: Long,
      n_events: Long, sum_value: Option[Double])

  /** Stateful sessionization via flatMapGroupsWithState: per-user sessions
    * closed after `gapMinutes` of event-time silence. Sessions are emitted
    * when the gap is observed in-stream; final open sessions are emitted
    * on event-time timeout — the staged far-future sentinel (see
    * stagedDir) pushes the watermark past every real timeout, so on the
    * static replay the output equals the batch gaps-and-islands answer
    * EXACTLY and shares its DuckDB oracle. Value sums are accumulated in
    * integer cents (the testdata values have 2 decimals), matching the
    * oracle's DECIMAL(18,2) sum bit-for-bit after the final /100.0.
    * (SURVEY §2.10's mapPartitions trainer is the reference's only custom
    * state — this is the Structured Streaming shape of keyed state.) */
  def sessionize(spark: SparkSession, sfDir: String, gapMinutes: Int = 30): DataFrame = {
    import spark.implicits._
    val gapMs = gapMinutes * 60L * 1000L
    val gapSec = gapMinutes * 60L

    def update(userId: Long, events: Iterator[Event],
        state: GroupState[SessionState]): Iterator[Session] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[Session]
      def close(s: SessionState): Session =
        Session(userId, s.start, s.last, s.n,
          if (s.nVals == 0) None else Some(s.cents / 100.0))
      if (state.hasTimedOut) {
        out += close(state.get)
        state.remove()
      } else if (userId < 0) {
        // sentinel group: advances the watermark, never holds state.
        // MUST be dropped here in the typed function, not with a
        // relational filter — a filter on user_id would be pushed down to
        // the parquet scan and row-group-prune the sentinel FILES, so the
        // watermark operator would never see their event times (measured:
        // sentinel batches arrived with 0 rows)
      } else {
        // floor to WHOLE SECONDS before gap comparison: the batch/oracle
        // spelling flags gaps on floor(epoch(ts)) diffs, so a
        // millisecond-precision comparison here would split boundary gaps
        // (actual gap in (gapSec, gapSec+1) seconds) differently than the
        // oracle this stream claims to equal
        val sorted = events.toArray.sortBy(_.ts.getTime)
        var cur = state.getOption.orNull
        sorted.foreach { e =>
          val t = e.ts.getTime / 1000
          val c = e.value.map(v => math.round(v * 100)).getOrElse(0L)
          val hv = if (e.value.isDefined) 1L else 0L
          if (cur == null) cur = SessionState(t, t, 1, c, hv)
          else if (t - cur.last > gapSec) {
            out += close(cur)
            cur = SessionState(t, t, 1, c, hv)
          } else {
            cur = SessionState(cur.start, t, cur.n + 1, cur.cents + c,
              cur.nVals + hv)
          }
        }
        if (cur != null) {
          state.update(cur)
          // timeout in ms from the floored-second session end; may fire up
          // to 999 ms before last+gapMs — any event that close to the
          // boundary would be late under the 0-second watermark anyway
          state.setTimeoutTimestamp((cur.last + gapSec) * 1000)
        }
      }
      out.iterator
    }

    val sessions = readEventStream(spark, sfDir, sentinelGapMs = Some(gapMs))
      .select(col("user_id"), col("ts"), col("value"))
      .withWatermark("ts", "0 seconds")
      .as[Event]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(update)

    runToCompletion(sessions.toDF(), OutputMode.Append())
      .orderBy("user_id", "session_start")
  }

  // ------------------------------------- native session_window sessionize
  /** The DECLARATIVE twin of [[sessionize]]: Spark's built-in
    * `session_window` aggregation instead of hand-rolled
    * flatMapGroupsWithState — state merging, eviction, and emission are
    * the engine's own (the "compose existing ops first" rule; the custom
    * -state spelling stays registered as the template for semantics the
    * built-in can't express, e.g. per-session early emission).
    *
    * Exactness vs the gaps-and-islands oracle needs two alignments:
    * event times are floored to WHOLE SECONDS before windowing (the
    * oracle flags gaps on floored epochs), and the merge boundary must
    * match — session_window merges INCLUSIVELY (next <= prev + gap;
    * verified against a measured diff == gap+1 split at sf0.01), which
    * on integer-second data is exactly the oracle's `diff <= gapSec`
    * merge / `diff > gapSec` split. window.end is last-event + gap, so
    * the session_end the oracle expects is `end - gapSec`.
    *
    * Append mode + the far-future sentinels flush every real session on
    * the finite replay (same mechanics as [[sessionize]]); the sentinel
    * group (user -1) holds its own session that simply never emits. */
  def sessionizeNative(spark: SparkSession, sfDir: String,
      gapMinutes: Int = 30): DataFrame = {
    val gapSec = gapMinutes * 60L
    // 2x-gap sentinels: a native window EMITS only when the watermark is
    // STRICTLY past its end (= last event + gap+1). The last real
    // session's end can tie a 1x-gap sentinel's watermark when max(ts)
    // falls on a whole second (observed at sf0.01: exactly one session
    // held back); doubling the sentinel gap clears every real end with
    // margin, like windowedCountsAppend's 2h sentinels for 1h windows.
    val agg = readEventStream(spark, sfDir,
        sentinelGapMs = Some(2L * gapMinutes * 60L * 1000L))
      .select(col("user_id"),
        timestamp_seconds(unix_timestamp(col("ts"))).as("tss"),
        col("value"))
      .withWatermark("tss", "0 seconds")
      .groupBy(session_window(col("tss"), s"$gapSec seconds"),
        col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
    runToCompletion(agg, OutputMode.Append())
      .filter(col("user_id") >= 0)
      .select(col("user_id"),
        unix_timestamp(col("session_window.start")).as("session_start"),
        (unix_timestamp(col("session_window.end")) - gapSec).as("session_end"),
        col("n_events"), col("sum_value"))
      .orderBy("user_id", "session_start")
  }

  /** [[sessionizeNative]] over the OUT-OF-ORDER replay
    * ([[readEventStreamOutOfOrder]]): the declarative session_window
    * aggregation absorbs bounded lateness NATIVELY once the watermark
    * delay covers it — windows stay open (state) until the watermark
    * passes their end, so late slices merge into the right sessions with
    * no custom buffering (contrast [[streamingPitFeaturesBuffered]],
    * which must buffer by hand because flatMapGroupsWithState folds
    * immediately). Same answer, same oracle as the in-order twins; the
    * composition argument for preferring built-in stateful operators
    * when they express the semantics.
    *
    * Watermark delay = 2.5 slice spans (the replay's lateness bound);
    * the sentinel gap exceeds delay + 2x session gap so the final
    * watermark strictly clears every real window end. Nothing emits
    * until the sentinels arrive (the watermark lags max ts by the
    * delay) — fine for a finite replay; state is bounded by the open
    * session count. */
  /** OOO replay lateness bounds, shared by every out-of-order consumer
    * AND kept in lockstep with stagedOutOfOrderDir's slice-span formula
    * ((max - min) / slices + 1): a swapped slice arrives <= 2 slice-spans
    * after a later-timestamped event, so delay = 2.5 spans + margin
    * covers it. Memoized per (events file, mtime, slices) — the min/max
    * probe is one scan the three former copies each paid separately. */
  private val oooBoundsCache =
    scala.collection.concurrent.TrieMap.empty[String, (Long, Long)]
  private[streaming] def oooLatenessBounds(spark: SparkSession,
      sfDir: String, slices: Int): (Long, Long) = {
    val target = java.nio.file.Paths.get(sfDir, "events.parquet")
      .toAbsolutePath.normalize
    val mtime = java.nio.file.Files.getLastModifiedTime(target).toMillis
    oooBoundsCache.getOrElseUpdate(s"$target:$mtime:$slices", {
      val mm = graft.Tables.events(spark, sfDir)
        .agg(min(unix_micros(col("ts"))).as("a"),
          max(unix_micros(col("ts"))).as("b")).head()
      val sliceSpanMicros = (mm.getLong(1) - mm.getLong(0)) / slices + 1
      val delayMs = (sliceSpanMicros * 5 / 2) / 1000L + 1000L
      (sliceSpanMicros, delayMs)
    })
  }

  def sessionizeNativeOoo(spark: SparkSession, sfDir: String,
      gapMinutes: Int = 30, slices: Int = 6): DataFrame = {
    val gapSec = gapMinutes * 60L
    val (_, delayMs) = oooLatenessBounds(spark, sfDir, slices)
    val sentinelGapMs = delayMs + 2L * gapMinutes * 60L * 1000L + 3600000L
    val agg = readEventStreamOutOfOrder(spark, sfDir, slices, sentinelGapMs)
      .select(col("user_id"),
        timestamp_seconds(unix_timestamp(col("ts"))).as("tss"),
        col("value"))
      .withWatermark("tss", s"$delayMs milliseconds")
      .groupBy(session_window(col("tss"), s"$gapSec seconds"),
        col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
    runToCompletion(agg, OutputMode.Append())
      .filter(col("user_id") >= 0)
      .select(col("user_id"),
        unix_timestamp(col("session_window.start")).as("session_start"),
        (unix_timestamp(col("session_window.end")) - gapSec).as("session_end"),
        col("n_events"), col("sum_value"))
      .orderBy("user_id", "session_start")
  }

  // ------------------------------------------------------ streaming as-of
  final case class TypedEvent(event_id: Long, user_id: Long,
      ts: java.sql.Timestamp, event_type: String)
  final case class ClickState(clickId: Long, clickSec: Long)
  final case class AsOfMatch(event_id: Long, matched_click: Option[Long],
      gap_sec: Option[Long])

  /** Streaming as-of join: each 'error' event matched to the same user's
    * most recent prior-or-simultaneous 'click', kept as keyed streaming
    * state (ONE tiny ClickState per user — the classic enrichment-state
    * shape). This is the stream spelling of `operators/AsOfJoin`
    * (q12_asof_join) and shares its DuckDB ASOF LEFT JOIN oracle: matches
    * emit inline, so no timeout flush and no watermark sentinel are
    * needed. Event comparison uses MICROsecond precision like the batch
    * sort — `Timestamp.getTime` alone truncates to milliseconds and could
    * order a microseconds-later click before an error. (Ties among
    * multiple clicks at the SAME microsecond are broken by event_id here;
    * the batch window leaves that tie partition-order-dependent — both
    * paths agree whenever per-user timestamps are unique, which the
    * testdata satisfies.) */
  def streamingAsOf(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    def micros(t: java.sql.Timestamp): Long =
      math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L

    def update(userId: Long, events: Iterator[TypedEvent],
        state: GroupState[ClickState]): Iterator[AsOfMatch] = {
      // clicks sort BEFORE errors at equal timestamps: the batch as-of
      // matches a simultaneous click (right-before-left tie order)
      val sorted = events.toArray.sortBy(e =>
        (micros(e.ts), if (e.event_type == "click") 0 else 1, e.event_id))
      val out = scala.collection.mutable.ArrayBuffer.empty[AsOfMatch]
      var cur = state.getOption.orNull
      sorted.foreach { e =>
        if (e.event_type == "click") {
          cur = ClickState(e.event_id, math.floorDiv(micros(e.ts), 1000000L))
        } else if (e.event_type == "error") {
          out += (if (cur == null) AsOfMatch(e.event_id, None, None)
          else AsOfMatch(e.event_id, Some(cur.clickId),
            Some(math.floorDiv(micros(e.ts), 1000000L) - cur.clickSec)))
        }
      }
      if (cur != null) state.update(cur)
      out.iterator
    }

    // pre-filter IS safe here (unlike sessionize): this stream stages no
    // sentinel files and sets no watermark, so predicate pushdown can
    // only prune rows the state function ignores anyway — and it keeps
    // view/purchase events out of the groupByKey shuffle entirely
    val matches = readEventStream(spark, sfDir)
      .filter(col("event_type").isin("click", "error"))
      .select(col("event_id"), col("user_id"), col("ts"), col("event_type"))
      .as[TypedEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(update)
    runToCompletion(matches.toDF(), OutputMode.Append())
      .orderBy("event_id")
  }

  // -------------------------------------- streaming point-in-time features
  final case class PitInput(event_id: Long, user_id: Long,
      ts: java.sql.Timestamp, event_type: String, cents: Long)
  final case class PitState(n: Long, nViews: Long, sumCents: Long, lastTsm: Long)
  final case class PitFeat(event_id: Long, user_id: Long, tsm: Long,
      n_prior: Long, n_prior_views: Long, sum_prior_cents: Long,
      sec_since_prev: Long)

  /** ONLINE point-in-time features — the serving-side twin of
    * `EventAnalytics.pointInTimeFeatures`, sharing its oracle: per-user
    * running aggregates live in keyed state; each label (purchase) event
    * emits its feature row from the state AS OF just before itself, then
    * every event (any type) folds into the state. Because the fold order
    * is the batch spelling's total (ts_micros, event_id) order — sorted
    * within the micro-batch, carried across batches by the state — the
    * online features EQUAL the offline training features exactly: the
    * training-serving-skew elimination a feature store exists for,
    * checked here by oracle equality rather than promised.
    *
    * State is four longs per user, bounded by |users|; matches emit
    * inline (no watermark, no sentinel, the [[streamingAsOf]] shape).
    *
    * Ordering contract: events are sorted (ts, event_id) WITHIN each
    * micro-batch, and batch-to-batch order is the source's arrival
    * order. Exact offline equality therefore requires the source to
    * deliver batches in non-decreasing per-user event time — true for
    * the single-file replay harness and for any time-ordered staged
    * replay; a source that interleaves late batches would need
    * watermark-buffered reordering instead. The fold GUARDS this
    * loudly: a cross-batch time regression throws rather than
    * silently skewing features (`sec_since_prev` going negative is a
    * training-serving-skew bug, not a tolerable reorder). */
  def streamingPitFeatures(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    def micros(t: java.sql.Timestamp): Long =
      math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L

    def update(userId: Long, events: Iterator[PitInput],
        state: GroupState[PitState]): Iterator[PitFeat] = {
      val sorted = events.toArray.sortBy(e => (micros(e.ts), e.event_id))
      val out = scala.collection.mutable.ArrayBuffer.empty[PitFeat]
      var cur = state.getOption.getOrElse(PitState(0L, 0L, 0L, Long.MinValue))
      sorted.foreach { e =>
        val tsm = micros(e.ts)
        if (cur.lastTsm != Long.MinValue && tsm < cur.lastTsm)
          throw new IllegalStateException(
            s"streamingPitFeatures: cross-batch out-of-order arrival for " +
              s"user $userId (event ${e.event_id} at $tsm < state ${cur.lastTsm}); " +
              "this source violates the time-ordered replay contract " +
              "(see scaladoc) — features would silently skew vs offline")
        if (e.event_type == "purchase")
          out += PitFeat(e.event_id, userId, tsm, cur.n, cur.nViews, cur.sumCents,
            if (cur.lastTsm == Long.MinValue) -1L else (tsm - cur.lastTsm) / 1000000L)
        cur = PitState(cur.n + 1L,
          cur.nViews + (if (e.event_type == "view") 1L else 0L),
          cur.sumCents + e.cents, tsm)
      }
      state.update(cur)
      out.iterator
    }

    val feats = readEventStream(spark, sfDir)
      .select(col("event_id"), col("user_id"), col("ts"), col("event_type"),
        // value is nullable DOUBLE; coalesce BEFORE the cast — PitInput's
        // primitive `cents: Long` would throw a non-nullable-field encoder
        // error on a null, while the batch twin tolerates nulls via SUM
        // (sum-skips-null == sum-of-zero, so the oracle stays exact)
        (coalesce(col("value"), lit(0.0)).cast("decimal(18,2)") * 100)
          .cast("long").as("cents"))
      .as[PitInput]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(update)
    runToCompletion(feats.toDF(), OutputMode.Append())
      .orderBy("event_id")
  }

  // ------------------------- out-of-order replay + buffered PIT features
  /** Stage the events table as `slices` time-sliced parquet files
    * DELIVERED OUT OF ORDER — adjacent slices swapped (2,1,4,3,...) —
    * plus the two far-future sentinel files, with strictly increasing
    * modification times so the file source (mtime order,
    * maxFilesPerTrigger=1) replays exactly that sequence one micro-batch
    * each. This is the bounded-lateness bus simulator for
    * [[streamingPitFeaturesBuffered]]: when slice k+1 arrives before
    * slice k, slice k's events are up to TWO slice-spans later than the
    * max event time already seen — a Kafka-shaped delivery pattern the
    * strict-order replay contract of [[streamingPitFeatures]] forbids.
    * Staged files carry the data file's exact RAW schema (nanos-long or
    * timestamp), like the sentinel writer; cached per (target mtime,
    * ts type, slices, gap) and rebuilt when stale. */
  private def stagedOutOfOrderDir(spark: SparkSession, sfDir: String,
      slices: Int, sentinelGapMs: Long, rawSchema: StructType): String = {
    import java.nio.file.{Files, Paths}
    import spark.implicits._
    val target = Paths.get(sfDir, "events.parquet").toAbsolutePath.normalize
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val rawTsType = rawSchema("ts").dataType
    // the PARAMETERS are part of the directory key (not just the stamp):
    // two consumers with different (slices, gap) — the buffered PIT fold
    // vs the OOO sessionizer — must not evict each other's staging on
    // every alternation (each restage is a full events rewrite)
    val key = java.security.MessageDigest.getInstance("SHA-256")
      .digest(s"$target:$slices:$sentinelGapMs".getBytes("UTF-8"))
      .take(8).map("%02x".format(_)).mkString
    val dir = Paths.get(sys.props("java.io.tmpdir"), s"graft_events_ooo_$key")
    Files.createDirectories(dir)
    val targetMtime = Files.getLastModifiedTime(target).toMillis
    val stamp = s"$targetMtime:${rawTsType.simpleString}:$slices:$sentinelGapMs"
    val marker = dir.resolve("_graft_ooo_stamp")
    if (Files.exists(marker) && Files.readString(marker).trim == stamp)
      return dir.toString
    val old = Files.list(dir)
    try old.forEach(p => Files.deleteIfExists(p)) finally old.close()

    def writeOne(df: DataFrame, name: String, mtimeMs: Long): Unit = {
      val tmp = Files.createTempDirectory("graft_ooo")
      df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val listing = Files.list(tmp)
      val part = try listing.filter(_.toString.endsWith(".parquet"))
        .findFirst().get()
      finally listing.close()
      Files.move(part, dir.resolve(name),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      val rest = Files.list(tmp)
      try rest.forEach(p => Files.deleteIfExists(p)) finally rest.close()
      Files.deleteIfExists(tmp)
      Files.setLastModifiedTime(dir.resolve(name),
        java.nio.file.attribute.FileTime.fromMillis(mtimeMs))
    }

    val raw = spark.read.schema(rawSchema).parquet(target.toString)
    val tsm = rawTsType match {
      case LongType => expr("ts div 1000")
      case TimestampNTZType => unix_micros(col("ts").cast(TimestampType))
      case _ => unix_micros(col("ts"))
    }
    val withTsm = raw.withColumn("__tsm", tsm).persist()
    val mm = withTsm.agg(min(col("__tsm")), max(col("__tsm"))).head()
    val (minM, maxM) = (mm.getLong(0), mm.getLong(1))
    val sliceSpan = (maxM - minM) / slices + 1
    // delivery order: adjacent slices swapped (a lone trailing slice
    // stays in place when `slices` is odd)
    val order = (0 until slices).map(i =>
      if (i % 2 == 0) math.min(i + 1, slices - 1) else i - 1)
    val base = System.currentTimeMillis()
    order.zipWithIndex.foreach { case (sliceIdx, pos) =>
      // `div` (integer division), not `/` (double): a double quotient at
      // an exact slice boundary could truncate into the wrong slice
      val df = withTsm
        .filter(expr(s"(__tsm - ${minM}L) div ${sliceSpan}L") === sliceIdx)
        .drop("__tsm")
      writeOne(df, f"slice_$pos%02d.parquet", base + pos * 2000L)
    }
    (1 to 2).foreach { k =>
      val sentinelMicros = maxM + k * (sentinelGapMs + 1000L) * 1000L
      val tsColS = rawTsType match {
        case LongType => col("us") * 1000L
        case TimestampNTZType =>
          timestamp_micros(col("us")).cast(TimestampNTZType)
        case _ => timestamp_micros(col("us"))
      }
      val sdf = Seq((-k.toLong, sentinelMicros, -1L, "__sentinel__", 0.0, ""))
        .toDF("event_id", "us", "user_id", "event_type", "value", "props")
        .withColumn("ts", tsColS)
        .select("event_id", "ts", "user_id", "event_type", "value", "props")
      writeOne(sdf, s"zz_sentinel$k.parquet", base + (slices + k) * 2000L)
    }
    withTsm.unpersist()
    Files.writeString(marker, stamp)
    dir.toString
  }

  /** File replay of the events table with bounded out-of-order delivery
    * (see [[stagedOutOfOrderDir]]); schema probed and `ts` normalized
    * exactly like [[readEventStream]]. */
  def readEventStreamOutOfOrder(spark: SparkSession, sfDir: String,
      slices: Int, sentinelGapMs: Long): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val rawSchema = graft.Tables.eventsRawSchema(spark, sfDir)
    val dir = stagedOutOfOrderDir(spark, sfDir, slices, sentinelGapMs, rawSchema)
    graft.Tables.normalizeEventTs(spark.readStream
      .schema(rawSchema)
      .option("maxFilesPerTrigger", "1")
      .parquet(dir))
  }

  final case class PitBufEvent(event_id: Long, tsm: Long,
      event_type: String, cents: Long)
  final case class PitBufState(agg: PitState, buf: List[PitBufEvent])

  /** [[streamingPitFeatures]] for a source that delivers LATE BATCHES
    * (VERDICT r7 #1) — the capability the strict-order twin's loud guard
    * points at: per-user events are BUFFERED in keyed state and folded
    * only once the event-time watermark passes them, so no later batch
    * can deliver an earlier event (that is the watermark's contract).
    * Fold order and feature math are identical to the strict twin, so on
    * ANY source whose lateness the watermark delay covers the output
    * EQUALS the offline training features — the staged out-of-order
    * replay (adjacent time slices swapped) passes the SAME
    * events_features_pit oracle.
    *
    * Mechanics per micro-batch and user: append arrivals to the buffer;
    * finalize buffered events with tsm < watermark in (tsm, event_id)
    * order through the running-aggregate fold (purchases emit their
    * feature row); hold the rest; arm an event-time timeout just past
    * the current watermark so buffered events flush as the watermark
    * advances even when the user has no further arrivals. The far-future
    * sentinels (dropped here in the typed function — a relational filter
    * would file-prune them before the watermark saw their event times)
    * push the final watermark past every real event, draining all
    * buffers.
    *
    * State per user = four running longs + the events inside the
    * lateness window (watermark delay) — the honest production bound for
    * out-of-order absorption.
    *
    * Beyond-delay lateness contract (the honest one): an event LATER
    * than the watermark delay never reaches this fold — Spark's
    * flatMapGroupsWithState filters rows older than the watermark before
    * the user function under EventTimeTimeout — so it is DROPPED by the
    * engine, the standard watermark data-loss semantics every
    * watermarked pipeline accepts. The regression throw inside the fold
    * is therefore a defense-in-depth invariant (it would fire only if
    * the engine's late-row filter ever stopped holding), NOT a
    * reachable lateness alarm; a deployment that must DETECT beyond-
    * delay drops compares the streaming row census against the batch
    * count (the stream_ts_canary pattern), it does not get a throw. */
  def streamingPitFeaturesBuffered(spark: SparkSession, sfDir: String,
      slices: Int = 6): DataFrame = {
    // replay lateness bound: a swapped slice arrives <= 2 slice-spans
    // after a later-timestamped event; delay = 2.5 spans covers it with
    // margin (the sentinel gap must then exceed the delay so the final
    // watermark clears every real event)
    val (_, delayMs) = oooLatenessBounds(spark, sfDir, slices)
    val gapMs = delayMs + 3600000L
    runToCompletion(
      pitFeaturesBufferedTransform(
        readEventStreamOutOfOrder(spark, sfDir, slices, gapMs), delayMs),
      OutputMode.Append())
      .orderBy("event_id")
  }

  /** [[streamingPitFeaturesBuffered]] fed by the OFFSET-TRACKED bus
    * connector ([[graft.sources.BusSource]]) — the two round-8
    * capabilities composed: a real unbounded-shaped source delivering
    * block-permuted out-of-order events, absorbed by the watermark-
    * buffered fold into features that equal the offline spelling
    * EXACTLY. The bus payload is integer arithmetic, so the whole
    * composition carries a full DuckDB hash oracle
    * ([[busPitFeaturesSql]]) — the training-serving-skew guarantee
    * demonstrated against the source class a production feature store
    * actually consumes. Lateness bound = one permutation block span. */
  def busPitFeatures(spark: SparkSession, rows: Long = 100000L,
      nUsers: Int = 64): DataFrame = {
    val delayMs = graft.sources.BusSource.Block.toLong *
      graft.sources.BusSource.StepMicros / 1000L + 1000L
    runToCompletion(
      pitFeaturesBufferedTransform(
        BusEventSource(rows, nUsers).load(spark), delayMs),
      OutputMode.Append())
      .orderBy("event_id")
  }

  def busPitFeaturesSql(rows: Long = 100000L, nUsers: Int = 64): String =
    s"""WITH ${graft.sources.BusSource.oracleCte(rows, nUsers)},
       |ev AS (
       |  SELECT event_id, user_id, event_type, ts_micros AS tsm,
       |    (event_id * 37) % 10000 AS cents
       |  FROM bus
       |), feat AS (
       |  SELECT event_id, user_id, event_type, tsm,
       |    COUNT(*) OVER prior AS n_prior,
       |    CAST(COALESCE(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
       |      OVER prior, 0) AS BIGINT) AS n_prior_views,
       |    CAST(COALESCE(SUM(cents) OVER prior, 0) AS BIGINT) AS sum_prior_cents,
       |    COALESCE((tsm - LAG(tsm) OVER w) // 1000000, -1) AS sec_since_prev
       |  FROM ev
       |  WINDOW w AS (PARTITION BY user_id ORDER BY tsm, event_id),
       |    prior AS (PARTITION BY user_id ORDER BY tsm, event_id
       |              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
       |)
       |SELECT event_id, user_id, tsm, n_prior, n_prior_views,
       |  sum_prior_cents, sec_since_prev
       |FROM feat WHERE event_type = 'purchase'
       |ORDER BY event_id""".stripMargin

  /** The watermark-buffered PIT fold over ANY events-schema stream (the
    * source seam applied to the round's reordering capability). */
  private[graft] def pitFeaturesBufferedTransform(events: DataFrame,
      delayMs: Long): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    def micros(t: java.sql.Timestamp): Long =
      math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L

    def update(userId: Long, events: Iterator[PitInput],
        state: GroupState[PitBufState]): Iterator[PitFeat] = {
      if (userId < 0) return Iterator.empty // sentinel: watermark only
      val wmMicros = state.getCurrentWatermarkMs() * 1000L
      val prior = state.getOption.getOrElse(
        PitBufState(PitState(0L, 0L, 0L, Long.MinValue), Nil))
      val incoming = events.map(e =>
        PitBufEvent(e.event_id, micros(e.ts), e.event_type, e.cents)).toList
      val (ready, hold) = (prior.buf ++ incoming).partition(_.tsm < wmMicros)
      val out = scala.collection.mutable.ArrayBuffer.empty[PitFeat]
      var cur = prior.agg
      ready.sortBy(e => (e.tsm, e.event_id)).foreach { e =>
        // defense-in-depth invariant, not a lateness alarm: the engine's
        // late-row filter (EventTimeTimeout) drops beyond-delay events
        // BEFORE this fold, so every delivered tsm >= the watermark that
        // finalized cur.lastTsm — see the scaladoc's lateness contract
        if (cur.lastTsm != Long.MinValue && e.tsm < cur.lastTsm)
          throw new IllegalStateException(
            s"streamingPitFeaturesBuffered: finalized-order invariant " +
              s"broken for user $userId (event ${e.event_id} at ${e.tsm} " +
              s"< finalized ${cur.lastTsm}) — the engine's late-row " +
              "filter should have made this unreachable")
        if (e.event_type == "purchase")
          out += PitFeat(e.event_id, userId, e.tsm, cur.n, cur.nViews,
            cur.sumCents,
            if (cur.lastTsm == Long.MinValue) -1L
            else (e.tsm - cur.lastTsm) / 1000000L)
        cur = PitState(cur.n + 1L,
          cur.nViews + (if (e.event_type == "view") 1L else 0L),
          cur.sumCents + e.cents, e.tsm)
      }
      state.update(PitBufState(cur, hold))
      if (hold.nonEmpty)
        state.setTimeoutTimestamp(state.getCurrentWatermarkMs() + 1L)
      out.iterator
    }

    events
      .select(col("event_id"), col("user_id"), col("ts"), col("event_type"),
        // same null-tolerant cents spelling as the strict twin
        (coalesce(col("value"), lit(0.0)).cast("decimal(18,2)") * 100)
          .cast("long").as("cents"))
      .withWatermark("ts", s"$delayMs milliseconds")
      .as[PitInput]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout())(update)
      .toDF()
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

  // ------------------------------------- streaming count-min sketch
  /** Streaming count-min maintenance: the stream keeps ONLY the d x w
    * counter grid (4 x 1024 rows of Complete-mode keyed state — fixed
    * size, independent of user cardinality and stream length, like the
    * HLL registers above); heavy-hitter estimation then joins batch-side
    * candidates against the completed grid. Counting aggregation is
    * order-insensitive, so the streamed grid equals the batch grid
    * exactly and the pipeline shares [[graft.operators.Sketches
    * .cmsHeavyUsersSql]] as a full value oracle. */
  def streamingCmsHeavyUsers(spark: SparkSession, sfDir: String,
      k: Int = 20): DataFrame = {
    import graft.operators.Sketches
    val salts = explode(array((0 until Sketches.CmsDepth).map(lit): _*)).as("s")
    val counters = readEventStream(spark, sfDir)
      .select(col("user_id").cast("string").as("tok"))
      .select(col("tok"), salts)
      .select(col("s"), Sketches.cmsBucket(col("tok"), col("s")).as("b"))
      .groupBy("s", "b").agg(count(lit(1)).as("c"))
    val grid = runToCompletion(counters, OutputMode.Complete())
    val candidates = graft.Tables.events(spark, sfDir)
      .select(col("user_id").cast("string").as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("exact_count"))
    Sketches.cmsTopKFromGrid(candidates, grid, k)
  }

  // ------------------------------------- streaming HDR quantile buckets
  /** Streaming HDR-quantile sketch of event values per event_type: the
    * stream maintains the BUCKET-COUNT table (one stateful counting
    * aggregation whose state is bounded by groups x <=960 HDR buckets —
    * like the HLL registers, no watermark needed, state never grows with
    * value cardinality or event volume); quantile extraction is a cheap
    * batch read over the completed buckets
    * ([[graft.operators.Sketches.quantilesFromBuckets]]). Bucket counting
    * is ORDER-INSENSITIVE, so on a finite replay the bucket table — and
    * therefore every reported quantile — equals the batch `hdr_quantile`
    * aggregate's exactly, and the shared DuckDB oracle replays both.
    * Values map to non-negative integer cents (floor(value*100), clamped
    * at 0): floor and x100 are correctly-rounded IEEE double ops, so the
    * oracle's bucket assignment is bit-identical. */
  def streamingQuantileHist(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.operators.Sketches
    val vals = readEventStream(spark, sfDir)
      .select(col("event_type").as("grp"),
        greatest(floor(col("value") * 100).cast("long"), lit(0L)).as("x"))
    val counts = Sketches.withHdrBucket(vals)
      .groupBy("grp", "b").agg(count(lit(1)).as("c"))
    val done = runToCompletion(counts, OutputMode.Complete())
    Sketches.quantilesFromBuckets(done, "event_type", "n_events")
      .orderBy("event_type")
  }

  def streamingQuantileHistSql: String =
    graft.operators.Sketches.hdrQuantileSqlOver(
      "SELECT event_type AS grp, " +
        "GREATEST(CAST(floor(value * 100) AS BIGINT), 0) AS x FROM events",
      grpOut = "event_type", nOut = "n_events")

  // --------------------------------------------- streaming KMV sketch
  /** Streaming KMV theta sketch of active user-days per event_type: the
    * CUSTOM `kmv_sketch` TypedImperativeAggregate runs INSIDE the
    * streaming aggregation — keyed state is the <=2 KB bottom-k buffer
    * itself (serialized to the state store per micro-batch), the
    * strongest possible statement that the native aggregate is
    * production-shaped: no watermark, state bounded by groups x 2 KB
    * regardless of volume or cardinality. Bottom-k retention is
    * ORDER-INSENSITIVE (a set union clipped to k), so the finite replay
    * lands on the batch sketch exactly and the estimator read
    * ([[graft.operators.Sketches.kmvEstimateCols]]) shares
    * sketch_kmv_distinct's DuckDB oracle. */
  def streamingKmvDistinct(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.operators.Sketches
    graft.functions.VectorFunctions.ensureRegistered(spark)
    val ev = Sketches.withUserDay(readEventStream(spark, sfDir))
    val sk = ev.groupBy(col("event_type").as("grp"))
      .agg(call_function("kmv_sketch", col("user_day"),
        lit(Sketches.KmvK)).as("arr"))
    val done = runToCompletion(sk, OutputMode.Complete())
    val exact = Sketches.withUserDay(graft.Tables.events(spark, sfDir))
      .groupBy(col("event_type").as("grp"))
      .agg(countDistinct(col("user_day")).as("n_exact"))
    Sketches.kmvEstimateCols(done.join(exact, "grp"), "event_type")
      .orderBy("event_type")
  }

  def streamingKmvDistinctSql: String =
    graft.operators.Sketches.kmvDistinctSql()

  // ------------------------------------------ streaming CDC apply (merge)
  /** Change-data-capture apply via `foreachBatch` — the remaining
    * Structured Streaming sink API next to the memory/file sinks: a
    * stream of keyed change batches (insert/update/delete ops) is MERGED
    * into a maintained snapshot table per micro-batch, using the batch
    * [[graft.operators.Upsert]] operator inside the stream. This is the
    * production periodic-merge pattern (CDC feed -> maintained table)
    * that row-level table formats optimize the write side of; here the
    * table is parquet rewritten per batch with an atomic directory swap.
    *
    * Batches are staged key-DISJOINT (op derived from the key's residue
    * class), so the final table equals the ONE-SHOT batch merge and
    * shares a full DuckDB oracle; ORDER-dependent semantics
    * (last-batch-wins on overlapping keys) are asserted separately in
    * StreamingSpec with a hand-staged overlapping feed.
    *
    * Scale: each micro-batch does one key shuffle (the Upsert shape);
    * snapshot bucketed by the merge key makes it zero-exchange on the
    * snapshot side. State is the TABLE, not stream state — nothing
    * unbounded in the query itself. */
  def streamingUpsert(spark: SparkSession, sfDir: String): DataFrame = {
    import java.nio.file.{Files, Paths}
    val target = Paths.get(sfDir, "orders.parquet").toAbsolutePath.normalize
    val mtime = Files.getLastModifiedTime(target).toMillis
    // "v2" = change-batch construction version (insert offset 1e12): a
    // semantic change to the staged feed MUST bust the stage or a reused
    // table silently diverges from the recompiled oracle (seen live in r6
    // when the ADVICE r5 #4 offset fix landed mid-verify)
    val key = java.security.MessageDigest.getInstance("SHA-256")
      .digest(s"$target:$mtime:cdc:v2".getBytes("UTF-8"))
      .take(8).map("%02x".format(_)).mkString
    val base = Paths.get(sys.props("java.io.tmpdir"), s"graft_cdc_$key")
    val (src, table, chk) =
      (base.resolve("src"), base.resolve("table"), base.resolve("chk"))
    val done = base.resolve("_DONE")

    if (!Files.exists(done)) {
      // a crash-interrupted previous attempt left a poisoned half-state:
      // wipe and rebuild (StagedRuns scaladoc — _DONE is the commit point)
      StagedRuns.freshBase(base, done)
      Files.createDirectories(src)
      val snap = graft.Tables.orders(spark, sfDir)
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority")
      snap.write.mode("overwrite").parquet(table.toString)
      // three key-disjoint change files: updates (%13==0), deletes
      // (%17==3 minus updates), inserts (fresh keys for %19==1) — one
      // micro-batch each under maxFilesPerTrigger=1
      val updates = snap.filter(col("o_orderkey") % 13 === 0)
        .withColumn("o_orderpriority", lit("MERGED"))
        .withColumn("op", lit("update"))
      val deletes = snap
        .filter(col("o_orderkey") % 17 === 3 && col("o_orderkey") % 13 =!= 0)
        .withColumn("op", lit("delete"))
      val inserts = snap.filter(col("o_orderkey") % 19 === 1)
        .withColumn("o_orderkey", col("o_orderkey") + lit(1000000000000L))
        .withColumn("o_orderstatus", lit("N"))
        .withColumn("o_orderpriority", lit("5-LOW"))
        .withColumn("op", lit("insert"))
      Seq(updates, deletes, inserts).zipWithIndex.foreach { case (df, i) =>
        df.coalesce(1).write.mode("overwrite")
          .parquet(src.resolve(s"batch$i.tmp").toString)
        val part = { val l = Files.list(src.resolve(s"batch$i.tmp"))
          try l.filter(_.toString.endsWith(".parquet")).findFirst().get()
          finally l.close() }
        Files.move(part, src.resolve(s"batch$i.parquet"))
        val rest = Files.list(src.resolve(s"batch$i.tmp"))
        try rest.forEach(p => Files.deleteIfExists(p)) finally rest.close()
        Files.deleteIfExists(src.resolve(s"batch$i.tmp"))
      }
      applyCdc(spark, src, table, chk)
      Files.writeString(done, "ok")
    }
    spark.read.parquet(table.toString).orderBy("o_orderkey")
  }

  /** Run the CDC stream over `src`, merging each micro-batch into the
    * parquet table at `tablePath` with an atomic directory swap. */
  private[graft] def applyCdc(spark: SparkSession, src: java.nio.file.Path,
      tablePath: java.nio.file.Path, chk: java.nio.file.Path): Unit = {
    import java.nio.file.Files
    recoverTable(tablePath)
    val changeSchema = spark.read.parquet(
      { val l = Files.list(src)
        try l.filter(_.toString.endsWith(".parquet")).findFirst().get().toString
        finally l.close() }).schema
    val q = spark.readStream
      .schema(changeSchema)
      .option("maxFilesPerTrigger", "1")
      .parquet(src.toString)
      .writeStream
      .option("checkpointLocation", chk.toString)
      .foreachBatch { (changes: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        if (!changes.isEmpty) {
          val snapshot = changes.sparkSession.read.parquet(tablePath.toString)
          val merged = graft.operators.Upsert
            .applyChanges(snapshot, changes, "o_orderkey")
          swapInto(tablePath, batchId)(next =>
            merged.write.mode("overwrite").parquet(next.toString))
        }
        ()
      }
      .start()
    try q.processAllAvailable() finally q.stop()
  }

  /** Crash half of the atomic-swap discipline: a crash between the two
    * renames leaves the table only under <table>_old — restore it before
    * reading, or every retry of a staged run fails on a missing table
    * (ADVICE r5 #3). */
  private def recoverTable(tablePath: java.nio.file.Path): Unit = {
    import java.nio.file.Files
    val oldPath = tablePath.resolveSibling(tablePath.getFileName.toString + "_old")
    if (!Files.exists(tablePath) && Files.exists(oldPath))
      Files.move(oldPath, tablePath)
  }

  /** Atomic replace of the parquet table at `tablePath` with whatever
    * `write` produces: the table dir is only ever a COMPLETE merge
    * result. A stale _old (crash after the second rename, before
    * cleanup) is cleared first or the first rename throws forever. */
  private def swapInto(tablePath: java.nio.file.Path, batchId: Long)(
      write: java.nio.file.Path => Unit): Unit = {
    import java.nio.file.Files
    def deleteTree(p: java.nio.file.Path): Unit = if (Files.exists(p)) {
      val walk = Files.walk(p)
      try walk.sorted(java.util.Comparator.reverseOrder())
        .forEach(q => Files.deleteIfExists(q))
      finally walk.close()
    }
    val oldPath = tablePath.resolveSibling(tablePath.getFileName.toString + "_old")
    val next = tablePath.resolveSibling(tablePath.getFileName.toString + s"_b$batchId")
    write(next)
    deleteTree(oldPath)
    Files.move(tablePath, oldPath)
    Files.move(next, tablePath)
    deleteTree(oldPath)
  }

  // --------------------------------- incremental rollup maintenance (MV)
  /** The MAINTENANCE half of the materialized-view story
    * (`plans/SummaryRewrite` is the query half): the (event_type, day)
    * count rollup kept fresh INCREMENTALLY by a foreachBatch stream —
    * each micro-batch aggregates its own rows (delta cardinality:
    * types x days touched) and merges into the rollup by keyed count
    * ADDITION, with the same atomic-swap crash discipline as the CDC
    * apply. Count addition is associative and batch-partitioning-
    * insensitive, so the maintained table equals the one-shot batch
    * rollup EXACTLY — which is what lets a SummaryRewrite registration
    * stay truthful between full rebuilds. At 100 TB the per-batch cost
    * is the batch's own aggregation plus a rollup-sized merge; the event
    * log is never rescanned. Emits the maintained rollup; the oracle is
    * the direct GROUP BY over raw events. */
  def streamingMvMaintenance(spark: SparkSession, sfDir: String): DataFrame = {
    import java.nio.file.{Files, Paths}
    val target = Paths.get(sfDir, "events.parquet").toAbsolutePath.normalize
    val mtime = Files.getLastModifiedTime(target).toMillis
    val key = java.security.MessageDigest.getInstance("SHA-256")
      .digest(s"$target:$mtime:mvmaint".getBytes("UTF-8"))
      .take(8).map("%02x".format(_)).mkString
    val base = Paths.get(sys.props("java.io.tmpdir"), s"graft_mvmaint_$key")
    val (src, table, chk) =
      (base.resolve("src"), base.resolve("rollup"), base.resolve("chk"))
    val done = base.resolve("_DONE")

    if (!Files.exists(done)) {
      // a crash-interrupted previous attempt left a poisoned half-state:
      // wipe and rebuild (StagedRuns scaladoc — _DONE is the commit point)
      StagedRuns.freshBase(base, done)
      Files.createDirectories(src)
      // four event micro-batches (hash split on event_id — any
      // partitioning works: counts are additive)
      val ev = graft.Tables.events(spark, sfDir)
        .select(col("event_type"), to_date(col("ts")).as("day"), col("event_id"))
      (0 until 4).foreach { i =>
        val tmp = src.resolve(s"batch$i.tmp")
        ev.filter(pmod(col("event_id"), lit(4)) === i)
          .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
        val part = { val l = Files.list(tmp)
          try l.filter(_.toString.endsWith(".parquet")).findFirst().get()
          finally l.close() }
        Files.move(part, src.resolve(s"batch$i.parquet"))
        val rest = Files.list(tmp)
        try rest.forEach(p => Files.deleteIfExists(p)) finally rest.close()
        Files.deleteIfExists(tmp)
      }
      recoverTable(table)
      val schema = spark.read.parquet(src.resolve("batch0.parquet").toString).schema
      val q = spark.readStream
        .schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src.toString)
        .writeStream
        .option("checkpointLocation", chk.toString)
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
          if (!batch.isEmpty) {
            val delta = batch.groupBy("event_type", "day")
              .agg(count(lit(1)).as("cnt"))
            val merged =
              if (Files.exists(table)) {
                val cur = batch.sparkSession.read.parquet(table.toString)
                cur.unionByName(delta)
                  .groupBy("event_type", "day")
                  .agg(sum(col("cnt")).cast("long").as("cnt"))
              } else delta
            if (Files.exists(table))
              swapInto(table, batchId)(next =>
                merged.write.mode("overwrite").parquet(next.toString))
            else merged.write.mode("overwrite").parquet(table.toString)
          }
          ()
        }
        .start()
      try q.processAllAvailable() finally q.stop()
      Files.writeString(done, "ok")
    }
    // epoch-day integers cross the engine boundary (the repo's date
    // discipline: pandas reads parquet DATE as object, not datetime)
    spark.read.parquet(table.toString)
      .select(col("event_type"),
        datediff(col("day"), lit("1970-01-01")).cast("long").as("day_epoch"),
        col("cnt"))
      .orderBy("event_type", "day_epoch")
  }

  def streamingMvMaintenanceSql: String =
    """SELECT event_type,
      |  CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS day_epoch,
      |  COUNT(*) AS cnt
      |FROM events GROUP BY 1, 2 ORDER BY event_type, day_epoch""".stripMargin

  // --------------------------------- checkpointed restart / exactly-once
  /** Fault-tolerance surface: a STATEFUL stream (first-seen dedup on
    * (user_id, event_type)) killed mid-input and RESTARTED from its
    * checkpoint, writing a parquet file sink. The events table is staged
    * as four files; the first run processes two and stops; the second run
    * recovers the dedup state + source offsets from the checkpoint and
    * processes the rest. Exactly-once evidence is the OUTPUT ITSELF: keys
    * seen before the kill re-appear after it, so any state loss re-emits
    * them and any offset loss duplicates whole files — either breaks the
    * DISTINCT oracle this query shares with stream_dedup. The file sink's
    * `_spark_metadata` commit log is what de-duplicates output files
    * across restarts (the production exactly-once contract; the memory
    * sink used by the other stream queries cannot survive a restart).
    *
    * Staging is keyed on (path, mtime) and the two-phase run executes
    * once per key (`_DONE` marker); re-invocations read the completed
    * sink — idempotent, like the other staged sinks. */
  def restartRecoveryDedup(spark: SparkSession, sfDir: String): DataFrame = {
    import java.nio.file.{Files, Paths}
    val target = Paths.get(sfDir, "events.parquet").toAbsolutePath.normalize
    val mtime = Files.getLastModifiedTime(target).toMillis
    val key = java.security.MessageDigest.getInstance("SHA-256")
      .digest(s"$target:$mtime".getBytes("UTF-8"))
      .take(8).map("%02x".format(_)).mkString
    val base = Paths.get(sys.props("java.io.tmpdir"), s"graft_restart_$key")
    val (src, out, chk) = (base.resolve("src"), base.resolve("out"), base.resolve("chk"))
    val done = base.resolve("_DONE")

    if (!Files.exists(done)) {
      // a crash-interrupted previous attempt left a poisoned half-state:
      // wipe and rebuild (StagedRuns scaladoc — _DONE is the commit point)
      StagedRuns.freshBase(base, done)
      Files.createDirectories(src)
      val events = graft.Tables.events(spark, sfDir)
        .select(col("user_id"), col("event_type"), col("event_id"))
      def writeSplit(i: Int): Unit =
        events.filter(pmod(col("event_id"), lit(4)) === i)
          .coalesce(1).write.mode("append").parquet(src.toString)
      def runOnce(): Unit = {
        val q = spark.readStream
          .schema(events.schema)
          .option("maxFilesPerTrigger", "1")
          .parquet(src.toString)
          .dropDuplicates("user_id", "event_type")
          .select("user_id", "event_type")
          .writeStream
          .format("parquet")
          .option("path", out.toString)
          .option("checkpointLocation", chk.toString)
          .outputMode(OutputMode.Append())
          .start()
        try q.processAllAvailable() finally q.stop()
      }
      writeSplit(0); writeSplit(1)
      runOnce() // phase 1: two files, then the query is STOPPED
      writeSplit(2); writeSplit(3)
      runOnce() // phase 2: restart from checkpoint, finish the input
      Files.writeString(done, "ok")
    }
    spark.read.parquet(out.toString).orderBy("user_id", "event_type")
  }

  // --------------------------- batchId-transactional foreachBatch sink
  /** Times a foreachBatch SKIPPED a batch because its commit marker
    * already existed — the replay-evidence counter TxnSinkSpec asserts. */
  private[graft] val txnSkips = new java.util.concurrent.atomic.AtomicLong(0)

  /** Exactly-once for NON-idempotent foreachBatch sinks. The file sink
    * gets exactly-once from `_spark_metadata`; CDC merge is key-idempotent
    * by construction; a plain APPEND sink is NEITHER — if the engine
    * replays a batch (crash after the sink write, before the streaming
    * commit is recorded), appended rows duplicate. The production fix is
    * the (batchId, target) transaction log: write to a staging dir, move
    * atomically into place, then mark the batchId committed; a replayed
    * batchId is a no-op. Returns false when skipped. */
  private[graft] def txnAppend(dataDir: java.nio.file.Path, batchId: Long)(
      write: java.nio.file.Path => Unit): Boolean = {
    import java.nio.file.Files
    val marker = dataDir.resolve(s"_committed_$batchId")
    if (Files.exists(marker)) {
      txnSkips.incrementAndGet()
      // persistent replay evidence (TxnSink test reads it across JVMs —
      // the staged run happens once, the assertion must not go vacuous)
      Files.writeString(dataDir.resolve(s"_replayed_$batchId"), "skipped")
      false
    }
    else {
      val staging = dataDir.resolveSibling(
        dataDir.getFileName.toString + s"_staging_$batchId")
      write(staging)
      val slot = dataDir.resolve(s"b$batchId")
      // a crashed PREVIOUS attempt may have moved the slot but died
      // before the marker: the slot content is complete (staging moves
      // are atomic), so adopt it — and discard the retry's staging dir
      // rather than leak it
      if (!Files.exists(slot)) Files.move(staging, slot)
      else if (Files.exists(staging)) {
        val walk = Files.walk(staging)
        try walk.sorted(java.util.Comparator.reverseOrder())
          .forEach(p => Files.deleteIfExists(p))
        finally walk.close()
      }
      Files.writeString(marker, "ok")
      true
    }
  }

  /** Per-bucket event-type counts APPENDED one micro-batch at a time
    * through [[txnAppend]], with an ENGINE-LEVEL REPLAY forced mid-run:
    * after phase 1 the checkpoint's newest commit marker is deleted, so
    * the restarted query re-delivers that batch (same batchId, same rows
    * from the recorded offsets) — the transaction log must swallow it or
    * the append duplicates and the GROUP BY oracle breaks. Buckets are
    * data-derived (event_id % 4 is constant within each staged file), so
    * the final table equals the batch GROUP BY regardless of delivery
    * order or replay count. */
  def streamingTxnAppend(spark: SparkSession, sfDir: String): DataFrame = {
    import java.nio.file.{Files, Paths}
    val target = Paths.get(sfDir, "events.parquet").toAbsolutePath.normalize
    val mtime = Files.getLastModifiedTime(target).toMillis
    val key = java.security.MessageDigest.getInstance("SHA-256")
      .digest(s"$target:$mtime:txn:v1".getBytes("UTF-8"))
      .take(8).map("%02x".format(_)).mkString
    val base = Paths.get(sys.props("java.io.tmpdir"), s"graft_txn_$key")
    val (src, data, chk) =
      (base.resolve("src"), base.resolve("data"), base.resolve("chk"))
    val done = base.resolve("_DONE")

    if (!Files.exists(done)) {
      // a crash-interrupted previous attempt left a poisoned half-state:
      // wipe and rebuild (StagedRuns scaladoc — _DONE is the commit point)
      StagedRuns.freshBase(base, done)
      Files.createDirectories(src)
      Files.createDirectories(data)
      val events = graft.Tables.events(spark, sfDir)
        .select(col("event_id"), col("event_type"))
      def writeSplit(i: Int): Unit =
        events.filter(pmod(col("event_id"), lit(4)) === i)
          .coalesce(1).write.mode("append").parquet(src.toString)
      def runOnce(): Unit = {
        val q = spark.readStream
          .schema(events.schema)
          .option("maxFilesPerTrigger", "1")
          .parquet(src.toString)
          .writeStream
          .option("checkpointLocation", chk.toString)
          .foreachBatch { (batch: DataFrame, batchId: Long) =>
            val counts = batch
              .groupBy(pmod(col("event_id"), lit(4)).as("bucket"), col("event_type"))
              .agg(count(lit(1)).as("n"))
            txnAppend(data, batchId) { staging =>
              counts.write.mode("overwrite").parquet(staging.toString)
            }
            ()
          }
          .start()
        try q.processAllAvailable() finally q.stop()
      }
      writeSplit(0); writeSplit(1)
      runOnce() // phase 1: batches 0 and 1 committed, query stopped
      // forge the replay: drop the newest STREAMING commit (the sink's
      // txn marker for that batch stays) — exactly the crash window
      // between sink write and streaming commit
      val commits = chk.resolve("commits")
      val newest = { val l = Files.list(commits)
        try l.filter(p => !p.getFileName.toString.startsWith("."))
          .max(java.util.Comparator.comparing[java.nio.file.Path, Long](
            p => p.getFileName.toString.toLong, java.lang.Long.compare _))
          .get()
        finally l.close() }
      Files.delete(newest)
      // the local checkpoint FS is checksummed: a stale .N.crc makes the
      // re-commit's rename half-fail and trip the concurrent-writer guard
      Files.deleteIfExists(
        newest.resolveSibling("." + newest.getFileName.toString + ".crc"))
      writeSplit(2); writeSplit(3)
      runOnce() // phase 2: batch 1 REPLAYED (skipped by the txn log), 2-3 fresh
      Files.writeString(done, "ok")
    }
    spark.read
      .parquet({ val l = Files.list(data)
        try l.filter(p => p.getFileName.toString.startsWith("b"))
          .map[String](_.toString).toArray(n => new Array[String](n)).toSeq
        finally l.close() }: _*)
      .orderBy("bucket", "event_type")
  }

  /** Replay-count-invisible by construction: the final table must be the
    * plain batch GROUP BY. */
  def streamingTxnAppendSql: String =
    """SELECT event_id % 4 AS bucket, event_type, COUNT(*) AS n
      |FROM events GROUP BY 1, 2 ORDER BY bucket, event_type""".stripMargin

  // ------------------------------------- stream-static enrichment join
  /** Stream-static broadcast enrichment — the remaining Structured
    * Streaming join class next to keyed-state as-of and the two-sided
    * interval join: each event enriched with its user's market segment
    * from the STATIC customer dimension, then aggregated per segment.
    *
    * Production shape: the static side is planned per micro-batch as an
    * ordinary broadcast hash join — STATELESS (no watermark, no join
    * state; only the downstream aggregate keeps state, bounded by segment
    * cardinality). At 100 TB of stream this is the standard dimension-
    * enrichment pattern: dims broadcast, the stream never shuffles for
    * the join. Inner equi-join row-by-row enrichment is replay-order-
    * insensitive, so the finite replay equals the batch join exactly and
    * shares its DuckDB oracle. */
  def streamingEnrich(spark: SparkSession, sfDir: String): DataFrame = {
    val dim = graft.Tables.customer(spark, sfDir)
      .select(col("c_custkey"), col("c_mktsegment"))
    val agg = readEventStream(spark, sfDir)
      .join(broadcast(dim), col("user_id") === col("c_custkey"))
      .groupBy("c_mktsegment", "event_type")
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
    runToCompletion(agg, OutputMode.Complete())
      .orderBy("c_mktsegment", "event_type")
  }

  val streamingEnrichSql: String =
    """SELECT c_mktsegment, event_type, COUNT(*) AS n_events,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      |FROM events JOIN customer ON user_id = c_custkey
      |GROUP BY 1, 2 ORDER BY c_mktsegment, event_type""".stripMargin

  // -------------------------------------- stream-stream interval join
  /** Watermarked stream-stream inner join — the last Structured Streaming
    * join class (the as-of above is stream-static-shaped keyed state; this
    * is two live streams): purchases attributed to the same user's clicks
    * within the preceding `windowMinutes`.
    *
    * Production shape: BOTH sides carry a watermark and the join condition
    * carries a time range, so each side's buffered state is evicted once
    * the other side's watermark passes the range — bounded state at 100 TB
    * (without the range + watermarks Spark would buffer both streams
    * forever). Inner-join matches emit in the arriving micro-batch, so on
    * a finite replay the result equals the batch self-join exactly and
    * shares its oracle — no sentinel flush needed.
    *
    * Plan: the join keys on user_id, so both streams shuffle-partition by
    * user — state lives with its key, the time predicate filters within
    * the key group. */
  def streamingIntervalJoin(spark: SparkSession, sfDir: String,
      windowMinutes: Int = 120): DataFrame = {
    def side(tpe: String, prefix: String) =
      readEventStream(spark, sfDir)
        .filter(col("event_type") === tpe && col("user_id") >= 0)
        .select(col("user_id").as(s"${prefix}_user"),
          col("event_id").as(s"${prefix}_id"), col("ts").as(s"${prefix}_ts"))
        .withWatermark(s"${prefix}_ts", s"$windowMinutes minutes")

    val joined = side("purchase", "p").join(side("click", "c"),
      col("p_user") === col("c_user") &&
        col("c_ts") <= col("p_ts") &&
        col("c_ts") >= col("p_ts") - expr(s"INTERVAL $windowMinutes MINUTES"))

    runToCompletion(joined, OutputMode.Append())
      .select(col("p_id").as("purchase_id"), col("c_id").as("click_id"),
        (unix_timestamp(col("p_ts")) - unix_timestamp(col("c_ts"))).as("gap_sec"))
      .orderBy("purchase_id", "click_id")
  }

  /** LEFT OUTER stream-stream interval join — the production attribution
    * shape the inner join cannot express: EVERY purchase emits, matched
    * to preceding clicks or alone. Unmatched rows cannot emit on arrival
    * (a matching click may still come); they emit when the click-side
    * WATERMARK passes the purchase's range — state eviction IS the
    * null-emission trigger, which is why outer stream joins hard-require
    * both watermarks and a range. On a finite replay the last purchases'
    * ranges would never be passed, so the far-future sentinel files push
    * the watermark past everything (the sessionize flush pattern, here
    * applied to a JOIN). Sentinels must survive the event-type filter to
    * reach the watermark operator — the `user_id < 0` escape keeps them
    * flowing (a plain type filter would be pushed into the parquet scan
    * and row-group-prune the sentinel files) — and sentinel output rows
    * are dropped batch-side AFTER completion. Unmatched columns surface
    * as -1 with a `matched` flag: COALESCE keeps the oracle's dtypes
    * integral (nullable BIGINT reads as float in the comparing harness). */
  def streamingIntervalJoinOuter(spark: SparkSession, sfDir: String,
      windowMinutes: Int = 120): DataFrame = {
    val gapMs = windowMinutes.toLong * 2 * 60 * 1000
    def side(tpe: String, prefix: String) =
      readEventStream(spark, sfDir, Some(gapMs))
        .filter(col("event_type") === tpe || col("user_id") < 0)
        .select(col("user_id").as(s"${prefix}_user"),
          col("event_id").as(s"${prefix}_id"), col("ts").as(s"${prefix}_ts"))
        .withWatermark(s"${prefix}_ts", s"$windowMinutes minutes")

    val joined = side("purchase", "p").join(side("click", "c"),
      col("p_user") === col("c_user") &&
        col("c_ts") <= col("p_ts") &&
        col("c_ts") >= col("p_ts") - expr(s"INTERVAL $windowMinutes MINUTES"),
      "left_outer")

    runToCompletion(joined, OutputMode.Append())
      .filter(col("p_user") >= 0) // batch-side: sentinel left rows out
      .select(col("p_id").as("purchase_id"),
        coalesce(col("c_id"), lit(-1L)).as("click_id"),
        coalesce(unix_timestamp(col("p_ts")) - unix_timestamp(col("c_ts")),
          lit(-1L)).as("gap_sec"),
        col("c_id").isNotNull.as("matched"))
      .orderBy("purchase_id", "click_id")
  }

  def streamingIntervalJoinOuterSql(windowMinutes: Int = 120): String =
    s"""SELECT p.event_id AS purchase_id,
       |  COALESCE(c.event_id, -1) AS click_id,
       |  COALESCE(CAST(floor(epoch(p.ts)) AS BIGINT)
       |    - CAST(floor(epoch(c.ts)) AS BIGINT), -1) AS gap_sec,
       |  c.event_id IS NOT NULL AS matched
       |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
       |LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
       |  ON p.user_id = c.user_id
       | AND c.ts <= p.ts AND c.ts >= p.ts - INTERVAL $windowMinutes MINUTE
       |ORDER BY purchase_id, click_id""".stripMargin

  def streamingIntervalJoinSql(windowMinutes: Int = 120): String =
    s"""SELECT p.event_id AS purchase_id, c.event_id AS click_id,
       |  CAST(floor(epoch(p.ts)) AS BIGINT)
       |    - CAST(floor(epoch(c.ts)) AS BIGINT) AS gap_sec
       |FROM events p JOIN events c
       |  ON p.user_id = c.user_id
       | AND p.event_type = 'purchase' AND c.event_type = 'click'
       | AND c.ts <= p.ts AND c.ts >= p.ts - INTERVAL $windowMinutes MINUTE
       |ORDER BY purchase_id, click_id""".stripMargin

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
