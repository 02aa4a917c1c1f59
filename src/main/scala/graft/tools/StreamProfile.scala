package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Dev-side profiler for the staged-stream bench cluster (VERDICT r12
  * #5): per-micro-batch durations + state-store metrics for the
  * interval-join-outer query, to attribute its bench cost (batch count
  * vs state traffic vs join work). */
object StreamProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val parts = if (args.length > 1) args(1) else cpus
    val spark = graft.GraftKryo.configure(SparkSession.builder()
      .master(s"local[$cpus]"))
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val windowMinutes = 120
    val gapMs = windowMinutes.toLong * 2 * 60 * 1000
    def side(tpe: String, prefix: String) =
      graft.streaming.EventStreams.readEventStream(spark, sfDir, Some(gapMs))
        .filter(col("event_type") === tpe || col("user_id") < 0)
        .select(col("user_id").as(s"${prefix}_user"),
          col("event_id").as(s"${prefix}_id"), col("ts").as(s"${prefix}_ts"))
        .withWatermark(s"${prefix}_ts", s"$windowMinutes minutes")
    val joined = side("purchase", "p").join(side("click", "c"),
      col("p_user") === col("c_user") &&
        col("c_ts") <= col("p_ts") &&
        col("c_ts") >= col("p_ts") - expr(s"INTERVAL $windowMinutes MINUTES"),
      "left_outer")

    val t0 = System.nanoTime()
    val q = joined.writeStream.format("memory").queryName("prof")
      .outputMode(OutputMode.Append()).start()
    q.processAllAvailable()
    val wall = (System.nanoTime() - t0) / 1e9
    q.recentProgress.foreach { p =>
      val st = p.stateOperators.map(s =>
        s"rowsTotal=${s.numRowsTotal} added=${s.numRowsUpdated} " +
          s"removed=${s.numRowsRemoved} commitMs=${s.commitTimeMs}").mkString("; ")
      println(f"batch=${p.batchId} rows=${p.numInputRows} " +
        f"durTotal=${p.batchDuration}ms add=${p.durationMs.get("addBatch")} " +
        f"getBatch=${p.durationMs.get("getBatch")} " +
        f"commit=${p.durationMs.get("commitOffsets")} state[$st]")
    }
    println(f"WALL=$wall%.2f s, nBatches=${q.recentProgress.length}")
    q.stop()
    spark.stop()
  }
}
