package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only: diff the custom-state and native session_window
  * sessionizers at a given sfDir. */
object SessionDiff {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val custom = graft.streaming.EventStreams.sessionize(spark, sfDir)
      .collect().map(_.toString).toSet
    val native = graft.streaming.EventStreams.sessionizeNative(spark, sfDir)
      .collect().map(_.toString).toSet
    println(s"[diff] custom=${custom.size} native=${native.size}")
    (custom -- native).toSeq.sorted.take(5).foreach(r => println(s"[only-custom] $r"))
    (native -- custom).toSeq.sorted.take(5).foreach(r => println(s"[only-native] $r"))
    spark.stop()
  }
}
