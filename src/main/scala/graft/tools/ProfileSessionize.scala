package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only: compare streamed vs batch sessionization counts. */
object ProfileSessionize {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val streamed = graft.streaming.EventStreams.sessionize(spark, sfDir)
    val batch = graft.streaming.EventStreams.sessionizeBatch(graft.Tables.events(spark, sfDir))
    val s = streamed.collect()
    val b = batch.collect()
    println(s"[sess] streamed=${s.length} batch=${b.length}")
    val sk = s.map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toSet
    val bk = b.map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toSet
    println(s"[sess] missing=${(bk -- sk).size} extra=${(sk -- bk).size}")
    (bk -- sk).take(3).foreach(x => println(s"[sess] missing ex: $x"))
    (sk -- bk).take(3).foreach(x => println(s"[sess] extra ex: $x"))
    spark.stop()
  }
}
