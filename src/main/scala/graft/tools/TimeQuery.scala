package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only: time individual registry queries under bench-like config.
  * Usage: runMain graft.tools.TimeQuery <sfDir> <query> [query...] */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val names = args.tail
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Untimed session warmup (VERDICT r8 nit): the first query in a fresh
    // session absorbs ~8 s of one-time cost (Tables normalization probe +
    // codegen warmup), which made ad-hoc single-query triage misleading.
    try graft.SparkEntry.queries("q1_agg")(spark, sfDir).count()
    catch { case _: Throwable => () }
    names.foreach { name =>
      val t0 = System.nanoTime()
      val n = graft.SparkEntry.queries(name)(spark, sfDir).count()
      println(f"[time] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  ($n rows)")
    }
    spark.stop()
  }
}
