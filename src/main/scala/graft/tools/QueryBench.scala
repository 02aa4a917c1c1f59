package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc single-query timing harness: `runMain graft.tools.QueryBench
  * <sfDir> <runs> <query...>` — same session config as Bench, min+mean
  * per query. For iterating on one operator without the full sweep. */
object QueryBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val runs = args(1).toInt
    val names = args.drop(2)
    val spark = graft.GraftKryo.configure(SparkSession.builder()
      .master("local[32]"))
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.Tables.names.foreach(n => graft.Tables.load(spark, sfDir, n).count())
    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      val secs = (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"QBENCH $name min=${secs.min}%.3f mean=${secs.sum / runs}%.3f")
    }
    spark.stop()
  }
}
