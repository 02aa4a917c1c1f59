package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: print the formatted physical plan (and optionally run+time)
  * for one or more SparkEntry queries.
  * Usage: runMain graft.tools.Explain <sfDir> <query1> [query2 ...] [--run]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val run = args.contains("--run")
    val names = args.tail.filterNot(_ == "--run")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { name =>
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      System.err.println(s"========== $name ==========")
      System.err.println(df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
      if (run) {
        val t0 = System.nanoTime()
        val n = df.count()
        System.err.println(f"[explain] $name rows=$n time=${(System.nanoTime() - t0) / 1e9}%.2fs")
      }
    }
    spark.stop()
  }
}
