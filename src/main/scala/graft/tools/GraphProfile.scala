package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only: time graph_pagerank / graph_degrees at a given sfDir. */
object GraphProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.GraftKryo.configure(SparkSession.builder()
      .master(s"local[$cpus]"))
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    (1 to 3).foreach { i =>
      val t0 = System.nanoTime()
      graft.queries.GraphQueries.queries("graph_pagerank")(spark, sfDir).count()
      val t1 = System.nanoTime()
      graft.queries.GraphQueries.queries("graph_degrees")(spark, sfDir).count()
      val t2 = System.nanoTime()
      println(f"[graph-profile] run$i pagerank=${(t1 - t0) / 1e9}%.2fs degrees=${(t2 - t1) / 1e9}%.2fs")
    }
    spark.stop()
  }
}
