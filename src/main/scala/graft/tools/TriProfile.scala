package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only: stage-by-stage sizing of the triangle-count pipeline.
  * Usage: runMain graft.tools.TriProfile <sfDir> */
object TriProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[tri] $label%-22s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val edges = graft.queries.GraphQueries.coPartEdges(spark, sfDir)
    timed("edges count") { println(s"[tri]   n_edges = ${edges.count()}") }
    val out = graft.operators.GraphAnalytics.triangleCounts(
      graft.queries.GraphQueries.coPartEdges(spark, sfDir))
    timed("triangleCounts") { println(s"[tri]   n_out = ${out.count()}") }
    timed("triangleCounts warm") { println(s"[tri]   n_out = ${out.count()}") }
    spark.stop()
  }
}
