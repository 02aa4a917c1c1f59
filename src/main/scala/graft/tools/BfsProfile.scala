package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Checkpoints.DatasetTruncate

/** Dev-only: per-stage timing of graph_bfs_layers at a given sfDir —
  * und setup vs each expansion round (join+distinct+anti+checkpoint). */
object BfsProfile {
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
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[bfs-profile] $label%-22s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      r
    }
    val edges = graft.queries.GraphQueries.kgEdges(spark, sfDir)
    val und = edges.select(col("src").as("a"), col("dst").as("b"))
      .unionAll(edges.select(col("dst").as("a"), col("src").as("b")))
      .filter(col("a") =!= col("b"))
      .repartition(col("a"))
      .persist()
    t("und setup")(und.count())
    var dist = t("seed checkpoint")(
      edges.filter(col("dst").startsWith("r:")).select(col("dst").as("id"))
        .distinct().withColumn("dist", lit(0L)).truncateLineage)
    var frontier = dist.select("id")
    var round = 0
    var done = false
    while (!done) {
      round += 1
      val r = round
      val cand = t(s"round $r cand+anti+ckpt") {
        val c = und
          .join(frontier.withColumnRenamed("id", "a").hint("shuffle_hash"), Seq("a"))
          .select(col("b").as("id")).distinct()
        c.join(dist, Seq("id"), "left_anti")
          .withColumn("dist", lit(r.toLong)).truncateLineage
      }
      val empty = t(s"round $r isEmpty")(cand.isEmpty)
      if (empty) done = true
      else { dist = dist.unionAll(cand); frontier = cand.select("id") }
    }
    t("final count")(dist.count())
    spark.stop()
  }
}
