package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: profile one TransE training at a given sfDir.
  * Usage: runMain graft.tools.TrainProfile /root/testdata/sf0.1 */
object TrainProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t0 = System.nanoTime()
    val (fit, _) = graft.queries.TransEQueries.fitted(spark, sfDir)
    System.err.println(f"[train-profile] total fit+prep=${(System.nanoTime() - t0) / 1e9}%.1fs " +
      s"nEnt=${fit.nEntities} nTrain=${fit.nTrain}")
    spark.stop()
  }
}
