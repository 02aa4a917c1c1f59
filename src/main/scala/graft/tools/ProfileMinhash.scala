package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only stage profiler for the MinHash pipeline (scratch; not part of
  * the query surface). */
object ProfileMinhash {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val aqe = sys.env.getOrElse("SPARK_GRAFT_AQE", "false")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", aqe)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.Tables.documents(spark, sfDir)

    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $name%-22s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val stages = new scala.collection.mutable.ArrayBuffer[(Int, Long, Long, String)]
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val i = sc.stageInfo
        stages += ((i.stageId,
          i.completionTime.getOrElse(0L) - i.submissionTime.getOrElse(0L),
          i.numTasks, i.name))
      }
    })
    time("cold full pipeline") {
      graft.operators.Dedup.minhashLsh(docs).count()
    }
    Thread.sleep(500)
    stages.sortBy(-_._2).take(12).foreach { case (id, ms, nt, name) =>
      println(f"[stage] $id%4d ${ms / 1000.0}%7.2f s  $nt%4d tasks  ${name.take(90)}")
    }

    val sh = time("shingles") { val s = graft.operators.Dedup.shingles(docs, 5).persist(); s.count(); s }
    val numHashes = 64; val bands = 16; val rowsPerBand = numHashes / bands
    val minAggs = (0 until numHashes).map { j =>
      min(xxhash64(col("h0"), lit(42L), lit(j))).as(s"m$j")
    }
    val sig = time("signatures") {
      val s = sh.withColumn("h0", xxhash64(col("shingle")))
        .groupBy("doc_id").agg(minAggs.head, minAggs.tail: _*).persist()
      s.count(); s
    }
    val bandCols = (0 until bands).map { bIdx =>
      xxhash64((0 until rowsPerBand).map(r => col(s"m${bIdx * rowsPerBand + r}")): _*)
    }
    val banded = time("banded") {
      val b = sig.select(col("doc_id"),
        posexplode(array(bandCols: _*)).as(Seq("band_idx", "band_hash"))).persist()
      b.count(); b
    }
    val candidates = time("candidates") {
      val left = banded.select(col("doc_id").as("doc_a"), col("band_idx"), col("band_hash"))
      val right = banded.select(col("doc_id").as("doc_b"), col("band_idx"), col("band_hash"))
      val c = left.join(right, Seq("band_idx", "band_hash"))
        .filter(col("doc_a") < col("doc_b"))
        .select("doc_a", "doc_b").distinct().persist()
      println("[profile] n_candidates = " + c.count()); c
    }
    time("full pipeline") {
      graft.operators.Dedup.minhashLsh(docs).count()
    }
    spark.stop()
  }
}
