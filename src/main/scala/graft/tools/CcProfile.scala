package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: isolate DedupComponents cost — literal pairs vs
  * minhash-derived pairs. Usage: runMain graft.tools.CcProfile <sfDir> */
object CcProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def time[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[ccp] $tag%-24s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    // 1. literal pair list, same shape as the sf0.01 graph
    val lit47 = (1L to 46L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    time("literal-pairs") {
      graft.operators.DedupComponents.components(lit47).count()
    }

    // 2. minhash pairs, collected then re-parallelized (no lineage)
    val mh = time("minhash-pairs-build") {
      val p = graft.operators.Dedup.minhashLsh(graft.Tables.documents(spark, sfDir))
        .select("doc_a", "doc_b").as[(Long, Long)].collect()
      p.toSeq.toDF("doc_a", "doc_b")
    }
    time("components-no-lineage") {
      graft.operators.DedupComponents.components(mh).count()
    }

    // 3. minhash pairs with full lineage (what the registry runs)
    time("components-with-lineage") {
      graft.operators.DedupComponents.components(
        graft.operators.Dedup.minhashLsh(graft.Tables.documents(spark, sfDir))).count()
    }
    spark.stop()
  }
}
