package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only: break transe_eval wall time into components (test-set
  * materialization, rank scan, metrics agg) to locate the cost.
  * Usage: runMain graft.tools.EvalProfile [sfDir] */
object EvalProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.GraftKryo.configure(SparkSession.builder()
      .master(s"local[$cpus]"))
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val a = f
      println(f"[eval-profile] $label%-24s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      a
    }
    val (fit, test) = t("fit+prep (memoized next)") {
      graft.queries.TransEQueries.fitted(spark, sfDir)
    }
    (1 to 3).foreach { i =>
      t(s"test.count #$i")(test.count())
      val ranks = graft.transe.LinkPrediction.rankTriples(test, fit.model)
      t(s"rankTriples.collect #$i")(ranks.collect().length)
      t(s"full evaluate #$i") {
        graft.transe.LinkPrediction.evaluate(test, fit.model).collect()
      }
    }
    // driver-local single-thread bound: same fused early-exit loop over
    // the same triples — separates scheduler/serialization cost from
    // compute and shows the parallel speedup actually achieved
    val triples = test.collect()
    val ent = fit.model.entity
    val lab = fit.model.label
    val n = ent.length
    val k = ent(0).length
    val flat = new Array[Float](n * k)
    (0 until n).foreach(r => System.arraycopy(ent(r), 0, flat, r * k, k))
    (1 to 2).foreach { i =>
      t(s"driver-local loop #$i (${triples.length} triples, 1 thread)") {
        var c = 0L
        triples.foreach { tr =>
          val l = lab(tr.l); val hOff = tr.h * k; val tOff = tr.t * k
          val u = new Array[Float](k); val v = new Array[Float](k)
          var j = 0
          while (j < k) {
            u(j) = l(j) - flat(tOff + j); v(j) = flat(hOff + j) + l(j); j += 1 }
          var dH = 0.0; var dT = 0.0
          j = 0
          while (j < k) {
            dH += math.abs(flat(hOff + j) + u(j)).toDouble
            dT += math.abs(v(j) - flat(tOff + j)).toDouble; j += 1 }
          var off = 0; val end = n * k
          while (off < end) {
            var sH = 0.0; var sT = 0.0
            j = 0
            while (j < k && (sH < dH || sT < dT)) {
              val x = flat(off + j)
              sH += math.abs(x + u(j)).toDouble
              sT += math.abs(v(j) - x).toDouble; j += 1 }
            if (sH < dH) c += 1
            if (sT < dT) c += 1
            off += k
          }
        }
        c
      }
    }
    spark.stop()
  }
}
