package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.transe.Kernels

/** IVF (inverted-file) approximate nearest neighbor: a coarse k-means
  * quantizer partitions the corpus into `nCells` cells; a query probes
  * only the `nProbe` nearest cells. This is the standard billion-scale
  * ANN layout (FAISS IVF-Flat), expressed Spark-first:
  *
  *  - centroid training is mini-batch Lloyd on a seeded SAMPLE of the
  *    corpus, driver-side (centroids are tiny: nCells x dim floats);
  *  - assignment is one narrow mapPartitions pass with the centroid
  *    matrix broadcast (no shuffle of the corpus beyond the cell
  *    groupBy);
  *  - the probe is an equi-join on cell id — candidates per query are
  *    |corpus| * nProbe / nCells in expectation, sub-linear scan cost.
  *
  * Recall < 1 by design (rows-only oracle); `IvfSpec`-style tests gate
  * recall against the brute-force baseline instead.
  */
object IvfAnn {

  /** Train the coarse quantizer on a seeded sample (driver-side Lloyd —
    * the sample and centroid set are small by construction). */
  def trainCentroids(embeddings: DataFrame, nCells: Int, iters: Int = 5,
      sampleSize: Int = 2000, seed: Long = 42L): Array[Array[Float]] = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val total = embeddings.count()
    val fraction = math.min(1.0, sampleSize.toDouble / math.max(total, 1L))
    val sample = embeddings.select(col("embedding"))
      .sample(withReplacement = false, fraction, seed)
      .as[Array[Float]].collect()
    require(sample.nonEmpty, "empty corpus")

    val rng = new java.util.SplittableRandom(seed)
    var centroids = Array.fill(math.min(nCells, sample.length))(
      sample(rng.nextInt(sample.length)).clone())
    var it = 0
    while (it < iters) {
      val sums = Array.fill(centroids.length)(new Array[Double](sample.head.length))
      val counts = new Array[Long](centroids.length)
      sample.foreach { v =>
        val c = nearest(centroids, v)
        counts(c) += 1
        var i = 0
        while (i < v.length) { sums(c)(i) += v(i); i += 1 }
      }
      centroids = centroids.indices.map { c =>
        if (counts(c) == 0) centroids(c)
        else sums(c).map(x => (x / counts(c)).toFloat)
      }.toArray
      it += 1
    }
    centroids
  }

  private def nearest(centroids: Array[Array[Float]], v: Array[Float]): Int = {
    var best = 0; var bestD = Double.MaxValue; var c = 0
    while (c < centroids.length) {
      var d = 0.0; var i = 0
      val ct = centroids(c)
      while (i < v.length) { val z = ct(i) - v(i); d += z * z; i += 1 }
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  /** Assign each vector to its IVF cell (narrow map, centroids broadcast). */
  def assign(embeddings: DataFrame, centroids: Array[Array[Float]]): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(centroids)
    embeddings.select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])]
      .mapPartitions { it =>
        val cs = bc.value
        it.map { case (id, v) => (id, v, nearest(cs, v)) }
      }
      .toDF("vec_id", "embedding", "cell")
  }

  /** Self-ANN: top-k cosine neighbors per vector, probing the `nProbe`
    * nearest cells. Cost per query ~ |corpus| * nProbe / nCells. */
  def topK(embeddings: DataFrame, nCells: Int = 16, nProbe: Int = 4,
      k: Int = 5, seed: Long = 42L): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val centroids = trainCentroids(embeddings, nCells, seed = seed)
    val assigned = assign(embeddings, centroids).persist()

    val bc = spark.sparkContext.broadcast(centroids)
    val probes = embeddings.select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])]
      .flatMap { case (id, v) =>
        val cs = bc.value
        // probe cells by centroid distance to the query vector
        val order = cs.indices
          .map(c => (c, Kernels.distL2Sq(cs(c), v)))
          .sortBy(_._2).take(nProbe)
        order.map { case (cell, _) => (id, v, cell) }
      }
      .toDF("query_id", "q_emb", "cell")

    val w = Window.partitionBy("query_id")
      .orderBy(col("sim").desc, col("neighbor_id").asc)
    val out = probes.join(assigned.select(col("vec_id").as("neighbor_id"),
        col("embedding").as("n_emb"), col("cell")), Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("sim", graft.functions.VectorFunctions.cosine(spark,
        col("q_emb"), col("n_emb")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("long").as("rank"),
        col("neighbor_id"), round(col("sim"), 6).as("sim"))
      .orderBy("query_id", "rank")
      .persist()
    out.count() // materialize, then drop the cell-assignment cache
    assigned.unpersist()
    out
  }
}
