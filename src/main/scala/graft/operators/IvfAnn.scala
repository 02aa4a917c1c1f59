package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF (inverted-file) approximate nearest neighbor: a coarse k-means
  * quantizer partitions the corpus into `nCells` cells; a query probes
  * only the `nProbe` nearest cells. This is the standard billion-scale
  * ANN layout (FAISS IVF-Flat), expressed Spark-first:
  *
  *  - centroid training is DISTRIBUTED Lloyd over the full corpus:
  *    per-cell integer sums/counts are a map-side-combinable aggregation
  *    (centroids stay tiny: nCells x dim), so training scales with
  *    executors instead of being capped by a driver-side sample;
  *  - assignment is one narrow mapPartitions pass with the centroid
  *    matrix broadcast (no shuffle of the corpus beyond the cell
  *    groupBy);
  *  - the probe is an equi-join on cell id — candidates per query are
  *    |corpus| * nProbe / nCells in expectation, sub-linear scan cost.
  *
  * Determinism contract (what makes [[topKSql]] a full hash oracle
  * despite recall < 1): seeds are the `nCells` vectors with smallest
  * `md5('ivf:' || vec_id)`; all distances and means run on
  * `floor(x*2^20)`-quantized vectors in EXACT integer arithmetic
  * (means take the floor of integer sums over counts); argmin and probe
  * order tie-break on cell index. No float accumulation order anywhere,
  * so any engine — and any executor count or retry — reproduces the
  * same cells, probes, and candidates; DuckDB then exact-scores the
  * same candidate set.
  */
object IvfAnn {

  private[operators] def quantize(v: Array[Float]): Array[Long] = {
    val q = new Array[Long](v.length)
    var i = 0
    while (i < v.length) { q(i) = SimilaritySearch.quantElem(v(i)); i += 1 }
    q
  }

  /** Exact integer squared-L2; strict < keeps the LOWEST index on ties. */
  private[operators] def nearestCell(cents: Array[Array[Long]], q: Array[Long]): Int = {
    var best = 0; var bestD = Long.MaxValue; var c = 0
    while (c < cents.length) {
      var d = 0L; var i = 0
      val ct = cents(c)
      while (i < q.length) { val z = q(i) - ct(i); d += z * z; i += 1 }
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  private def cellDist(ct: Array[Long], q: Array[Long]): Long = {
    var d = 0L; var i = 0
    while (i < q.length) { val z = q(i) - ct(i); d += z * z; i += 1 }
    d
  }

  /** Distributed deterministic Lloyd: md5-ordered seeds, `iters` rounds
    * of integer-mean updates over the FULL corpus. Memoized via
    * [[ModelStaging]] — a trained quantizer is a persisted production
    * asset, and the training is deterministic, so the memo is
    * transparent (frames without file lineage always train fresh). */
  def trainCentroids(embeddings: DataFrame, nCells: Int,
      iters: Int = 2): Array[Array[Long]] =
    ModelStaging.memo(embeddings, s"centroids:$nCells:$iters") {
      trainCentroidsUncached(embeddings, nCells, iters)
    }

  private def trainCentroidsUncached(embeddings: DataFrame, nCells: Int,
      iters: Int): Array[Array[Long]] = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val qvecs: Dataset[(Long, Array[Long])] = embeddings
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])]
      .map { case (id, v) => (id, quantize(v)) }

    val seeds: Array[Array[Long]] = embeddings
      .select(col("vec_id"), col("embedding"),
        md5(concat(lit("ivf:"), col("vec_id").cast("string"))).as("h"))
      .orderBy(col("h"), col("vec_id"))
      .limit(nCells)
      .select(col("vec_id"), col("embedding")).as[(Long, Array[Float])]
      .collect().map { case (_, v) => quantize(v) }
    require(seeds.nonEmpty, "empty corpus")

    var cents = seeds
    val dim = cents.head.length
    var it = 0
    while (it < iters) {
      val bc = spark.sparkContext.broadcast(cents)
      // exact integer sums + counts per cell: order-independent, so the
      // result is identical for any partitioning (and for the SQL replay)
      val (sums, counts) = qvecs.rdd.treeAggregate(
        (Array.fill(cents.length)(new Array[Long](dim)), new Array[Long](cents.length)))(
        seqOp = { case ((s, n), (_, q)) =>
          val c = nearestCell(bc.value, q)
          n(c) += 1
          var i = 0; while (i < dim) { s(c)(i) += q(i); i += 1 }
          (s, n)
        },
        combOp = { case ((s1, n1), (s2, n2)) =>
          var c = 0
          while (c < n1.length) {
            n1(c) += n2(c)
            var i = 0; while (i < dim) { s1(c)(i) += s2(c)(i); i += 1 }
            c += 1
          }
          (s1, n1)
        })
      val prev = cents
      cents = prev.indices.map { c =>
        if (counts(c) == 0) prev(c) // empty cell keeps its centroid
        else sums(c).map(x => math.floor(x.toDouble / counts(c)).toLong)
      }.toArray
      bc.destroy()
      it += 1
    }
    cents
  }

  /** Assign each vector to its IVF cell (narrow map, centroids broadcast). */
  def assign(embeddings: DataFrame, centroids: Array[Array[Long]]): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(centroids)
    embeddings.select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])]
      .mapPartitions { it =>
        val cs = bc.value
        it.map { case (id, v) => (id, v, nearestCell(cs, quantize(v))) }
      }
      .toDF("vec_id", "embedding", "cell")
  }

  /** Each vector's `nProbe` nearest cells by exact integer centroid
    * distance, ties by index (narrow flatMap, centroids broadcast).
    * Output: (vec_id, embedding, cell), one row per probed cell —
    * shared by [[topK]]'s query side and `SemanticDedup`'s multi-probe
    * candidate generation. */
  private[operators] def probeCells(embeddings: DataFrame,
      centroids: Array[Array[Long]], nProbe: Int): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(centroids)
    embeddings.select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])]
      .flatMap { case (id, v) =>
        val cs = bc.value
        val q = quantize(v)
        cs.indices
          .map(c => (c, cellDist(cs(c), q)))
          .sortBy { case (c, d) => (d, c) }.take(nProbe)
          .map { case (cell, _) => (id, v, cell) }
      }
      .toDF("vec_id", "embedding", "cell")
  }

  /** Self-ANN: top-k cosine neighbors per vector, probing the `nProbe`
    * nearest cells. Cost per query ~ |corpus| * nProbe / nCells.
    * Output: (query_id, rank, neighbor_id) — integer-only, hash-oracled
    * by [[topKSql]]. */
  def topK(embeddings: DataFrame, nCells: Int = 16, nProbe: Int = 4,
      k: Int = 5, iters: Int = 2,
      restrictQueries: Option[Seq[Long]] = None): DataFrame = {
    val spark = embeddings.sparkSession
    val centroids = trainCentroids(embeddings, nCells, iters)
    val assigned = assign(embeddings, centroids).persist()

    // probe restriction (r14): centroids still train on the FULL corpus
    // (identical index), but a |q|-query recall probe only routes those
    // queries — per-query cell sets and ranks are untouched, so the kept
    // rows are bit-identical to the unrestricted pipeline
    val probeSrc = restrictQueries.map(ids =>
      embeddings.filter(col("vec_id").isin(ids: _*))).getOrElse(embeddings)
    val probes = probeCells(probeSrc, centroids, nProbe)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"),
        col("cell"))

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
        col("neighbor_id"))
      .persist()
      // registry + listener release, like topKAgainst: the materialized
      // result cache must not pin blocks for the session lifetime
      .transform(graft.CacheScope.register)
    out.count() // materialize, then drop the cell-assignment cache
    assigned.unpersist()
    SimilaritySearch.unpersistAfterFirstAction(out)
    out
  }

  /** The probe half of the index-build/probe split, over an ALREADY
    * assigned corpus: queries route to their `nProbe` nearest cells and
    * rank only that candidate set — the per-query cost a serving path
    * pays. Factored out so the STREAMING consumer can assign the corpus
    * ONCE and probe every micro-batch against it. */
  def probeAssigned(assigned: DataFrame, centroids: Array[Array[Long]],
      queries: DataFrame, nProbe: Int = 4, k: Int = 5): DataFrame = {
    val spark = assigned.sparkSession
    val probes = probeCells(queries, centroids, nProbe)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"),
        col("cell"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("sim").desc, col("neighbor_id").asc)
    probes.join(assigned.select(col("vec_id").as("neighbor_id"),
        col("embedding").as("n_emb"), col("cell")), Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("sim", graft.functions.VectorFunctions.cosine(spark,
        col("q_emb"), col("n_emb")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("long").as("rank"),
        col("neighbor_id"))
  }

  /** IVF top-k of QUERIES against a SEPARATE corpus (the index-build /
    * probe split of [[topK]]'s self-ANN): centroids train on the corpus
    * only — queries must not shape the index they probe — and each
    * query ranks the corpus vectors in its `nProbe` nearest cells.
    * Ids are assumed disjoint (the self-pair guard stays as a belt). */
  def topKAgainst(corpus: DataFrame, queries: DataFrame, nCells: Int = 16,
      nProbe: Int = 4, k: Int = 5, iters: Int = 2): DataFrame = {
    val centroids = trainCentroids(corpus, nCells, iters)
    val assigned = assign(corpus, centroids).persist()
    val out = graft.CacheScope.register(
      probeAssigned(assigned, centroids, queries, nProbe, k).persist())
    out.count() // materialize, then drop the cell-assignment cache
    assigned.unpersist()
    SimilaritySearch.unpersistAfterFirstAction(out)
    out
  }

  /** DuckDB replay of [[topKAgainst]] where corpus/queries are SQL
    * slices of the embeddings table (`queryPred` selects the queries):
    * centroids train on the corpus slice, query vectors rank the same
    * probed candidates. */
  def topKAgainstSql(dim: Int, queryPred: String, nCells: Int = 16,
      nProbe: Int = 4, k: Int = 5, iters: Int = 2): String = {
    s"""WITH corpus_src AS (SELECT * FROM embeddings WHERE NOT ($queryPred)),
       |${assignCtesSql(dim, nCells, iters, src = "corpus_src")},
       |aq AS (SELECT vec_id, embedding AS v FROM embeddings WHERE $queryPred),
       |aqv AS (SELECT vec_id, CAST(ri.i AS INTEGER) AS i,
       |    CAST(floor(CAST(v[CAST(ri.i + 1 AS INTEGER)] AS DOUBLE) * 1048576.0) AS BIGINT) AS q
       |  FROM aq, range($dim) AS ri(i)),
       |adF AS (SELECT aqv.vec_id, c.c, SUM((aqv.q - c.cv) * (aqv.q - c.cv)) AS dist
       |  FROM aqv JOIN c$iters c USING (i) GROUP BY aqv.vec_id, c.c),
       |probes AS (SELECT vec_id AS query_id, c AS cell FROM (
       |    SELECT vec_id, c, ROW_NUMBER() OVER (
       |      PARTITION BY vec_id ORDER BY dist, c) AS rn FROM adF)
       |  WHERE rn <= $nProbe),
       |scored AS (
       |  SELECT p.query_id, a.vec_id AS neighbor_id, ROW_NUMBER() OVER (
       |      PARTITION BY p.query_id
       |      ORDER BY list_cosine_similarity(CAST(q.v AS DOUBLE[]),
       |                                      CAST(n.v AS DOUBLE[])) DESC,
       |               a.vec_id ASC) AS rank
       |  FROM probes p
       |  JOIN assigned a ON a.cell = p.cell AND a.vec_id <> p.query_id
       |  JOIN aq q ON q.vec_id = p.query_id
       |  JOIN vecs n ON n.vec_id = a.vec_id)
       |SELECT query_id, rank, neighbor_id FROM scored
       |WHERE rank <= $k ORDER BY query_id, rank""".stripMargin
  }

  /** DuckDB replay of the MAINTAINED-index probe: centroids train on the
    * `trainPred` base slice ONLY (the frozen quantizer — arriving
    * vectors must not reshape the cells they land in), arrivals
    * (`arrivalPred`) are assigned to those final centroids exactly like
    * the streamed ingest does, and queries (`queryPred`) rank base ∪
    * arrival candidates — the vector-ingest twin of [[topKAgainstSql]].
    * Same determinism contract: integer Lloyd, integer assignment
    * distances, (sim DESC, neighbor_id) rank ties. */
  def topKMaintainedSql(dim: Int, trainPred: String, arrivalPred: String,
      queryPred: String, nCells: Int = 16, nProbe: Int = 4, k: Int = 5,
      iters: Int = 2): String = {
    s"""WITH corpus_src AS (SELECT * FROM embeddings WHERE ($trainPred)),
       |${assignCtesSql(dim, nCells, iters, src = "corpus_src")},
       |arrv AS (SELECT vec_id, embedding AS v FROM embeddings WHERE ($arrivalPred)),
       |arrqv AS (SELECT vec_id, CAST(ri.i AS INTEGER) AS i,
       |    CAST(floor(CAST(v[CAST(ri.i + 1 AS INTEGER)] AS DOUBLE) * 1048576.0) AS BIGINT) AS q
       |  FROM arrv, range($dim) AS ri(i)),
       |arrd AS (SELECT arrqv.vec_id, c.c, SUM((arrqv.q - c.cv) * (arrqv.q - c.cv)) AS dist
       |  FROM arrqv JOIN c$iters c USING (i) GROUP BY arrqv.vec_id, c.c),
       |arrassigned AS (SELECT vec_id, c AS cell FROM (
       |    SELECT vec_id, c, ROW_NUMBER() OVER (
       |      PARTITION BY vec_id ORDER BY dist, c) AS rn FROM arrd)
       |  WHERE rn = 1),
       |assigned_all AS (SELECT vec_id, cell FROM assigned
       |  UNION ALL SELECT vec_id, cell FROM arrassigned),
       |allvecs AS (SELECT vec_id, v FROM vecs UNION ALL
       |  SELECT vec_id, v FROM arrv),
       |aq AS (SELECT vec_id, embedding AS v FROM embeddings WHERE $queryPred),
       |aqv AS (SELECT vec_id, CAST(ri.i AS INTEGER) AS i,
       |    CAST(floor(CAST(v[CAST(ri.i + 1 AS INTEGER)] AS DOUBLE) * 1048576.0) AS BIGINT) AS q
       |  FROM aq, range($dim) AS ri(i)),
       |adF AS (SELECT aqv.vec_id, c.c, SUM((aqv.q - c.cv) * (aqv.q - c.cv)) AS dist
       |  FROM aqv JOIN c$iters c USING (i) GROUP BY aqv.vec_id, c.c),
       |probes AS (SELECT vec_id AS query_id, c AS cell FROM (
       |    SELECT vec_id, c, ROW_NUMBER() OVER (
       |      PARTITION BY vec_id ORDER BY dist, c) AS rn FROM adF)
       |  WHERE rn <= $nProbe),
       |scored AS (
       |  SELECT p.query_id, a.vec_id AS neighbor_id, ROW_NUMBER() OVER (
       |      PARTITION BY p.query_id
       |      ORDER BY list_cosine_similarity(CAST(q.v AS DOUBLE[]),
       |                                      CAST(n.v AS DOUBLE[])) DESC,
       |               a.vec_id ASC) AS rank
       |  FROM probes p
       |  JOIN assigned_all a ON a.cell = p.cell AND a.vec_id <> p.query_id
       |  JOIN aq q ON q.vec_id = p.query_id
       |  JOIN allvecs n ON n.vec_id = a.vec_id)
       |SELECT query_id, rank, neighbor_id FROM scored
       |WHERE rank <= $k ORDER BY query_id, rank""".stripMargin
  }

  /** K-means clustering as a first-class operator (the quantizer exposed
    * directly — corpus organization, topic bucketing, SemDeDup's cell
    * step): each vector's cluster, its EXACT integer squared distance to
    * the final centroid (cohesion), and the cluster size. Output:
    * (vec_id, cluster_id, dist_qsq, cluster_size) — integer-only, fully
    * hash-oracled by [[clustersSql]] via the same determinism contract as
    * [[topK]].
    *
    * Scale shape: training is the distributed integer Lloyd (corpus
    * aggregated, never shuffled); assignment is one narrow pass with the
    * centroid matrix broadcast; sizes are a tiny nCells-row aggregate
    * broadcast back — the corpus never shuffles at all. */
  def clusters(embeddings: DataFrame, nCells: Int = 16, iters: Int = 2): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val centroids = trainCentroids(embeddings, nCells, iters)
    val bc = spark.sparkContext.broadcast(centroids)
    val assigned = embeddings.select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])]
      .mapPartitions { it =>
        val cs = bc.value
        it.map { case (id, v) =>
          val q = quantize(v)
          val c = nearestCell(cs, q)
          (id, c.toLong, cellDist(cs(c), q))
        }
      }
      .toDF("vec_id", "cluster_id", "dist_qsq")
    val sizes = assigned.groupBy("cluster_id")
      .agg(count(lit(1)).as("cluster_size"))
    assigned.join(broadcast(sizes), Seq("cluster_id"))
      .select(col("vec_id"), col("cluster_id"), col("dist_qsq"),
        col("cluster_size"))
  }

  /** DuckDB replay of [[clusters]]: same quantizer chain, keeping the
    * winning distance; integer sums CAST from HUGEINT to BIGINT. */
  def clustersSql(dim: Int, nCells: Int = 16, iters: Int = 2): String =
    s"""WITH ${assignCtesSql(dim, nCells, iters)},
       |ad AS (SELECT vec_id, c AS cluster_id, CAST(dist AS BIGINT) AS dist_qsq
       |  FROM (SELECT vec_id, c, dist, ROW_NUMBER() OVER (
       |      PARTITION BY vec_id ORDER BY dist, c) AS rn FROM dF)
       |  WHERE rn = 1)
       |SELECT vec_id, cluster_id, dist_qsq,
       |  COUNT(*) OVER (PARTITION BY cluster_id) AS cluster_size
       |FROM ad ORDER BY vec_id""".stripMargin

  /** The `WITH`-clause body replaying quantization, seed selection,
    * `iters` integer-Lloyd rounds, and final cell assignment — everything
    * up to the `assigned (vec_id, cell)` CTE (plus `vecs` and `dF`,
    * which consumers may also reference). Shared by [[topKSql]],
    * `SemanticDedup.pairsSql`, and (via `prefix`/`offset`, which replay
    * Lloyd over the `[offset, offset+dim)` slice of the embedding under
    * collision-free CTE names) `Quantization.pqCodesSql`'s per-subspace
    * codebooks. */
  private[operators] def assignCtesSql(dim: Int, nCells: Int, iters: Int,
      offset: Int = 0, prefix: String = "", src: String = "embeddings"): String = {
    val p = prefix
    // one assign+update round: reads centroid CTE `cin`, emits `cout`
    def round(cin: String, cout: String, n: Int) =
      s"""${p}d$n AS (SELECT qv.vec_id, c.c, SUM((qv.q - c.cv) * (qv.q - c.cv)) AS dist
         |  FROM ${p}qv qv JOIN $cin c USING (i) GROUP BY qv.vec_id, c.c),
         |${p}a$n AS (SELECT vec_id, c AS cell FROM (
         |    SELECT vec_id, c, ROW_NUMBER() OVER (
         |      PARTITION BY vec_id ORDER BY dist, c) AS rn FROM ${p}d$n)
         |  WHERE rn = 1),
         |${p}m$n AS (SELECT a.cell AS c, qv.i,
         |    CAST(floor(CAST(SUM(qv.q) AS DOUBLE) / COUNT(*)) AS BIGINT) AS cv
         |  FROM ${p}a$n a JOIN ${p}qv qv USING (vec_id) GROUP BY a.cell, qv.i),
         |$cout AS (SELECT g.c, g.i, COALESCE(m.cv, g.cv) AS cv
         |  FROM $cin g LEFT JOIN ${p}m$n m ON m.c = g.c AND m.i = g.i)""".stripMargin
    val rounds = (1 to iters).map(n => round(s"${p}c${n - 1}", s"${p}c$n", n)).mkString(",\n")
    val cFinal = s"${p}c$iters"
    s"""${p}vecs AS (SELECT vec_id, embedding AS v FROM $src),
       |${p}qv AS (SELECT vec_id, CAST(ri.i AS INTEGER) AS i,
       |    CAST(floor(CAST(v[CAST(ri.i + 1 + $offset AS INTEGER)] AS DOUBLE) * 1048576.0) AS BIGINT) AS q
       |  FROM ${p}vecs, range($dim) AS ri(i)),
       |${p}seeds AS (SELECT vec_id, ROW_NUMBER() OVER (
       |      ORDER BY md5('ivf:' || CAST(vec_id AS VARCHAR)), vec_id) - 1 AS c
       |  FROM ${p}vecs ORDER BY md5('ivf:' || CAST(vec_id AS VARCHAR)), vec_id
       |  LIMIT $nCells),
       |${p}c0 AS (SELECT s.c, qv.i, qv.q AS cv FROM ${p}seeds s JOIN ${p}qv qv USING (vec_id)),
       |$rounds,
       |${p}dF AS (SELECT qv.vec_id, c.c, SUM((qv.q - c.cv) * (qv.q - c.cv)) AS dist
       |  FROM ${p}qv qv JOIN $cFinal c USING (i) GROUP BY qv.vec_id, c.c),
       |${p}assigned AS (SELECT vec_id, c AS cell FROM (
       |    SELECT vec_id, c, ROW_NUMBER() OVER (
       |      PARTITION BY vec_id ORDER BY dist, c) AS rn FROM ${p}dF)
       |  WHERE rn = 1)""".stripMargin
  }

  /** DuckDB replay of [[topK]] over the embeddings table: same seeds,
    * same integer Lloyd rounds (unrolled), same probes, exact cosine
    * ranking of the same candidates. */
  def topKSql(dim: Int, nCells: Int = 16, nProbe: Int = 4, k: Int = 5,
      iters: Int = 2, src: String = "embeddings"): String = {
    s"""WITH ${assignCtesSql(dim, nCells, iters, src = src)},
       |probes AS (SELECT vec_id AS query_id, c AS cell FROM (
       |    SELECT vec_id, c, ROW_NUMBER() OVER (
       |      PARTITION BY vec_id ORDER BY dist, c) AS rn FROM dF)
       |  WHERE rn <= $nProbe),
       |scored AS (
       |  SELECT p.query_id, a.vec_id AS neighbor_id, ROW_NUMBER() OVER (
       |      PARTITION BY p.query_id
       |      ORDER BY list_cosine_similarity(CAST(q.v AS DOUBLE[]),
       |                                      CAST(n.v AS DOUBLE[])) DESC,
       |               a.vec_id ASC) AS rank
       |  FROM probes p
       |  JOIN assigned a ON a.cell = p.cell AND a.vec_id <> p.query_id
       |  JOIN vecs q ON q.vec_id = p.query_id
       |  JOIN vecs n ON n.vec_id = a.vec_id)
       |SELECT query_id, rank, neighbor_id FROM scored
       |WHERE rank <= $k ORDER BY query_id, rank""".stripMargin
  }
}
