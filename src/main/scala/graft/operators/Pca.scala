package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed PCA over the embeddings table, in the engine's
  * three-stage numeric discipline:
  *
  *  1. DATA-SCALE, EXACT, ORACLED: one `gram_lower` aggregation
  *     ([[graft.functions.GramLowerAgg]]) produces the integer Gram
  *     matrix of the `floor(x*2^20)`-quantized vectors, plus an exact
  *     integer column-sum vector — the only pass over the data, fully
  *     DuckDB-replayable (`embed_gram`).
  *  2. DRIVER, d x d, DETERMINISTIC: the covariance eigensolve runs on
  *     the collected 64x64 matrix — seeded deflated power iteration
  *     with a fixed iteration count and a deterministic sign convention,
  *     so the components are a pure function of the (exact) Gram. This
  *     is not distributed because it must not be: the matrix is 32 KB
  *     at any corpus size.
  *  3. DATA-SCALE, EXACT, ORACLED: the top-k components quantize to
  *     integers and inline as LITERALS into the projection expression
  *     (the RandomProjection discipline) — scoring is a codegen'd
  *     integer dot product per component, no shuffle, no broadcast, and
  *     the DuckDB oracle replays the identical literals
  *     (`embed_pca_project`).
  *
  * So the parts that touch the corpus are hash-oracle-exact, and the
  * float eigensolve — which no cross-engine oracle can replay bit-wise
  * — is confined to a driver step gated by spectral property tests
  * (orthonormality, descending eigenvalues, projection-variance
  * agreement; PipelineSpec). */
object Pca {

  val D = 64
  val K = 8
  private val Scale = 1048576.0 // 2^20, the repo-wide quantization

  private val cells = D * (D + 1) / 2

  /** Stage 1 surface: (i, j, s) lower-triangle integer Gram cells plus
    * the j = -1 rows carrying the exact column sums (for centering). */
  def gram(emb: DataFrame): DataFrame = {
    val spark = emb.sparkSession
    graft.functions.VectorFunctions.ensureRegistered(spark)
    val g = emb.agg(
      call_function("gram_lower", col("embedding"), lit(D)).as("g"))
    // (pos -> i, j) mapping for the packed lower triangle, broadcast
    val idx = (0 until D).flatMap(i => (0 to i).map(j => (i * (i + 1) / 2 + j, i, j)))
    val idxDf = spark.createDataFrame(idx).toDF("pos", "i", "j")
    val cellsDf = g.select(posexplode(col("g")).as(Seq("pos", "s")))
      .join(broadcast(idxDf), "pos")
      .select(col("i").cast("long").as("i"), col("j").cast("long").as("j"), col("s"))
    // exact integer column sums as j = -1 rows (the centering vector)
    val sums = emb
      .select(posexplode(col("embedding")).as(Seq("pos", "x")))
      .groupBy(col("pos"))
      .agg(sum(floor(col("x").cast("double") * Scale).cast("long")).as("s"))
      .select(col("pos").cast("long").as("i"), lit(-1L).as("j"), col("s"))
    cellsDf.unionByName(sums)
  }

  def gramSql: String =
    s"""WITH q AS (SELECT list_transform(embedding,
       |    x -> CAST(floor(CAST(x AS DOUBLE) * $Scale) AS BIGINT)) AS qv
       |  FROM embeddings),
       |cells AS (
       |  SELECT ii.i AS i, jj.j AS j,
       |    CAST(SUM(qv[CAST(ii.i + 1 AS INTEGER)]
       |            * qv[CAST(jj.j + 1 AS INTEGER)]) AS BIGINT) AS s
       |  FROM q, range(0, $D) ii(i), range(0, $D) jj(j)
       |  WHERE jj.j <= ii.i GROUP BY 1, 2),
       |sums AS (
       |  SELECT ii.i AS i, CAST(-1 AS BIGINT) AS j,
       |    CAST(SUM(qv[CAST(ii.i + 1 AS INTEGER)]) AS BIGINT) AS s
       |  FROM q, range(0, $D) ii(i) GROUP BY 1, 2)
       |SELECT i, j, s FROM cells UNION ALL SELECT i, j, s FROM sums
       |ORDER BY i, j""".stripMargin

  /** Stage 2: covariance eigensolve from the exact integer Gram.
    * Returns (components[k][d] — unit vectors, eigenvalues[k] of the
    * covariance in quantized units). Deterministic: exact integer
    * input, fixed 1000 power iterations per component with Hotelling
    * deflation, e_argmax-diag start, first-nonzero-positive sign. */
  private[graft] def eigensolve(gramPacked: Array[Long], sums: Array[Long],
      n: Long): (Array[Array[Double]], Array[Double]) = {
    require(n > 1, s"PCA needs >= 2 rows, got $n")
    val c = Array.ofDim[Double](D, D)
    var p = 0
    var i = 0
    while (i < D) {
      var j = 0
      while (j <= i) {
        // centered covariance: (G_ij - S_i * S_j / n) / n
        val v = (gramPacked(p).toDouble - sums(i).toDouble * sums(j).toDouble / n) / n
        c(i)(j) = v; c(j)(i) = v
        j += 1; p += 1
      }
      i += 1
    }
    val comps = Array.ofDim[Double](K, D)
    val eigs = new Array[Double](K)
    var k = 0
    while (k < K) {
      // start at the basis vector of the largest remaining diagonal —
      // deterministic and never orthogonal to the dominant eigenvector
      // of a PSD matrix with that diagonal
      var start = 0
      var best = Double.NegativeInfinity
      i = 0
      while (i < D) { if (c(i)(i) > best) { best = c(i)(i); start = i }; i += 1 }
      val v = new Array[Double](D)
      v(start) = 1.0
      var it = 0
      while (it < 1000) {
        val w = new Array[Double](D)
        i = 0
        while (i < D) {
          var s = 0.0
          var j = 0
          while (j < D) { s += c(i)(j) * v(j); j += 1 }
          w(i) = s
          i += 1
        }
        // re-orthogonalize against the found components every step:
        // deflation alone leaves O(gap^-1) cross-talk on clustered
        // spectra (near-isotropic embeddings!), while explicit
        // Gram-Schmidt keeps orthogonality at machine precision by
        // construction regardless of eigengaps
        var kk = 0
        while (kk < k) {
          val u = comps(kk)
          var d0 = 0.0
          i = 0
          while (i < D) { d0 += u(i) * w(i); i += 1 }
          i = 0
          while (i < D) { w(i) -= d0 * u(i); i += 1 }
          kk += 1
        }
        var norm = 0.0
        i = 0
        while (i < D) { norm += w(i) * w(i); i += 1 }
        norm = math.sqrt(norm)
        if (norm == 0.0) it = 1000
        else {
          i = 0
          while (i < D) { v(i) = w(i) / norm; i += 1 }
        }
        it += 1
      }
      // sign convention: first component with |v_i| > 1e-9 is positive
      i = 0
      while (i < D && math.abs(v(i)) <= 1e-9) i += 1
      if (i < D && v(i) < 0) { var j = 0; while (j < D) { v(j) = -v(j); j += 1 } }
      // Rayleigh quotient = eigenvalue
      var lam = 0.0
      i = 0
      while (i < D) {
        var s = 0.0
        var j = 0
        while (j < D) { s += c(i)(j) * v(j); j += 1 }
        lam += v(i) * s
        i += 1
      }
      comps(k) = v
      eigs(k) = lam
      // Hotelling deflation
      i = 0
      while (i < D) {
        var j = 0
        while (j < D) { c(i)(j) -= lam * v(i) * v(j); j += 1 }
        i += 1
      }
      k += 1
    }
    (comps, eigs)
  }

  /** Train from the data (one aggregation + driver solve), memoized per
    * input lineage like the IVF/PQ quantizers. Returns quantized integer
    * components `floor(c * 2^20)` — what both plans inline. */
  private[operators] def trainedComponents(emb: DataFrame): Array[Array[Long]] =
    ModelStaging.memo(emb, s"pca:v2-gs1000:$D:$K") {
      val spark = emb.sparkSession
      graft.functions.VectorFunctions.ensureRegistered(spark)
      val row = emb.agg(
        call_function("gram_lower", col("embedding"), lit(D)).as("g"),
        count(lit(1)).as("n")).head()
      val packed = row.getSeq[Long](0).toArray
      val n = row.getLong(1)
      // exact integer column sums (same quantization as the Gram)
      val sums = emb
        .select(posexplode(col("embedding")).as(Seq("pos", "x")))
        .groupBy(col("pos"))
        .agg(sum(floor(col("x").cast("double") * Scale).cast("long")).as("s"))
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      val sumArr = Array.tabulate(D)(i => sums.getOrElse(i, 0L))
      val (comps, _) = eigensolve(packed, sumArr, n)
      comps.map(_.map(x => math.floor(x * Scale).toLong))
    }

  /** Stage 3 surface: every vector's integer scores on the top-k
    * components — a codegen'd literal dot product per component. Also
    * publishes the matching oracle SQL (same literals) to
    * [[dynamicOracle]]: the driver writes oracle_sql.json AFTER the
    * query sweep, so the json carries the literals of the model the
    * sweep actually scored with. */
  def project(emb: DataFrame): DataFrame = {
    val qc = trainedComponents(emb)
    sqlRegistry.set(Some(projectSql(qc)))
    val qv = transform(col("embedding"),
      x => floor(x.cast("double") * Scale).cast("long"))
    val withQ = emb.select(col("vec_id"), qv.as("qv"))
    val scoreCols: Seq[Column] = (0 until K).map { k =>
      (0 until D).map(i =>
        element_at(col("qv"), i + 1) * lit(qc(k)(i))).reduce(_ + _).as(s"p$k")
    }
    withQ.select(col("vec_id") +: scoreCols: _*)
  }

  /** The projection oracle exists only once a model has been trained in
    * this JVM (the eigensolve is a driver float step no static SQL can
    * replay; the LITERAL verification of its application is the oracle,
    * the RandomProjection discipline). Before training the entry is
    * absent and the driver records a rows-only check for that run. */
  private val sqlRegistry =
    new java.util.concurrent.atomic.AtomicReference[Option[String]](None)

  def dynamicOracle: Map[String, String] =
    sqlRegistry.get().map("embed_pca_project" -> _).toMap

  private def projectSql(qc: Array[Array[Long]]): String = {
    val qv = s"list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * $Scale) AS BIGINT))"
    val scores = (0 until K).map { k =>
      (0 until D).map(i => s"qv[${i + 1}] * (${qc(k)(i)})").mkString(" + ") + s" AS p$k"
    }.mkString(",\n  ")
    s"""SELECT vec_id,
       |  $scores
       |FROM (SELECT vec_id, $qv AS qv FROM embeddings)
       |ORDER BY vec_id""".stripMargin
  }
}
