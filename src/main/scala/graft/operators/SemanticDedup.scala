package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions

/** Semantic (embedding-space) deduplication — the SemDeDup shape (Abbas
  * et al. 2023, arXiv:2303.09540): cluster the corpus embeddings with a
  * coarse k-means quantizer, compare pairs only WITHIN a cell, and
  * collapse connected near-duplicate groups to one representative. This
  * catches paraphrases and re-encodings that lexical dedup (MinHash /
  * SimHash over shingles) structurally cannot, and is the standard
  * web-scale recipe precisely because the quadratic step is confined to
  * cells: expected pair cost is n^2 * nProbe^2 / nCells (vs n^2
  * all-pairs), so holding avg cell size constant by growing nCells with
  * the corpus keeps per-cell work flat — at 100 TB, nCells scales to
  * ~n/1000 and the cell self-join is an equi-join shuffle, never a
  * cartesian.
  *
  * MULTI-PROBE assignment (the recall lever): each vector enters its
  * `nProbe` nearest cells, and a pair is a candidate if ANY probed cell
  * is shared. Single-cell assignment splits near-dups that straddle a
  * cell boundary — on similarity tails (like the testdata's, where
  * near-dup cosine sits just above background) boundary pairs are the
  * COMMON case, not the corner case. Candidate generation stays an
  * equi-join on cell id; bucket rows carry ids only, embeddings are
  * fetched back by id for the exact verify (the ann_lsh discipline —
  * the shuffled volume is nProbe id-rows per vector, never embeddings).
  *
  * Spark shape, all reused machinery:
  *  - quantizer = [[IvfAnn.trainCentroids]] (distributed deterministic
  *    integer Lloyd); probes = [[IvfAnn.probeCells]] (narrow map,
  *    centroids broadcast);
  *  - candidate pairs = probe-cell self-equi-join, distinct on id pair,
  *    exact-verified by the codegen'd `vector_cosine` expression at
  *    threshold tau;
  *  - clusters = [[DedupComponents.components]] min-label propagation
  *    (near-dup similarity is not transitive; retention needs closure).
  *
  * Determinism: the quantizer is md5-seeded integer arithmetic, probe
  * order is exact integer distance with index tie-break, and the verify
  * is exact double cosine in index order — so DuckDB replays the
  * identical cells, probes, pairs, and components: a FULL hash oracle
  * despite the operator being "approximate" (recall < 1 only relative
  * to all-pairs; the computed result itself is bit-stable).
  */
object SemanticDedup {

  /** Near-duplicate pairs at cosine >= tau among vectors sharing any of
    * their `nProbe` probed cells. Output: (doc_a, doc_b), doc_a < doc_b. */
  def pairs(embeddings: DataFrame, nCells: Int = 16, nProbe: Int = 4,
      iters: Int = 2, tau: Double = 0.45): DataFrame = {
    val spark = embeddings.sparkSession
    val centroids = IvfAnn.trainCentroids(embeddings, nCells, iters)
    val probes = IvfAnn.probeCells(embeddings, centroids, nProbe)
      .select(col("cell"), col("vec_id"))
    // id-only candidate pairs; distinct because a pair can share several
    // probed cells
    val cand = probes.select(col("cell"), col("vec_id").as("doc_a"))
      .join(probes.select(col("cell"), col("vec_id").as("doc_b")), Seq("cell"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b")
      .distinct()
    // fetch embeddings back by id for the exact verify
    val vecs = embeddings.select(col("vec_id"), col("embedding"))
    cand
      .join(vecs.select(col("vec_id").as("doc_a"), col("embedding").as("emb_a")), "doc_a")
      .join(vecs.select(col("vec_id").as("doc_b"), col("embedding").as("emb_b")), "doc_b")
      .filter(VectorFunctions.cosine(spark, col("emb_a"), col("emb_b")) >= tau)
      .select("doc_a", "doc_b")
  }

  /** Semantic near-duplicate clusters: (doc_id, component_id,
    * component_size) for every vector in at least one verified pair;
    * component_id = min vec_id doubles as the kept representative. */
  def clusters(embeddings: DataFrame, nCells: Int = 16, nProbe: Int = 4,
      iters: Int = 2, tau: Double = 0.45): DataFrame =
    DedupComponents.components(pairs(embeddings, nCells, nProbe, iters, tau))

  /** DuckDB replay of [[pairs]]: same quantizer training + probes
    * (shared CTE prefix with the IVF oracle), same exact cosine verify. */
  def pairsSql(dim: Int, nCells: Int = 16, nProbe: Int = 4, iters: Int = 2,
      tau: Double = 0.45): String =
    s"""WITH ${IvfAnn.assignCtesSql(dim, nCells, iters)},
       |probes AS (SELECT vec_id, c AS cell FROM (
       |    SELECT vec_id, c, ROW_NUMBER() OVER (
       |      PARTITION BY vec_id ORDER BY dist, c) AS rn FROM dF)
       |  WHERE rn <= $nProbe),
       |cand AS (SELECT DISTINCT a.vec_id AS doc_a, b.vec_id AS doc_b
       |  FROM probes a JOIN probes b ON b.cell = a.cell AND a.vec_id < b.vec_id)
       |SELECT c.doc_a, c.doc_b
       |FROM cand c
       |JOIN vecs va ON va.vec_id = c.doc_a
       |JOIN vecs vb ON vb.vec_id = c.doc_b
       |WHERE list_cosine_similarity(CAST(va.v AS DOUBLE[]),
       |                             CAST(vb.v AS DOUBLE[])) >= $tau""".stripMargin

  /** DuckDB replay of [[clusters]]: recursive-CTE closure over the same
    * pair set. */
  def clustersSql(dim: Int, nCells: Int = 16, nProbe: Int = 4,
      iters: Int = 2, tau: Double = 0.45): String =
    DedupComponents.componentsSql(
      s"SELECT doc_a, doc_b FROM (${pairsSql(dim, nCells, nProbe, iters, tau)})")
}
