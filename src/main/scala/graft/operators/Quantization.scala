package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Embedding compression for at-scale similarity search: scalar int8
  * quantization (4x memory cut, the standard serving format) and product
  * quantization (PQ — FAISS's billion-scale code layout: the vector is
  * split into `m` subspaces, each quantized against its own small
  * codebook, so a 64-float vector becomes `m` one-byte codes, a 32x cut).
  * Together with `IvfAnn` this is the IVF-PQ layout that makes 100 TB of
  * embeddings searchable: cells prune the scan, codes shrink residency.
  *
  * Beyond-reference surface (the reference stores full float32
  * embeddings only, `utils.py:44-49`).
  *
  * Determinism contracts (what makes both full hash oracles):
  *  - int8: `q = floor(x * 127 / maxabs + 0.5)` runs on exact float32 ->
  *    float64 promotions; `maxabs` is an order-independent MAX; every
  *    engine computes the identical IEEE double expression, and the
  *    output is integers only.
  *  - PQ: each subspace codebook is the SAME deterministic integer Lloyd
  *    as `IvfAnn` (md5-ordered seeds, `floor(x*2^20)` quantized exact
  *    integer arithmetic), run over the subspace slice; assignment
  *    tie-breaks on code index. No float accumulation order anywhere.
  *
  * Scale shape:
  *  - int8 is a narrow per-row expression — zero shuffle;
  *  - PQ trains m tiny codebooks (map-side-combinable integer sums — the
  *    corpus is aggregated, never shuffled), then ONE narrow encode pass
  *    with all m codebooks broadcast (m * nCells * subDim longs — KBs);
  *    at 100 TB you would train on a sample instead of the full corpus
  *    (codebooks need ~100k vectors), which drops the training scans to
  *    a constant — the encode pass is the only full read either way.
  */
object Quantization {

  // ------------------------------------------------ int8 scalar quantize
  /** Symmetric per-vector int8 quantization: `scale = maxabs(v)`,
    * `q_i = round_half_up(v_i * 127 / scale)` in [-127, 127]. Output is
    * exploded to scalar rows (vec_id, i, q, scale_q) — integer-only;
    * `scale_q = floor(scale * 2^20)` carries the dequant factor through
    * the integer-only oracle surface (production would keep the double
    * alongside; the parquet payload is the same 8 bytes per row). */
  def int8(embeddings: DataFrame): DataFrame = {
    val maxabs = aggregate(
      transform(col("embedding"), x => abs(x.cast("double"))),
      lit(0.0), (a, x) => greatest(a, x))
    embeddings
      .select(col("vec_id"), col("embedding"), maxabs.as("maxabs"))
      .select(col("vec_id"), col("maxabs"),
        posexplode(col("embedding")).as(Seq("i", "x")))
      .select(
        col("vec_id"),
        col("i").cast("long").as("i"),
        when(col("maxabs") === 0.0, 0L)
          .otherwise(floor(col("x").cast("double") * lit(127.0) / col("maxabs")
            + lit(0.5)).cast("long")).as("q"),
        floor(col("maxabs") * lit(1048576.0)).cast("long").as("scale_q"))
      .orderBy("vec_id", "i")
  }

  /** DuckDB replay of [[int8]]: the identical IEEE double expression over
    * the same float32 values. */
  def int8Sql(dim: Int = 64): String =
    s"""WITH v AS (SELECT vec_id, embedding FROM embeddings),
       |mx AS (SELECT vec_id, MAX(ABS(CAST(u.e AS DOUBLE))) AS maxabs
       |       FROM v, UNNEST(embedding) AS u(e) GROUP BY vec_id)
       |SELECT v.vec_id, CAST(ri.i AS BIGINT) AS i,
       |  CAST(CASE WHEN mx.maxabs = 0 THEN 0
       |    ELSE floor(CAST(embedding[CAST(ri.i + 1 AS INTEGER)] AS DOUBLE)
       |      * 127.0 / mx.maxabs + 0.5) END AS BIGINT) AS q,
       |  CAST(floor(mx.maxabs * 1048576.0) AS BIGINT) AS scale_q
       |FROM v JOIN mx USING (vec_id), range($dim) AS ri(i)
       |ORDER BY vec_id, i""".stripMargin

  // -------------------------------------------- product quantization
  /** PQ codes: split each embedding into `m` contiguous subspaces of
    * `dim/m` floats; train one `nCells`-entry codebook per subspace with
    * [[IvfAnn.trainCentroids]] (deterministic integer Lloyd) over that
    * slice of the corpus; encode = nearest codebook entry per subspace
    * (exact integer L2, ties to the lower code). Output: one row per
    * (vec_id, subspace) with the assigned `code` — integer-only.
    *
    * The encode is ONE narrow mapPartitions pass with all m codebooks
    * broadcast; the corpus is never shuffled. */
  def pqCodes(embeddings: DataFrame, m: Int = 8, nCells: Int = 16,
      iters: Int = 2): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val dim = embeddings.select(size(col("embedding"))).first().getInt(0)
    require(dim % m == 0, s"dim $dim not divisible by m $m")
    val sub = dim / m

    // m small training aggregations (sliced corpus, integer sums combine
    // map-side); at scale these run over a sample — see scaladoc
    val codebooks: Array[Array[Array[Long]]] = (0 until m).toArray.map { s =>
      val sliced = embeddings.select(col("vec_id"),
        slice(col("embedding"), s * sub + 1, sub).as("embedding"))
      IvfAnn.trainCentroids(sliced, nCells, iters)
    }
    val bc = spark.sparkContext.broadcast(codebooks)

    embeddings.select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])]
      .mapPartitions { it =>
        val cbs = bc.value
        val mm = cbs.length
        it.flatMap { case (id, v) =>
          val q = IvfAnn.quantize(v)
          (0 until mm).iterator.map { s =>
            val slice = java.util.Arrays.copyOfRange(q, s * sub, (s + 1) * sub)
            (id, s.toLong, IvfAnn.nearestCell(cbs(s), slice).toLong)
          }
        }
      }
      .toDF("vec_id", "subspace", "code")
      .orderBy("vec_id", "subspace")
  }

  /** DuckDB replay of [[pqCodes]]: m prefixed copies of the IVF
    * assignment CTE chain, each over its subspace slice, unioned. */
  def pqCodesSql(dim: Int = 64, m: Int = 8, nCells: Int = 16,
      iters: Int = 2): String = {
    require(dim % m == 0)
    val sub = dim / m
    val ctes = (0 until m)
      .map(s => IvfAnn.assignCtesSql(sub, nCells, iters,
        offset = s * sub, prefix = s"p${s}_"))
      .mkString(",\n")
    val arms = (0 until m)
      .map(s => s"SELECT vec_id, CAST($s AS BIGINT) AS subspace, cell AS code FROM p${s}_assigned")
      .mkString("\nUNION ALL\n")
    s"""WITH $ctes
       |SELECT vec_id, subspace, code FROM ($arms)
       |ORDER BY vec_id, subspace""".stripMargin
  }
}
