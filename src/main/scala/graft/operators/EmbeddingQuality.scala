package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Embedding-column validation — the ingest gate for every vector
  * operator (ANN, PQ, k-means, semantic dedup, PCA). A 100 TB embedding
  * feed WILL contain garbage: null rows from failed encoders, ragged
  * vectors from mixed model versions, NaN/Inf from fp16 overflow,
  * all-zero vectors from padding bugs. Each class poisons a different
  * downstream operator (zero vectors make cosine undefined, NaN
  * contaminates every distance it touches, ragged vectors crash fixed-
  * dim kernels), so the production posture is validate-then-assume:
  * classify every vector ONCE, route invalid ones out, and let the
  * vector operators run on a corpus they can trust.
  *
  * Verdict precedence (first failing class wins): null > empty >
  * ragged > nonfinite > zero > ok. All checks are narrow codegen'd
  * array expressions — no shuffle, no UDF — and every one replays in
  * DuckDB (isnan/isinf exist in both engines; the zero-norm check sums
  * SQUARES, so cancellation cannot fake a zero), making the full
  * verdict table a hash oracle.
  */
object EmbeddingQuality {

  /** The expected dimensionality: taken from the first valid vector by
    * id order — deterministic, and the right default when the feed is
    * SUPPOSED to be homogeneous (pass `dim` explicitly when the
    * contract says otherwise). Returns -1 (= "no expectation": the
    * ragged check is skipped) on a feed with no valid vector — the
    * all-garbage input this gate exists to classify must not crash it,
    * and the SQL replay's empty scalar subquery skips ragged the same
    * way (NULL comparisons). */
  def inferDim(vecs: DataFrame, col0: String = "embedding"): Int =
    vecs.filter(col(col0).isNotNull && size(col(col0)) > 0)
      .orderBy("vec_id").select(size(col(col0))).head(1)
      .headOption.map(_.getInt(0)).getOrElse(-1)

  // the ONE spelling of each check — validate (the classifier) and
  // valid (the router) must never disagree
  private def nonfiniteExpr = exists(col("embedding"),
    x => isnan(x) || x === lit(Float.PositiveInfinity) ||
      x === lit(Float.NegativeInfinity))
  private def sumSqExpr = aggregate(col("embedding"), lit(0.0),
    (acc, x) => acc + x.cast("double") * x.cast("double"))

  /** Per-vector verdict table: (vec_id, n_dims, verdict). `n_dims` is -1
    * for a NULL embedding (the oracle COALESCEs identically). */
  def validate(vecs: DataFrame, dim: Int): DataFrame = {
    val e = col("embedding")
    vecs.select(
      col("vec_id"),
      coalesce(size(e).cast("long"), lit(-1L)).as("n_dims"),
      when(e.isNull, "null")
        .when(size(e) === 0, "empty")
        .when(lit(dim >= 0) && size(e) =!= dim, "ragged")
        .when(nonfiniteExpr, "nonfinite")
        .when(sumSqExpr === 0.0, "zero")
        .otherwise("ok").as("verdict"))
  }

  /** The vectors downstream operators may assume: present, the right
    * shape, finite, and normalizable. */
  def valid(vecs: DataFrame, dim: Int): DataFrame = {
    val e = col("embedding")
    vecs.filter(e.isNotNull && size(e) === dim &&
      !nonfiniteExpr && sumSqExpr =!= 0.0)
  }

  /** Static-SQL replay: the expected dim is the same first-valid-by-id
    * derivation [[inferDim]] makes, inlined as a subquery. */
  val validateSql: String =
    s"""WITH d AS (
       |  SELECT len(embedding) AS dim FROM embeddings
       |  WHERE embedding IS NOT NULL AND len(embedding) > 0
       |  ORDER BY vec_id LIMIT 1)
       |SELECT vec_id,
       |  COALESCE(CAST(len(embedding) AS BIGINT), -1) AS n_dims,
       |  CASE WHEN embedding IS NULL THEN 'null'
       |       WHEN len(embedding) = 0 THEN 'empty'
       |       WHEN len(embedding) <> (SELECT dim FROM d) THEN 'ragged'
       |       WHEN len(list_filter(embedding, x -> isnan(x) OR isinf(x))) > 0
       |         THEN 'nonfinite'
       |       WHEN list_sum(list_transform(embedding,
       |              x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) = 0 THEN 'zero'
       |       ELSE 'ok' END AS verdict
       |FROM embeddings ORDER BY vec_id""".stripMargin
}
