package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Feature-hashing text vectorization — the bridge from the documents
  * table into the vector family without a model: each document becomes a
  * fixed-dim vector by hashing tokens into buckets (the "hashing trick",
  * Weinberger et al. 2009), signed to debias collisions, weighted by
  * tf x integer-idf (the transcendental-free `n_docs DIV df` surrogate
  * the search and tf-idf operators already use).
  *
  * Everything stays in INTEGER space until the final cast — token hash
  * is the engine-portable md5-derived 64-bit key ([[Dedup.hash64Col]]),
  * bucket is pmod, sign is a hash bit, weights and cell sums are exact
  * BIGINT — so both the sparse table and the dense vectors replay
  * bit-for-bit in DuckDB, and the downstream cosine sees IDENTICAL
  * floats in both engines.
  *
  * Scale shape: tf is one (doc, token) aggregate, df one token
  * aggregate (both map-side combinable), the cell sum one (doc, bucket)
  * aggregate — three bounded shuffles, no UDF; the dense assembly is a
  * narrow per-doc map over at most `dim` cells. NULL text vectorizes to
  * nothing (the family's shingle rule).
  */
object TextVectorize {

  /** Sparse hashed tf-idf cells: (doc_id, bucket, weight), weight =
    * SUM over the bucket's tokens of sign(h) * tf * (n_docs DIV df). */
  def hashVectors(docs: DataFrame, dim: Int = 64): DataFrame = {
    val nDocs = docs.count()
    val toks = docs.filter(col("text").isNotNull)
      .select(col("doc_id"),
        explode(split(trim(col("text")), "\\s+")).as("tok"))
    val tf = toks.groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
    // df DERIVES from tf (one row per (doc, tok) already): a row count
    // per token — not a second countDistinct pass over the exploded
    // corpus, which would re-run the scan+explode end to end
    val df = tf.groupBy("tok").agg(count(lit(1)).as("df"))
    tf.join(df, "tok")
      .select(
        col("doc_id"),
        Dedup.hash64Col(col("tok")).as("h"),
        // DIV, not `/`-then-cast: a double quotient at an exact integer
        // boundary could truncate off the oracle's exact floor (`//`)
        expr(s"tf * (${nDocs}L DIV df)").as("wt"))
      .select(
        col("doc_id"),
        pmod(col("h"), lit(dim.toLong)).as("bucket"),
        (when((shiftright(col("h"), 1).bitwiseAND(lit(1L))) === 0L, 1L)
          .otherwise(-1L) * col("wt")).as("signed_wt"))
      .groupBy("doc_id", "bucket")
      .agg(sum(col("signed_wt")).as("weight"))
  }

  def hashVectorsSql(dim: Int = 64): String = {
    val h = OracleSql.hex64Signed("md5(tok)")
    s"""WITH toks AS (
       |  SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS tok
       |  FROM documents WHERE text IS NOT NULL),
       |n AS (SELECT COUNT(*) AS n_docs FROM documents),
       |tf AS (SELECT doc_id, tok, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
       |df AS (SELECT tok, COUNT(*) AS df FROM tf GROUP BY 1),
       |w AS (
       |  SELECT tf.doc_id,
       |    ((($h) % $dim) + $dim) % $dim AS bucket,
       |    (CASE WHEN (($h >> 1) & 1) = 0 THEN 1 ELSE -1 END)
       |      * tf.tf * (n.n_docs // df.df) AS signed_wt
       |  FROM tf JOIN df USING (tok) CROSS JOIN n)
       |SELECT doc_id, CAST(bucket AS BIGINT) AS bucket,
       |  CAST(SUM(signed_wt) AS BIGINT) AS weight
       |FROM w GROUP BY 1, 2 ORDER BY doc_id, bucket""".stripMargin
  }

  /** Dense (vec_id, embedding ARRAY<FLOAT>) assembly of [[hashVectors]]
    * — the typed handoff into the ANN operators (same contract as
    * [[Multimodal.featureEmbeddings]]). Cell sums are exact BIGINTs in
    * both engines before ONE float cast, so the vectors are
    * bit-identical. */
  def denseVectors(docs: DataFrame, dim: Int = 64): DataFrame =
    hashVectors(docs, dim)
      .groupBy(col("doc_id").as("vec_id"))
      .agg(map_from_entries(collect_list(struct(col("bucket"), col("weight"))))
        .as("cells"))
      .select(col("vec_id"),
        transform(sequence(lit(0L), lit(dim - 1L)),
          b => coalesce(element_at(col("cells"), b), lit(0L)).cast("float"))
          .as("embedding"))

  /** The `vecs AS (...)` CTE fragment of [[denseVectors]] for consumers'
    * oracles: dense per-doc lists from the sparse cells via a
    * (doc x range(dim)) scaffold. */
  def denseVecsCteSql(dim: Int = 64): String = {
    val h = OracleSql.hex64Signed("md5(tok)")
    s"""toks AS (
       |  SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS tok
       |  FROM documents WHERE text IS NOT NULL),
       |n AS (SELECT COUNT(*) AS n_docs FROM documents),
       |tf AS (SELECT doc_id, tok, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
       |df AS (SELECT tok, COUNT(*) AS df FROM tf GROUP BY 1),
       |w AS (
       |  SELECT tf.doc_id,
       |    ((($h) % $dim) + $dim) % $dim AS bucket,
       |    (CASE WHEN (($h >> 1) & 1) = 0 THEN 1 ELSE -1 END)
       |      * tf.tf * (n.n_docs // df.df) AS signed_wt
       |  FROM tf JOIN df USING (tok) CROSS JOIN n),
       |cells AS (SELECT doc_id, bucket, SUM(signed_wt) AS v FROM w GROUP BY 1, 2),
       |vecs AS (
       |  SELECT d.doc_id AS vec_id,
       |    list(CAST(COALESCE(c.v, 0) AS FLOAT) ORDER BY b.b) AS embedding
       |  FROM (SELECT DISTINCT doc_id FROM cells) d
       |  CROSS JOIN range($dim) AS b(b)
       |  LEFT JOIN cells c ON c.doc_id = d.doc_id AND c.bucket = b.b
       |  GROUP BY d.doc_id)""".stripMargin
  }

  /** Near-duplicate pairs over the hashed vectors at cosine >= tau —
    * the cheap model-free semantic-ish dedup a pipeline runs when
    * embeddings don't exist yet. Exact all-pairs spelling (cap-guarded,
    * the oracle carrier — [[SimilaritySearch.cosineNearDupLsh]] is the
    * demonstrated scale path for the same vector shape).
    *
    * Corpus caveat (same class as clf_quality_vocab's documented
    * flatness): the sf testdata's ~31-token homogeneous vocabulary makes
    * BAG-cosine a weak separator there — most docs share most tokens, so
    * bag similarity is high corpus-wide and order-sensitive near-dups
    * don't stand out. On lexically separable text the operator is sharp:
    * AdversarialDocsSpec proves the planted near-dup pair scores above
    * every cross-vocabulary pair. */
  def hashVecNearDup(docs: DataFrame, dim: Int = 64,
      tau: Double = 0.9): DataFrame = {
    val vecs = denseVectors(docs, dim).persist()
    val out = graft.CacheScope.register(
      SimilaritySearch.cosineNearDupExact(vecs, tau)
        .select(col("vec_a").as("doc_a"), col("vec_b").as("doc_b"))
        .persist())
    out.count()
    vecs.unpersist()
    // release the (materialized) result cache on the CALLER's first
    // action — a pinned-forever block per invocation otherwise (the
    // registry doubles as the drain-race backstop)
    SimilaritySearch.unpersistAfterFirstAction(out)
    out
  }

  def hashVecNearDupSql(dim: Int = 64, tau: Double = 0.9): String =
    s"""WITH ${denseVecsCteSql(dim)}
       |SELECT a.vec_id AS doc_a, b.vec_id AS doc_b
       |FROM vecs a JOIN vecs b ON a.vec_id < b.vec_id
       |WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
       |                             CAST(b.embedding AS DOUBLE[])) >= $tau
       |ORDER BY doc_a, doc_b""".stripMargin
}
