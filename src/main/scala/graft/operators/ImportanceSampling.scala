package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** DSIR-style data selection via hashed-n-gram importance resampling
  * (Xie et al. 2023, "Data Selection for Language Models via Importance
  * Resampling"): estimate a target and a raw token distribution over
  * hashed feature buckets, weight each document by how target-like its
  * buckets are, keep the top-weighted slice. The canonical "make the
  * web corpus look like the curated domain" selection pass.
  *
  * Integer surrogate (the transcendental-free oracle discipline — DSIR's
  * log-likelihood ratio sum is replaced by the mean per-occurrence
  * probability ratio, monotone in the same direction):
  *
  *   t_ppm(b)   = (1e6 * (t_b + 1)) div (Ttot + B)     [add-one target]
  *   r_ppm(b)   = (1e6 * (r_b + 1)) div (Rtot + B)     [add-one raw]
  *   ratio_milli(b) = (1000 * t_ppm) div greatest(r_ppm, 1)
  *   importance_milli(d) = SUM over d's occurrences of ratio_milli(bucket)
  *                         div n_grams(d)
  *
  * Every rung is BIGINT with non-negative operands (Spark DIV == DuckDB
  * `//`); normalizing to ppm BEFORE the ratio bounds every intermediate
  * (t_ppm <= 1e6, ratio <= 1e9) regardless of corpus size, so the ladder
  * never overflows at 100 TB totals.
  *
  * The operator splits MODEL from SCORING — the serving seam: the bucket
  * model is a maintained B-row asset trained once on the standing
  * corpus ([[bucketModel]] materializes ALL B buckets, zero-count ones
  * at the add-one floor, so scoring never meets an unseen bucket), and
  * [[scoreAgainst]] is a per-doc function of (doc, model) alone — which
  * is what lets the streaming twin chop arrivals into micro-batches
  * without changing a single score.
  *
  * Scale shape:
  *  - tokens hash into `buckets` cells via the engine-portable
  *    md5-derived key ([[Dedup.hash64Col]]) — the hashing trick keeps
  *    the model tables FIXED-SIZE (<= B rows each) no matter the corpus;
  *  - one (doc, bucket) tally shuffle is the only corpus-volume
  *    movement; bucket totals are map-side-combinable B-row aggregates;
  *  - the B-row model broadcasts into the scoring join; totals ride as
  *    a broadcast 1-row cross join;
  *  - the selection cut is a TakeOrderedAndProject (per-partition
  *    heaps), total (importance DESC, doc_id) order so the boundary is
  *    deterministic in both engines.
  */
object ImportanceSampling {

  /** (doc_id, source, bucket) stream: one row per token occurrence. */
  private def hashedToks(docs: DataFrame, buckets: Int): DataFrame =
    docs.filter(col("text").isNotNull)
      .select(col("doc_id"), col("source"),
        explode(regexp_extract_all(lower(col("text")),
          lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0))).as("tok"))
      .select(col("doc_id"), col("source"),
        pmod(Dedup.hash64Col(col("tok")), lit(buckets.toLong)).as("bucket"))

  /** The standing B-row model: (bucket, ratio_milli) for EVERY bucket in
    * [0, B) — zero-count buckets carry the add-one floor, so any future
    * document scores without a missing-key case. `targetSource`
    * designates the curated slice whose token distribution the selection
    * should match. */
  def bucketModel(docs: DataFrame, targetSource: String,
      buckets: Int = 1024): DataFrame = {
    // ONE corpus pass: raw and target counts as a conditional agg over
    // the same scan (not two groupBys whose lineages each rescan the
    // corpus)
    val counts = hashedToks(docs, buckets)
      .groupBy("bucket")
      .agg(count(lit(1)).as("r"),
        count(when(col("source") === targetSource, 1)).as("t"))
    modelFromCounts(docs.sparkSession, counts, buckets)
  }

  /** The add-one ratio ladder over per-bucket (r, t) tallies: totals ride
    * as unpartitioned windows over the <= B-row joined frame (the repo's
    * tiny-cells-table marginals pattern) — so no second corpus
    * derivation and no persist is needed. */
  private def modelFromCounts(spark: org.apache.spark.sql.SparkSession,
      counts: DataFrame, buckets: Int): DataFrame = {
    val all = org.apache.spark.sql.expressions.Window
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.unboundedFollowing)
    spark.range(buckets).select(col("id").as("bucket"))
      .join(counts, Seq("bucket"), "left")
      .na.fill(0L, Seq("r", "t"))
      .withColumn("rtot", sum("r").over(all))
      .withColumn("ttot", sum("t").over(all))
      .select(col("bucket"),
        expr(s"(1000000 * (t + 1)) DIV (ttot + $buckets)").as("t_ppm"),
        expr(s"(1000000 * (r + 1)) DIV (rtot + $buckets)").as("r_ppm"))
      .select(col("bucket"),
        expr("(1000 * t_ppm) DIV greatest(r_ppm, 1)").as("ratio_milli"))
  }

  /** Score docs against a standing model: (doc_id, n_grams,
    * importance_milli). Pure per-doc function of (doc, model) — the
    * micro-batch-invariance contract the streaming twin relies on. */
  def scoreAgainst(model: DataFrame, docs: DataFrame,
      buckets: Int = 1024): DataFrame =
    hashedToks(docs, buckets).groupBy("doc_id", "bucket")
      .agg(count(lit(1)).as("c"))
      .join(broadcast(model), Seq("bucket"))
      .groupBy("doc_id")
      .agg(sum("c").as("n_grams"),
        expr("SUM(c * ratio_milli) DIV SUM(c)").as("importance_milli"))

  /** Top-k most target-like docs, model trained on the same corpus —
    * the one-shot batch selection pass.
    *
    * SINGLE corpus pass (VERDICT r11 #1): unlike the serving split
    * (where model and scored docs genuinely differ), the batch form
    * scores the training corpus itself, so the per-(doc, source, bucket)
    * tally is aggregated ONCE and both the model's per-bucket (r, t)
    * marginals and the per-doc scoring tallies are rollups of that same
    * shuffled aggregate — the branches share the exchange byte-for-byte
    * (no Filter in between, every branch consumes the full output), so
    * ReusedExchange runs the scan + tokenizer once (PlanSpec gate). */
  def dsirTopK(docs: DataFrame, targetSource: String,
      buckets: Int = 1024, k: Int = 100): DataFrame = {
    val g = hashedToks(docs, buckets)
      .groupBy("doc_id", "source", "bucket").agg(count(lit(1)).as("c"))
    val counts = g.groupBy("bucket")
      .agg(sum("c").as("r"),
        sum(when(col("source") === targetSource, col("c")).otherwise(0L)).as("t"))
    val model = modelFromCounts(docs.sparkSession, counts, buckets)
    g.groupBy("doc_id", "bucket").agg(sum("c").as("c"))
      .join(broadcast(model), Seq("bucket"))
      .groupBy("doc_id")
      .agg(sum("c").as("n_grams"),
        expr("SUM(c * ratio_milli) DIV SUM(c)").as("importance_milli"))
      .orderBy(col("importance_milli").desc, col("doc_id"))
      .limit(k)
  }

  /** Shared CTE prelude: model over `modelPred` docs, scoring tallies
    * over `scorePred` docs — identical hash, buckets, ladder. */
  private def dsirCtes(targetSource: String, buckets: Int,
      modelPred: String, scorePred: String): String = {
    val h = OracleSql.hex64Signed("md5(tok)")
    s"""WITH toks AS (
       |  SELECT doc_id, source,
       |    ((($h) % $buckets) + $buckets) % $buckets AS bucket
       |  FROM (
       |    SELECT doc_id, source, unnest(regexp_extract_all(lower(text),
       |      '[a-z]+|[0-9]+|[^a-z0-9\\s]')) AS tok
       |    FROM documents WHERE text IS NOT NULL)
       |), raw AS (
       |  SELECT bucket, COUNT(*) AS r FROM toks WHERE $modelPred GROUP BY bucket
       |), tgt AS (
       |  SELECT bucket, COUNT(*) AS t FROM toks
       |  WHERE ($modelPred) AND source = '$targetSource' GROUP BY bucket
       |), totals AS (
       |  SELECT (SELECT COALESCE(SUM(r), 0) FROM raw) AS rtot,
       |         (SELECT COALESCE(SUM(t), 0) FROM tgt) AS ttot
       |), model AS (
       |  SELECT b.bucket,
       |    (1000 * ((1000000 * (COALESCE(tgt.t, 0) + 1)) // (ttot + $buckets))) //
       |      greatest((1000000 * (COALESCE(raw.r, 0) + 1)) // (rtot + $buckets), 1)
       |      AS ratio_milli
       |  FROM (SELECT range AS bucket FROM range(0, $buckets)) b
       |  LEFT JOIN raw ON b.bucket = raw.bucket
       |  LEFT JOIN tgt ON b.bucket = tgt.bucket
       |  CROSS JOIN totals
       |), dt AS (
       |  SELECT doc_id, bucket, COUNT(*) AS c FROM toks
       |  WHERE $scorePred GROUP BY doc_id, bucket
       |), scored AS (
       |  SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_grams,
       |    CAST(SUM(c * ratio_milli) // SUM(c) AS BIGINT) AS importance_milli
       |  FROM dt JOIN model USING (bucket)
       |  GROUP BY doc_id
       |)""".stripMargin
  }

  /** DuckDB replay of [[dsirTopK]]. */
  def dsirTopKSql(targetSource: String, buckets: Int = 1024,
      k: Int = 100): String =
    s"""${dsirCtes(targetSource, buckets, "TRUE", "TRUE")}
       |SELECT doc_id, n_grams, importance_milli FROM scored
       |ORDER BY importance_milli DESC, doc_id LIMIT $k""".stripMargin

  /** DuckDB replay of the serving split: model on `modelPred` docs,
    * scores for `scorePred` docs (the streaming twin's oracle). */
  def dsirScoreSql(targetSource: String, modelPred: String,
      scorePred: String, buckets: Int = 1024): String =
    s"""${dsirCtes(targetSource, buckets, modelPred, scorePred)}
       |SELECT doc_id, n_grams, importance_milli FROM scored
       |ORDER BY doc_id""".stripMargin
}
