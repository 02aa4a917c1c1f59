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

  /** Top-k most target-like docs: (doc_id, n_grams, importance_milli).
    * `targetSource` designates the curated slice whose token
    * distribution the selection should match. */
  def dsirTopK(docs: DataFrame, targetSource: String,
      buckets: Int = 1024, k: Int = 100): DataFrame = {
    val toks = docs.filter(col("text").isNotNull)
      .select(col("doc_id"), col("source"),
        explode(regexp_extract_all(lower(col("text")),
          lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0))).as("tok"))
      .select(col("doc_id"), col("source"),
        pmod(Dedup.hash64Col(col("tok")), lit(buckets.toLong)).as("bucket"))
    val docTallies = toks.groupBy("doc_id", "bucket")
      .agg(count(lit(1)).as("c"))
    val raw = toks.groupBy("bucket").agg(count(lit(1)).as("r"))
    val tgt = toks.filter(col("source") === targetSource)
      .groupBy("bucket").agg(count(lit(1)).as("t"))
    val totals = raw.agg(sum("r").as("rtot"))
      .crossJoin(tgt.agg(sum("t").as("ttot")))
    val model = raw.join(tgt, Seq("bucket"), "left")
      .na.fill(0L, Seq("t"))
      .crossJoin(broadcast(totals))
      .select(col("bucket"),
        expr(s"(1000000 * (t + 1)) DIV (ttot + $buckets)").as("t_ppm"),
        expr(s"(1000000 * (r + 1)) DIV (rtot + $buckets)").as("r_ppm"))
      .select(col("bucket"),
        expr("(1000 * t_ppm) DIV greatest(r_ppm, 1)").as("ratio_milli"))
    docTallies.join(broadcast(model), Seq("bucket"))
      .groupBy("doc_id")
      .agg(sum("c").as("n_grams"),
        expr("SUM(c * ratio_milli) DIV SUM(c)").as("importance_milli"))
      .orderBy(col("importance_milli").desc, col("doc_id"))
      .limit(k)
  }

  /** DuckDB replay of [[dsirTopK]] — identical hash, buckets, ladder. */
  def dsirTopKSql(targetSource: String, buckets: Int = 1024,
      k: Int = 100): String = {
    val h = OracleSql.hex64Signed("md5(tok)")
    s"""WITH toks AS (
       |  SELECT doc_id, source,
       |    ((($h) % $buckets) + $buckets) % $buckets AS bucket
       |  FROM (
       |    SELECT doc_id, source, unnest(regexp_extract_all(lower(text),
       |      '[a-z]+|[0-9]+|[^a-z0-9\\s]')) AS tok
       |    FROM documents WHERE text IS NOT NULL)
       |), dt AS (
       |  SELECT doc_id, bucket, COUNT(*) AS c FROM toks GROUP BY doc_id, bucket
       |), raw AS (
       |  SELECT bucket, COUNT(*) AS r FROM toks GROUP BY bucket
       |), tgt AS (
       |  SELECT bucket, COUNT(*) AS t FROM toks
       |  WHERE source = '$targetSource' GROUP BY bucket
       |), totals AS (
       |  SELECT (SELECT SUM(r) FROM raw) AS rtot, (SELECT SUM(t) FROM tgt) AS ttot
       |), model AS (
       |  SELECT raw.bucket,
       |    (1000 * ((1000000 * (COALESCE(tgt.t, 0) + 1)) // (ttot + $buckets))) //
       |      greatest((1000000 * (raw.r + 1)) // (rtot + $buckets), 1) AS ratio_milli
       |  FROM raw LEFT JOIN tgt ON raw.bucket = tgt.bucket CROSS JOIN totals
       |)
       |SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_grams,
       |  CAST(SUM(c * ratio_milli) // SUM(c) AS BIGINT) AS importance_milli
       |FROM dt JOIN model USING (bucket)
       |GROUP BY doc_id
       |ORDER BY importance_milli DESC, doc_id LIMIT $k""".stripMargin
  }
}
