package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-trained bigram language-model fluency scoring — the integer
  * relative of CCNet/Gopher's "score each document under a small LM and
  * filter the tails" quality pass (Wenzek et al. 2020 train a 5-gram
  * KenLM; the cheap in-engine stand-in is a bigram model trained on the
  * corpus itself). A doc whose word transitions are common corpus-wide
  * (templated/boilerplate text) scores high; gibberish and shuffled-word
  * text scores near the smoothing floor — a real curation signal that
  * complements text_quality's surface ratios and text_repetition's
  * within-doc signal with a CROSS-doc transition model.
  *
  * Model: add-one-smoothed conditional bigram frequency, kept fixed-point
  * integer so DuckDB replays it bit-exactly (the transcendental-free
  * oracle discipline — a log-perplexity spelling would hash-drift):
  *
  *   p_ppm(w1,w2)  = (1e6 * (c12 + 1)) div (c1 + V)
  *   fluency_ppm(d) = SUM over d's bigram OCCURRENCES of p_ppm
  *                    div n_bigrams(d)
  *
  * where c12 = corpus count of the bigram, c1 = corpus count of w1 in
  * bigram-left position, V = distinct token types in the corpus. Docs
  * with fewer than 2 tokens have no bigrams and are absent (both
  * engines agree by construction).
  *
  * Scale shape:
  *  - bigrams are generated NARROWLY per doc (array zip_with over the
  *    tokenizer's output — no self-join, no window);
  *  - the doc-side stream is first reduced to per-doc bigram tallies
  *    (doc_id, w1, w2, n), so the model join probes one row per DISTINCT
  *    doc bigram, not per occurrence;
  *  - the model tables (c12, c1) are corpus-level aggregates with Zipf
  *    cardinality (they grow with vocabulary, not corpus size), V rides
  *    as a broadcast 1-row aggregate;
  *  - the final per-doc agg is map-side combinable integer sums.
  */
object BigramLm {

  /** Tokens of each doc as an ORDERED array — VocabBuild's splitter. */
  private def tokArrays(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      regexp_extract_all(lower(col("text")),
        lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0)).as("toks"))

  /** Per-doc-occurrence successor stream (doc_id, w1, w2): one row per
    * TOKEN occurrence, pairing it with the following token — NULL for the
    * doc's last token (zip_with pads the shorter slice with nulls). The
    * null-successor rows are what let the vocabulary size ride the same
    * aggregate as the bigram tallies: every corpus token appears exactly
    * once per occurrence as w1. */
  private def pairs(docs: DataFrame): DataFrame =
    tokArrays(docs)
      .where(size(col("toks")) >= 1)
      .select(col("doc_id"), explode(expr(
        "zip_with(toks, slice(toks, 2, size(toks) - 1), " +
          "(x, y) -> struct(x AS w1, y AS w2))")).as("bg"))
      .select(col("doc_id"), col("bg.w1").as("w1"), col("bg.w2").as("w2"))

  /** (doc_id, n_bigrams, fluency_ppm) for every doc with >= 2 tokens.
    *
    * SINGLE corpus pass (VERDICT r11 #1): the per-doc successor tallies
    * `g` are aggregated ONCE and PERSISTED, and every downstream table is
    * a rollup of that tally — `c12` re-groups g by (w1, w2), `c1` and the
    * vocabulary size V re-group `c12` — so the parquet scan + the regexp
    * tokenizer execute exactly once (PlanSpec's scan-count gate pins
    * this). The cache (MEMORY_AND_DISK; per-doc DISTINCT successor
    * pairs, well under token volume, spillable) is load-bearing rather
    * than a nicety: plain exchange reuse cannot carry this shape, because
    * the scoring join infers `w2 IS NOT NULL` null-filters into its
    * branches while the vocabulary branch NEEDS the null-successor rows
    * (a token whose every occurrence is doc-final only appears there) —
    * the branches legitimately diverge below the exchange.
    *
    * Null-successor rows are dropped from scoring by JOIN semantics
    * (equi-join keys never match NULL) and excluded from c1 by a
    * conditional sum INSIDE the aggregate — no Filter whose placement the
    * optimizer could shift. V rides as an unpartitioned window over the
    * Zipf-sized per-w1 table (the tiny-cells-table marginals pattern):
    * the row count of the w1 rollup IS the distinct-token count, since
    * every corpus token occurs somewhere as w1. */
  def fluency(docs: DataFrame): DataFrame = {
    val g = pairs(docs).groupBy("doc_id", "w1", "w2").agg(count(lit(1)).as("n"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      .transform(graft.CacheScope.register)
    // corpus bigram counts; the (w1, NULL) groups never match the join
    val c12 = g.groupBy("w1", "w2").agg(sum("n").as("c12"))
    // bigram-LEFT occurrence count per w1 (null successors excluded by the
    // conditional agg, not a Filter) + V = row count of this very table
    val all = org.apache.spark.sql.expressions.Window
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.unboundedFollowing)
    val c1v = c12.groupBy("w1")
      .agg(sum(when(col("w2").isNotNull, col("c12"))).as("c1"))
      .withColumn("v", count(lit(1)).over(all))
    g.join(c12, Seq("w1", "w2"))
      .join(c1v, Seq("w1"))
      .withColumn("p_ppm", expr("(1000000 * (c12 + 1)) DIV (c1 + v)"))
      .groupBy("doc_id")
      .agg(sum("n").as("n_bigrams"),
        expr("SUM(n * p_ppm) DIV SUM(n)").as("fluency_ppm"))
  }

  /** DuckDB replay of [[fluency]] — identical integer ladder; bigrams
    * spelled with list_zip over the same slices. */
  def fluencySql(docsTable: String = "documents"): String =
    s"""WITH arr AS (
       |  SELECT doc_id, regexp_extract_all(lower(text),
       |    '[a-z]+|[0-9]+|[^a-z0-9\\s]') AS toks
       |  FROM $docsTable
       |), bg AS (
       |  SELECT doc_id, bg[1] AS w1, bg[2] AS w2 FROM (
       |    SELECT doc_id, unnest(list_zip(toks[1:len(toks)-1],
       |                                   toks[2:len(toks)])) AS bg
       |    FROM arr WHERE len(toks) >= 2)
       |), d12 AS (
       |  SELECT doc_id, w1, w2, COUNT(*) AS n FROM bg GROUP BY doc_id, w1, w2
       |), c12 AS (
       |  SELECT w1, w2, COUNT(*) AS c12 FROM bg GROUP BY w1, w2
       |), c1 AS (
       |  SELECT w1, COUNT(*) AS c1 FROM bg GROUP BY w1
       |), vocab AS (
       |  SELECT COUNT(DISTINCT tok) AS v FROM (
       |    SELECT unnest(toks) AS tok FROM arr)
       |)
       |SELECT doc_id, CAST(SUM(n) AS BIGINT) AS n_bigrams,
       |  CAST(SUM(n * ((1000000 * (c12 + 1)) // (c1 + v))) // SUM(n) AS BIGINT)
       |    AS fluency_ppm
       |FROM d12 JOIN c12 USING (w1, w2) JOIN c1 USING (w1) CROSS JOIN vocab
       |GROUP BY doc_id
       |ORDER BY doc_id""".stripMargin
}
