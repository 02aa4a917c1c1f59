package graft.operators

import graft.Checkpoints.DatasetTruncate
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Tokenizer-vocabulary build — the precompute step every training
  * pipeline runs before tokenization: corpus -> subword pieces -> counted,
  * frequency-thresholded vocabulary with DENSE integer ids (ids index an
  * embedding table, so they must be contiguous 0..V-1 — the same dense-id
  * constraint as the TransE dictionary, SURVEY A7).
  *
  * Pipeline shape and scale properties:
  *  - tokenize: narrow per-row regex explode (the BPE-ish letter-run /
  *    digit-run / punctuation splitter shared with text_token_counts) —
  *    no shuffle;
  *  - count: one hash shuffle keyed by token, with map-side partial
  *    aggregation — the shuffle moves (token, partial_count) pairs, not
  *    token occurrences (at 100 TB: |vocab| * partitions rows, not the
  *    trillions of raw tokens);
  *  - threshold: minCount filter drops the long tail BEFORE id
  *    assignment — on web corpora this typically cuts the distinct-token
  *    set by 10-100x;
  *  - ids: total order (freq DESC, token ASC — deterministic tiebreak),
  *    assigned with range-partitioned sortBy + zipWithIndex. NEVER a
  *    global row_number() window: that funnels the vocabulary through a
  *    single partition (the q8 lesson). zipWithIndex runs one extra job
  *    to count per-partition sizes, then assigns offsets partition-local.
  *
  * Frequent-id-first ordering is the convention tokenizers expect (short
  * ids compress well in varint token streams).
  */
object VocabBuild {

  /** (token_id, token, freq) for every piece with freq >= minCount. */
  def vocab(docs: DataFrame, minCount: Long = 5L): DataFrame =
    vocabFromCounts(docs
      .select(explode(regexp_extract_all(lower(col("text")),
        lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0))).as("token"))
      .groupBy("token")
      .agg(count(lit(1)).as("freq"))
      .filter(col("freq") >= minCount))

  /** Dense-id assignment over a prebuilt thresholded (token, freq)
    * table — the id half of [[vocab]], reusable by consumers whose
    * counts come from somewhere other than a corpus scan (the staged
    * postings asset). */
  private[graft] def vocabFromCounts(countsIn: DataFrame): DataFrame = {
    val spark = countsIn.sparkSession
    import spark.implicits._
    // eager truncation (Checkpoints seam): the count aggregation runs ONCE. The RDD
    // id-assignment below launches several jobs (sortBy's range-bound
    // sample, zipWithIndex's size count, the final pass) and under AQE
    // every separate DataFrame->RDD conversion is a fresh plan — without
    // the checkpoint the upstream scan re-executes per job (measured
    // 22 s -> ~7 s at sf0.1). Real cluster: reliable checkpoint()
    // instead (executor loss must not drop the counted vocab).
    val counts = countsIn.select(col("token"), col("freq")).truncateLineage
    val rdd = counts.as[(String, Long)].rdd
    rdd
      .sortBy({ case (tok, freq) => (-freq, tok) },
        ascending = true, numPartitions = rdd.getNumPartitions.max(1))
      .zipWithIndex()
      .map { case ((tok, freq), id) => (id, tok, freq) }
      .toDF("token_id", "token", "freq")
  }

  /** [[vocab]] over the STANDING postings asset (r14, extending VERDICT
    * r13 #5): the thresholded token counts are a pure postings
    * aggregation — every occurrence is one (tok, doc_id, pos) row — so
    * the build reads ZERO corpus bytes. Identical output (same
    * tokenizer built the postings, same threshold, same dense-id
    * order). The final plan shows no postings scan either: the counts
    * are eagerly truncated (vocabFromCounts) before the RDD id
    * assignment, exactly like the corpus-scanning spelling. */
  def vocabStaged(spark: org.apache.spark.sql.SparkSession, sfDir: String,
      minCount: Long = 5L): DataFrame =
    vocabFromCounts(vocabStagedCounts(spark, sfDir, minCount))

  /** The pre-truncation counts half of [[vocabStaged]], exposed because
    * the FINAL vocab plan hides its read behind the eager id-assignment
    * truncation — the plan gate asserts zero-corpus-scan on THIS surface,
    * where a regression re-introducing the corpus tokenize is visible. */
  private[graft] def vocabStagedCounts(spark: org.apache.spark.sql.SparkSession,
      sfDir: String, minCount: Long = 5L): DataFrame =
    spark.read.parquet(s"${Search.stagedDir(spark, sfDir)}/postings")
      .select(col("tok").as("token"))
      .groupBy("token")
      .agg(count(lit(1)).as("freq"))
      .filter(col("freq") >= minCount)

  /** Tokenize the corpus against a built vocabulary — the apply step:
    * every document becomes (doc_id, pos, token_id) rows, out-of-vocab
    * pieces mapped to -1 (the OOV id). Scale shape: the tokenize explode
    * is narrow; the vocabulary is broadcast (a thresholded vocab is
    * always small — that is its job), so the id lookup is a map-side
    * hash join and the corpus NEVER shuffles. Row-per-token output is
    * the join/filter-friendly relational spelling; packing rows back
    * into per-doc arrays is `collect_list` over (doc_id) or downstream
    * `pack_sequences`. */
  def tokenize(docs: DataFrame, minCount: Long = 5L): DataFrame = {
    val v = vocab(docs, minCount).select(col("token"), col("token_id"))
    docs
      .select(col("doc_id"), posexplode(regexp_extract_all(lower(col("text")),
        lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0))).as(Seq("pos", "token")))
      .join(broadcast(v), Seq("token"), "left")
      .select(col("doc_id"), col("pos").cast("long").as("pos"),
        coalesce(col("token_id"), lit(-1L)).as("token_id"))
  }

  /** [[tokenize]] over the STANDING postings asset (r14): the postings
    * table IS the tokenized corpus — (doc_id, pos, tok) per occurrence —
    * so the apply step is one postings scan broadcast-joined to the
    * postings-derived vocabulary: zero corpus scans, zero re-tokenizing
    * regex work. Identical output (null/empty-text docs carry no
    * postings rows, exactly as posexplode drops them). */
  def tokenizeStaged(spark: org.apache.spark.sql.SparkSession,
      sfDir: String, minCount: Long = 5L): DataFrame = {
    val v = vocabStaged(spark, sfDir, minCount)
      .select(col("token"), col("token_id"))
    spark.read.parquet(s"${Search.stagedDir(spark, sfDir)}/postings")
      .select(col("doc_id"), col("pos"), col("tok").as("token"))
      .join(broadcast(v), Seq("token"), "left")
      .select(col("doc_id"), col("pos").cast("long").as("pos"),
        coalesce(col("token_id"), lit(-1L)).as("token_id"))
  }

  /** DuckDB replay of [[tokenize]]: parallel unnests zip token with its
    * ordinal; vocab from [[vocabSql]]'s window spelling. */
  def tokenizeSql(minCount: Long = 5L): String =
    s"""WITH vocab AS (${vocabSql(minCount)}),
       |exploded AS (
       |  SELECT doc_id, unnest(arr) AS token,
       |    unnest(range(1, len(arr) + 1)) AS pos
       |  FROM (SELECT doc_id, regexp_extract_all(lower(text),
       |          '[a-z]+|[0-9]+|[^a-z0-9\\s]') AS arr FROM documents))
       |SELECT e.doc_id, CAST(e.pos - 1 AS BIGINT) AS pos,
       |  COALESCE(v.token_id, -1) AS token_id
       |FROM exploded e LEFT JOIN vocab v USING (token)
       |ORDER BY doc_id, pos""".stripMargin

  /** DuckDB oracle: identical tokenization + threshold, ids via the
    * window spelling (fine at oracle scale; the Spark side avoids it). */
  def vocabSql(minCount: Long = 5L): String =
    s"""WITH tok AS (
       |  SELECT unnest(regexp_extract_all(lower(text),
       |    '[a-z]+|[0-9]+|[^a-z0-9\\s]')) AS token
       |  FROM documents
       |), counts AS (
       |  SELECT token, COUNT(*) AS freq FROM tok
       |  GROUP BY token HAVING COUNT(*) >= $minCount
       |)
       |SELECT CAST(ROW_NUMBER() OVER (ORDER BY freq DESC, token ASC) - 1 AS BIGINT)
       |    AS token_id,
       |  token, freq
       |FROM counts ORDER BY token_id""".stripMargin

  // ------------------------------------------------------ tf-idf top-k
  /** Per-document top-k salient terms by INTEGER tf-idf — keyword
    * extraction composed from the pieces this pipeline already has:
    * the shared tokenizer, the dense-id vocabulary, and the native
    * `topk_pairs` TypedImperativeAggregate.
    *
    * idf is the integer surrogate `n_docs DIV df` rather than
    * log(N/df): exact in both engines (no transcendental whose last-bit
    * rounding could diverge a hash oracle), same ordering for fixed tf
    * (monotone in df), and it preserves the signal that matters —
    * corpus-wide terms weight ~1, rare terms weight ~N. Ties are total:
    * (score DESC, token_id ASC), token_id dense from the vocab.
    *
    * Scale shape: tf is ONE corpus-volume hash shuffle on (doc_id,
    * token) with map-side combine; df aggregates the already-thresholded
    * vocab-joined pairs (vocab-cardinality shuffle); n_docs rides as a
    * broadcast 1-row cross join (never a driver collect); the vocab id
    * lookups are broadcast joins; top-k is bounded k-pair buffers with
    * map-side partials — no sort, no window over the corpus. */
  def tfidfTopTerms(docs: DataFrame, k: Int = 5, minCount: Long = 5L): DataFrame = {
    graft.functions.VectorFunctions.ensureRegistered(docs.sparkSession)
    val v = vocab(docs, minCount).select(col("token"), col("token_id"))
    // persisted: the df rollup and the scoring join both consume the
    // vocab-joined tf table — unpersisted lineage re-ran the corpus
    // tokenize per branch (r12 scan audit); posting-sized rows
    val tf = docs
      .select(col("doc_id"), explode(regexp_extract_all(lower(col("text")),
        lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0))).as("token"))
      .groupBy("doc_id", "token")
      .agg(count(lit(1)).as("tf"))
      .join(broadcast(v), Seq("token"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      .transform(graft.CacheScope.register)
    val df = tf.groupBy("token_id").agg(count(lit(1)).as("df"))
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    tf.join(df, Seq("token_id"))
      .crossJoin(broadcast(nDocs))
      .select(col("doc_id"), col("token_id"),
        expr("tf * (n_docs DIV df)").as("score"))
      .groupBy("doc_id")
      .agg(call_function("topk_pairs",
        col("score"), col("token_id"), lit(k)).as("top"))
      .select(col("doc_id"), posexplode(col("top")))
      .select(col("doc_id"), (col("pos") + 1).cast("long").as("rn"),
        col("col.id").as("token_id"), col("col.ord").as("score"))
      .join(broadcast(v), Seq("token_id"))
      .select(col("doc_id"), col("rn"), col("token"), col("score"))
  }

  /** [[tfidfTopTerms]] over the STANDING postings asset (VERDICT r13
    * #5): the (tok, doc_id, pos) postings table already carries every
    * occurrence the rollup needs — tf, the vocabulary counts, and df are
    * pure postings aggregations, and n_docs reads the staged 1-row
    * corpus stats — so the registered query reads ZERO corpus bytes at
    * probe time (the corpus was tokenized once, at stage-build time).
    * Identical output to [[tfidfTopTerms]]: same tokenizer built the
    * postings, same thresholds, same dense-id order, same integer idf.
    *
    * Scale shape: ONE postings-volume (doc, tok) count shuffle (the
    * cached tf), a vocab-cardinality count for ids, a vocab-cardinality
    * df rollup, bounded top-k buffers — the raw text is never re-read
    * and never re-tokenized. */
  def tfidfTopTermsStaged(spark: org.apache.spark.sql.SparkSession,
      sfDir: String, k: Int = 5, minCount: Long = 5L): DataFrame = {
    graft.functions.VectorFunctions.ensureRegistered(spark)
    val dir = Search.stagedDir(spark, sfDir)
    // the only postings-volume aggregation; persisted because the vocab
    // counts, the df rollup and the scoring join all read it (released
    // by the harness between queries)
    val tf = spark.read.parquet(s"$dir/postings")
      .select(col("doc_id"), col("tok").as("token"))
      .groupBy("doc_id", "token")
      .agg(count(lit(1)).as("tf"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      .transform(graft.CacheScope.register)
    val v = vocabFromCounts(
        tf.groupBy("token").agg(sum("tf").as("freq"))
          .filter(col("freq") >= minCount))
      .select(col("token"), col("token_id"))
    val tfv = tf.join(broadcast(v), Seq("token"))
    val df = tfv.groupBy("token_id").agg(count(lit(1)).as("df"))
    val nDocs = spark.read.parquet(s"$dir/stats").select("n_docs")
    tfv.join(df, Seq("token_id"))
      .crossJoin(broadcast(nDocs))
      .select(col("doc_id"), col("token_id"),
        expr("tf * (n_docs DIV df)").as("score"))
      .groupBy("doc_id")
      .agg(call_function("topk_pairs",
        col("score"), col("token_id"), lit(k)).as("top"))
      .select(col("doc_id"), posexplode(col("top")))
      .select(col("doc_id"), (col("pos") + 1).cast("long").as("rn"),
        col("col.id").as("token_id"), col("col.ord").as("score"))
      .join(broadcast(v), Seq("token_id"))
      .select(col("doc_id"), col("rn"), col("token"), col("score"))
  }

  /** DuckDB replay of [[tfidfTopTerms]]: identical tokenizer, vocab ids
    * from [[vocabSql]], identical integer idf surrogate; the window
    * spelling equals the aggregate under the total (score DESC,
    * token_id ASC) order. */
  def tfidfSql(k: Int = 5, minCount: Long = 5L): String =
    s"""WITH vocab AS (${vocabSql(minCount)}),
       |toks AS (
       |  SELECT doc_id, unnest(regexp_extract_all(lower(text),
       |    '[a-z]+|[0-9]+|[^a-z0-9\\s]')) AS token FROM documents),
       |tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM toks GROUP BY doc_id, token),
       |tv AS (SELECT tf.doc_id, v.token_id, v.token, tf.tf
       |       FROM tf JOIN vocab v USING (token)),
       |df AS (SELECT token_id, COUNT(*) AS df FROM tv GROUP BY token_id),
       |n AS (SELECT COUNT(*) AS n_docs FROM documents),
       |scored AS (
       |  SELECT tv.doc_id, tv.token_id, tv.token,
       |         CAST(tv.tf * (n.n_docs // d.df) AS BIGINT) AS score
       |  FROM tv JOIN df d USING (token_id) CROSS JOIN n)
       |SELECT doc_id, CAST(rn AS BIGINT) AS rn, token, score FROM (
       |  SELECT doc_id, token, score,
       |    ROW_NUMBER() OVER (PARTITION BY doc_id
       |      ORDER BY score DESC, token_id ASC) AS rn
       |  FROM scored)
       |WHERE rn <= $k ORDER BY doc_id, rn""".stripMargin

  // ---------------------------------------------------- OOV-rate report
  /** Out-of-vocabulary rate per (source, lang) — the tokenizer-health
    * check before a training run: a corpus slice whose token
    * OCCURRENCES fall outside the trained vocabulary at an unusual rate
    * signals a domain/language mismatch the loss curve would only show
    * later. Rates are exact integer ppm over occurrences (not types —
    * one frequent unknown token should dominate a thousand rare ones).
    *
    * Shape: the vocabulary (already thresholded, vocab-sized) joins
    * BROADCAST against the narrow token explode; the only corpus-scale
    * shuffle is the map-side-combinable (source, lang) count aggregate —
    * cells out, occurrences never move. */
  def oovRate(docs: DataFrame, minCount: Long = 5L): DataFrame = {
    val v = vocab(docs, minCount).select(col("token"))
      .withColumn("known", lit(1L))
    docs
      .select(col("source"), col("lang"),
        explode(regexp_extract_all(lower(col("text")),
          lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0))).as("token"))
      .join(broadcast(v), Seq("token"), "left")
      .groupBy("source", "lang")
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("known").isNull, 1L).otherwise(0L)).as("n_oov"))
      .withColumn("oov_ppm", expr("n_oov * 1000000L div n_tokens"))
  }

  def oovRateSql(minCount: Long = 5L): String =
    s"""WITH vocab AS (${vocabSql(minCount)}),
       |tok AS (
       |  SELECT source, lang, unnest(regexp_extract_all(lower(text),
       |    '[a-z]+|[0-9]+|[^a-z0-9\\s]')) AS token
       |  FROM documents
       |)
       |SELECT source, lang, COUNT(*) AS n_tokens,
       |  CAST(SUM(CASE WHEN v.token IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
       |  CAST(SUM(CASE WHEN v.token IS NULL THEN 1 ELSE 0 END) AS BIGINT)
       |    * 1000000 // COUNT(*) AS oov_ppm
       |FROM tok t LEFT JOIN vocab v USING (token)
       |GROUP BY source, lang
       |ORDER BY source, lang""".stripMargin
}
