package graft.operators

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
  def vocab(docs: DataFrame, minCount: Long = 5L): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    // eager localCheckpoint: the corpus explode+count runs ONCE. The RDD
    // id-assignment below launches several jobs (sortBy's range-bound
    // sample, zipWithIndex's size count, the final pass) and under AQE
    // every separate DataFrame->RDD conversion is a fresh plan — without
    // the checkpoint the corpus scan re-executes per job (measured 22 s
    // -> ~7 s at sf0.1). Real cluster: reliable checkpoint() instead
    // (executor loss must not drop the counted vocab).
    val counts = docs
      .select(explode(regexp_extract_all(lower(col("text")),
        lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0))).as("token"))
      .groupBy("token")
      .agg(count(lit(1)).as("freq"))
      .filter(col("freq") >= minCount)
      .select(col("token"), col("freq"))
      .localCheckpoint(true)
    val rdd = counts.as[(String, Long)].rdd
    rdd
      .sortBy({ case (tok, freq) => (-freq, tok) },
        ascending = true, numPartitions = rdd.getNumPartitions.max(1))
      .zipWithIndex()
      .map { case ((tok, freq), id) => (id, tok, freq) }
      .toDF("token_id", "token", "freq")
  }

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
      .orderBy("doc_id", "pos")
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
}
