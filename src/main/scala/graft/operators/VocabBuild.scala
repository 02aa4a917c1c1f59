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
    val counts = docs
      .select(explode(regexp_extract_all(lower(col("text")),
        lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0))).as("token"))
      .groupBy("token")
      .agg(count(lit(1)).as("freq"))
      .filter(col("freq") >= minCount)
    counts
      .select(col("token"), col("freq"))
      .as[(String, Long)]
      .rdd
      .sortBy({ case (tok, freq) => (-freq, tok) },
        ascending = true, numPartitions = counts.rdd.getNumPartitions.max(1))
      .zipWithIndex()
      .map { case ((tok, freq), id) => (id, tok, freq) }
      .toDF("token_id", "token", "freq")
  }

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
