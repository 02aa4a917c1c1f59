package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sequence packing: assign documents to fixed token-budget bins —
  * the batching step before pretraining (pack ~budget tokens per
  * sequence/shard). This is CONTIGUOUS-FILL packing in doc_id order:
  * bin(doc) = floor(tokens_before_doc / budget). Greedy first-fit is
  * inherently sequential; the contiguous rule is deterministic, order-
  * stable, and embarrassingly parallel.
  *
  * Scale shape (the q8 lesson applied): the prefix sum is NOT a global
  * window (`SUM() OVER (ORDER BY ...)` funnels the corpus through one
  * task). Instead: sort-shuffle by doc_id, one tiny job collects the
  * per-partition token sums (numPartitions longs), their scan gives
  * each partition's exclusive offset, and a second narrow pass assigns
  * bins with a running counter — same two-phase spelling as
  * `DictionaryEncoder.buildDictionary`. The DuckDB oracle uses the
  * plain window (single-node engine), computing the identical function.
  */
object SequencePacking {

  /** (doc_id, n_tokens, bin) for every document; whitespace tokens. */
  def packDocs(docs: DataFrame, budgetTokens: Long = 2048L): DataFrame = {
    require(budgetTokens > 0)
    val spark = docs.sparkSession
    import spark.implicits._
    val sorted = docs
      .select(col("doc_id"),
        // null text packs zero tokens (the oracle COALESCEs identically);
        // empty text is [''] = 1 token in BOTH engines, left as-is
        coalesce(size(split(trim(col("text")), "\\s+")).cast("long"), lit(0L))
          .as("n_tokens"))
      .orderBy("doc_id")
      .as[(Long, Long)]
      .rdd
      .persist() // two passes: partition sums, then bin assignment
    val partSums = sorted
      .mapPartitionsWithIndex { case (i, it) =>
        var s = 0L; it.foreach(s += _._2); Iterator((i, s))
      }
      .collect().sortBy(_._1).map(_._2)
    val offsets = partSums.scanLeft(0L)(_ + _) // exclusive per-partition
    val bc = spark.sparkContext.broadcast(offsets)
    val out = sorted
      .mapPartitionsWithIndex { case (i, it) =>
        var running = bc.value(i)
        it.map { case (id, t) =>
          val bin = running / budgetTokens // nonneg: truncation == floor
          running += t
          (id, t, bin)
        }
      }
      .toDF("doc_id", "n_tokens", "bin")
    out
  }

  def packDocsSql(budgetTokens: Long = 2048L): String =
    s"""SELECT doc_id, n_tokens,
       |  CAST(floor(CAST(cum - n_tokens AS DOUBLE) / $budgetTokens) AS BIGINT) AS bin
       |FROM (
       |  SELECT doc_id,
       |    COALESCE(CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT), 0) AS n_tokens,
       |    SUM(COALESCE(CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT), 0)) OVER (
       |      ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
       |  FROM documents)
       |ORDER BY doc_id""".stripMargin
}
