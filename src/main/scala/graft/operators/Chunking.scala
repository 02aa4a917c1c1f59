package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sliding-window document chunking — the RAG / context-window
  * preparation step: split each document into fixed-size token windows
  * with overlap, so retrieval-scale corpora index bounded-size chunks
  * without losing cross-boundary context.
  *
  * Chunk rule (pure integer arithmetic, engine-replayable): with chunk
  * size C and stride S (S <= C, overlap = C - S), chunk i covers tokens
  * [i*S, min(i*S + C, len)), for i in 0 .. nChunks-1 where
  * nChunks = 1 + (len > C ? (len - C + S - 1) div S : 0) — every token
  * is covered, only the last chunk may be short, and a document shorter
  * than C yields exactly one chunk.
  *
  * Scale design: one narrow codegen'd pass — tokenize (split), generate
  * chunk indices (sequence), slice + rejoin per chunk, explode. NO
  * shuffle; fan-out is bounded by ~len/S chunks per document, each
  * output row bounded by C tokens, so partition sizes scale by the same
  * ~C/S factor as the data (vs the unbounded rows of a
  * one-row-per-token explode). Chunk text and token counts are
  * deterministic, so the DuckDB oracle matches hash-exactly.
  */
object Chunking {

  def chunkDocs(docs: DataFrame, chunkTokens: Int = 64,
      stride: Int = 48): DataFrame = {
    require(stride > 0 && stride <= chunkTokens, "need 0 < stride <= chunk")
    val (c, s) = (chunkTokens, stride)
    docs
      .select(col("doc_id"), split(trim(col("text")), "\\s+").as("ts"))
      .withColumn("len", size(col("ts")).cast("long"))
      .withColumn("n_chunks",
        lit(1L) + when(col("len") > c,
          expr(s"(len - $c + ${s - 1}) DIV $s")).otherwise(lit(0L)))
      .select(col("doc_id"),
        explode(expr(s"transform(sequence(0, n_chunks - 1), i -> struct(" +
          s"i AS idx, slice(ts, int(i) * $s + 1, $c) AS ck))")).as("ch"))
      .select(col("doc_id"), col("ch.idx").as("chunk_idx"),
        size(col("ch.ck")).cast("long").as("n_tokens"),
        array_join(col("ch.ck"), " ").as("chunk"))
  }

  /** DuckDB replay of [[chunkDocs]]: identical tokenizer (the repo-wide
    * `string_split_regex(trim(text), '\s+')` spelling) and identical
    * integer chunk rule; the index fan-out is `unnest(range(...))`
    * (DuckDB's range table function rejects lateral parameters). */
  def chunkDocsSql(chunkTokens: Int = 64, stride: Int = 48): String = {
    val (c, s) = (chunkTokens, stride)
    s"""WITH tok AS (
       |  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS ts
       |  FROM documents
       |), sized AS (
       |  SELECT doc_id, ts, CAST(len(ts) AS BIGINT) AS n,
       |    1 + (CASE WHEN CAST(len(ts) AS BIGINT) > $c
       |         THEN (CAST(len(ts) AS BIGINT) - $c + ${s - 1}) // $s
       |         ELSE 0 END) AS n_chunks
       |  FROM tok
       |), idx AS (
       |  SELECT doc_id, ts, n, unnest(range(0, n_chunks)) AS i FROM sized
       |)
       |SELECT doc_id, i AS chunk_idx,
       |  CAST(len(list_slice(ts, CAST(i * $s + 1 AS BIGINT),
       |    CAST(LEAST(i * $s + $c, n) AS BIGINT))) AS BIGINT) AS n_tokens,
       |  array_to_string(list_slice(ts, CAST(i * $s + 1 AS BIGINT),
       |    CAST(LEAST(i * $s + $c, n) AS BIGINT)), ' ') AS chunk
       |FROM idx
       |ORDER BY doc_id, chunk_idx""".stripMargin
  }
}
