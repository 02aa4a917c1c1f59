package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination: flag training documents that share any
  * word n-gram with a held-out evaluation set — the standard pretraining
  * hygiene pass (8-gram overlap is the common window; GPT-3/PaLM-style
  * pipelines use 8-13). Here the "benchmark" is a deterministic hash
  * split of the corpus (stand-in for a real eval-set list; the operator
  * takes any (doc_id, text) frame as the eval side).
  *
  * Scale shape: the eval side is tiny by construction, so its distinct
  * gram set BROADCASTS; the training corpus streams through one narrow
  * shingle pass and a broadcast semi-join-style lookup — no shuffle of
  * the corpus, no all-pairs anything. Cost ~ corpus tokens + |eval
  * grams|. The split, the grams, and the counts are all deterministic,
  * so the DuckDB oracle replays the whole check.
  */
object Decontaminate {

  /** Contaminated training docs: (doc_id, n_shared_grams), docs sharing
    * at least one word `n`-gram with the hash-held-out eval slice.
    *
    * The join KEY is the md5-derived hash64 of the gram, not the gram
    * string: the broadcast eval-gram set shrinks from ~`n` words of text
    * per entry to 8 bytes, and the probe compares longs instead of
    * strings. Same engine-portability argument as [[Dedup.hash64Col]] —
    * DuckDB computes the identical hash, so a collision (which would
    * merge two grams on BOTH sides equally) can never diverge the
    * replay. */
  def flagContaminated(docs: DataFrame, n: Int = 8,
      evalRate: Double = 0.05): DataFrame = {
    val u = Sampling.hashUnit(col("doc_id"), "evalset")
    val evalDocs = docs.filter(u < evalRate)
    val trainDocs = docs.filter(u >= evalRate) // complement filter, not a join
    probeGrams(evalGramSet(evalDocs, n), trainDocs, n)
  }

  /** The deterministic (eval, train) split the operator's oracle
    * replays — exposed for the streaming twin, which slices arrivals
    * out of the train side. */
  def evalSplit(docs: DataFrame,
      evalRate: Double = 0.05): (DataFrame, DataFrame) = {
    val u = Sampling.hashUnit(col("doc_id"), "evalset")
    (docs.filter(u < evalRate), docs.filter(u >= evalRate))
  }

  /** The standing asset of the split: distinct hash64 grams of the eval
    * slice — tiny by construction, broadcast into every probe. */
  def evalGramSet(evalDocs: DataFrame, n: Int = 8): DataFrame =
    Dedup.shingles(evalDocs, n)
      .select(Dedup.hash64Col(col("shingle")).as("g")).distinct()

  /** Flag `docs` against a standing eval-gram set. Every verdict is a
    * pure per-doc function of (doc, gram set) — docs are never compared
    * to each other — which is the serving seam: the streaming twin
    * ([[graft.streaming.CorpusStreams.streamingDecontaminate]]) chops
    * arrivals into micro-batches without changing a single row.
    *
    * `keepClean = true` emits a verdict row for EVERY doc (clean docs at
    * n_shared_grams = 0) — the admission-control shape, where each
    * arrival needs an explicit decision; `false` is the batch report's
    * flagged-only shape. */
  def probeGrams(evalGrams: DataFrame, docs: DataFrame, n: Int = 8,
      keepClean: Boolean = false): DataFrame = {
    val hits = Dedup.shingles(docs, n)
      .select(col("doc_id"), Dedup.hash64Col(col("shingle")).as("g"))
      .join(broadcast(evalGrams), "g")
      .groupBy("doc_id").agg(count(lit(1)).as("n_shared_grams"))
    if (!keepClean) hits
    else docs.select(col("doc_id"))
      .join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_shared_grams"), lit(0L)).as("n_shared_grams"))
  }

  def flagContaminatedSql(n: Int = 8, evalRate: Double = 0.05,
      trainPred: String = "TRUE"): String = {
    val u = Sampling.hashUnitSql("doc_id", "evalset")
    val h64 = OracleSql.hex64Signed("md5(shingle)")
    // inner queries keep the per-doc DISTINCT on gram STRINGS (matching
    // Dedup.shingles's array_distinct); hashing happens OUTSIDE it, like
    // the Spark side, so a within-doc hash collision replays identically
    def sh(src: String, distinctDoc: String) =
      s"""SELECT DISTINCT $distinctDoc array_to_string(w[i:i+${n - 1}], ' ') AS shingle
         |  FROM (SELECT doc_id, w, unnest(range(1, greatest(len(w) - ${n - 1}, 1) + 1)) AS i
         |        FROM (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w FROM $src))""".stripMargin
    s"""WITH ev AS (SELECT doc_id, text FROM documents WHERE $u < $evalRate),
       |tr AS (SELECT doc_id, text FROM documents
       |       WHERE $u >= $evalRate AND ($trainPred)),
       |evsh AS (SELECT DISTINCT $h64 AS g FROM (${sh("ev", "")})),
       |trsh AS (SELECT doc_id, $h64 AS g FROM (${sh("tr", "doc_id,")}))
       |SELECT t.doc_id, COUNT(*) AS n_shared_grams
       |FROM trsh t JOIN evsh USING (g)
       |GROUP BY t.doc_id ORDER BY t.doc_id""".stripMargin
  }

  /** The all-verdicts (`keepClean = true`) replay: one row per train doc
    * under `trainPred`, clean docs at zero. */
  def verdictsSql(n: Int = 8, evalRate: Double = 0.05,
      trainPred: String = "TRUE"): String = {
    val u = Sampling.hashUnitSql("doc_id", "evalset")
    val h64 = OracleSql.hex64Signed("md5(shingle)")
    def sh(src: String, distinctDoc: String) =
      s"""SELECT DISTINCT $distinctDoc array_to_string(w[i:i+${n - 1}], ' ') AS shingle
         |  FROM (SELECT doc_id, w, unnest(range(1, greatest(len(w) - ${n - 1}, 1) + 1)) AS i
         |        FROM (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w FROM $src))""".stripMargin
    s"""WITH ev AS (SELECT doc_id, text FROM documents WHERE $u < $evalRate),
       |tr AS (SELECT doc_id, text FROM documents
       |       WHERE $u >= $evalRate AND ($trainPred)),
       |evsh AS (SELECT DISTINCT $h64 AS g FROM (${sh("ev", "")})),
       |trsh AS (SELECT doc_id, $h64 AS g FROM (${sh("tr", "doc_id,")})),
       |hits AS (SELECT t.doc_id, COUNT(*) AS n FROM trsh t
       |         JOIN evsh USING (g) GROUP BY t.doc_id)
       |SELECT tr.doc_id, CAST(COALESCE(h.n, 0) AS BIGINT) AS n_shared_grams
       |FROM tr LEFT JOIN hits h USING (doc_id)
       |ORDER BY tr.doc_id""".stripMargin
  }
}
