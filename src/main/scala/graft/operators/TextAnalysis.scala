package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Text-analysis operators for a training-data pipeline: token counting,
  * quality scoring, language ID, and document fingerprinting — all over
  * the `documents` table.
  *
  * Everything here is a narrow per-row map (no shuffle, no UDF where a
  * codegen'd built-in exists), so it scales linearly with the corpus and
  * stays inside whole-stage codegen. Counts and ratios are integer-derived
  * so the DuckDB oracles match exactly.
  */
object TextAnalysis {

  private val wsTokens = split(trim(col("text")), "\\s+")

  // -------------------------------------------------------- token counts
  /** Token counting: whitespace tokens, BPE-ish subword pieces via a
    * regex over letter-runs / digit-runs / punctuation, and a chars/4
    * heuristic (the common "~4 chars per token" estimate). */
  def tokenCounts(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      size(wsTokens).cast("long").as("n_ws_tokens"),
      size(regexp_extract_all(col("text"),
        lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0))).cast("long").as("n_pieces"),
      ceil(length(col("text")) / 4.0).cast("long").as("n_tokens_est"))
      .orderBy("doc_id")

  val tokenCountsSql: String =
    """SELECT doc_id,
      |  CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_ws_tokens,
      |  CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS BIGINT) AS n_pieces,
      |  CAST(ceil(length(text) / 4.0) AS BIGINT) AS n_tokens_est
      |FROM documents ORDER BY doc_id""".stripMargin

  // ------------------------------------------------------ quality score
  /** Stopword list shared by quality scoring and language ID. */
  val enStopwords: Seq[String] = Seq(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "for", "on", "with", "as", "at", "by", "this", "that")

  /** Quality scoring: doc length, mean word length, stopword ratio,
    * alpha ratio, and a composite [0,1] score — the usual cheap quality
    * gates applied before expensive pipeline stages. All ratios are
    * integer/integer, deterministic across engines. */
  def qualityScore(docs: DataFrame): DataFrame = {
    val nWords = size(wsTokens)
    val stopArr = array(enStopwords.map(lit): _*)
    val nStop = size(filter(wsTokens, w => array_contains(stopArr, lower(w))))
    val nAlpha = size(regexp_extract_all(col("text"), lit("[A-Za-z]+"), lit(0)))
    docs.select(
      col("doc_id"),
      length(col("text")).cast("long").as("n_chars_measured"),
      nWords.cast("long").as("n_words"),
      round(length(col("text")).cast("double") / nWords, 6).as("mean_word_len"),
      round(nStop.cast("double") / nWords, 6).as("stopword_ratio"),
      round(nAlpha.cast("double") / nWords, 6).as("alpha_ratio"))
      .withColumn("quality_score",
        round(least(
          greatest(col("stopword_ratio") * 2, lit(0.0)) * 0.5 +
            least(col("n_words").cast("double") / 100.0, lit(1.0)) * 0.5,
          lit(1.0)), 6))
      .orderBy("doc_id")
  }

  val qualityScoreSql: String = {
    val stopList = enStopwords.map(s => s"'$s'").mkString("[", ", ", "]")
    s"""SELECT *,
       |  ROUND(LEAST(GREATEST(stopword_ratio * 2, 0.0) * 0.5 +
       |              LEAST(CAST(n_words AS DOUBLE) / 100.0, 1.0) * 0.5, 1.0), 6) AS quality_score
       |FROM (
       |  SELECT doc_id,
       |    CAST(length(text) AS BIGINT) AS n_chars_measured,
       |    CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS n_words,
       |    ROUND(CAST(length(text) AS DOUBLE) / len(string_split_regex(trim(text), '\\s+')), 6) AS mean_word_len,
       |    ROUND(CAST(len(list_filter(string_split_regex(trim(text), '\\s+'),
       |        w -> list_contains($stopList, lower(w)))) AS DOUBLE)
       |      / len(string_split_regex(trim(text), '\\s+')), 6) AS stopword_ratio,
       |    ROUND(CAST(len(regexp_extract_all(text, '[A-Za-z]+')) AS DOUBLE)
       |      / len(string_split_regex(trim(text), '\\s+')), 6) AS alpha_ratio
       |  FROM documents)
       |ORDER BY doc_id""".stripMargin
  }

  // -------------------------------------------------------- language ID
  /** Tiny per-language marker-word lists for the heuristic language ID.
    * (A real pipeline plugs a fastText-style model in the same operator
    * shape; the heuristic keeps this container-runnable.) */
  val langMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "is", "in", "that", "it", "for", "with"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "mit", "ein", "zu", "den"),
    "fr" -> Seq("le", "la", "les", "et", "est", "un", "une", "des", "que", "pour"),
    "es" -> Seq("el", "la", "los", "las", "es", "un", "una", "que", "por", "con"))

  /** Heuristic language ID: marker-word hit ratio per language, argmax
    * (ties -> "und" = undetermined, like CLD). Narrow map, no shuffle;
    * rows-only oracle (the heuristic is engine-specific by design). */
  def langId(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val markers = langMarkers.map { case (k, v) => (k, v.toSet) }
    docs.select(col("doc_id"), col("text"), col("lang")).as[(Long, String, String)]
      .map { case (id, text, declared) =>
        val words = text.trim.toLowerCase.split("\\s+")
        val scores = markers.map { case (lang, set) =>
          (lang, words.count(set.contains).toDouble / math.max(words.length, 1))
        }
        val (best, bestScore) = scores.maxBy(_._2)
        val detected = if (bestScore > 0.0) best else "und"
        (id, detected, declared, detected == declared)
      }
      .toDF("doc_id", "detected_lang", "declared_lang", "agrees")
      .orderBy("doc_id")
  }

  // ------------------------------------------------------- fingerprints
  /** Content fingerprint: md5 of whitespace-normalized lowercase text —
    * the canonical-form hash used as a cheap cross-corpus dedup key. */
  def fingerprint(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      md5(lower(regexp_replace(trim(col("text")), "\\s+", " ")).cast("binary"))
        .as("fingerprint"))
      .orderBy("doc_id")

  val fingerprintSql: String =
    """SELECT doc_id,
      |  md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))) AS fingerprint
      |FROM documents ORDER BY doc_id""".stripMargin

  /** Winnowing-style robust fingerprint: rolling-hash every word k-gram,
    * keep the minimum hash in each sliding window of w hashes (Schleimer
    * et al.'s winnowing) — a compact sketch robust to local edits.
    * Rows-only oracle (hash-function specific). */
  def winnowingFingerprints(docs: DataFrame, k: Int = 5, w: Int = 4): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .map { case (id, text) =>
        val words = text.trim.split("\\s+")
        val grams = (0 to math.max(words.length - k, 0))
          .map(i => words.slice(i, i + k).mkString(" "))
        val hashes = grams.map(Dedup.fnv1a64)
        val picks = if (hashes.length <= w) Set(hashes.min)
        else hashes.sliding(w).map(_.min).toSet
        (id, picks.toArray.sorted)
      }
      .toDF("doc_id", "fingerprints")
      .orderBy("doc_id")
  }
}
