package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fuzzy vocabulary matching via deletion neighborhoods — the
  * typo-pair / variant-spelling detector a corpus-cleaning pipeline runs
  * before normalizing text (OCR noise, misspellings, tokenizer-splitting
  * artifacts all surface as rare tokens within small edit distance of a
  * frequent canonical form).
  *
  * Algorithm (FastSS / SymSpell family, Bocek et al. 2007): two tokens
  * within Levenshtein distance d share at least one string in the
  * intersection of their depth-<=d DELETION neighborhoods. So instead of
  * the quadratic all-pairs edit-distance join, each vocabulary token
  * expands to its O(L^2) delete-<=2 variants, candidates come from one
  * EQUI-join on the variant string, and an exact `levenshtein` check
  * removes the false candidates (deletion-sharing is necessary, not
  * sufficient — e.g. "big"/"agg" share variant "g" traces but sit at
  * distance 2 only via substitutions, which the verify step measures).
  *
  * Scale shape (the dedup-family discipline — candidates from an
  * inverted index, never all-pairs):
  *  - ONE corpus-volume shuffle: the token count aggregate (map-side
  *    partials; the shuffle moves (token, partial_count), not
  *    occurrences). Everything after is VOCAB-sized.
  *  - variant expansion is a narrow codegen'd HOF pass: |vocab| * O(L^2)
  *    rows (L capped at `maxLen`, so <= ~300 variants/token at L=24).
  *  - the self-join keys on the variant string — a hash equi-join over
  *    the variant table; at web scale (10M-token vocab) that is ~3G
  *    small rows, an ordinary shuffle, vs the 10^14-pair quadratic.
  *  - SHORT-TOKEN HOT-KEY caveat: depth-2 deletions of a length-<4
  *    token collapse to single characters and the empty string, making
  *    those variant keys quadratic hot buckets (every 2-char token
  *    meets every other via ''). That collapse is not removable — for
  *    short tokens the ''/1-char buckets are precisely what makes the
  *    dist<=2 candidates COMPLETE — so the fix is the default
  *    `minLen = 4` (SymSpell practice): short tokens are a tiny,
  *    closed vocabulary better handled by the exact quadratic over
  *    just that slice if a pipeline needs them at all.
  *  - verification + frequency attachment ride the candidate rows;
  *    candidate cardinality is bounded by true-pairs + deletion-collision
  *    pairs (rare for L >= minLen).
  *
  * Oracle: the QUADRATIC spelling (`levenshtein` over distinct-token
  * pairs) in DuckDB — so the driver's hash compare is simultaneously a
  * COMPLETENESS proof of the banding (the same contract
  * graph_similar_suppliers uses). Both engines implement textbook
  * unit-cost Levenshtein; all output columns are strings/BIGINTs.
  */
object FuzzyVocab {

  /** Tokens of length in [minLen, maxLen] with corpus frequencies.
    * Same splitter as VocabBuild (letter runs / digit runs / punct). */
  private def tokenCounts(docs: DataFrame, minLen: Int, maxLen: Int): DataFrame =
    docs
      .select(explode(regexp_extract_all(lower(col("text")),
        lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0))).as("tok"))
      .filter(length(col("tok")).between(minLen, maxLen))
      .groupBy("tok")
      .agg(count(lit(1)).as("freq"))

  /** All strings reachable from `tok` by deleting up to 2 characters
    * (including `tok` itself), distinct, as one codegen'd HOF chain.
    * Assumes length(tok) >= 2 (the minLen filter guarantees it). */
  private def deleteVariants(tok: Column): Column = {
    val L = length(tok)
    // delete position i (1-based)
    def del1(t: Column, i: Column) =
      concat(t.substr(lit(1), i - 1), t.substr(i + 1, length(t)))
    // delete positions i < j of the ORIGINAL string: drop j first so i
    // keeps its index, i.e. del1(del1(t, j), i)
    val d1 = transform(sequence(lit(1), L), i => del1(tok, i))
    val d2 = flatten(transform(sequence(lit(1), L - 1), i =>
      transform(sequence(i + 1, L), j => del1(del1(tok, j), i))))
    array_distinct(concat(array(tok), d1, d2))
  }

  /** Token pairs within Levenshtein distance <= 2, with frequencies:
    * (tok_a, tok_b, dist, freq_a, freq_b), tok_a < tok_b. */
  def fuzzyPairs(docs: DataFrame, minLen: Int = 4, maxLen: Int = 24): DataFrame = {
    val toks = tokenCounts(docs, minLen, maxLen)
    val variants = toks
      .select(col("tok"), col("freq"),
        explode(deleteVariants(col("tok"))).as("variant"))
    val a = variants.toDF("tok_a", "freq_a", "variant")
    val b = variants.toDF("tok_b", "freq_b", "variant")
    a.join(b, Seq("variant"))
      .filter(col("tok_a") < col("tok_b"))
      .select("tok_a", "tok_b", "freq_a", "freq_b")
      .distinct()
      .withColumn("dist", levenshtein(col("tok_a"), col("tok_b")).cast("long"))
      .filter(col("dist") <= 2)
      .select("tok_a", "tok_b", "dist", "freq_a", "freq_b")
  }

  /** DuckDB replay — deliberately the quadratic spelling, so hash
    * equality proves the deletion-neighborhood candidates COMPLETE. */
  def fuzzyPairsSql(minLen: Int = 4, maxLen: Int = 24): String =
    s"""WITH tok AS (
       |  SELECT unnest(regexp_extract_all(lower(text),
       |    '[a-z]+|[0-9]+|[^a-z0-9\\s]')) AS tok
       |  FROM documents
       |), v AS (
       |  SELECT tok, COUNT(*) AS freq FROM tok
       |  WHERE length(tok) BETWEEN $minLen AND $maxLen
       |  GROUP BY tok
       |)
       |SELECT a.tok AS tok_a, b.tok AS tok_b,
       |  CAST(levenshtein(a.tok, b.tok) AS BIGINT) AS dist,
       |  a.freq AS freq_a, b.freq AS freq_b
       |FROM v a JOIN v b ON a.tok < b.tok
       |WHERE levenshtein(a.tok, b.tok) <= 2
       |ORDER BY tok_a, tok_b""".stripMargin
}
