package graft.operators

import graft.Checkpoints.DatasetTruncate
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Byte-pair-encoding MERGE TRAINING — the real tokenizer-training loop
  * (Sennrich et al. 2016), not just the piece-count vocabulary
  * (`VocabBuild`): repeatedly find the most frequent adjacent symbol
  * pair across the corpus and fuse it into a new symbol. The learned
  * merge list IS the tokenizer.
  *
  * Scale shape (the same one production BPE trainers use): all rounds
  * operate on the WORD-FREQUENCY table, never the corpus — one
  * corpus-volume count shuffle up front, then every merge round is a
  * pair-explode + sum over the distinct-word table, which Zipf makes
  * orders of magnitude smaller than the corpus (at 100 TB: billions of
  * running words, low millions of distinct words). Per round: one
  * vocab-sized job (explode adjacent pairs weighted by word freq,
  * map-side-combined sum, bounded top-1), a 1-row driver decision (BPE
  * is inherently a sequential greedy loop — the decision is the
  * algorithm, not a shortcut), and a narrow spelling rewrite truncated
  * with an eager lineage truncation (Checkpoints seam) so round N's plan does not replay
  * rounds 1..N-1.
  *
  * Determinism contract (what makes the DuckDB oracle hash-exact):
  *  - BPE words are LETTER RUNS (`[a-z]+` on lowered text) — ASCII by
  *    construction, so per-codepoint splitting and string ordering
  *    cannot diverge between engines;
  *  - the argmax is total: (count DESC, pair ASC);
  *  - merge application is `replace` with space-delimited patterns,
  *    applied TWICE: both engines' replace() scans left-to-right
  *    non-overlapping and resumes after each replacement, so in a run
  *    of shared-boundary occurrences (' a b a b ') one pass merges the
  *    odd occurrences only; the second pass catches the evens. Runs
  *    long enough to survive two passes are possible in pathological
  *    text and are resolved identically by both engines (the contract
  *    is the deterministic double-pass, documented as a deviation from
  *    canonical all-occurrence merging).
  */
object Bpe {

  /** (word, freq) over letter runs — the table every round works on. */
  def wordTable(docs: DataFrame): DataFrame =
    docs.select(explode(regexp_extract_all(lower(col("text")),
        lit("[a-z]+"), lit(0))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("freq"))

  /** The per-round best pair + the rewritten word table. */
  private def spellOut(words: DataFrame): DataFrame =
    words.withColumn("sp",
      concat(lit(" "), concat_ws(" ", split(col("word"), "")), lit(" ")))

  private def bestPair(words: DataFrame): Option[(String, Long)] = {
    val row = words
      .select(col("freq"), split(trim(col("sp")), " ").as("ls"))
      .select(col("freq"), explode(expr(
        """CASE WHEN size(ls) < 2 THEN array()
          |ELSE transform(sequence(0, size(ls) - 2),
          |       j -> concat(element_at(ls, j + 1), ' ', element_at(ls, j + 2)))
          |END""".stripMargin)).as("pair"))
      .groupBy("pair").agg(sum("freq").as("cnt"))
      .orderBy(col("cnt").desc, col("pair").asc)
      .limit(1)
      .collect()
    row.headOption.map(r => (r.getString(0), r.getLong(1)))
  }

  private def applyMerge(words: DataFrame, pair: String): DataFrame = {
    val merged = pair.replace(" ", "")
    val pat = s" $pair "
    val rep = s" $merged "
    // double-pass: catch the even occurrences of shared-boundary runs
    words.withColumn("sp",
      expr(s"replace(replace(sp, '$pat', '$rep'), '$pat', '$rep')"))
  }

  /** One learned merge: rank in application order, the pair, its fused
    * form, and the pair count at decision time. */
  final case class Merge(rank: Long, leftTok: String, rightTok: String,
      merged: String, cnt: Long) {
    def pair: String = s"$leftTok $rightTok"
  }

  /** Train `nMerges` merges — the greedy loop. Driver-local result (the
    * merge list IS tokenizer metadata, ~rank rows). */
  def trainMerges(docs: DataFrame, nMerges: Int = 20): Seq[Merge] = {
    var words = spellOut(wordTable(docs)).truncateLineage
    val out = Seq.newBuilder[Merge]
    var rank = 1
    var done = false
    while (rank <= nMerges && !done) {
      bestPair(words) match {
        case Some((pair, cnt)) =>
          val Array(l, r) = pair.split(" ", 2)
          out += Merge(rank.toLong, l, r, pair.replace(" ", ""), cnt)
          words = applyMerge(words, pair).truncateLineage
          rank += 1
        case None => done = true
      }
    }
    out.result()
  }

  /** [[trainMerges]] as the relational query surface. */
  def merges(docs: DataFrame, trained: Seq[Merge]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    trained.map(m => (m.rank, m.leftTok, m.rightTok, m.merged, m.cnt))
      .toDF("rank", "left_tok", "right_tok", "merged", "cnt")
  }

  /** The post-merge SUBWORD DISTRIBUTION: apply the learned merges, then
    * count every surviving piece weighted by word frequency — the
    * vocabulary a BPE tokenizer at this merge count would emit. Same
    * word-table scale shape; the corpus is touched only by the initial
    * count. */
  def pieces(docs: DataFrame, trained: Seq[Merge]): DataFrame = {
    var words = spellOut(wordTable(docs))
    trained.foreach { m => words = applyMerge(words, m.pair) }
    words
      .select(col("freq"), explode(split(trim(col("sp")), " ")).as("piece"))
      .groupBy("piece").agg(sum("freq").as("freq"))
  }

  /** The APPLY step: tokenize the corpus with the learned merges. The
    * merge replay happens on the WORD table (vocab-sized, as in
    * [[pieces]]); the corpus then broadcast-joins word -> piece-array and
    * explodes — the corpus itself never shuffles (the tokenize_corpus
    * discipline) and never re-runs a replace. Output: one row per
    * (doc_id, word position, piece position). */
  def tokenizeBpe(docs: DataFrame, trained: Seq[Merge]): DataFrame = {
    var words = spellOut(wordTable(docs))
    trained.foreach { m => words = applyMerge(words, m.pair) }
    val spelled = words.select(col("word"),
      split(trim(col("sp")), " ").as("pieces"))
    docs
      .select(col("doc_id"), posexplode(regexp_extract_all(lower(col("text")),
        lit("[a-z]+"), lit(0))).as(Seq("word_pos", "word")))
      .join(broadcast(spelled), Seq("word"))
      .select(col("doc_id"), col("word_pos").cast("long").as("word_pos"),
        posexplode(col("pieces")).as(Seq("piece_pos", "piece")))
      .select(col("doc_id"), col("word_pos"),
        col("piece_pos").cast("long").as("piece_pos"), col("piece"))
  }

  def tokenizeBpeSql(nMerges: Int = 20): String = {
    val rounds = (1 to nMerges).map(roundSql).mkString(",\n")
    s"""WITH $prelude,
       |$rounds,
       |spelled AS MATERIALIZED (
       |  SELECT word, string_split(trim(sp), ' ') AS pieces FROM w$nMerges
       |), corpus AS (
       |  SELECT doc_id, unnest(arr) AS word,
       |         unnest(range(0, len(arr))) AS word_pos
       |  FROM (SELECT doc_id,
       |          regexp_extract_all(lower(text), '[a-z]+') AS arr
       |        FROM documents)
       |)
       |SELECT c.doc_id, CAST(c.word_pos AS BIGINT) AS word_pos,
       |  CAST(p.i - 1 AS BIGINT) AS piece_pos, s.pieces[p.i] AS piece
       |FROM corpus c
       |JOIN spelled s USING (word),
       |UNNEST(range(1, len(s.pieces) + 1)) AS p(i)
       |ORDER BY doc_id, word_pos, piece_pos""".stripMargin
  }

  // ------------------------------------------------------------- oracles

  private def wordTableSql: String =
    """SELECT word, COUNT(*) AS freq FROM (
      |  SELECT unnest(regexp_extract_all(lower(text), '[a-z]+')) AS word
      |  FROM documents) GROUP BY word""".stripMargin

  /** Every chained CTE is AS MATERIALIZED: DuckDB inlines CTEs by
    * default, and each round references its predecessor ~3x (pair scan +
    * two argmax scalar subqueries), so 20 inlined rounds would expand
    * ~3^20 scans of w0 (observed as a file-handle explosion).
    * Materialization makes the oracle evaluate each round once, like the
    * Spark loop's localCheckpoint. */
  private def prelude: String =
    s"""w0 AS MATERIALIZED (
       |  SELECT word, freq,
       |    ' ' || array_to_string(regexp_extract_all(word, '.'), ' ') || ' ' AS sp
       |  FROM ($wordTableSql)
       |)""".stripMargin

  /** One unrolled round: pair counts over w{i-1}, the total-order argmax,
    * and the double-pass rewrite — the EXACT integer/string ops the Spark
    * loop runs. */
  private def roundSql(i: Int): String = {
    val prev = s"w${i - 1}"
    s"""p$i AS MATERIALIZED (
       |  SELECT pr AS pair, SUM(freq) AS cnt FROM (
       |    SELECT freq, unnest(list_transform(range(1, len(ls)),
       |      j -> ls[j] || ' ' || ls[j + 1])) AS pr
       |    FROM (SELECT freq, string_split(trim(sp), ' ') AS ls FROM $prev))
       |  GROUP BY pr
       |), b$i AS MATERIALIZED (
       |  SELECT pair, cnt FROM p$i ORDER BY cnt DESC, pair ASC LIMIT 1
       |), w$i AS MATERIALIZED (
       |  SELECT word, freq,
       |    replace(replace(sp,
       |        ' ' || (SELECT pair FROM b$i) || ' ',
       |        ' ' || replace((SELECT pair FROM b$i), ' ', '') || ' '),
       |      ' ' || (SELECT pair FROM b$i) || ' ',
       |      ' ' || replace((SELECT pair FROM b$i), ' ', '') || ' ') AS sp
       |  FROM $prev
       |)""".stripMargin
  }

  def mergesSql(nMerges: Int = 20): String = {
    val rounds = (1 to nMerges).map(roundSql).mkString(",\n")
    val rows = (1 to nMerges).map { i =>
      s"""SELECT CAST($i AS BIGINT) AS rank,
         |  split_part(pair, ' ', 1) AS left_tok, split_part(pair, ' ', 2) AS right_tok,
         |  replace(pair, ' ', '') AS merged, CAST(cnt AS BIGINT) AS cnt FROM b$i""".stripMargin
    }.mkString("\nUNION ALL ")
    s"""WITH $prelude,
       |$rounds
       |SELECT * FROM (
       |$rows
       |) ORDER BY rank""".stripMargin
  }

  def piecesSql(nMerges: Int = 20): String = {
    val rounds = (1 to nMerges).map(roundSql).mkString(",\n")
    s"""WITH $prelude,
       |$rounds
       |SELECT piece, CAST(SUM(freq) AS BIGINT) AS freq FROM (
       |  SELECT freq, unnest(string_split(trim(sp), ' ')) AS piece FROM w$nMerges)
       |GROUP BY piece ORDER BY piece""".stripMargin
  }
}
