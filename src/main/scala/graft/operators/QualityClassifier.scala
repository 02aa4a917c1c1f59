package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Model-based quality filtering: a Naive-Bayes-SIGN token-vote
  * classifier distilled from the repo's heuristic quality score — the
  * cheap-teacher/token-student pattern modern pretraining pipelines use
  * (a fastText-style classifier trained on weak labels, then applied to
  * the whole corpus; cf. DCLM / CCNet filtering stages).
  *
  * Training (one pass, all exact integers):
  *  - Teacher labels: quality decile >= [[PosDecile]] → positive,
  *    <= [[NegDecile]] → negative, mid-band unlabeled (confident labels
  *    only — the standard distillation trick).
  *  - Per token: DOCUMENT frequencies df_pos / df_neg over distinct
  *    (doc, token) pairs, kept when df_pos + df_neg >= [[MinDf]].
  *  - Vote: sign of the rate comparison df_pos/N_pos vs df_neg/N_neg,
  *    decided by CROSS-MULTIPLICATION (df_pos * N_neg <=> df_neg * N_pos)
  *    so no division or logarithm ever happens — which is what makes the
  *    learned model bit-replayable in the DuckDB oracle, where a
  *    log-likelihood weight (floating ln) could drift per libm.
  *
  * Scoring: every doc's DISTINCT tokens join the vote table; the score
  * is the vote sum, the verdict is score >= 0. Distinct-per-doc tokens
  * make the score robust to token-repetition gaming (the same reason NB
  * document models use Bernoulli df, not term counts, for short docs).
  *
  * Scale shape: training is ONE token-keyed count shuffle whose result
  * is VOCAB-sized (MinDf-capped), never corpus-sized; label totals are a
  * broadcast 1-row aggregate. Scoring explodes distinct tokens (narrow),
  * equi-joins the vote table (vocab-sized → AQE broadcasts while it
  * fits; shuffled hash join above that, with the corpus side already
  * exploded so no extra corpus pass), and re-aggregates by doc_id — one
  * corpus-volume shuffle. The model itself (the vote table) is a
  * first-class inspectable artifact ([[clfVocab]]).
  */
object QualityClassifier {

  // thresholds sit around the corpus's decile mass (testdata spans 0-6
  // with median ~3) so BOTH classes are populated and the mid-band stays
  // unlabeled; on a different corpus these are the knobs to recalibrate
  val PosDecile = 4
  val NegDecile = 1
  val MinDf = 3

  /** Quality decile 0..9 — shares [[TextAnalysis.qualityScoreExpr]] with
    * the curriculum sampler and token-budget report. */
  private def decile = least(
    floor(TextAnalysis.qualityScoreExpr * 10).cast("long"), lit(9L))

  /** ONE corpus pass for the whole classifier FAMILY (r12; memoized
    * across the pair per VERDICT r13 #3): per doc, the teacher decile
    * and the distinct lowered tokens (null row for docs with no tokens
    * via explode_outer, so every doc survives to the verdict join) —
    * training's label totals + dfs AND scoring's probe all derive from
    * this tally, where the pre-r12 spelling re-scanned the corpus per
    * branch (4 scans for clfScore). Token-scale (doc_id, decile, tok)
    * rows, spillable. The registration layer memoizes ONE persisted copy
    * per sfDir (PipelineQueries.clfEnriched) shared by clf_quality_vocab
    * AND clf_quality_score; direct calls get a query-scoped persist. */
  private[graft] def enrichedTokensPlan(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), decile.as("teacher_decile"),
      explode_outer(array_distinct(
        transform(TextAnalysis.wsTokens, lower _))).as("tok"))

  private def enrichedTokens(docs: DataFrame): DataFrame =
    enrichedTokensPlan(docs)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      .transform(graft.CacheScope.register)

  /** Distinct (doc_id, tok, label) over labeled docs; label +1/-1. */
  private def labeledDocTokens(enriched: DataFrame): DataFrame =
    enriched
      .withColumn("label",
        when(col("teacher_decile") >= PosDecile, lit(1))
          .when(col("teacher_decile") <= NegDecile, lit(-1)))
      .filter(col("label").isNotNull)
      .select(col("doc_id"), col("label"), col("tok"))
      .filter(col("tok").isNotNull && col("tok") =!= "")

  /** The learned model: (tok, df_pos, df_neg, vote), vote in {-1, 0, 1},
    * MinDf-thresholded, plus the label totals replicated on every row
    * (n_pos, n_neg) so the artifact is self-describing. */
  def clfVocab(docs: DataFrame): DataFrame =
    clfVocabFrom(enrichedTokens(docs))

  /** [[clfVocab]] over a prebuilt [[enrichedTokensPlan]] tally. */
  private[graft] def clfVocabFrom(enriched: DataFrame): DataFrame = {
    val lab = labeledDocTokens(enriched)
    val totals = lab.select(col("doc_id"), col("label")).distinct()
      .agg(sum(when(col("label") === 1, 1).otherwise(0)).as("n_pos"),
        sum(when(col("label") === -1, 1).otherwise(0)).as("n_neg"))
    val dfs = lab.groupBy("tok")
      .agg(sum(when(col("label") === 1, 1L).otherwise(0L)).as("df_pos"),
        sum(when(col("label") === -1, 1L).otherwise(0L)).as("df_neg"))
      .filter(col("df_pos") + col("df_neg") >= MinDf)
    dfs.crossJoin(broadcast(totals))
      .select(col("tok"), col("df_pos"), col("df_neg"),
        col("n_pos"), col("n_neg"),
        (when(col("df_pos") * col("n_neg") > col("df_neg") * col("n_pos"), 1)
          .when(col("df_pos") * col("n_neg") < col("df_neg") * col("n_pos"), -1)
          .otherwise(0)).cast("int").as("vote"))
  }

  /** Apply the model to EVERY doc (labeled or not): vote sum over the
    * doc's distinct known tokens, verdict = score >= 0, with the teacher
    * decile alongside so agreement is auditable downstream. */
  def clfScore(docs: DataFrame): DataFrame =
    clfScoreFrom(enrichedTokens(docs))

  /** [[clfScore]] over a prebuilt [[enrichedTokensPlan]] tally. */
  private[graft] def clfScoreFrom(enriched: DataFrame): DataFrame = {
    val votes = clfVocabFrom(enriched).select(col("tok"), col("vote"))
    val docToks = enriched.select(col("doc_id"), col("tok"))
      .filter(col("tok").isNotNull && col("tok") =!= "")
    docToks.join(votes, Seq("tok"))
      .groupBy("doc_id")
      .agg(sum(col("vote")).cast("long").as("score"),
        count(lit(1)).as("n_voting"))
      .join(enriched.groupBy("doc_id")
          .agg(max("teacher_decile").as("teacher_decile")),
        Seq("doc_id"), "right")
      .na.fill(0L, Seq("score", "n_voting"))
      .select(col("doc_id"), col("score"), col("n_voting"),
        (col("score") >= 0L).as("keep"), col("teacher_decile"))
  }

  private val tokSql =
    "list_distinct(list_transform(string_split_regex(trim(text), '\\s+'), w -> lower(w)))"
  private val decSql =
    s"LEAST(CAST(floor((${TextAnalysis.qualityScoreExprSql}) * 10) AS BIGINT), 9)"

  private def vocabCte: String =
    s"""lab AS (
       |  SELECT doc_id,
       |    CASE WHEN $decSql >= $PosDecile THEN 1
       |         WHEN $decSql <= $NegDecile THEN -1 END AS label,
       |    unnest($tokSql) AS tok
       |  FROM documents
       |  WHERE $decSql >= $PosDecile OR $decSql <= $NegDecile),
       |labnz AS (SELECT * FROM lab WHERE tok <> ''),
       |tot AS (SELECT
       |    CAST(SUM(CASE WHEN label = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
       |    CAST(SUM(CASE WHEN label = -1 THEN 1 ELSE 0 END) AS BIGINT) AS n_neg
       |  FROM (SELECT DISTINCT doc_id, label FROM labnz)),
       |dfs AS (SELECT tok,
       |    CAST(SUM(CASE WHEN label = 1 THEN 1 ELSE 0 END) AS BIGINT) AS df_pos,
       |    CAST(SUM(CASE WHEN label = -1 THEN 1 ELSE 0 END) AS BIGINT) AS df_neg
       |  FROM labnz GROUP BY tok
       |  HAVING (SUM(CASE WHEN label = 1 THEN 1 ELSE 0 END)
       |    + SUM(CASE WHEN label = -1 THEN 1 ELSE 0 END)) >= $MinDf),
       |vocab AS (SELECT tok, df_pos, df_neg, n_pos, n_neg,
       |    CASE WHEN df_pos * n_neg > df_neg * n_pos THEN 1
       |         WHEN df_pos * n_neg < df_neg * n_pos THEN -1
       |         ELSE 0 END AS vote
       |  FROM dfs CROSS JOIN tot)""".stripMargin

  /** DuckDB replay of [[clfVocab]]. */
  def clfVocabSql: String =
    s"""WITH $vocabCte
       |SELECT tok, df_pos, df_neg, n_pos, n_neg, vote FROM vocab
       |ORDER BY tok""".stripMargin

  /** DuckDB replay of [[clfScore]]. */
  def clfScoreSql: String =
    s"""WITH $vocabCte,
       |dt AS (SELECT doc_id, unnest($tokSql) AS tok FROM documents),
       |sc AS (SELECT doc_id, CAST(SUM(vote) AS BIGINT) AS score, COUNT(*) AS n_voting
       |  FROM dt JOIN vocab USING (tok) WHERE tok <> '' GROUP BY doc_id)
       |SELECT d.doc_id, COALESCE(sc.score, 0) AS score,
       |  COALESCE(sc.n_voting, 0) AS n_voting,
       |  COALESCE(sc.score, 0) >= 0 AS keep,
       |  $decSql AS teacher_decile
       |FROM documents d LEFT JOIN sc ON d.doc_id = sc.doc_id
       |ORDER BY d.doc_id""".stripMargin
}
