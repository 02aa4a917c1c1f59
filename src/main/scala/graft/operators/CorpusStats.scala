package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus profiling statistics for training-data pipelines.
  *
  * The quantile spelling here is deliberately NOT `percentile` /
  * `approx_percentile`: exact `percentile` buffers every value of a group
  * in executor memory (dies at 100 TB strata), and t-digest
  * `approx_percentile` is not engine-stable (no oracle). Instead:
  * a VALUE HISTOGRAM — group by (stratum, value), then a running count
  * over the histogram. The first shuffle moves only (stratum, value)
  * pairs (bounded by value cardinality, not corpus size); the window runs
  * over the tiny histogram. Discrete quantiles fall out in pure integer
  * arithmetic, so the DuckDB oracle replays them exactly.
  */
object CorpusStats {

  /** Per-language discrete length quantiles: for each q in `qs` (percent),
    * the smallest n_chars value whose cumulative doc count reaches
    * ceil(q * n/100) — classic type-1 (lower) discrete quantile.
    * Output: (lang, q, n_docs, n_chars_q), integer-only. */
  def lengthQuantiles(docs: DataFrame,
      qs: Seq[Int] = Seq(25, 50, 75, 90, 99)): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val hist = docs.groupBy(col("lang"), col("n_chars"))
      .agg(count(lit(1)).as("cnt"))
    val tot = hist.groupBy("lang").agg(sum("cnt").as("n_docs"))
    val w = Window.partitionBy("lang").orderBy("n_chars")
    val cum = hist.withColumn("cum", sum("cnt").over(w))
    // cum*100 >= q*n  <=>  cum >= ceil(q*n/100): all-integer rank test
    cum.join(broadcast(tot), Seq("lang"))
      .crossJoin(broadcast(qs.map(_.toLong).toDF("q")))
      .filter(col("cum") * 100 >= col("q") * col("n_docs"))
      .groupBy("lang", "q")
      .agg(min(col("n_docs")).as("n_docs"), min(col("n_chars")).as("n_chars_q"))
      .select(col("lang"), col("q"), col("n_docs"), col("n_chars_q"))
      .orderBy("lang", "q")
  }

  /** Data-mixing report — the accounting table a pretraining run is
    * steered by: documents and whitespace tokens per
    * (source, lang, quality decile), plus each cell's share of the total
    * token budget in ppm. The quality expression is the SAME column
    * expression the cleaning pipeline gates on
    * ([[TextAnalysis.qualityScoreExpr]]), so the report matches what the
    * pipeline would actually keep per bucket.
    *
    * Scale shape: one narrow scoring pass, one map-side-combinable
    * aggregation keyed by (source, lang, decile) — cardinality is
    * sources x langs x 10, so the post-agg window for the share column
    * runs over a tiny table. Integer-only output (ppm by integer
    * division), full hash oracle. */
  def tokenBudgetReport(docs: DataFrame): DataFrame = {
    val toks = size(split(trim(col("text")), "\\s+")).cast("long")
    val decile = least(floor(TextAnalysis.qualityScoreExpr * 10).cast("long"), lit(9L))
    docs.select(col("source"), col("lang"),
        decile.as("quality_decile"), toks.as("n_toks"))
      .groupBy("source", "lang", "quality_decile")
      .agg(count(lit(1)).as("n_docs"), sum("n_toks").as("n_tokens"))
      .withColumn("token_share_ppm",
        expr("n_tokens * 1000000 DIV sum(n_tokens) OVER ()"))
      .orderBy("source", "lang", "quality_decile")
  }

  def tokenBudgetReportSql: String =
    s"""WITH scored AS (SELECT source, lang,
       |    LEAST(CAST(floor((${TextAnalysis.qualityScoreExprSql}) * 10) AS BIGINT), 9) AS quality_decile,
       |    CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS n_toks
       |  FROM documents),
       |cells AS (SELECT source, lang, quality_decile,
       |    COUNT(*) AS n_docs, CAST(SUM(n_toks) AS BIGINT) AS n_tokens
       |  FROM scored GROUP BY source, lang, quality_decile)
       |SELECT source, lang, quality_decile, n_docs, n_tokens,
       |  CAST(n_tokens * 1000000 // SUM(n_tokens) OVER () AS BIGINT) AS token_share_ppm
       |FROM cells ORDER BY source, lang, quality_decile""".stripMargin

  /** Source × language association report: for every (source, lang) cell
    * of the corpus contingency table, the observed doc count and the
    * LIFT vs independence — observed/(expected under independence) =
    * n_cell * N / (n_source * n_lang) — scaled to ppm by exact integer
    * arithmetic (1e6 = independent; above = over-represented). This is
    * the drift/association check a corpus curator runs when a crawl
    * source starts skewing the language mix.
    *
    * Scale shape: ONE full-data shuffle (the groupBy to cells); the
    * marginals are windows over the tiny cells table (|sources| x
    * |langs| rows), never a second pass over the corpus. Integer-only
    * output; the n_cell * N * 1e6 product needs DECIMAL beyond ~3e12
    * docs — far past any real corpus, noted for the audit. */
  def sourceLangLift(docs: DataFrame): DataFrame =
    docs.groupBy("source", "lang")
      .agg(count(lit(1)).as("n_docs"))
      .withColumn("lift_ppm", expr(
        "n_docs * sum(n_docs) OVER () * 1000000L DIV " +
          "(sum(n_docs) OVER (PARTITION BY source) * sum(n_docs) OVER (PARTITION BY lang))"))

  def sourceLangLiftSql: String =
    s"""WITH cells AS (SELECT source, lang, COUNT(*) AS n_docs
       |               FROM documents GROUP BY source, lang)
       |SELECT source, lang, n_docs,
       |  CAST(n_docs * SUM(n_docs) OVER () * 1000000 //
       |    (SUM(n_docs) OVER (PARTITION BY source) * SUM(n_docs) OVER (PARTITION BY lang))
       |    AS BIGINT) AS lift_ppm
       |FROM cells ORDER BY source, lang""".stripMargin

  /** Embedding-space drift monitor: per label (class/cluster), the L1
    * distance between the quantized per-dimension centroid of the
    * STANDING slice (vec_id % 10 != 7, the corpus) and of the ARRIVAL
    * slice (% 10 == 7) — the representation-shift check a vector feed
    * needs (a model/featurizer version bump or upstream distribution
    * change moves class centroids long before any per-vector check
    * fires). The vector twin of report_type_drift's categorical test.
    *
    * Integer contract (the repo's quantized-vector discipline): each
    * coordinate quantizes as floor((x + 16) * 2^20) — the +16 shift
    * keeps every sum NON-NEGATIVE so Spark's truncating DIV equals
    * DuckDB's floor `//`, and it cancels EXACTLY in the mean difference
    * (floor((S + nK)/n) = K + floor(S/n) for integer K). Per-dim means
    * are floor-divided sums, drift is the BIGINT sum of |mean diffs|.
    *
    * Scale shape: one embeddings pass; the posexplode fans out dim-fold
    * but map-side combine collapses to (label, dim) cells per partition,
    * so the one shuffle moves |labels| x dim x partitions tiny rows; the
    * per-label rollup is |labels| x dim input. Labels with an empty
    * slice are reported with drift NULL rather than dropped (a class
    * that STOPPED arriving is exactly what the monitor must surface). */
  def embeddingDrift(emb: DataFrame, scaleBits: Int = 20,
      offset: Long = 16L): DataFrame = {
    val scale = 1L << scaleBits
    val cells = emb
      .select(col("label").cast("long").as("label"),
        (col("vec_id") % 10 === 7).as("is_arr"),
        posexplode(col("embedding")).as(Seq("dim", "x")))
      .select(col("label"), col("is_arr"), col("dim"),
        floor((col("x").cast("double") + offset) * scale).cast("long").as("qx"))
      .groupBy("label", "dim")
      .agg(sum(when(!col("is_arr"), col("qx"))).as("s_ref"),
        sum(when(col("is_arr"), col("qx"))).as("s_arr"),
        sum(when(!col("is_arr"), 1L).otherwise(0L)).as("n_ref"),
        sum(when(col("is_arr"), 1L).otherwise(0L)).as("n_arr"))
    cells.groupBy("label")
      .agg(max("n_ref").as("n_ref"), max("n_arr").as("n_arr"),
        sum(abs(expr("s_ref DIV n_ref") - expr("s_arr DIV n_arr")))
          .as("l1_drift"))
  }

  def embeddingDriftSql(dim: Int = 64, scaleBits: Int = 20,
      offset: Long = 16L): String = {
    val scale = 1L << scaleBits
    s"""WITH q AS (
       |  SELECT CAST(label AS BIGINT) AS label, vec_id % 10 = 7 AS is_arr,
       |    CAST(i.i AS BIGINT) AS dim,
       |    CAST(floor((CAST(embedding[CAST(i.i + 1 AS INTEGER)] AS DOUBLE)
       |      + $offset) * $scale) AS BIGINT) AS qx
       |  FROM embeddings, range($dim) AS i(i)
       |), cells AS (
       |  SELECT label, dim,
       |    SUM(CASE WHEN NOT is_arr THEN qx END) AS s_ref,
       |    SUM(CASE WHEN is_arr THEN qx END) AS s_arr,
       |    COUNT(*) FILTER (WHERE NOT is_arr) AS n_ref,
       |    COUNT(*) FILTER (WHERE is_arr) AS n_arr
       |  FROM q GROUP BY label, dim
       |)
       |SELECT label, CAST(MAX(n_ref) AS BIGINT) AS n_ref,
       |  CAST(MAX(n_arr) AS BIGINT) AS n_arr,
       |  CAST(SUM(ABS(s_ref // n_ref - s_arr // n_arr)) AS BIGINT) AS l1_drift
       |FROM cells GROUP BY label ORDER BY label""".stripMargin
  }

  def lengthQuantilesSql(qs: Seq[Int] = Seq(25, 50, 75, 90, 99)): String =
    s"""WITH hist AS (SELECT lang, n_chars, COUNT(*) AS cnt
       |              FROM documents GROUP BY lang, n_chars),
       |tot AS (SELECT lang, SUM(cnt) AS n_docs FROM hist GROUP BY lang),
       |cum AS (SELECT lang, n_chars,
       |          SUM(cnt) OVER (PARTITION BY lang ORDER BY n_chars) AS cum
       |        FROM hist),
       |qs AS (SELECT unnest([${qs.mkString(", ")}]) AS q)
       |SELECT lang, CAST(q AS BIGINT) AS q, CAST(MIN(n_docs) AS BIGINT) AS n_docs,
       |       MIN(n_chars) AS n_chars_q
       |FROM cum JOIN tot USING (lang) CROSS JOIN qs
       |WHERE cum * 100 >= q * n_docs
       |GROUP BY lang, q ORDER BY lang, q""".stripMargin
}
