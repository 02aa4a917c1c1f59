package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, content-keyed sampling — the reproducible alternative
  * to `rand()`-based sampling for training-data pipelines.
  *
  * Why hash-based: `df.sample()` / `rand()` draw from a per-task RNG, so
  * the selected rows change with partitioning, task retries, and
  * speculative execution — at 1000 executors a recomputed partition
  * silently yields a DIFFERENT sample. Keying the draw on
  * `md5(salt:key)` makes membership a pure function of the row: stable
  * across reruns, engines (the DuckDB oracle replays it), and cluster
  * layouts; changing the salt draws an independent sample. The filter
  * is a narrow codegen'd map — no shuffle, no state.
  *
  * The unit draw u = first-32-md5-bits / 2^32 is EXACT in double (the
  * numerator is an integer < 2^32), so threshold comparisons are
  * bit-identical in any engine.
  */
object Sampling {

  /** Uniform [0,1) draw keyed on (salt, key). */
  private[operators] def hashUnit(key: Column, salt: String): Column =
    conv(substring(md5(concat(lit(salt + ":"), key.cast("string"))), 1, 8), 16, 10)
      .cast("long").cast("double") / lit(4294967296.0)

  private[operators] def hashUnitSql(keyExpr: String, salt: String): String =
    s"CAST(${OracleSql.hexVal(s"md5('$salt:' || CAST($keyExpr AS VARCHAR))", 1, 8)} AS BIGINT)" +
      " / 4294967296.0"

  /** Deterministic Bernoulli sample of `rate` keyed on `keyCol`. */
  def hashSample(df: DataFrame, keyCol: String, rate: Double,
      salt: String = "sample"): DataFrame =
    df.filter(hashUnit(col(keyCol), salt) < rate)

  /** The documents sampled at `rate`, ids only (oracle-stable). */
  def sampleDocs(docs: DataFrame, rate: Double = 0.1): DataFrame =
    hashSample(docs, "doc_id", rate).select("doc_id")

  def sampleDocsSql(rate: Double = 0.1): String =
    s"""SELECT doc_id FROM documents
       |WHERE ${hashUnitSql("doc_id", "sample")} < $rate
       |ORDER BY doc_id""".stripMargin

  /** Deterministic stratified sample: cap each stratum (e.g. language,
    * source domain) at ~`target` docs — the standard corpus-rebalancing
    * pass before pretraining. Each stratum gets Bernoulli rate
    * min(1, target/n_stratum), keyed on content hash like [[hashSample]].
    *
    * Scale shape: one TINY aggregate (|strata| rows) broadcast back, then
    * a narrow codegen'd filter — no window, no per-stratum sort, no
    * shuffle of the corpus. Selected counts are Binomial(n, rate), not
    * exactly `target` — the honest distributed spelling (exact-N needs a
    * per-stratum ranking shuffle; at 100 TB the binomial spread is
    * negligible and the determinism is worth more).
    *
    * The membership test `u * n_stratum < target` stays in exact double
    * arithmetic (u = int/2^32 exact, n < 2^53), so DuckDB replays it
    * bit-for-bit. */
  def stratifiedSample(docs: DataFrame, strataCol: String = "lang",
      target: Long = 100, salt: String = "strat"): DataFrame = {
    val counts = docs.groupBy(strataCol)
      .agg(count(lit(1)).as("n_stratum"))
    docs.join(broadcast(counts), Seq(strataCol))
      .filter(hashUnit(col("doc_id"), salt) * col("n_stratum") < lit(target.toDouble))
      .select(col("doc_id"), col(strataCol))
  }

  def stratifiedSampleSql(strataCol: String = "lang", target: Long = 100): String =
    s"""WITH counts AS (SELECT $strataCol, COUNT(*) AS n_stratum
       |                FROM documents GROUP BY $strataCol)
       |SELECT doc_id, $strataCol FROM documents JOIN counts USING ($strataCol)
       |WHERE (${hashUnitSql("doc_id", "strat")}) * n_stratum < $target.0
       |ORDER BY doc_id""".stripMargin

  /** Token-budget source mixing — the data-mixing pass of a pretraining
    * pipeline: rebalance a multi-source corpus so every source contributes
    * (in expectation) the same token mass, by capping each source at the
    * SMALLEST source's token total. Source s with token total T_s gets
    * Bernoulli keep-rate T_min/T_s, keyed on content hash like every
    * sampler here (retry/partitioning-stable); the smallest source keeps
    * everything. Generalizing to arbitrary target weights is the same
    * shape with a weighted cap.
    *
    * Scale: one tiny per-source aggregate (|sources| rows) + its 1-row
    * min, both broadcast back; the corpus itself sees only a narrow
    * codegen'd filter — no shuffle. The membership test is spelled
    * `u * T_s < T_min` (one IEEE multiply + compare, identical operation
    * order in any engine), so the DuckDB oracle replays membership
    * bit-for-bit. */
  def mixSources(docs: DataFrame, salt: String = "mix"): DataFrame = {
    // persisted: the per-source totals chain and the membership filter
    // both consume the token-count table — unpersisted lineage re-ran
    // the corpus scan + tokenize per branch (r12 scan audit); three
    // small columns per doc, spillable
    val tok = docs.select(col("doc_id"), col("source"),
      size(split(trim(col("text")), "\\s+")).cast("long").as("n_tokens"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      .transform(graft.CacheScope.register)
    val tot = tok.groupBy("source").agg(sum("n_tokens").as("t_src"))
    val tmin = tot.agg(min("t_src").as("t_min"))
    tok.join(broadcast(tot), Seq("source"))
      .crossJoin(broadcast(tmin))
      .filter(hashUnit(col("doc_id"), salt) * col("t_src") < col("t_min"))
      .select(col("doc_id"), col("source"), col("n_tokens"))
  }

  def mixSourcesSql(salt: String = "mix"): String =
    s"""WITH tok AS (
       |  SELECT doc_id, source,
       |    CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS n_tokens
       |  FROM documents),
       |tot AS (SELECT source, SUM(n_tokens) AS t_src FROM tok GROUP BY source),
       |m AS (SELECT MIN(t_src) AS t_min FROM tot)
       |SELECT doc_id, source, n_tokens
       |FROM tok JOIN tot USING (source) CROSS JOIN m
       |WHERE (${hashUnitSql("doc_id", salt)}) * t_src < t_min
       |ORDER BY doc_id""".stripMargin

  /** Temperature-weighted source mixing at α = 1/2 — the standard
    * multinomial source-rebalancing used for multi-source pretraining
    * corpora (sampling mass ∝ T_s^α flattens the source distribution
    * without the hard equal-mass cap of [[mixSources]]). Downsampling
    * only, so rates are normalized to the smallest source:
    * rate_s = (T_min/T_s)^(1-α) = sqrt(T_min/T_s); α=0 recovers
    * [[mixSources]] exactly and α=1 keeps everything.
    *
    * α is fixed at 1/2 deliberately: the membership test is then
    * `u * sqrt(T_s) < sqrt(T_min)`, and IEEE-754 requires sqrt to be
    * CORRECTLY ROUNDED in every conforming engine (unlike pow, whose
    * last-ulp behavior is library-specific) — so the DuckDB oracle
    * replays membership bit-for-bit, same as every sampler here.
    *
    * Scale shape identical to [[mixSources]]: tiny per-source totals
    * broadcast back, narrow codegen'd filter, corpus never shuffled. */
  def mixSourcesTemperature(docs: DataFrame, salt: String = "mixt"): DataFrame = {
    // same persisted-tally discipline as mixSources
    val tok = docs.select(col("doc_id"), col("source"),
      size(split(trim(col("text")), "\\s+")).cast("long").as("n_tokens"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      .transform(graft.CacheScope.register)
    val tot = tok.groupBy("source").agg(sum("n_tokens").as("t_src"))
    val tmin = tot.agg(min("t_src").as("t_min"))
    tok.join(broadcast(tot), Seq("source"))
      .crossJoin(broadcast(tmin))
      .filter(hashUnit(col("doc_id"), salt) * sqrt(col("t_src").cast("double"))
        < sqrt(col("t_min").cast("double")))
      .select(col("doc_id"), col("source"), col("n_tokens"))
  }

  def mixSourcesTemperatureSql(salt: String = "mixt"): String =
    s"""WITH tok AS (
       |  SELECT doc_id, source,
       |    CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS n_tokens
       |  FROM documents),
       |tot AS (SELECT source, SUM(n_tokens) AS t_src FROM tok GROUP BY source),
       |m AS (SELECT MIN(t_src) AS t_min FROM tot)
       |SELECT doc_id, source, n_tokens
       |FROM tok JOIN tot USING (source) CROSS JOIN m
       |WHERE (${hashUnitSql("doc_id", salt)}) * sqrt(CAST(t_src AS DOUBLE))
       |      < sqrt(CAST(t_min AS DOUBLE))
       |ORDER BY doc_id""".stripMargin

  /** Curriculum assignment — quality-ordered training schedule: docs map
    * to `nStages` stages, stage 0 holding the top quality deciles (served
    * first), with a deterministic content-keyed order WITHIN each stage
    * (`order_ppm`, the first-32-md5-bits uniform scaled to ppm — exact in
    * double, so any engine replays it; same retry/partitioning-stability
    * argument as every sampler here). The quality expression is the SAME
    * one the cleaning gate and token-budget report use, so the stages
    * agree with the rest of the pipeline.
    *
    * Scale shape: one narrow codegen'd pass, no shuffle but the output
    * sort; a trainer consumes it by `WHERE stage = k ORDER BY order_ppm`
    * with stage/order as partition-prunable sort keys. */
  def curriculumAssign(docs: DataFrame, nStages: Int = 5): DataFrame = {
    val decile = least(floor(TextAnalysis.qualityScoreExpr * 10).cast("long"), lit(9L))
    val stage = floor(((lit(9L) - decile) * lit(nStages.toLong)).cast("double") / 10.0)
      .cast("long")
    val ord = floor(hashUnit(col("doc_id"), "curriculum") * 1000000).cast("long")
    docs.select(col("doc_id"), decile.as("quality_decile"),
        stage.as("stage"), ord.as("order_ppm"))
  }

  def curriculumAssignSql(nStages: Int = 5): String = {
    val q = TextAnalysis.qualityScoreExprSql
    val dec = s"LEAST(CAST(floor(($q) * 10) AS BIGINT), 9)"
    val u = hashUnitSql("doc_id", "curriculum")
    s"""SELECT doc_id, $dec AS quality_decile,
       |  CAST(floor(CAST((9 - $dec) * $nStages AS DOUBLE) / 10.0) AS BIGINT) AS stage,
       |  CAST(floor(($u) * 1000000) AS BIGINT) AS order_ppm
       |FROM documents ORDER BY doc_id""".stripMargin
  }

  /** Deterministic train/val/test assignment by hash range (80/10/10):
    * the standard reproducible experiment split, as a pure function of
    * the document id. Output: (split, n_docs, n_chars) — the split
    * SIZES; membership itself is recomputable by any engine from the
    * same ids. */
  def trainValTestSplit(docs: DataFrame): DataFrame = {
    val u = hashUnit(col("doc_id"), "split")
    docs.select(
      when(u < 0.8, "train").when(u < 0.9, "val").otherwise("test").as("split"),
      col("text"))
      .groupBy("split")
      .agg(count(lit(1)).as("n_docs"), sum(length(col("text"))).as("n_chars"))
      .orderBy("split")
  }

  def trainValTestSplitSql: String = {
    val u = hashUnitSql("doc_id", "split")
    s"""SELECT CASE WHEN $u < 0.8 THEN 'train'
       |            WHEN $u < 0.9 THEN 'val'
       |            ELSE 'test' END AS split,
       |  COUNT(*) AS n_docs, CAST(SUM(length(text)) AS BIGINT) AS n_chars
       |FROM documents GROUP BY 1 ORDER BY split""".stripMargin
  }

  /** Weight-proportional sample WITHOUT replacement via priority sampling
    * (Duffield, Lund & Thorup, JACM 2007): each row gets priority
    * w/u with u ~ U(0,1], the k highest priorities are kept. Unlike
    * Bernoulli-per-row sampling this returns EXACTLY k rows, and unlike
    * `rand()`-weighted reservoir schemes the draw is keyed on content
    * hash — stable under retries, partitioning, and engines.
    *
    * Integer-exact spelling (the engine-stability contract of this file):
    * u is the md5-derived 32-bit integer + 1 (range [1, 2^32]), and the
    * sort key is floor(w * 2^32 / u) computed in exact BIGINT arithmetic
    * (w ≤ 2^20 keeps the product < 2^52) — no transcendental, no float
    * sum, so DuckDB orders identically; ties (quantized priorities
    * collide) break on doc_id.
    *
    * Scale shape: a narrow codegen'd projection followed by a global
    * top-k — Spark plans sort+limit as TakeOrderedAndProject (per-
    * partition heaps of k, never a full sort; the driver merges
    * |parts| * k rows). At 100 TB this is the cheapest exact-k weighted
    * sample available: one pass, no shuffle of the data itself. */
  def prioritySample(docs: DataFrame, weightCol: String = "n_chars",
      k: Int = 100, salt: String = "wsample"): DataFrame = {
    val u = conv(substring(md5(concat(lit(salt + ":"),
        col("doc_id").cast("string"))), 1, 8), 16, 10)
      .cast("long") + lit(1L)
    docs.select(col("doc_id"), col(weightCol).cast("long").as("w"),
        u.as("u"))
      .select(col("doc_id"), col("w"),
        expr("(w * 4294967296L) div u").as("priority"))
      .orderBy(col("priority").desc, col("doc_id"))
      .limit(k)
  }

  def prioritySampleSql(weightCol: String = "n_chars", k: Int = 100,
      salt: String = "wsample"): String = {
    val u = s"(CAST(${OracleSql.hexVal(s"md5('$salt:' || CAST(doc_id AS VARCHAR))", 1, 8)} AS BIGINT) + 1)"
    s"""SELECT doc_id, CAST($weightCol AS BIGINT) AS w,
       |  (CAST($weightCol AS BIGINT) * 4294967296) // $u AS priority
       |FROM documents
       |ORDER BY priority DESC, doc_id LIMIT $k""".stripMargin
  }

  /** EXACT-k uniform sample PER GROUP — the "pull a fixed QA/eval sample
    * from every stratum" op. Keeps the k group members with the smallest
    * content-keyed hashes: deterministic (stable under retries,
    * partitioning, engines — the file's standing contract), uniform
    * within each group, and COORDINATED: a doc keeps its draw across
    * runs, so consecutive corpus snapshots produce overlapping samples
    * (bottom-k sketch semantics).
    *
    * Vs [[stratifiedSample]]: that one is Bernoulli at a rate (binomial
    * count, zero shuffle); this one is exactly min(k, |group|) rows. Vs
    * the window spelling (`row_number` over hash): same answer, but this
    * runs as the native bounded [[graft.functions.TopKPairsAgg]] —
    * ObjectHashAggregate with map-side partials, shuffling <= k pairs
    * per group per map partition and never sorting a partition (the q26
    * comparison). At 100 TB with thousands of strata that is one
    * ordinary hash-agg shuffle of bounded rows.
    *
    * topk_pairs keeps the TOP k by (ord DESC, id ASC); passing
    * ord = ~hash (bitwise NOT, overflow-free and strictly
    * order-reversing for signed longs — unlike arithmetic negation,
    * which maps Long.MinValue back to itself under non-ANSI overflow)
    * yields the k SMALLEST hashes, ties on doc_id. */
  def perGroupSample(docs: DataFrame, groupCol: String = "source",
      k: Int = 10, salt: String = "pgs"): DataFrame = {
    graft.functions.VectorFunctions.ensureRegistered(docs.sparkSession)
    val hv = conv(substring(md5(concat(lit(salt + ":"),
      col("doc_id").cast("string"))), 1, 16), 16, -10).cast("long")
    docs.select(col(groupCol), col("doc_id"), hv.as("hv"))
      .groupBy(groupCol)
      .agg(call_function("topk_pairs", bitwise_not(col("hv")), col("doc_id"), lit(k)).as("top"))
      .select(col(groupCol), posexplode(col("top")))
      .select(col(groupCol), (col("pos") + 1).cast("long").as("rn"),
        col("col.id").as("doc_id"))
  }

  def perGroupSampleSql(groupCol: String = "source", k: Int = 10,
      salt: String = "pgs"): String = {
    val hv = OracleSql.hex64Signed(s"md5('$salt:' || CAST(doc_id AS VARCHAR))")
    s"""SELECT $groupCol, rn, doc_id FROM (
       |  SELECT $groupCol, doc_id,
       |    ROW_NUMBER() OVER (PARTITION BY $groupCol
       |      ORDER BY ($hv) ASC, doc_id ASC) AS rn
       |  FROM documents)
       |WHERE rn <= $k ORDER BY $groupCol, rn""".stripMargin
  }
}
