package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end corpus cleaning — the operators composed the way a real
  * training-data pipeline chains them:
  *
  *   quality gate -> PII scrub -> exact content dedup -> deterministic
  *   sample
  *
  * Everything stays one lazy DataFrame chain (Catalyst sees the whole
  * pipeline: the quality ratios, the scrub regexes, the dedup
  * aggregation and the sample filter fuse into three stages — scan+map,
  * one shuffle for the content groupBy, output sort), and every stage
  * reuses the deterministic primitives that already carry their own
  * oracles, so the COMPOSITION has a full hash oracle too: the DuckDB
  * replay chains the same quality SQL, the same redaction regexes, the
  * same md5 grouping and the same hash-threshold sample.
  */
object CorpusPipeline {

  /** Surviving documents after the full clean: (doc_id, content_md5),
    * where doc_id is the smallest id among exact duplicates of the
    * scrubbed content. */
  def cleanCorpus(docs: DataFrame, minQuality: Double = 0.2,
      sampleRate: Double = 0.5): DataFrame = {
    val quality = TextAnalysis.qualityScore(docs)
      .select(col("doc_id"), col("quality_score"))
    val kept = docs.join(quality, "doc_id")
      .filter(col("quality_score") >= minQuality)
    val scrubbed = kept.select(col("doc_id"),
      md5(TextAnalysis.redactedText(col("text"))).as("content_md5"))
    val deduped = scrubbed.groupBy("content_md5").agg(min("doc_id").as("doc_id"))
    Sampling.hashSample(deduped, "doc_id", sampleRate, salt = "clean")
      .select(col("doc_id"), col("content_md5"))
      .orderBy("doc_id")
  }

  /** Stage-by-stage funnel counts: (stage, n_docs) — four lazy
    * aggregations unioned, no driver-side counting. */
  def funnel(docs: DataFrame, minQuality: Double = 0.2,
      sampleRate: Double = 0.5): DataFrame = {
    val quality = TextAnalysis.qualityScore(docs)
      .select(col("doc_id"), col("quality_score"))
    val kept = docs.join(quality, "doc_id")
      .filter(col("quality_score") >= minQuality)
    val deduped = kept
      .select(col("doc_id"), md5(TextAnalysis.redactedText(col("text"))).as("content_md5"))
      .groupBy("content_md5").agg(min("doc_id").as("doc_id"))
    val sampled = Sampling.hashSample(deduped, "doc_id", sampleRate, salt = "clean")
    def stage(name: String, df: DataFrame) =
      df.agg(count(lit(1)).as("n_docs")).select(lit(name).as("stage"), col("n_docs"))
    stage("1_input", docs)
      .union(stage("2_quality", kept))
      .union(stage("3_dedup", deduped))
      .union(stage("4_sample", sampled))
      .orderBy("stage")
  }

  private def keptSql(minQuality: Double, sampleRate: Double): String =
    s"""q AS (SELECT doc_id, quality_score FROM (${TextAnalysis.qualityScoreSql})),
       |kept AS (SELECT d.doc_id, d.text FROM documents d
       |         JOIN q USING (doc_id) WHERE quality_score >= $minQuality),
       |deduped AS (SELECT content_md5, MIN(doc_id) AS doc_id FROM (
       |    SELECT doc_id, md5(${TextAnalysis.redactedTextSql("text")}) AS content_md5
       |    FROM kept)
       |  GROUP BY content_md5),
       |sampled AS (SELECT doc_id, content_md5 FROM deduped
       |  WHERE ${Sampling.hashUnitSql("doc_id", "clean")} < $sampleRate)""".stripMargin

  def cleanCorpusSql(minQuality: Double = 0.2, sampleRate: Double = 0.5): String =
    s"""WITH ${keptSql(minQuality, sampleRate)}
       |SELECT doc_id, content_md5 FROM sampled ORDER BY doc_id""".stripMargin

  def funnelSql(minQuality: Double = 0.2, sampleRate: Double = 0.5): String =
    s"""WITH ${keptSql(minQuality, sampleRate)}
       |SELECT '1_input' AS stage, COUNT(*) AS n_docs FROM documents
       |UNION ALL SELECT '2_quality', COUNT(*) FROM kept
       |UNION ALL SELECT '3_dedup', COUNT(*) FROM deduped
       |UNION ALL SELECT '4_sample', COUNT(*) FROM sampled
       |ORDER BY stage""".stripMargin
}
