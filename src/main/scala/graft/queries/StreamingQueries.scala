package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.Tables
import graft.operators.{AsOfJoin, RangeJoin}
import graft.streaming.EventStreams

/** Streaming surface (net-new vs reference, SURVEY §2.9): each streaming
  * query replays the static events table through a file-source stream and
  * returns the completed sink; batch-equivalent DuckDB SQL oracles apply
  * where the streaming answer is engine-stable. */
object StreamingQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "stream_windowed_counts" -> ((s, d) => EventStreams.windowedCounts(s, d)),
    "stream_windowed_counts_append" -> ((s, d) => EventStreams.windowedCountsAppend(s, d)),
    "stream_dedup" -> ((s, d) => EventStreams.streamingDedup(s, d)),
    "stream_dedup_watermark" -> ((s, d) => EventStreams.streamingDedupWatermark(s, d)),
    "stream_sessionize" -> ((s, d) => EventStreams.sessionize(s, d)),
    "stream_sessionize_native" -> ((s, d) => EventStreams.sessionizeNative(s, d)),
    "stream_sessionize_ooo" -> ((s, d) => EventStreams.sessionizeNativeOoo(s, d)),
    "stream_asof" -> ((s, d) => EventStreams.streamingAsOf(s, d)),
    "stream_hll_distinct" -> ((s, d) => EventStreams.streamingHllDistinct(s, d)),
    "stream_interval_join" -> ((s, d) => EventStreams.streamingIntervalJoin(s, d)),
    "stream_cms_heavy_users" -> ((s, d) => EventStreams.streamingCmsHeavyUsers(s, d)),
    "stream_top_users" -> ((s, d) => EventStreams.streamingTopUsers(s, d)),
    "stream_ts_canary" -> ((s, d) => EventStreams.tsSpanCanary(s, d)),
    "stream_bus_source" -> ((s, _) => EventStreams.busWindowedCounts(s)),
    "stream_bus_features_pit" -> ((s, _) => EventStreams.busPitFeatures(s)),
    "stream_enrich" -> ((s, d) => EventStreams.streamingEnrich(s, d)),
    "stream_restart_dedup" -> ((s, d) => EventStreams.restartRecoveryDedup(s, d)),
    "stream_upsert" -> ((s, d) => EventStreams.streamingUpsert(s, d)),
    "stream_quantile_hist" -> ((s, d) => EventStreams.streamingQuantileHist(s, d)),
    "stream_kmv_distinct" -> ((s, d) => EventStreams.streamingKmvDistinct(s, d)),
    "stream_mv_maintenance" -> ((s, d) => EventStreams.streamingMvMaintenance(s, d)),
    "stream_interval_join_outer" -> ((s, d) => EventStreams.streamingIntervalJoinOuter(s, d)),
    "stream_features_pit" -> ((s, d) => EventStreams.streamingPitFeatures(s, d)),
    "stream_features_pit_ooo" -> ((s, d) => EventStreams.streamingPitFeaturesBuffered(s, d)),
    "stream_dedup_incremental" -> ((s, d) =>
      graft.streaming.CorpusStreams.streamingIncrementalDedup(s, d)),
    "stream_vocab_growth" -> ((s, d) =>
      graft.streaming.VocabStreams.streamingVocabGrowth(s, d)),
    // the INTEGER stage surface (sizes, deltas, training counts) is
    // hash-oracled via the vocab-growth relational chain; the float
    // hinge loss stays out of the registered projection (SQL cannot
    // train) and is gated in StreamingSpec's continual-contract twin
    "stream_continual_train" -> ((s, d) =>
      graft.streaming.VocabStreams.streamingContinualTrain(s, d)
        .select("k", "n_entities", "n_labels", "n_new_entities",
          "n_train_triples")),
    // ...but the trained CHECKPOINT is hash-oracled: integer-quantized
    // ranks over the continually-trained model (VERDICT r12 #4)
    "stream_continual_eval" -> ((s, d) =>
      graft.streaming.VocabStreams.streamingContinualEval(s, d)),
    "stream_txn_append" -> ((s, d) => EventStreams.streamingTxnAppend(s, d)),
    "stream_ann_probe" -> ((s, d) =>
      graft.streaming.CorpusStreams.streamingAnnProbe(s, d)),
    "stream_dsir_score" -> ((s, d) =>
      graft.streaming.CorpusStreams.streamingDsirScore(s, d)),
    "stream_decontaminate" -> ((s, d) =>
      graft.streaming.CorpusStreams.streamingDecontaminate(s, d)),
    "stream_search_maintained" -> ((s, d) =>
      graft.streaming.CorpusStreams.streamingSearchMaintained(s, d,
        PipelineQueries.searchTerms)),
    "stream_search_compacted" -> ((s, d) =>
      graft.streaming.CorpusStreams.streamingSearchCompacted(s, d,
        PipelineQueries.searchTerms)),
    "stream_search_bm25_maintained" -> ((s, d) =>
      graft.streaming.CorpusStreams.streamingSearchBm25Maintained(s, d,
        PipelineQueries.searchTerms)),
    "stream_search_bm25_compacted" -> ((s, d) =>
      graft.streaming.CorpusStreams.streamingSearchBm25Compacted(s, d,
        PipelineQueries.searchTerms)),
    "stream_ann_maintained" -> ((s, d) =>
      graft.streaming.CorpusStreams.streamingAnnMaintained(s, d)),
    "stream_search_tombstoned" -> ((s, d) =>
      graft.streaming.CorpusStreams.streamingSearchTombstoned(s, d,
        PipelineQueries.searchTerms)),
    "stream_search_purged" -> ((s, d) =>
      graft.streaming.CorpusStreams.streamingSearchPurged(s, d,
        PipelineQueries.searchTerms)),
    "q11_sessionize" -> ((s, d) => EventStreams.sessionizeBatch(Tables.events(s, d))),
    "q12_asof_join" -> ((s, d) => AsOfJoin.errorToLastClick(Tables.events(s, d))),
    "q32_asof_forward" -> ((s, d) => AsOfJoin.errorToNextClick(Tables.events(s, d))),
    "q16_range_join" -> ((s, d) => RangeJoin.concurrentSessions(Tables.events(s, d))),
    "q16_range_join_auto" -> ((s, d) => RangeJoin.concurrentSessionsAuto(Tables.events(s, d))))

  /** A `def`: stream_continual_eval's oracle embeds the staging dir of
    * the checkpoint the query actually ranked (set at run time — the
    * QuantizedEval volatile discipline). */
  def oracles: Map[String, String] = staticOracles ++
    graft.streaming.VocabStreams.continualEvalOracleOpt

  private val staticOracles: Map[String, String] = Map(
    "stream_windowed_counts" -> EventStreams.windowedCountsSql,
    // Append mode with watermark eviction (the production unbounded
    // spelling): the far-future sentinels close every real window before
    // the replay drains, so the emitted set equals the batch aggregation
    "stream_windowed_counts_append" -> EventStreams.windowedCountsSql,
    "stream_dedup" -> EventStreams.streamingDedupSql,
    // watermark-bounded dedup state (dropDuplicatesWithinWatermark): the
    // single-batch replay keeps every duplicate inside the delay, so the
    // emitted set equals the batch DISTINCT and shares its oracle
    "stream_dedup_watermark" -> EventStreams.streamingDedupSql,
    // the watermark sentinel flushes every final session, so the stream
    // equals the batch gaps-and-islands answer and shares its oracle
    "stream_sessionize" -> EventStreams.sessionizeBatchSql(),
    // the built-in session_window spelling must equal the same oracle —
    // gap+1 on floored seconds aligns merge/split boundaries exactly
    "stream_sessionize_native" -> EventStreams.sessionizeBatchSql(),
    // session_window over the OUT-OF-ORDER replay with a lateness-covering
    // watermark: late slices merge natively into the right sessions, so
    // the disordered stream still equals the batch gaps-and-islands oracle
    "stream_sessionize_ooo" -> EventStreams.sessionizeBatchSql(),
    // matches emit inline from keyed state, so the stream equals the
    // batch as-of exactly and shares its oracle
    "stream_asof" -> AsOfJoin.errorToLastClickSql,
    // online features emit inline from keyed running state folded in the
    // batch spelling's total (ts, event_id) order, so serving features
    // EQUAL training features exactly and share the offline oracle
    "stream_features_pit" -> graft.operators.EventAnalytics.pointInTimeFeaturesSql(),
    // watermark-buffered reordering: the staged OUT-OF-ORDER replay
    // (adjacent time slices swapped) must still equal the offline
    // training features exactly — same oracle as the in-order twins
    "stream_features_pit_ooo" -> graft.operators.EventAnalytics.pointInTimeFeaturesSql(),
    // register maintenance is order-insensitive, so the finite replay
    // equals the batch sketch and shares its oracle
    "stream_hll_distinct" -> graft.operators.Sketches.hllDistinctSql,
    // inner-join matches emit in the arriving micro-batch, so the finite
    // replay equals the batch self-join and shares its oracle
    "stream_interval_join" -> EventStreams.streamingIntervalJoinSql(),
    // the streamed grid equals the batch grid (order-insensitive counts)
    "stream_cms_heavy_users" -> graft.operators.Sketches.cmsHeavyUsersSql(),
    // streamed counts equal batch counts; the deterministic topk_pairs
    // ranking shares the batch window-replay oracle
    "stream_top_users" -> EventStreams.streamingTopUsersSql(),
    // source-format drift insurance: the span/count the stream sees must
    // equal what DuckDB reads from the same file
    "stream_ts_canary" -> EventStreams.tsSpanCanarySql,
    // the custom DSv2 bus connector: offset-tracked, admission-controlled,
    // block-permuted out-of-order event time; the integer-arithmetic
    // payload lets DuckDB replay the whole stream over range(n), so the
    // connector's end-to-end path carries a full hash oracle
    "stream_bus_source" -> EventStreams.busWindowedCountsSql(),
    // the capstone composition: watermark-buffered PIT features consumed
    // from the offset-tracked out-of-order bus — oracled by a relational
    // window replay of the same integer generator
    "stream_bus_features_pit" -> EventStreams.busPitFeaturesSql(),
    // bucket counting is order-insensitive, so the streamed HDR bucket
    // table — and every quantile read from it — equals batch exactly
    "stream_quantile_hist" -> EventStreams.streamingQuantileHistSql,
    // bottom-k retention is a clipped set union — order-insensitive, so
    // the streamed sketch equals batch and shares its oracle
    "stream_kmv_distinct" -> EventStreams.streamingKmvDistinctSql,
    // keyed count addition is associative + batch-partitioning-
    // insensitive: the incrementally-maintained rollup equals the
    // one-shot GROUP BY over raw events exactly
    "stream_mv_maintenance" -> EventStreams.streamingMvMaintenanceSql,
    // watermark eviction emits the unmatched rows; sentinels pass every
    // range, so the finite replay equals the batch LEFT JOIN
    "stream_interval_join_outer" -> EventStreams.streamingIntervalJoinOuterSql(),
    // stateless per-row enrichment is replay-order-insensitive, so the
    // finite replay equals the batch join and shares its oracle
    "stream_enrich" -> EventStreams.streamingEnrichSql,
    // a state/offset-recovery failure re-emits or drops keys, so the
    // checkpointed two-phase run matching DISTINCT IS the exactly-once
    // evidence (same oracle as stream_dedup)
    "stream_restart_dedup" -> EventStreams.streamingDedupSql,
    // key-disjoint change batches make the CDC-applied table equal the
    // one-shot merge, so the stream shares sink_upsert's oracle
    "stream_upsert" -> PipelineQueries.upsertOrdersSql,
    // every verdict is a function of (one arrival doc, corpus index) —
    // arrivals never compare to each other — so the micro-batched probe
    // union equals the one-shot batch probe and shares its oracle
    "stream_dedup_incremental" ->
      graft.streaming.CorpusStreams.streamingIncrementalDedupSql(),
    // postings are a pure per-document function, so the streamed delta
    // union the sliced base equals the from-scratch index — the oracle
    // is the batch conjunctive search over the FULL documents table
    "stream_search_maintained" ->
      graft.streaming.CorpusStreams.streamingSearchMaintainedSql(
        PipelineQueries.searchTerms),
    // compaction is a layout rewrite, not a semantics change: the merged
    // single-source index answers with the same rows, so the compacted
    // probe shares the identical full-documents oracle
    "stream_search_compacted" ->
      graft.streaming.CorpusStreams.streamingSearchMaintainedSql(
        PipelineQueries.searchTerms),
    // ranked retrieval over the maintained/compacted index: BM25's
    // scores depend on EVERY doc's length and the corpus constants, so
    // serving from maintained statistics must equal the from-scratch
    // full-documents ladder — the identical oracle the batch query uses
    "stream_search_bm25_maintained" ->
      graft.operators.Search.bm25SearchSql(PipelineQueries.searchTerms),
    "stream_search_bm25_compacted" ->
      graft.operators.Search.bm25SearchSql(PipelineQueries.searchTerms),
    // vector-ingest maintenance: frozen base quantizer, arrivals
    // assigned per micro-batch, queries rank base ∪ delta — assignment
    // to fixed centroids is a pure per-vector function, so the oracle
    // replays the whole maintained index from the three slices
    "stream_ann_maintained" ->
      graft.streaming.CorpusStreams.streamingAnnMaintainedSql(),
    // deletion: logically-tombstoned and physically-purged probes must
    // both equal the from-scratch search over documents minus the
    // takedown slice — one oracle for both halves of the claim
    "stream_search_tombstoned" ->
      graft.streaming.CorpusStreams.streamingSearchDeletedSql(
        PipelineQueries.searchTerms),
    "stream_search_purged" ->
      graft.streaming.CorpusStreams.streamingSearchDeletedSql(
        PipelineQueries.searchTerms),
    // id assignment DEPENDS on arrival order here (unlike the probes
    // above): the stream pins a deterministic content-defined batch
    // sequence and the oracle replays it as a fixed CTE chain
    "stream_vocab_growth" ->
      graft.streaming.VocabStreams.streamingVocabGrowthSql,
    // a batchId-transactional append survives a FORGED engine replay
    // (newest streaming commit deleted mid-run) — any double-append
    // breaks this GROUP BY oracle
    "stream_txn_append" -> EventStreams.streamingTxnAppendSql,
    // per-query results depend only on (query vector, corpus index), so
    // the micro-batched probe union equals the one-shot batch probe and
    // shares ann_ivf_probe's oracle
    "stream_ann_probe" ->
      graft.streaming.CorpusStreams.streamingAnnProbeSql(),
    // scores are per-doc functions of (doc, standing bucket model) — the
    // model covers all B buckets, so micro-batch chopping is invisible
    // and the stream shares the one-shot serving oracle
    "stream_dsir_score" ->
      graft.streaming.CorpusStreams.streamingDsirScoreSql(),
    // verdicts are per-doc functions of (doc, standing eval-gram set) —
    // arrivals never compare to each other — so the micro-batched union
    // equals the one-shot probe and shares the batch ladder's oracle
    // restricted to the arrival slice (all-verdicts form: an ingest
    // gate decides every doc)
    "stream_decontaminate" ->
      graft.streaming.CorpusStreams.streamingDecontaminateSql(),
    // integer stage metrics of the continual trainer: dictionary growth
    // replayed by the vocab-growth CTE chain, per-stage training counts
    // as relational aggregates over the content-defined batching (the
    // registered query projects the float hinge loss away)
    "stream_continual_train" ->
      graft.streaming.VocabStreams.streamingContinualTrainSql,
    "q11_sessionize" -> EventStreams.sessionizeBatchSql(),
    "q12_asof_join" -> AsOfJoin.errorToLastClickSql,
    // forward direction + tolerance: DuckDB's native forward ASOF is the
    // oracle; out-of-tolerance matches null out identically in both
    "q32_asof_forward" -> AsOfJoin.errorToNextClickSql(),
    "q16_range_join" -> RangeJoin.concurrentSessionsSql(),
    // natural range-join spelling, rewritten by the optimizer rule —
    // same answer, same oracle
    "q16_range_join_auto" -> RangeJoin.concurrentSessionsSql())
}
