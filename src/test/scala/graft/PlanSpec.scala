package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{FormattedMode, SimpleMode}
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions
import graft.queries.Relational

/** Physical-plan assertions: the optimizations the engine's scale story
  * depends on must be visible in the plan, not assumed. A regression that
  * turns a broadcast join into a sort-merge join or loses column pruning
  * fails here even though results stay correct. */
class PlanSpec extends SparkSpec {

  /** Tree-only plan (each operator printed once — for counting). */
  private def simplePlan(df: DataFrame): String =
    df.queryExecution.explainString(SimpleMode)

  /** Detailed plan (ReadSchema / PushedFilters / conditions). */
  private def formattedPlan(df: DataFrame): String =
    df.queryExecution.explainString(FormattedMode)

  test("operators return UNSORTED: no global sort in any oracle-ordered raw plan") {
    // VERDICT r5 #2: the oracle presentation sort lives at the
    // registration boundary (PipelineQueries.oracleOrder), not in the
    // operator — a total sort of a corpus-sized output inside the
    // operator is a needless range-shuffle at 100 TB. A global Sort
    // plans as Exchange rangepartitioning; window/top-k sorts (local or
    // TakeOrdered) are semantic and allowed.
    val po = graft.queries.PipelineQueries
    assert((po.oracleOrder.keySet -- po.rawQueries.keySet).isEmpty,
      s"oracleOrder names without a registration: ${po.oracleOrder.keySet -- po.rawQueries.keySet}")
    po.oracleOrder.keys.toSeq.sorted.foreach { name =>
      val p = simplePlan(po.rawQueries(name)(spark, sf))
      assert(!p.contains("rangepartitioning"),
        s"$name's raw operator plan contains a global sort:\n$p")
    }
    // and the registered surface DOES present the oracle order
    val registered = simplePlan(po.queries("dedup_exact")(spark, sf))
    assert(registered.contains("rangepartitioning") ||
      registered.contains("Sort ["), "registration boundary lost the oracle sort")
  }

  test("q1_agg: parquet scan prunes to exactly the 5 referenced columns") {
    val p = formattedPlan(Relational.q1Agg(spark, sf))
    val readSchema = "ReadSchema: struct<(.*?)>".r
      .findFirstMatchIn(p).map(_.group(1)).getOrElse(fail("no ReadSchema"))
    val cols = readSchema.split(",").map(_.split(":").head.trim).toSet
    assert(cols == Set("l_quantity", "l_extendedprice", "l_discount",
      "l_returnflag", "l_linestatus"), s"got: $cols")
  }

  test("q1_agg: partial (map-side) + final aggregation") {
    val p = simplePlan(Relational.q1Agg(spark, sf))
    assert("HashAggregate".r.findAllIn(p).length >= 2,
      "expected partial+final HashAggregate pair")
  }

  test("q3: star join broadcasts both dims, no sort-merge join") {
    val p = simplePlan(Relational.q3BroadcastJoin(spark, sf))
    assert("BroadcastHashJoin".r.findAllIn(p).length == 2, p)
    assert(!p.contains("SortMergeJoin"), "dims must broadcast, not SMJ")
  }

  test("q5: semi join stays broadcast; segment filter pushed to scan") {
    val p = formattedPlan(Relational.q5SemiJoin(spark, sf))
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftSemi"), p)
    assert(p.contains("EqualTo(c_mktsegment,BUILDING)"),
      "segment predicate must reach the parquet scan")
  }

  test("q4: anti join planned as hash anti join with pushed status filter") {
    val p = formattedPlan(Relational.q4AntiJoin(spark, sf))
    assert(p.contains("LeftAnti"), p)
    assert(p.contains("EqualTo(o_orderstatus,F)"),
      "status predicate must reach the orders scan")
  }

  test("q27: runtime Bloom filter injected on the application side; join shuffles") {
    val df = Relational.q27RuntimeFilter(spark, sf)
    val opt = df.queryExecution.optimizedPlan.toString
    assert(opt.contains("might_contain"),
      s"no runtime bloom probe in optimized plan:\n$opt")
    assert(opt.contains("bloom_filter_agg"),
      "no bloom_filter_agg creation subquery in optimized plan")
    // the tuned conf lives in the cloned session only — the shared test
    // session must still plan broadcast joins (no leaked -1 threshold)
    assert(spark.conf.get("spark.sql.autoBroadcastJoinThreshold") != "-1",
      "cloned-session conf leaked into the parent session")
    val p = simplePlan(df)
    assert(!p.contains("BroadcastHashJoin"),
      "q27 models the no-broadcast regime; join must shuffle")
  }

  test("q8: dense id assignment has no single-partition exchange") {
    // the global-window spelling (row_number over Window.orderBy) funnels
    // the whole vocabulary through ONE task; the zipWithIndex spelling
    // must not produce an Exchange SinglePartition anywhere
    val p = simplePlan(Relational.q8DictEncode(spark, sf))
    assert(!p.contains("Exchange SinglePartition"), p)
  }

  test("q9: global top-k avoids a full sort (TakeOrderedAndProject)") {
    val p = simplePlan(Relational.q9TopK(spark, sf))
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("ann_near_dup: native vector_cosine evaluated in the join condition") {
    val df = graft.operators.SimilaritySearch.cosineNearDupExact(
      Tables.embeddings(spark, sf))
    val p = formattedPlan(df)
    assert(p.contains("vector_cosine"), "custom expression must appear in plan")
  }

  test("vector expressions run inside whole-stage codegen in projections") {
    val df = Tables.embeddings(spark, sf)
      .select(VectorFunctions.cosine(spark, col("embedding"), col("embedding")).as("c"))
    df.collect()
    // the "*(n)" prefix marks operators fused into a WholeStageCodegen stage
    assert("""\*\(\d+\) Project \[vector_cosine""".r
      .findFirstIn(df.queryExecution.executedPlan.toString).isDefined,
      "projection with vector_cosine must be codegen'd (expected *(n) prefix)")
    // and the generated code must be the primitive loop, not eval fallback
    assert(!formattedPlan(df).contains("CodegenFallback"))
  }

  test("multiple vector expressions in ONE codegen scope compile (no fallback)") {
    // regression: the emitted loop locals (n, s, i, ...) must be scoped —
    // with non-nullable inputs, two expressions in one consume function
    // would otherwise declare duplicates and Janino would reject the stage
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val e = col("embedding")
      val df = Tables.embeddings(spark, sf).select(
        VectorFunctions.cosine(spark, e, e).as("c"),
        VectorFunctions.dot(spark, e, e).as("d"),
        VectorFunctions.l2sq(spark, e, e).as("l2"),
        VectorFunctions.l1(spark, e, e).as("l1"))
      assert(df.collect().nonEmpty)
    } finally spark.conf.set("spark.sql.codegen.fallback", "true")
  }

  test("salted join shuffles on (key, salt) when broadcast is off") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val li = Tables.lineitem(spark, sf).select(col("l_partkey").as("k"), col("l_quantity"))
      val p = Tables.part(spark, sf).select(col("p_partkey").as("k"), col("p_brand"))
      val plan = simplePlan(graft.operators.SkewJoin.saltedJoin(li, p, "k"))
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"), plan)
      assert(plan.contains("__salt"), "join key must include the salt column")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("q33_scd2_join: equi-key broadcast join with range residual, facts never shuffle") {
    val p = simplePlan(graft.queries.Relational.q33Scd2Join(spark, sf))
    assert(p.contains("BroadcastHashJoin"),
      s"SCD2 join must broadcast the versioned dim:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"the validity range must be a residual on the equi-join, not the join itself:\n$p")
  }

  test("search family: term filter precedes every shuffle; top-k is TakeOrdered") {
    val terms = graft.queries.PipelineQueries.searchTerms
    // keyword search: no join at all — explode, filter, two hash aggs
    val kw = simplePlan(graft.operators.Search.keywordSearch(
      Tables.documents(spark, sf), terms))
    assert(!kw.contains("Join"), s"conjunctive search needs no join:\n$kw")
    // ranked search: global top-k must be heap-based, never a full sort
    val tf = simplePlan(graft.operators.Search.tfidfSearch(
      Tables.documents(spark, sf), terms))
    assert(tf.contains("TakeOrderedAndProject"), s"top-k must be TakeOrdered:\n$tf")
    assert(!tf.contains("rangepartitioning"), s"no global sort in ranked search:\n$tf")
    // BM25: same posting-list economics — heap top-k, no cartesian beyond
    // the broadcast 1-row corpus stat
    val bm = simplePlan(graft.operators.Search.bm25Search(
      Tables.documents(spark, sf), terms))
    assert(bm.contains("TakeOrderedAndProject"), s"bm25 top-k must be TakeOrdered:\n$bm")
    assert(!bm.contains("rangepartitioning") && !bm.contains("CartesianProduct"),
      s"bm25 must not globally sort or go cartesian:\n$bm")
  }

  test("dsir selection: B-row model broadcasts, heap top-k, no cartesian") {
    val p = simplePlan(graft.operators.ImportanceSampling.dsirTopK(
      Tables.documents(spark, sf), "src1"))
    assert(p.contains("TakeOrderedAndProject"), s"selection cut must be TakeOrdered:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("rangepartitioning"),
      s"dsir must not go cartesian or globally sort:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"the bucket model should broadcast:\n$p")
  }

  test("q34_latest_by_key: sortless bounded agg + broadcast fetch-back, no window") {
    val p = simplePlan(graft.queries.Relational.q34LatestByKey(spark, sf))
    assert(p.contains("ObjectHashAggregate"),
      s"latest-by-key must run as the bounded topk aggregate:\n$p")
    assert(!p.contains("SortAggregate") && !p.contains("Window"),
      s"neither struct-max's SortAggregate nor a window may appear:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"payload fetch-back must broadcast the keys-sized winner set:\n$p")
  }

  test("LSH near-dup candidates come from an equi-join, never a cartesian") {
    val df = graft.operators.SimilaritySearch.cosineNearDupLsh(
      Tables.embeddings(spark, sf), tau = 0.9)
    val p = simplePlan(df)
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"candidate generation must be an equi-join:\n$p")
  }

  test("banded hyperplane ANN: equi-join candidates, vectors fetched by id") {
    val df = graft.operators.SimilaritySearch.randomHyperplaneAnn(
      Tables.embeddings(spark, sf), bitsPerTable = 12, k = 3)
    val p = simplePlan(df)
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p)
  }

  test("range join: bin equi-join, never the nested-loop range plan") {
    // the naive `t BETWEEN start AND end` join has no equi-key and Catalyst
    // plans a BroadcastNestedLoopJoin — O(|P| * |I|); the bucketed spelling
    // must keep an equi-join on the bin
    val p = simplePlan(graft.operators.RangeJoin.concurrentSessions(
      Tables.events(spark, sf)))
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"range join must bucket to an equi-join:\n$p")
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin")
      || p.contains("ShuffledHashJoin"), p)
  }

  test("source mixing: corpus side is a narrow broadcast-joined filter") {
    val p = simplePlan(graft.operators.Sampling.mixSources(
      Tables.documents(spark, sf)))
    // per-source totals and their min broadcast back; the corpus is never
    // shuffled by a join (only the tiny aggregates and the output sort)
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
      s"corpus must join the tiny rate tables by broadcast:\n$p")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("sink_bucketed_join: co-located join reads carry the distribution — no join-side exchange") {
    val p = simplePlan(graft.operators.BucketedSink.bucketedJoin(spark, sf))
    assert(p.contains("SortMergeJoin"), p)
    // bucketed scans satisfy the join's distribution; only the tiny
    // priority agg and the output sort may exchange
    assert(!p.contains("Exchange hashpartitioning(l_orderkey"), p)
    assert(!p.contains("Exchange hashpartitioning(o_orderkey"), p)
  }

  test("temperature mixing: corpus side is a narrow broadcast-joined filter") {
    val p = simplePlan(graft.operators.Sampling.mixSourcesTemperature(
      Tables.documents(spark, sf)))
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
      s"corpus must join the tiny rate tables by broadcast:\n$p")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("filter reasons: one single-row agg pair, corpus never shuffled by key") {
    val p = simplePlan(graft.operators.TextAnalysis.filterReasons(
      Tables.documents(spark, sf)))
    // the only exchange is the 1-row final-agg gather (the presentation
    // sort is registry-owned, applied at the PipelineQueries boundary)
    val exchanges = "Exchange".r.findAllIn(p).length
    assert(exchanges <= 1, s"expected <=1 exchange, got $exchanges:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("Join"), p)
  }

  test("token budget report: keyed agg shuffle; share window over tiny cells only") {
    val p = simplePlan(graft.operators.CorpusStats.tokenBudgetReport(
      Tables.documents(spark, sf)))
    // agg exchange + the window's single-partition exchange (cells table,
    // |sources|x|langs|x10 rows) + the output sort — never a corpus window
    val exchanges = "Exchange".r.findAllIn(p).length
    assert(exchanges <= 3, s"expected <=3 exchanges, got $exchanges:\n$p")
    assert(p.contains("Window"), p)
    assert(!p.contains("Join"), p)
  }

  test("dedup_exact: one shuffle for the agg + one for the output sort") {
    val p = simplePlan(graft.operators.Dedup.exact(Tables.documents(spark, sf)))
    val exchanges = "Exchange".r.findAllIn(p).length
    assert(exchanges <= 2, s"expected <=2 exchanges, got $exchanges:\n$p")
  }

  test("hll TypedImperativeAggregate plans as ObjectHashAggregate, buffers only") {
    val df = graft.operators.Sketches.hllDistinctAgg(
      Tables.events(spark, sf), "event_type", "user_id")
    val p = simplePlan(df)
    assert(p.contains("ObjectHashAggregate"),
      s"TypedImperativeAggregate must use the object hash agg exec:\n$p")
    assert(p.contains("hll_sketch"), p)
    // partial + final on the estimate branch: the shuffle carries 4 KB
    // buffers, never (grp, bucket, rank) register rows
    assert("hll_sketch".r.findAllIn(p).length >= 2,
      s"expected partial AND final hll_sketch aggregation:\n$p")
  }

  test("hdr_quantile plans as partial+final ObjectHashAggregate") {
    val df = graft.operators.Sketches.hdrQuantileHist(
      Tables.documents(spark, sf))
    val p = simplePlan(df)
    assert(p.contains("ObjectHashAggregate"),
      s"hdr_quantile must use the object hash agg exec:\n$p")
    // partial bucket tables merge map-side; the shuffle carries one
    // 7.5 KB buffer per (group, quantile) per map partition
    assert("hdr_quantile".r.findAllIn(p).length >= 2,
      s"expected partial AND final hdr_quantile aggregation:\n$p")
  }

  test("grouped topk plans as partial+final ObjectHashAggregate, no window sort") {
    val df = graft.queries.Relational.q26GroupedTopK(spark, sf)
    val p = simplePlan(df)
    assert(p.contains("ObjectHashAggregate"),
      s"topk_pairs must use the object hash agg exec:\n$p")
    // partial map-side heaps + final merge: the shuffle carries <=k pairs
    // per group per partition — never the sorted full row set
    assert("topk_pairs".r.findAllIn(p).length >= 2,
      s"expected partial AND final topk_pairs aggregation:\n$p")
    assert(!p.contains("Window"),
      s"the aggregate spelling must not fall back to a window sort:\n$p")
  }

  test("semantic dedup pairs: cell equi-join, never a cartesian") {
    val p = simplePlan(graft.operators.SemanticDedup.pairs(
      Tables.embeddings(spark, sf)))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"within-cell candidates must come from the cell equi-join:\n$p")
  }

  test("hll sketch: register build is a partial+final aggregation pair") {
    val p = simplePlan(graft.operators.Sketches.hllDistinct(
      Tables.events(spark, sf), "event_type", "user_id"))
    assert("HashAggregate".r.findAllIn(p).length >= 2,
      s"register build must combine map-side:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("hash sample: narrow filter — no shuffle except the output sort") {
    val p = simplePlan(graft.operators.Sampling.sampleDocs(
      Tables.documents(spark, sf)))
    val exchanges = "Exchange".r.findAllIn(p).length
    assert(exchanges <= 1, s"deterministic sample must not shuffle:\n$p")
  }

  test("clean-corpus pipeline fuses into few stages: quality+scrub+dedup+sample") {
    val p = simplePlan(graft.operators.CorpusPipeline.cleanCorpus(
      Tables.documents(spark, sf)))
    // quality gate + scrub + sample are all inline expressions over ONE
    // scan (no self-join); the content dedup is the only real shuffle,
    // plus the output sort
    assert(!p.contains("Join"), s"pipeline must not join — inline exprs:\n$p")
    val exchanges = "Exchange".r.findAllIn(p).length
    assert(exchanges <= 2, s"expected <=2 exchanges (dedup agg + sort):\n$p")
  }

  test("decontaminate: eval grams broadcast; corpus side never shuffles for the join") {
    val p = simplePlan(graft.operators.Decontaminate.flagContaminated(
      Tables.documents(spark, sf)))
    assert(p.contains("BroadcastHashJoin"), s"eval grams must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"), p)
  }

  test("decontaminate: train shingles are a narrow map (no distinct shuffle)") {
    // the per-row array_distinct spelling must keep the corpus side down
    // to the broadcast lookup: exchanges only for the tiny eval-gram
    // distinct and the final per-doc agg + sort
    val p = simplePlan(graft.operators.Decontaminate.flagContaminated(
      Tables.documents(spark, sf)))
    val exchanges = "Exchange".r.findAllIn(p).length
    assert(exchanges <= 4, s"corpus shingles must not shuffle:\n$p")
  }

  test("stratified sample: corpus is filtered, never shuffled") {
    val p = simplePlan(graft.operators.Sampling.stratifiedSample(
      Tables.documents(spark, sf)))
    assert(p.contains("BroadcastHashJoin"), s"stratum rates must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), p)
    // exchanges: the tiny stratum-count agg (pair) + the output sort only
    val exchanges = "Exchange".r.findAllIn(p).length
    assert(exchanges <= 3, s"corpus must not shuffle:\n$p")
  }

  test("length quantiles: first shuffle moves only the value histogram") {
    val p = simplePlan(graft.operators.CorpusStats.lengthQuantiles(
      Tables.documents(spark, sf)))
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"),
      s"totals + quantile levels must broadcast:\n$p")
    // the only acceptable non-equi join is the broadcast cross with the
    // 5-row quantile-level table; a shuffled join of the histogram is not
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"), p)
  }

  test("q19: EXISTS subquery rewrites to a semi join, not a cartesian") {
    val p = simplePlan(Relational.q19Exists(spark, sf))
    assert(p.contains("LeftSemi"), s"EXISTS must plan as a semi join:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p)
  }

  test("q19: lineitem scan pruned to the two referenced columns") {
    val p = formattedPlan(Relational.q19Exists(spark, sf))
    assert(p.contains("l_orderkey") && p.contains("l_returnflag"), p)
    assert(!p.contains("l_extendedprice"),
      s"semi-join build side must not read unused columns:\n$p")
  }

  test("q22: pivot with explicit values is one agg pair, no value-collect job") {
    val df = Relational.q22Pivot(spark, sf)
    val p = simplePlan(df)
    // conditional aggregation: partial + final HashAggregate, single shuffle
    // on day (plus the output sort) — no join, no per-value scan
    assert("HashAggregate".r.findAllIn(p).length >= 2, p)
    assert(!p.contains("Join"), s"pivot must not join:\n$p")
  }

  test("q28: json extraction prunes the scan to (event_type, props) only") {
    val df = Relational.q28JsonProps(spark, sf)
    val p = formattedPlan(df)
    val readSchema = "ReadSchema: struct<(.*?)>".r
      .findFirstMatchIn(p).map(_.group(1)).getOrElse(fail("no ReadSchema"))
    val cols = readSchema.split(",").map(_.split(":").head.trim).toSet
    // the ts normalization withColumn must not defeat pruning: ts is
    // unused downstream, so the scan reads only the two live columns
    assert(cols == Set("event_type", "props"), s"got: $cols")
    val s = simplePlan(df)
    assert("HashAggregate".r.findAllIn(s).length >= 2,
      "expected partial+final agg pair")
    assert(!s.contains("Join"), s"json extraction must not join:\n$s")
  }

  test("sink_upsert: one key-shuffle merge — anti join + union, no cartesian") {
    val df = graft.queries.PipelineQueries.upsertOrders(spark, sf)
    val p = simplePlan(df)
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"upsert must join by key:\n$p")
    assert(p.contains("Union"), "expected untouched ∪ survivors union")
  }

  test("profile_columns: single stacked aggregate, scan pruned to the profiled set") {
    val df = graft.queries.PipelineQueries.profileColumnsOrders(spark, sf)
    val p = formattedPlan(df)
    assert(!p.contains("Join"), s"profiler must not join:\n$p")
    val readSchema = "ReadSchema: struct<(.*?)>".r
      .findFirstMatchIn(p).map(_.group(1)).getOrElse(fail("no ReadSchema"))
    val cols = readSchema.split(",").map(_.split(":").head.trim).toSet
    assert(cols == graft.queries.PipelineQueries.ordersProfileCols.toSet, s"got: $cols")
  }

  test("q23: lead/lag window is partitioned — no single-partition exchange") {
    val p = simplePlan(Relational.q23LeadLag(spark, sf))
    assert(!p.contains("Exchange SinglePartition"),
      s"per-user window must hash-partition on user_id:\n$p")
  }

  test("RangeJoinRewrite: natural range join plans as equi-join, not BNLJ") {
    val df = graft.operators.RangeJoin.concurrentSessionsAuto(Tables.events(spark, sf))
    val p = simplePlan(df)
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"the optimizer rule must bucket the range predicate:\n$p")
    assert(p.contains("__graft_bin"), s"rewritten join must key on the bin:\n$p")
  }

  test("RangeJoinRewrite: leaves equi-joins and non-range joins alone") {
    graft.plans.RangeJoinRewrite.ensureInstalled(spark)
    // equi-join: must stay a plain hash join, no bin artifacts
    val eq = simplePlan(Relational.q3BroadcastJoin(spark, sf))
    assert(!eq.contains("__graft_bin"), eq)
    // single-inequality join (no two-sided range): untouched
    val a = Tables.orders(spark, sf).select(col("o_orderkey").as("k1"))
    val b = Tables.orders(spark, sf).select(col("o_orderkey").as("k2"))
    val one = a.join(b, col("k1") < col("k2"))
    assert(!simplePlan(one).contains("__graft_bin"), simplePlan(one))
  }

  test("tokenize: vocab broadcast to the exploded corpus, never an SMJ") {
    val p = simplePlan(graft.operators.VocabBuild.tokenize(Tables.documents(spark, sf)))
    assert(p.contains("BroadcastHashJoin"),
      s"the thresholded vocab must broadcast for the id lookup:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"the token stream must not shuffle for the vocab join:\n$p")
  }

  test("partitioned sink: event_type filter prunes at planning time") {
    val df = graft.operators.PartitionedSink.prunedDailyAgg(spark, sf)
    val p = formattedPlan(df)
    assert(p.contains("PartitionFilters") &&
      """PartitionFilters: \[[^\]]*event_type""".r.findFirstIn(p).isDefined,
      s"event_type must be consumed by the file index, not a row filter:\n$p")
    // the partition column never appears in the data schema read
    assert("""ReadSchema: [^\n]*event_type""".r.findFirstIn(p).isEmpty,
      s"partition column must not be read from data files:\n$p")
  }

  test("kg_triples: no shuffle except the two lineitem DISTINCTs") {
    // sf0.01 rather than the shared sf0.001: other suites cache the
    // sf0.001 KG (encodeAll), and the InMemoryRelation's embedded plan
    // would double-count exchanges here
    val p = simplePlan(graft.queries.TransEQueries.kgTriples(spark, "/root/testdata/sf0.01"))
    val exchanges = "Exchange".r.findAllIn(p).length
    assert(exchanges <= 2, s"union of projections must not shuffle:\n$p")
  }

  test("paragraph dedup: anti join on the chunk hash, no cartesian") {
    val p = simplePlan(graft.operators.Dedup.paragraphDedup(
      Tables.documents(spark, sf)))
    assert(p.contains("LeftAnti"),
      s"duplicated chunks must be removed by an anti equi-join:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"chunk dedup must never go quadratic:\n$p")
    // df agg must combine map-side before its exchange
    assert("HashAggregate".r.findAllIn(p).length >= 2,
      s"expected partial+final doc-frequency aggregation:\n$p")
  }

  test("tfidf: ranked by the bounded topk_pairs aggregate, no window sort") {
    val p = simplePlan(graft.operators.VocabBuild.tfidfTopTerms(
      Tables.documents(spark, sf)))
    assert(p.contains("ObjectHashAggregate") &&
      "topk_pairs".r.findAllIn(p).length >= 2,
      s"expected partial AND final topk_pairs aggregation:\n$p")
    assert(!p.contains("Window"),
      s"per-doc ranking must not fall back to a window sort:\n$p")
    // the only nested-loop join is the broadcast 1-row n_docs total
    assert(!p.contains("CartesianProduct"), p)
  }

  test("sharded sink manifest: one agg pair over the re-read shards") {
    val p = simplePlan(graft.operators.ShardedSink.manifest(spark, sf))
    assert("HashAggregate".r.findAllIn(p).length >= 2,
      s"manifest aggregate must combine map-side:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  // -------------------------------------------------- AQE skew handling
  test("AQE splits a skewed join partition at runtime (skew=true in the final plan)") {
    // the RUNTIME half of the skew story (q15's salting is the static
    // half): a hot key concentrates one shuffle partition; with skew-join
    // thresholds sized to the data, AQE must split it rather than let one
    // task straggle. Cloned session: the aggressive thresholds and the
    // broadcast opt-out never leak.
    val s = spark.newSession()
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s.conf.set("spark.sql.adaptive.enabled", "true")
    s.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1.0")
    s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
    s.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64KB")
    s.conf.set("spark.sql.shuffle.partitions", "8")
    // 10% of rows pile onto key 7; the tail is uniform
    val big = s.range(0, 400000).select(
      when(col("id") % 10 === 0, lit(7L)).otherwise(col("id")).as("k"),
      col("id").as("v"))
    val dim = s.range(0, 50000).select(col("id").as("k"), (col("id") * 2).as("w"))
    val j = big.join(dim, "k")
    // execute THIS dataset's own physical plan: count()/write() wrap the
    // logical plan in a NEW QueryExecution and would leave j's adaptive
    // plan unexecuted (its toString would show the pre-runtime plan)
    val aqePlan = j.queryExecution.executedPlan
    val n = aqePlan.execute().count()
    // matches: tail keys < 50000 except multiples of 10 (40000 - 4000... )
    // computed independently: keys k in [0,50000) with k%10!=0 match once;
    // key 7 matches 40000 times (every id%10==0 row)
    val expected = (0L until 50000L).count(k => k % 10 != 0) + 40000L
    assert(n == expected, s"join result moved: $n vs $expected")
    val plan = aqePlan.toString
    assert(plan.contains("skew=true"),
      s"AQE did not split the skewed partition:\n$plan")
  }

  // ------------------------------------------------ SummaryRewrite (MV)
  test("mv rewrite: registered dashboard aggregate scans the ROLLUP, not events") {
    val summaryDir = graft.operators.Summaries.ensureEventsDailySummary(spark, sf)
    val df = graft.operators.Summaries.eventTypeTotals(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("graft_evsum_"), s"summary not scanned:\n$plan")
    assert(!plan.contains("events.parquet"), s"raw events still scanned:\n$plan")
    // and the redirect is semantically invisible: equal to the raw answer
    val raw = graft.Tables.events(spark, sf)
      .groupBy("event_type").agg(count(lit(1)).as("n_events"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == raw, s"rewrite changed the answer: $got vs $raw")
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(summaryDir)))
  }

  test("mv rewrite: group-key filters push to the rollup; sums + exact grouping work") {
    import spark.implicits._
    graft.plans.SummaryRewrite.clear()
    try {
      // synthetic view with an INTEGRAL measure: the sum path
      val dir = java.nio.file.Files.createTempDirectory("graft_mvtest")
      val src = dir.resolve("src.parquet").toString
      (1 to 1000).map(i => (s"g${i % 4}", s"d${i % 7}", i.toLong))
        .toDF("g", "d", "m").write.parquet(src)
      val view = spark.read.parquet(src)
      val sumDir = dir.resolve("rollup.parquet").toString
      view.groupBy("g", "d")
        .agg(count(lit(1)).as("cnt"), sum(col("m")).as("m_sum"))
        .write.parquet(sumDir)
      graft.plans.SummaryRewrite.register(view,
        graft.plans.SummaryRewrite.Entry(sumDir, Seq("g", "d"), "cnt",
          Map("m" -> "m_sum")))

      // filter on a group column + exact-key grouping + count AND sum
      val q = view.filter(col("g") =!= "g3").groupBy("g", "d")
        .agg(count(lit(1)).as("n"), sum(col("m")).as("s"))
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains("rollup.parquet"), s"rollup not scanned:\n$plan")
      assert(!plan.contains("src.parquet"), s"raw still scanned:\n$plan")
      val got = q.collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
      // reference computed WITHOUT registration (cleared below first)
      graft.plans.SummaryRewrite.clear()
      val ref = spark.read.parquet(src).filter(col("g") =!= "g3")
        .groupBy("g", "d").agg(count(lit(1)).as("n"), sum(col("m")).as("s"))
        .collect().map(r => (r.getString(0), r.getString(1)) ->
          (r.getLong(2), r.getLong(3))).toMap
      assert(got == ref)
    } finally graft.plans.SummaryRewrite.clear()
  }

  test("mv rewrite: conservative — unanswerable shapes stay on the raw scan") {
    import spark.implicits._
    graft.plans.SummaryRewrite.clear()
    try {
      val dir = java.nio.file.Files.createTempDirectory("graft_mvneg")
      val src = dir.resolve("src.parquet").toString
      (1 to 100).map(i => (s"g${i % 4}", s"d${i % 7}", i.toLong, i * 0.5))
        .toDF("g", "d", "m", "x").write.parquet(src)
      val view = spark.read.parquet(src)
      val sumDir = dir.resolve("rollup.parquet").toString
      view.groupBy("g", "d")
        .agg(count(lit(1)).as("cnt"), sum(col("m")).as("m_sum"))
        .write.parquet(sumDir)
      graft.plans.SummaryRewrite.register(view,
        graft.plans.SummaryRewrite.Entry(sumDir, Seq("g", "d"), "cnt",
          Map("m" -> "m_sum")))
      def rewritten(df: org.apache.spark.sql.DataFrame): Boolean =
        df.queryExecution.executedPlan.toString.contains("rollup.parquet")
      // DOUBLE measure: reassociation is not IEEE-transparent -> no fire
      assert(!rewritten(view.groupBy("g").agg(sum(col("x")).as("s"))))
      // grouping outside the summary key -> no fire
      assert(!rewritten(view.groupBy("m").agg(count(lit(1)).as("n"))))
      // filter on a NON-group column -> no fire
      assert(!rewritten(view.filter(col("m") > 50)
        .groupBy("g").agg(count(lit(1)).as("n"))))
      // DISTINCT count -> no fire
      assert(!rewritten(view.groupBy("g").agg(countDistinct(col("d")).as("n"))))
      // GLOBAL aggregate (no grouping) -> no fire (empty-source zero row)
      assert(!rewritten(view.agg(count(lit(1)).as("n"))))
      // the answerable twin DOES fire (the guard is selective, not dead)
      assert(rewritten(view.groupBy("g").agg(count(lit(1)).as("n"))))
    } finally graft.plans.SummaryRewrite.clear()
  }

  test("text family: each registered corpus query scans documents ONCE") {
    // VERDICT r11 #1: the "one corpus pass" claim becomes a checked
    // invariant. Count FileSourceScanExec leaves over documents.parquet in
    // the FINAL physical plan — AQE is disabled in a cloned session so
    // executedPlan is the exchange-reuse-applied plan (duplicate subtrees
    // appear as ReusedExchangeExec leaves, not second scans); cached
    // subtrees (Search's persisted posting tally) are counted through
    // their InMemoryRelation exactly once. A regression that forks the
    // shared exchange (a Filter pushed below the tally aggregate, a
    // column-pruning asymmetry between branch copies) shows up here as a
    // second scan even though results stay correct.
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.adaptive.enabled", "false")
    def docScans(plan: SparkPlan): Int = {
      val inline = plan.collect {
        case f: FileSourceScanExec if f.relation.location.rootPaths
          .exists(_.toString.contains("documents")) => 1
      }.sum
      val cached = plan.collect { case m: InMemoryTableScanExec =>
        m.relation.cacheBuilder.cachedPlan
      }.distinct.map(docScans).sum
      inline + cached
    }
    val po = graft.queries.PipelineQueries
    val gated = Seq("text_lm_fluency", "sample_dsir",
      "text_sentence_stats", "clf_quality_vocab", "clf_quality_score",
      "text_bigram_coverage", "text_dup_span_coverage", "text_scrub_dup_spans")
    gated.foreach { name =>
      val df = po.rawQueries(name)(s2, sf)
      val n = docScans(df.queryExecution.executedPlan)
      assert(n <= 1, s"$name reads documents $n times — the corpus pass " +
        "is no longer shared:\n" + df.queryExecution.executedPlan.toString)
      assert(n == 1 || df.queryExecution.executedPlan.exists(
        _.isInstanceOf[InMemoryTableScanExec]),
        s"$name shows no documents scan at all — the gate went blind")
    }
    // the search family probes the STANDING postings asset (VERDICT r12
    // #3): its registered probe plans must contain ZERO corpus scans —
    // the corpus is read once at stage-build time, and every query-time
    // read lands on the token-bucketed index tables instead
    val stagedSearch = Seq("search_keyword", "search_phrase",
      "search_tfidf_topk", "search_bm25_topk")
    // cache-aware: the phrase probe persists its bucket slice, so the
    // index read may sit under an InMemoryTableScanExec
    def postingsScans(plan: SparkPlan): Int = {
      val inline = plan.collect {
        case f: FileSourceScanExec if f.relation.location.rootPaths
          .exists(_.toString.contains("graft_postings_")) => 1
      }.sum
      val cached = plan.collect { case m: InMemoryTableScanExec =>
        m.relation.cacheBuilder.cachedPlan
      }.distinct.map(postingsScans).sum
      inline + cached
    }
    // text_tfidf_topterms and tokenize_corpus joined the postings-asset
    // consumers (VERDICT r13 #5 + r14): their tf/df/vocab rollups and
    // the apply stream are pure postings aggregations
    (stagedSearch ++ Seq("text_tfidf_topterms", "tokenize_corpus"))
      .foreach { name =>
        val df = po.rawQueries(name)(s2, sf)
        val n = docScans(df.queryExecution.executedPlan)
        assert(n == 0, s"$name probe plan scans the documents corpus $n " +
          "times — the standing postings asset is being bypassed:\n" +
          df.queryExecution.executedPlan.toString)
        assert(postingsScans(df.queryExecution.executedPlan) >= 1,
          s"$name probe plan does not read the staged postings asset:\n" +
            df.queryExecution.executedPlan.toString)
      }
    // vocab_build's FINAL plan hides its read behind the eager
    // id-assignment truncation (always an RDD conversion — asserting on
    // it would be vacuous), so its gate runs on the pre-truncation
    // counts surface, where a regression re-introducing the corpus
    // tokenize is actually visible
    locally {
      val counts = graft.operators.VocabBuild.vocabStagedCounts(s2, sf)
      val p = counts.queryExecution.executedPlan
      assert(docScans(p) == 0,
        "vocab_build counts scan the documents corpus — the standing " +
          s"postings asset is being bypassed:\n$p")
      assert(postingsScans(p) >= 1,
        s"vocab_build counts do not read the staged postings asset:\n$p")
    }
    // the ANN recall report probes the STAGED exact-truth asset (VERDICT
    // r13 #4): its plan must read the committed truth table instead of
    // recomputing the two brute-force corpus scans per run
    locally {
      val df = po.rawQueries("report_ann_recall")(s2, sf)
      def truthScans(plan: SparkPlan): Int = {
        val inline = plan.collect {
          case f: FileSourceScanExec if f.relation.location.rootPaths
            .exists(_.toString.contains("graft_anntruth_")) => 1
        }.sum
        val cached = plan.collect { case m: InMemoryTableScanExec =>
          m.relation.cacheBuilder.cachedPlan
        }.distinct.map(truthScans).sum
        inline + cached
      }
      assert(truthScans(df.queryExecution.executedPlan) >= 2,
        "report_ann_recall does not probe the staged exact-truth asset " +
          "for both slices:\n" + df.queryExecution.executedPlan.toString)
    }
    // plan-only construction persists probe tallies whose action-keyed
    // release listeners never fire — drain the registry the way the
    // harness does between queries
    graft.CacheScope.releaseAll()
  }

  test("repo-wide: every registered batch query scans each base table at most once") {
    // VERDICT r12 #6: the ScanAudit sweep as a GATE, repo-wide — not just
    // the text family. Every registered non-streaming query's final
    // physical plan (AQE-off clone, exchange reuse applied, caches
    // counted once through their InMemoryRelation) must scan each base
    // table at most once, except the enumerated intentional-MULTI
    // classes below (SCALE.md §Read-amplification audit).
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.adaptive.enabled", "false")
    // intentional MULTI, by class:
    val whitelist: Map[String, String] = Map(
      // -- semantic self-joins / two distinct slices with pushed
      //    predicates: one scan per operand is the operator's meaning
      "ann_topk" -> "query slice + corpus slice",
      "ann_lsh" -> "query slice + corpus slice",
      "ann_ivf" -> "query slice + corpus slice",
      "ann_ivf_probe" -> "query slice vs corpus slice (disjoint predicates)",
      "ann_ivfpq_topk" -> "query slice + corpus slice",
      "ann_near_dup" -> "self-join: both pair sides",
      "ann_pq_refine" -> "ADC shortlist + exact-rerank vector fetch",
      "cluster_kmeans" -> "assignment slice + distance slice",
      "embed_gram" -> "gram self-join: both operand sides",
      "q12_asof_join" -> "as-of: error slice + click slice",
      "q32_asof_forward" -> "as-of: error slice + click slice",
      "q16_range_join" -> "range self-join: both interval sides",
      "q16_range_join_auto" -> "range self-join: both interval sides",
      "q14_except" -> "EXCEPT: one scan per operand",
      "q21_intersect" -> "INTERSECT: one scan per operand",
      "q33_scd2_join" -> "SCD2: dimension-build slice + fact probe",
      "q34_latest_by_key" -> "latest-by-key: max-ts build + row fetch",
      "sketch_hll_agg" -> "sketch build + merge-read slices",
      "sketch_hll_distinct" -> "sketch vs exact comparison: two operands",
      "sketch_kmv_intersect" -> "two sketch operands by construction",
      "events_funnel_steps" -> "one pushed-predicate scan per funnel step",
      "profile_fk_orphans" -> "one scan per FK side under check",
      "clean_winsorize" -> "percentile-build slice + clip application",
      "sample_stratified" -> "per-stratum rates build + row draw",
      "embed_hash_vectors" -> "vocab-build slice + vectorize slice",
      "decontaminate" -> "eval-gram build + corpus probe (different cols)",
      "dedup_simhash" -> "band-build + verify slices",
      "dedup_hashvec" -> "bucket-build + verify slices",
      "dedup_incremental" -> "standing index + arrival slice",
      "mm_feature_near_dup_lsh" -> "bucket-build + verify slices",
      "tokenize_bpe" -> "vocab-train slice + apply slice",
      "sink_upsert" -> "snapshot + derived change batch (three slices)",
      "transe_eval_filtered" -> "ranked sample + known-competitor fetch",
      // -- persist-then-release pipelines: the FINAL plan shows lineage
      //    the execution never re-runs (internals persist during the
      //    run; a sibling's one-shot release can also drop a shared
      //    cache entry mid-audit) — actual executed reads are single
      "dedup_minhash_lsh" -> "persist-then-release internals",
      "dedup_ngram_jaccard" -> "persist-then-release internals",
      "pipeline_train_corpus" -> "persist-then-release internals",
      "report_ann_recall" -> "two slice caches over one underlying scan",
      // -- documented teaching twin: four lazy aggregations vs the
      //    one-pass observe() spelling — the comparison is the point
      "pipeline_funnel" -> "lazy-funnel teaching twin")
    // streams are skipped: their registered plans read the completed
    // staged SINK (single-scan by construction) and constructing them
    // cold executes full streaming runs — their structural gates live in
    // StreamingSpec (state peaks, micro-batch counts, shuffle records)
    val names = graft.SparkEntry.queries.keys.toSeq.sorted
      .filterNot(_.startsWith("stream_"))
      .filterNot(whitelist.contains)
    val offenders = names.flatMap { name =>
      val df = graft.SparkEntry.queries(name)(s2, sf)
      val over = graft.tools.ScanAudit.multiScans(df.queryExecution.executedPlan)
      if (over.isEmpty) None else Some(name -> over)
    }
    assert(offenders.isEmpty,
      s"queries with un-whitelisted repeated base-table scans: $offenders")
    graft.CacheScope.releaseAll()
  }
}
