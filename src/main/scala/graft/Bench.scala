package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR. Emits the full per-query JSON line (also saved to
  * BENCH_DETAIL.json, since it exceeds the driver's stdout-tail capture)
  * and ends stdout with a compact parseable headline line.
  * A small warmup action first so JVM/session startup isn't billed to
  * whichever query happens to run first. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // Kryo class registration on (small ids instead of class names in
    // every broadcast/shuffle record) but registrationRequired OFF: an
    // unregistered exotic type in the driver-run sweep must degrade to
    // the slow path, never crash the round
    val spark = GraftKryo.configure(SparkSession.builder()
      .master(s"local[$cpus]"))
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // production integration route: vector functions + optimizer rules
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // warmup: touch every table + exercise codegen once
    Tables.names.foreach(n => Tables.load(spark, sfDir, n).count())

    // Reference-comparable epoch time FIRST (BASELINE.md: 13.50 s/epoch at
    // k=50, n_batches=2, L1 on 272k triples / 1 worker): measured before
    // the query sweep so host-throttling of long runs doesn't skew the
    // headline metric. 3 epochs at the reference hyperparameters.
    val (epochSecMin, epochSecSpread) = try {
      val (enc, _, _, nEnt, nLab) =
        graft.queries.TransEQueries.encodedKg(spark, sfDir)
      enc.count() // materialize the persisted encode lineage OUTSIDE the timer
      val p = graft.transe.TransEParams(epochs = 3, batches = 2,
        margin = 1.0f, lr = 0.01f, dim = 50, distance = graft.transe.L1)
      val trainer = new graft.transe.TransETrainer(p)
      trainer.fit(enc, nEnt, nLab)
      // the sandbox throttles sustained CPU (3-65 s/epoch swings measured
      // on identical code); min-of-epochs is the steady-state number. The
      // sf0.1 epoch MEAN was dropped from the headline (VERDICT r8 #7):
      // it is dominated by the throttle lottery and was repeatedly
      // misread as a regression — the spread field makes the instability
      // explicit, and transe_epoch_sec_fb15kshape_min is the
      // baseline-comparable figure.
      val hist = trainer.epochSecsHistory
      (hist.min, hist.max - hist.min)
    } catch { case _: Throwable => (-1.0, -1.0) }

    // FB15k-237-SHAPED stress (VERDICT r2 #5): the baseline epoch number
    // (13.50 s) was published at 14,541 entities / 237 relations /
    // 272,115 triples — the sf0.1 KG matches hyperparameters but not
    // shape (1.43M triples, ~19k entities). Train a seeded synthetic KG
    // at the PUBLISHED shape for 20 epochs so the comparison is matched
    // on both axes; min-of-epochs is the steady-state (throttle-free)
    // figure, as for transe_epoch_sec_min.
    val (fbShapeSec, fbShapeSecMin) = try {
      // KG construction + hyperparameters shared with ContractSpec's
      // fb15k-shape golden gate (transe.Fb15kShape) so a loss drift here
      // is caught by the recorded 3-epoch curve, not just wall clock
      val kg = graft.transe.Fb15kShape.kg(spark).persist()
      kg.count() // materialize outside the timer
      val p = graft.transe.Fb15kShape.params(epochs = 20)
      val trainer = new graft.transe.TransETrainer(p)
      val t0 = System.nanoTime()
      trainer.fit(kg, graft.transe.Fb15kShape.nEntities,
        graft.transe.Fb15kShape.nLabels)
      val mean = (System.nanoTime() - t0) / 1e9 / p.epochs
      kg.unpersist()
      (mean, trainer.epochSecsHistory.min)
    } catch { case _: Throwable => (-1.0, -1.0) }

    // MIN-OF-3 per query (VERDICT r5 #3), taken across INTERLEAVED full
    // sweep passes (VERDICT r8 #1): three consecutive runs of one query
    // sit inside the same few seconds, so a single sandbox CPU-throttle
    // window poisons all three samples and min-of-3 stops protecting —
    // r8 recorded fake 5-30x "regressions" that way (report_filter_reasons
    // 14.0 s sweep-min vs 1.3 s standalone). Running pass-by-pass over the
    // whole query list separates a query's samples by the full sweep
    // duration, so one throttle window can poison at most ONE sample and
    // the min stays a steady-state figure. A representative session-warmup
    // query runs before pass 1 so first-query codegen/session cost isn't
    // billed to whichever query sorts first. The headline "queries" map
    // carries the MIN; "queries_mean" the mean of the 3 passes. Failed
    // queries record the -1 sentinel and are excluded from `total` (a
    // thrown count() must not read as a fast successful run).
    val passes = 3
    val named = SparkEntry.queries.toSeq.sortBy(_._1)
    try SparkEntry.queries("q1_agg")(spark, sfDir).count()
    catch { case _: Throwable => () }
    val samples: Seq[Seq[(String, Option[Double])]] = (1 to passes).map { _ =>
      named.map { case (name, fn) =>
        val t0 = System.nanoTime()
        val r = name -> (try { fn(spark, sfDir).count(); Some((System.nanoTime() - t0) / 1e9) }
        catch {
          case e: Throwable =>
            System.err.println(s"[bench] $name failed: ${e.getMessage}"); None
        })
        // release query-scoped tallies OUTSIDE the timer (ADVICE r12 #1):
        // a 3-pass sweep over 210 queries otherwise accumulates every
        // per-query cache for the session lifetime
        CacheScope.releaseAll()
        r
      }
    }
    val results = named.map { case (name, _) =>
      val secs = samples.flatMap(_.collectFirst { case (`name`, Some(s)) => s })
      name -> (if (secs.length == passes) (secs.min, secs.sum / passes) else (-1.0, -1.0))
    }
    // 3 decimals: 17-digit IEEE doubles tripled the line length for
    // sub-millisecond noise
    def r3(v: Double): Double = math.rint(v * 1000) / 1000
    def obj(kvs: Seq[(String, Double)]): String =
      kvs.map { case (k, v) => "\"" + k + "\":" + r3(v) }.mkString("{", ",", "}")
    def arr(names: Seq[String]): String =
      names.map("\"" + _ + "\"").mkString("[", ",", "]")
    val headline = Seq(
      "transe_epoch_sec_min" -> epochSecMin,
      "transe_epoch_sec_spread" -> epochSecSpread,
      "transe_epoch_sec_fb15kshape" -> fbShapeSec,
      "transe_epoch_sec_fb15kshape_min" -> fbShapeSecMin)
    // Queries whose timing shares memoized upstream work (model fit, KG
    // encode, MinHash pair set, BPE merges): the shared cost lands on
    // whichever consumer the sweep's pass order runs FIRST; the rest bench
    // near-zero, so their per-query seconds are pass-order-dependent noise
    // (r9: transe_fit_partitioned swung 13.4 s -> 0.04 s on an interleave
    // reorder, VERDICT r9 #5). They are therefore EXCLUDED from the
    // per-query maps; each memoization FAMILY instead reports its one-time
    // shared cost once, as the per-pass SUM of its members (whichever
    // member paid, the sum captures it), min across passes.
    val families: Seq[(String, Seq[String])] = Seq(
      "family_transe_fit_sec" -> Seq(
        "kg_encode", "transe_fit", "transe_fit_partitioned", "transe_eval",
        "transe_eval_filtered", "transe_eval_partitioned", "transe_embeddings",
        "transe_link_suggest"),
      "family_minhash_sec" -> Seq(
        "dedup_minhash_lsh", "dedup_components", "dedup_components_star",
        "dedup_retention", "pipeline_train_corpus", "sample_split_grouped"),
      "family_bpe_sec" -> Seq(
        "vocab_bpe_merges", "vocab_bpe_pieces", "tokenize_bpe"),
      // the KG edge list / co-part graph are memoized per sfDir (VERDICT
      // r11 #3): whichever consumer runs first pays the one-time build
      "family_kg_graph_sec" -> Seq(
        "graph_degrees", "graph_pagerank", "graph_kcore",
        "graph_bfs_layers", "graph_ppr"),
      "family_copart_graph_sec" -> Seq(
        "graph_triangles", "graph_communities"),
      // the dup-span zip tally / classifier token tally are memoized per
      // sfDir (VERDICT r13 #2/#3): whichever pair member runs first pays
      // the shared corpus tokenize
      "family_dup_span_sec" -> Seq(
        "text_scrub_dup_spans", "text_dup_span_coverage"),
      "family_clf_quality_sec" -> Seq(
        "clf_quality_vocab", "clf_quality_score"),
      // the standing postings asset builds once per corpus mtime;
      // whichever search query runs first pays the one-time index build
      "family_search_postings_sec" -> Seq(
        "search_keyword", "search_phrase", "search_tfidf_topk",
        "search_bm25_topk"),
      // staged streaming runs: the stream executes once per (file, mtime)
      // key; re-invocations read the completed sink
      "family_staged_streams_sec" -> Seq(
        "stream_dedup_incremental", "stream_txn_append", "stream_ann_probe",
        "stream_restart_dedup", "stream_upsert", "stream_vocab_growth",
        "stream_continual_train", "stream_dsir_score",
        "stream_decontaminate", "stream_search_maintained",
        "stream_search_compacted", "stream_search_bm25_maintained",
        "stream_search_bm25_compacted", "stream_ann_maintained",
        "stream_search_tombstoned", "stream_search_purged"))
    // the search family's members do REAL probe work every pass (only
    // the one-time index build is shared), so unlike the trained/staged
    // families they KEEP their per-query entries — min-of-3 lands on the
    // warm probe cost while the family sum still captures the build
    val reportBoth = Set("family_search_postings_sec")
    val memoized = families.filterNot(f => reportBoth(f._1)).flatMap(_._2)
      .filter(n => results.exists(_._1 == n)).sorted
    val familyCosts: Seq[(String, Double)] = families.map { case (fam, members) =>
      val present = members.filter(n => results.exists(_._1 == n))
      val perPass = samples.map { pass =>
        val secs = present.flatMap(n => pass.collectFirst { case (`n`, Some(s)) => s })
        if (secs.length == present.length && present.nonEmpty) secs.sum else -1.0
      }
      fam -> (if (perPass.forall(_ >= 0) && perPass.nonEmpty) perPass.min else -1.0)
    }
    // Long ITERATIVE queries (many jobs, ~10 s span) cross multiple host
    // CPU-throttle windows inside one sample, so even interleaved
    // min-of-3 stays inflated (r9: graph mins drifted +30% on untouched
    // code). Their seconds are ADVISORY; regressions in this family are
    // gated structurally instead (GraphSpec: per-iteration shuffle-record
    // budget, constant plan depth, recorded kcore peel rounds;
    // StreamingSpec: state-rows peak/final + micro-batch-count +
    // shuffle-record gates for the sessionize/windowed family — r10:
    // stream_sessionize swung +37% on UNTOUCHED code).
    val variancePron = Seq(
      "graph_components", "graph_pagerank", "graph_kcore",
      "graph_similar_suppliers", "graph_bfs_layers", "graph_ppr",
      "graph_communities",
      "stream_interval_join",
      "stream_interval_join_outer", "stream_sessionize_ooo",
      "stream_sessionize", "stream_sessionize_native",
      "stream_features_pit_ooo", "stream_windowed_counts_append")
      .filter(n => results.exists(_._1 == n)).sorted
    val failed = results.collect { case (n, (mn, _)) if mn < 0 => n }
    val nonMemoized = results.filterNot { case (n, _) => memoized.contains(n) }
    // Per-query SPREAD for the variance-marked set (VERDICT r12 #2): the
    // headline min alone cannot distinguish a real regression from the
    // sandbox throttle lottery — r11->r12 the staged-stream cluster
    // "regressed" 10-25% with no code change and nothing in the output
    // could adjudicate it. Publishing min/mean/max per marked query makes
    // the round-over-round comparison self-describing: a drifted MIN with
    // a tight spread is a regression; a drifted mean under a wide spread
    // is the lottery.
    // Per-PASS seconds (VERDICT r13 #1): min/mean/max alone cannot
    // separate a one-time memo build from the throttle lottery from a
    // regression — r13's graph_ppr spanned 7.9-48.0 s with all three
    // indistinguishable. The passes array is ORDERED (pass 1 first), so
    // a memoized family's one-time build reads as a pass-1-only spike on
    // whichever member the sweep order ran first, a throttle window as a
    // single inflated pass at a random index, and a regression as a
    // uniformly shifted floor.
    def passesArr(n: String): String =
      samples.map(_.collectFirst { case (`n`, Some(s)) => r3(s) }
        .getOrElse(-1.0)).mkString("[", ",", "]")
    val varianceDetail: String = {
      val entries = variancePron.map { n =>
        val secs = samples.flatMap(_.collectFirst { case (`n`, Some(s)) => s })
        val (mn, mx, mean) =
          if (secs.isEmpty) (-1.0, -1.0, -1.0)
          else (secs.min, secs.max, secs.sum / secs.length)
        "\"" + n + "\":" +
          s"""{"min":${r3(mn)},"mean":${r3(mean)},"max":${r3(mx)},"passes":${passesArr(n)}}"""
      }
      entries.mkString("{", ",", "}")
    }
    // every memoized-family member's per-pass seconds, so the family
    // sums above are attributable to the member that paid the build
    val memoizedDetail: String = families.flatMap(_._2).distinct.sorted
      .filter(n => results.exists(_._1 == n))
      .map(n => "\"" + n + "\":" + passesArr(n))
      .mkString("{", ",", "}")
    val qs = obj(nonMemoized.map { case (n, (mn, _)) => n -> mn } ++ headline)
    val qsMean = obj(nonMemoized.map { case (n, (_, mean)) => n -> mean })
    val total = results.map(_._2._1).filter(_ >= 0).sum
    val fams = obj(familyCosts)
    // epoch seconds are ADVISORY (r10 #4): the number swings with host
    // throttle on an untouched path; the invariant lives in ContractSpec's
    // epoch-shape gate (jobs-constant per epoch, zero shuffle)
    val note = "\"advisory\":[\"transe_epoch_sec_min\"," +
      "\"transe_epoch_sec_spread\"],\"advisory_gate\":" +
      "\"ContractSpec: an epoch adds jobs-constant, shuffle-free work\""
    val full =
      s"""{"metric":"total","value":${r3(total)},"unit":"sec","queries":$qs,"queries_mean":$qsMean,"families":$fams,"failed":${arr(failed)},"memoized":${arr(memoized)},"memoized_detail":$memoizedDetail,"variance_prone":${arr(variancePron)},"variance_detail":$varianceDetail,$note,"sf":"$sfDir"}"""
    // The full line (170+ queries) exceeds the driver's 2 KB stdout-tail
    // capture, which is why BENCH_r4-r6 recorded parsed:null. Persist the
    // full sweep to a repo file, print it for the log, then END stdout
    // with a compact line (headline metrics + the slowest queries) that
    // fits entirely inside the tail window so the driver can parse it.
    // The detail path resolves against SPARK_GRAFT_OUT_DIR (fallback:
    // launch CWD) so the file's location is explicit in the compact line
    // rather than depending silently on the driver's CWD.
    val detailPath = java.nio.file.Paths.get(
      sys.env.getOrElse("SPARK_GRAFT_OUT_DIR", sys.props("user.dir")))
      .resolve("BENCH_DETAIL.json").toAbsolutePath
    java.nio.file.Files.write(detailPath, (full + "\n").getBytes("UTF-8"))
    println(full)
    val slowest = nonMemoized.map { case (n, (mn, _)) => n -> mn }
      .filter(_._2 >= 0).sortBy(-_._2).take(20)
    val compact = obj(headline ++ familyCosts ++ slowest)
    println(s"""{"metric":"total","value":${r3(total)},"unit":"sec","queries":$compact,"n_queries":${results.length},"failed":${arr(failed)},"detail":"$detailPath","sf":"$sfDir"}""")
    spark.stop()
  }
}
