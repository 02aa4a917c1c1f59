package graft.transe

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Link-prediction evaluation — the reference's `test.py` protocol ("raw"
  * setting) re-expressed: for each test triple (h, l, t), rank the true
  * head against all entities by d(e + l, t) and the true tail by
  * d(h + l, e); report MeanRank and Hits@k over BOTH rank lists
  * (`test.py:28-71`, `test.py:14-25`).
  *
  * Two deliberate upgrades over the reference:
  *  - rank via a single O(n) strict-less count (+1, 1-based) instead of a
  *    full O(n log n) argsort (`test.py:51,59`) — only the rank of one
  *    element is consumed (SURVEY §2.5 note);
  *  - the per-candidate inner loop hoists the invariant vector (l - t for
  *    heads, h + l for tails) out of the scan, halving flops vs the
  *    reference's whole-matrix `E + l - t` temporaries (`test.py:49-50`).
  *
  * Execution: broadcast matrices + `mapPartitions` — embarrassingly
  * parallel over test triples, no shuffle; metrics are a Catalyst
  * partial+final aggregate over the rank Dataset (SURVEY A3/A4).
  */
object LinkPrediction {

  final case class Ranks(l: Int, rank_head: Long, rank_tail: Long)

  /** Per-triple head and tail ranks (1-based, optimistic tie-handling);
    * `l` carries the relation so metrics can slice by cardinality
    * category (the paper's Table-4 protocol). */
  def rankTriples(test: Dataset[Triple], model: TransEModel): Dataset[Ranks] = {
    val spark = test.sparkSession
    import spark.implicits._
    val n = model.entity.length
    val k = if (n > 0) model.entity(0).length else 0
    // Flatten the entity matrix ONCE on the driver: a single contiguous
    // float buffer broadcasts smaller (no per-row object headers) and the
    // candidate scan walks it sequentially — hardware prefetch instead of
    // a pointer dereference per candidate row. Same floats, same order:
    // ranks are bit-identical to the nested form (golden-gated).
    val flat = new Array[Float](n * k)
    var r = 0
    while (r < n) { System.arraycopy(model.entity(r), 0, flat, r * k, k); r += 1 }
    val entBc = spark.sparkContext.broadcast(flat)
    val labBc = spark.sparkContext.broadcast(model.label)
    val l1 = model.params.distance == L1

    // The test set is tiny relative to the O(|test| * n * k) scoring work,
    // and AQE happily coalesces it to one partition — which would serialize
    // the whole scan. Spread the compute across the cluster explicitly.
    val spread = test.repartition(spark.sparkContext.defaultParallelism)

    spread.mapPartitions { it =>
      val ent = entBc.value
      val lab = labBc.value
      val end = n * k
      it.map { tr =>
        val l = lab(tr.l)
        val hOff = tr.h * k
        val tOff = tr.t * k

        // invariants: u = l - t (head scan scores d(e + l, t) = |e + u|),
        // v = h + l (tail scan scores d(h + l, e) = |v - e|)
        val u = new Array[Float](k)
        val v = new Array[Float](k)
        var i = 0
        while (i < k) {
          u(i) = l(i) - ent(tOff + i)
          v(i) = ent(hOff + i) + l(i)
          i += 1
        }
        var dTrueHead = 0.0
        var dTrueTail = 0.0
        i = 0
        if (l1) {
          while (i < k) {
            dTrueHead += math.abs(ent(hOff + i) + u(i)).toDouble
            dTrueTail += math.abs(v(i) - ent(tOff + i)).toDouble
            i += 1
          }
        } else {
          while (i < k) {
            val a = ent(hOff + i) + u(i); dTrueHead += a.toDouble * a
            val b = v(i) - ent(tOff + i); dTrueTail += b.toDouble * b
            i += 1
          }
        }

        val (lessH, lessT) = fusedCounts(ent, end, k, u, v, dTrueHead, dTrueTail, l1)
        Ranks(tr.l, lessH + 1, lessT + 1)
      }
    }
  }

  /** The fused head+tail strict-less scan over the flat entity matrix —
    * ONE sequential read of the buffer. EARLY EXIT is exact, not
    * approximate: every term is >= 0, so the partial sums are monotone
    * non-decreasing — once BOTH have reached their true distances,
    * neither final sum can be strictly less, and the candidate's
    * contribution to both counts is decided. A trained model scores its
    * true triples low, so typical candidates exceed both thresholds
    * within a few components — the scan does a fraction of the k flops
    * per candidate with bit-identical ranks. Shared by the raw and
    * FILTERED evaluators (identical float-op order: the goldens gate it). */
  private[transe] def fusedCounts(ent: Array[Float], end: Int, k: Int,
      u: Array[Float], v: Array[Float], dTrueHead: Double, dTrueTail: Double,
      l1: Boolean): (Long, Long) = {
    var lessH = 0L
    var lessT = 0L
    var off = 0
    if (l1) {
      while (off < end) {
        var sH = 0.0; var sT = 0.0
        var j = 0
        while (j < k && (sH < dTrueHead || sT < dTrueTail)) {
          val x = ent(off + j)
          sH += math.abs(x + u(j)).toDouble
          sT += math.abs(v(j) - x).toDouble
          j += 1
        }
        if (sH < dTrueHead) lessH += 1
        if (sT < dTrueTail) lessT += 1
        off += k
      }
    } else {
      while (off < end) {
        var sH = 0.0; var sT = 0.0
        var j = 0
        while (j < k && (sH < dTrueHead || sT < dTrueTail)) {
          val x = ent(off + j)
          val a = x + u(j); sH += a.toDouble * a
          val b = v(j) - x; sT += b.toDouble * b
          j += 1
        }
        if (sH < dTrueHead) lessH += 1
        if (sT < dTrueTail) lessT += 1
        off += k
      }
    }
    (lessH, lessT)
  }

  /** FILTERED-protocol ranking (Bordes et al. 2013, the "filt." columns
    * every KG paper reports next to "raw"): when ranking the head of
    * (h, l, t), candidates e whose triple (e, l, t) is itself a KNOWN
    * true triple are excluded — they are correct answers, not errors,
    * and the raw protocol unfairly penalizes the model for ranking them
    * high. Symmetrically for tails.
    *
    * Execution: the raw fused scan stays UNTOUCHED (same kernel,
    * bit-identical counts) and the filter is a per-triple CORRECTION:
    * score only the known-true competitors (a handful per triple — the
    * few entities sharing (l, t) / (h, l) in the KG) and subtract those
    * that scored strictly below the true distance. The true entity
    * itself needs no special-casing: its distance EQUALS the threshold,
    * so strict-less never subtracts it. Cost: |filters| extra vector
    * scores per triple vs n for the scan — noise.
    *
    * Filter-set construction never shuffles the known set: the test
    * keys broadcast, known is scanned twice with a broadcast semi-join
    * shape (at 100 TB the KG scan dominates; the grouped filter lists
    * are test-sized), and the lists ride into the scan via the joined
    * Dataset, not a driver map. */
  def rankTriplesFiltered(test: Dataset[Triple], model: TransEModel,
      known: Dataset[Triple]): Dataset[Ranks] = {
    val spark = test.sparkSession
    import spark.implicits._
    val n = model.entity.length
    val k = if (n > 0) model.entity(0).length else 0
    val flat = new Array[Float](n * k)
    var r = 0
    while (r < n) { System.arraycopy(model.entity(r), 0, flat, r * k, k); r += 1 }
    val entBc = spark.sparkContext.broadcast(flat)
    val labBc = spark.sparkContext.broadcast(model.label)
    val l1 = model.params.distance == L1

    val testDf = test.toDF()
    val knownDf = known.toDF().select(col("h").as("kh"), col("l").as("kl"),
      col("t").as("kt"))
    // known heads per (l, t) key of the test set; known tails per (h, l)
    val headF = knownDf
      .join(broadcast(testDf.select(col("l"), col("t")).distinct()),
        col("kl") === col("l") && col("kt") === col("t"))
      .groupBy("l", "t").agg(collect_set(col("kh")).as("fheads"))
    val tailF = knownDf
      .join(broadcast(testDf.select(col("h"), col("l")).distinct()),
        col("kh") === col("h") && col("kl") === col("l"))
      .groupBy("h", "l").agg(collect_set(col("kt")).as("ftails"))
    val withF = testDf
      .join(broadcast(headF), Seq("l", "t"), "left")
      .join(broadcast(tailF), Seq("h", "l"), "left")
      .select(col("h"), col("l"), col("t"), col("fheads"), col("ftails"))
      .as[(Int, Int, Int, Option[Seq[Int]], Option[Seq[Int]])]
      .repartition(spark.sparkContext.defaultParallelism)

    withF.mapPartitions { it =>
      val ent = entBc.value
      val lab = labBc.value
      val end = n * k
      it.map { case (th, tl, tt, fh, ft) =>
        val l = lab(tl)
        val hOff = th * k
        val tOff = tt * k
        val u = new Array[Float](k)
        val v = new Array[Float](k)
        var i = 0
        while (i < k) {
          u(i) = l(i) - ent(tOff + i)
          v(i) = ent(hOff + i) + l(i)
          i += 1
        }
        var dTrueHead = 0.0
        var dTrueTail = 0.0
        i = 0
        if (l1) {
          while (i < k) {
            dTrueHead += math.abs(ent(hOff + i) + u(i)).toDouble
            dTrueTail += math.abs(v(i) - ent(tOff + i)).toDouble
            i += 1
          }
        } else {
          while (i < k) {
            val a = ent(hOff + i) + u(i); dTrueHead += a.toDouble * a
            val b = v(i) - ent(tOff + i); dTrueTail += b.toDouble * b
            i += 1
          }
        }
        var (lessH, lessT) = fusedCounts(ent, end, k, u, v, dTrueHead, dTrueTail, l1)
        // correction: drop known-true competitors that the raw count
        // included (full-precision score, no early exit — the threshold
        // comparison must be exact, and these are a handful of vectors)
        fh.foreach(_.foreach { e =>
          val off = e * k
          var s = 0.0
          var j = 0
          if (l1) while (j < k) { s += math.abs(ent(off + j) + u(j)).toDouble; j += 1 }
          else while (j < k) { val a = ent(off + j) + u(j); s += a.toDouble * a; j += 1 }
          if (s < dTrueHead) lessH -= 1
        })
        ft.foreach(_.foreach { e =>
          val off = e * k
          var s = 0.0
          var j = 0
          if (l1) while (j < k) { s += math.abs(v(j) - ent(off + j)).toDouble; j += 1 }
          else while (j < k) { val b = v(j) - ent(off + j); s += b.toDouble * b; j += 1 }
          if (s < dTrueTail) lessT -= 1
        })
        Ranks(tl, lessH + 1, lessT + 1)
      }
    }
  }

  /** [[evaluate]] under the filtered protocol. */
  def evaluateFiltered(test: Dataset[Triple], model: TransEModel,
      known: Dataset[Triple], hitsK: Int = 10): DataFrame =
    metrics(rankTriplesFiltered(test, model, known).toDF(), hitsK)

  /** Partitioned-matrix ranking — the implemented form of SCALE.md's
    * escape hatch for entity matrices past the broadcast budget (~25M
    * entities at k=50 ≈ 5 GB/executor): the roles invert. The ENTITY
    * MATRIX stays a DISTRIBUTED (id, vec) Dataset — e.g. the parquet
    * checkpoint read back without ever materializing driver-side — and
    * the TEST SET broadcasts instead, carrying one precomputed invariant
    * pair per triple (u = l - t with its true head distance, v = h + l
    * with its true tail distance). Each partition scans its slice of the
    * matrix once, accumulating strict-less counts per test triple;
    * treeAggregate merges the 2·|test| long counters. Flops are
    * IDENTICAL to [[rankTriples]] (n · 2|test| · k) — what changes is
    * what moves: no n×k broadcast, only |test|-sized invariants out and
    * 2·|test| longs back per partition. The h/t vectors the invariants
    * need are fetched from the distributed matrix by a broadcast
    * id-join (≤ 2|test| rows), not a matrix collect.
    *
    * The test set must be driver/broadcast-bounded — the same contract
    * the reference's protocol already assumes (test sets are orders of
    * magnitude smaller than entity inventories). */
  def rankTriplesPartitioned(test: Dataset[Triple], entities: DataFrame,
      label: Array[Array[Float]], distance: Distance): Dataset[Ranks] = {
    val spark = test.sparkSession
    import spark.implicits._
    val triples = test.collect()
    require(triples.nonEmpty, "empty test set")

    // fetch only the h/t vectors the test set references, by id
    val neededDf = triples.flatMap(tr => Seq(tr.h, tr.t)).distinct.toSeq.toDF("id")
    val fetched: Map[Int, Array[Float]] = entities
      .join(broadcast(neededDf), "id")
      .select(col("id").cast("int"), col("vec"))
      .as[(Int, Array[Float])].collect().toMap

    val m = triples.length
    val us = new Array[Array[Float]](m)
    val vs = new Array[Array[Float]](m)
    val dTrueHead = new Array[Double](m)
    val dTrueTail = new Array[Double](m)
    var j = 0
    while (j < m) {
      val tr = triples(j)
      val l = label(tr.l)
      val h = fetched(tr.h)
      val t = fetched(tr.t)
      val k = l.length
      val u = new Array[Float](k)
      val v = new Array[Float](k)
      var i = 0
      while (i < k) { u(i) = l(i) - t(i); v(i) = h(i) + l(i); i += 1 }
      us(j) = u; vs(j) = v
      dTrueHead(j) = scoreWith(distance, h, u)
      dTrueTail(j) = scoreNeg(distance, t, v)
      j += 1
    }
    val bc = spark.sparkContext.broadcast((us, vs, dTrueHead, dTrueTail))
    val l1 = distance == L1

    val (lessH, lessT) = entities.select(col("vec"))
      .as[Array[Float]].rdd
      .treeAggregate((new Array[Long](m), new Array[Long](m)))(
        seqOp = { case ((lh, lt), e) =>
          val (bu, bv, bdh, bdt) = bc.value
          var p = 0
          while (p < m) {
            // fused head+tail with exact early exit (terms >= 0 so the
            // partial sums are monotone — see rankTriples): identical
            // strict-less counts, a fraction of the flops
            val uu = bu(p); val vv = bv(p)
            val th = bdh(p); val tt = bdt(p)
            val kk = uu.length
            var sH = 0.0; var sT = 0.0
            var j = 0
            if (l1) {
              while (j < kk && (sH < th || sT < tt)) {
                val x = e(j)
                sH += math.abs(x + uu(j)).toDouble
                sT += math.abs(vv(j) - x).toDouble
                j += 1
              }
            } else {
              while (j < kk && (sH < th || sT < tt)) {
                val x = e(j)
                val a = x + uu(j); sH += a.toDouble * a
                val b = vv(j) - x; sT += b.toDouble * b
                j += 1
              }
            }
            if (sH < th) lh(p) += 1
            if (sT < tt) lt(p) += 1
            p += 1
          }
          (lh, lt)
        },
        combOp = { case ((a1, a2), (b1, b2)) =>
          var p = 0
          while (p < m) { a1(p) += b1(p); a2(p) += b2(p); p += 1 }
          (a1, a2)
        })
    bc.destroy()
    spark.createDataset(
      (0 until m).map(p => Ranks(triples(p).l, lessH(p) + 1, lessT(p) + 1)))
  }

  /** [[evaluate]] over a distributed entity matrix — metrics from
    * [[rankTriplesPartitioned]], same output schema. */
  def evaluatePartitioned(test: Dataset[Triple], entities: DataFrame,
      label: Array[Array[Float]], distance: Distance,
      hitsK: Int = 10): DataFrame =
    metrics(rankTriplesPartitioned(test, entities, label, distance).toDF(), hitsK)

  /** d over (x + u) for the head scan. */
  private def scoreWith(d: Distance, x: Array[Float], u: Array[Float]): Double = {
    var s = 0.0
    var i = 0
    d match {
      case L1 =>
        while (i < x.length) { s += math.abs(x(i) + u(i)).toDouble; i += 1 }
      case L2Squared =>
        while (i < x.length) { val z = x(i) + u(i); s += z.toDouble * z; i += 1 }
    }
    s
  }

  /** d over (v - x) for the tail scan. */
  private def scoreNeg(d: Distance, x: Array[Float], v: Array[Float]): Double = {
    var s = 0.0
    var i = 0
    d match {
      case L1 =>
        while (i < x.length) { s += math.abs(v(i) - x(i)).toDouble; i += 1 }
      case L2Squared =>
        while (i < x.length) { val z = v(i) - x(i); s += z.toDouble * z; i += 1 }
    }
    s
  }

  /** MeanRank + Hits@k over both rank lists (reference `test.py:14-25`),
    * plus the per-direction means, as one Catalyst aggregate. */
  def evaluate(test: Dataset[Triple], model: TransEModel, hitsK: Int = 10): DataFrame =
    metrics(rankTriples(test, model).toDF(), hitsK)

  private def metrics(ranks: DataFrame, hitsK: Int): DataFrame = {
    def hitsAt(k: Int) =
      ((avg(when(col("rank_head") <= k, 1.0).otherwise(0.0)) +
        avg(when(col("rank_tail") <= k, 1.0).otherwise(0.0))) / 2)
        .as(s"hits_at_$k")
    ranks.agg(
      ((avg(col("rank_head")) + avg(col("rank_tail"))) / 2).as("mean_rank"),
      avg(col("rank_head")).as("mean_rank_head"),
      avg(col("rank_tail")).as("mean_rank_tail"),
      hitsAt(hitsK),
      (count(lit(1)) * 2).as("n_ranks"),
      // the post-Bordes reporting protocol (columns APPENDED: the golden
      // gates read 0-4 positionally): MRR + the standard hits ladder.
      // Reciprocals ride a fixed-scale DECIMAL (the q1 carrier
      // discipline): double summation order varies with partitioning and
      // moved the broadcast-vs-partitioned bit-equality gate by 2 ULPs;
      // per-element double reciprocal -> decimal cast is deterministic
      // and decimal SUM is exact, so the mean is partitioning-blind
      ((avg((lit(1.0) / col("rank_head")).cast("decimal(28,20)")) +
        avg((lit(1.0) / col("rank_tail")).cast("decimal(28,20)"))) / 2)
        .cast("double").as("mrr"),
      hitsAt(1),
      hitsAt(3))
  }

  // ------------------------- relation cardinality categories (Table 4)
  /** Bordes et al. §4's relation classification: per relation, the
    * averaged tails-per-head (tph = triples / distinct heads) and
    * heads-per-tail (hpt = triples / distinct tails), thresholded at 1.5
    * into 1-1 / 1-N / N-1 / N-N. Ratios are integer ppm (matching the
    * engine's DuckDB-replay discipline), so the table is a full hash
    * oracle over any (h, l, t) frame — raw string KG or encoded ids.
    * One |triples| shuffle keyed on l; the output is |relations|-sized. */
  def relationCategories(triples: DataFrame): DataFrame =
    triples.groupBy("l").agg(
      count(lit(1)).as("n_triples"),
      countDistinct(col("h")).as("n_heads"),
      countDistinct(col("t")).as("n_tails"))
      .withColumn("tph_ppm", expr("n_triples * 1000000 DIV n_heads"))
      .withColumn("hpt_ppm", expr("n_triples * 1000000 DIV n_tails"))
      .withColumn("category",
        when(col("tph_ppm") < 1500000L && col("hpt_ppm") < 1500000L, "1-1")
          .when(col("tph_ppm") >= 1500000L && col("hpt_ppm") < 1500000L, "1-N")
          .when(col("tph_ppm") < 1500000L && col("hpt_ppm") >= 1500000L, "N-1")
          .otherwise("N-N"))

  /** The paper's Table-4 breakdown: hits@k split by predicted side AND
    * the relation's cardinality category (computed from `train` — the
    * graph the model saw). A 1-N relation is easy on the 1 side and hard
    * on the N side; this table is where that asymmetry becomes visible.
    * Output: one row per category present in the test set —
    * (category, n_triples, hits_head, hits_tail). */
  def evaluateByCategory(test: Dataset[Triple], model: TransEModel,
      train: Dataset[Triple], hitsK: Int = 10): DataFrame = {
    val cats = relationCategories(train.toDF()).select("l", "category")
    rankTriples(test, model).toDF()
      .join(broadcast(cats), Seq("l"), "left")
      .na.fill("unseen", Seq("category")) // test-only relations: loud, not dropped
      .groupBy("category")
      .agg(
        count(lit(1)).as("n_triples"),
        avg(when(col("rank_head") <= hitsK, 1.0).otherwise(0.0)).as("hits_head"),
        avg(when(col("rank_tail") <= hitsK, 1.0).otherwise(0.0)).as("hits_tail"))
  }
}
