package graft.transe

import java.util.SplittableRandom

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Dataset, SparkSession}

/** Membership test for negative-sample rejection (reference: broadcast dict
  * used as a set, `utils.py:35-41` + `TransE.py:94-95,243`). */
sealed trait TripleMembership extends Serializable {
  def contains(h: Int, l: Int, t: Int): Boolean
}

/** Exact broadcast set — right up to ~10^8 triples of executor memory. */
final class ExactMembership(set: java.util.HashSet[(Int, Int, Int)]) extends TripleMembership {
  def contains(h: Int, l: Int, t: Int): Boolean = set.contains((h, l, t))
}

/** Exact membership as a PACKED sorted Array[Long] + binary search:
  * zero boxing, 8 bytes/triple broadcast payload, cache-friendly lookups.
  * Usable when ids fit the bit budget (h,t < 2^27, l < 2^10 — far beyond
  * the broadcast-matrix design ceiling anyway); the trainer falls back to
  * the HashSet form otherwise. */
final class PackedMembership(sorted: Array[Long]) extends TripleMembership {
  def contains(h: Int, l: Int, t: Int): Boolean =
    java.util.Arrays.binarySearch(sorted, PackedMembership.pack(h, l, t)) >= 0
}

object PackedMembership {
  val EntityBits = 27
  val LabelBits = 10
  def fits(nEntities: Int, nLabels: Int): Boolean =
    nEntities < (1 << EntityBits) && nLabels < (1 << LabelBits)
  def pack(h: Int, l: Int, t: Int): Long =
    (h.toLong << (EntityBits + LabelBits)) | (l.toLong << EntityBits) | t.toLong
}

/** Bloom-filter membership (1% fpp) — the at-scale path: a false positive
  * only causes a harmless extra redraw of the corrupted triple, so
  * correctness is unaffected while memory drops ~50x vs the exact set. */
final class BloomMembership(bloom: org.apache.spark.util.sketch.BloomFilter) extends TripleMembership {
  def contains(h: Int, l: Int, t: Int): Boolean =
    bloom.mightContainString(s"$h:$l:$t")
}

/** Distributed TransE trainer (Bordes et al., NeurIPS 2013), replacing the
  * reference's `TransE.fit/_sgd` (`TransE.py:64-157`) with the Scala/MLlib
  * idiom: data-parallel gradient computation via `mapPartitions` over the
  * cached triple Dataset, parameters broadcast per batch, sparse per-
  * partition deltas collected and merged on the driver (same shape as
  * `ml.feature.Word2Vec`).
  *
  * Faithfully preserved reference semantics:
  *  - Bernoulli batch sampling, fraction 1/batches (`TransE.py:120-122`);
  *  - hinge check before any update (`TransE.py:276`);
  *  - touched entity rows re-normalized after each update
  *    (`TransE.py:214-217`); labels normalized once at init (`TransE.py:60`);
  *  - per-partition write-combining of embedding rows (`TransE.py:179-206`);
  *  - LAST-WRITER-WINS on cross-partition delta collisions — the reference's
  *    stale-synchronous merge (`TransE.py:159-170`, SURVEY §7.5-2) — made
  *    deterministic here by applying deltas in partition-index order;
  *  - epoch loss via a DoubleAccumulator (`TransE.py:104,279`).
  *
  * Deliberate upgrades: seeded determinism end-to-end (SURVEY §7.5-3),
  * a rejection cap (§7.5-4), float32 parameters, Bloom-filter membership
  * option for at-scale rejection sets.
  *
  * Scale ceiling (documented, same as reference `README.md:30`): both
  * matrices must fit on the driver and each executor — n*k*4 bytes; at
  * k=50 that is ~5 GB per 25M entities. Beyond that, use
  * [[TransEPartitionedTrainer]]: the entity matrix lives as a distributed
  * `(id, vec)` RDD co-partitioned with the per-batch updates, and is
  * bit-for-bit equivalent to this trainer (asserted by TransESpec /
  * ContractSpec).
  */
class TransETrainer(params: TransEParams) extends Serializable {

  /** Per-epoch hinge loss trajectory of the last `fit` call. */
  @volatile var lossHistory: Vector[Double] = Vector.empty

  /** Per-epoch wall seconds of the last `fit` call. The host sandbox
    * throttles sustained CPU (measured 3-65 s/epoch swings on identical
    * code), so the MIN is the steady-state epoch time; the mean is the
    * throttle lottery. Bench reports both. */
  @volatile var epochSecsHistory: Vector[Double] = Vector.empty

  def fit(triples: Dataset[Triple], nEntities: Int, nLabels: Int): TransEModel =
    fit(triples, nEntities, nLabels, warmStart = None)

  /** @param warmStart resume from a previous model's matrices (reference
    *                  `TransE.py:28-29,73-76`: restore-then-continue). */
  def fit(triples: Dataset[Triple], nEntities: Int, nLabels: Int,
      warmStart: Option[TransEModel]): TransEModel = {
    val spark = triples.sparkSession
    val sc = spark.sparkContext
    val p = params
    TransETrainer.requireWarmStartShape(p, nEntities, nLabels, warmStart)

    val (data, nTriples, _) = TransETrainer.relayout(triples)
    val membership = TransETrainer.buildMembership(spark, data, nTriples,
      nEntities, nLabels, p)
    val membBc = sc.broadcast(membership)
    val bernBc = sc.broadcast(
      if (p.bernCorruption) TransETrainer.bernProbs(data, nLabels) else null)

    val (entity, label) = TransETrainer.initialMatrices(p, nEntities, nLabels, warmStart)

    var history = Vector.empty[Double]

    val profile = sys.env.contains("GRAFT_TRAIN_PROFILE")
    var tBroadcast, tJob, tMerge, tDestroy = 0L
    def tick(): Long = System.nanoTime()

    var epochSecs = Vector.empty[Double]
    var epoch = 0
    while (epoch < p.epochs) {
      val tEpoch0 = tick()
      // loss rides in the COLLECTED deltas, not an accumulator: updates
      // from transformations are re-applied on task retry / speculative
      // execution, which would inflate the metric nondeterministically on
      // a real cluster; collect() results are exactly-once
      var epochLoss = 0.0
      var batch = 0
      while (batch < p.batches) {
        // Parameter sync: ONE fresh broadcast per batch bundling both
        // matrices (the reference broadcasts two, TransE.py:116-117),
        // destroyed after the merge (TransE.py:146-149 — epochs*batches
        // generations would otherwise accumulate on executors).
        val t0 = tick()
        val modelBc = sc.broadcast((entity, label))
        val batchSeed = TransETrainer.batchSeedOf(p, epoch, batch)
        val t1 = tick()

        val sampled = TransETrainer.sampleBatch(data, p.batches, batchSeed)
        val deltas = sampled.mapPartitionsWithIndex { (pid, it) =>
          val (ent, lab) = modelBc.value
          TransETrainer.partitionSgd(pid, it, ent(_), lab(_),
            membBc.value, nEntities, p, batchSeed, bernBc.value)
        }.collect()
        val t2 = tick()

        // Deterministic last-writer-wins: partition-index order.
        java.util.Arrays.sort(deltas, Ordering.by((d: TransETrainer.Delta) => d.pid))
        deltas.foreach { d =>
          epochLoss += d.loss
          d.applyTo(entity, label, p.dim)
        }
        val t3 = tick()
        modelBc.destroy()
        val t4 = tick()
        tBroadcast += t1 - t0; tJob += t2 - t1; tMerge += t3 - t2; tDestroy += t4 - t3
        batch += 1
      }
      history :+= epochLoss
      epochSecs :+= (tick() - tEpoch0) / 1e9
      epoch += 1
      // periodic VERSIONED checkpoint (reference writes per-epoch files
      // entity_embedding_<id>.pkl, utils.py:44-49 / TransE.py:108-111):
      // every checkpointed epoch is restorable from $dir/epoch=<n>
      if (p.checkpointEvery > 0 && epoch % p.checkpointEvery == 0) {
        p.checkpointDir.foreach { dir =>
          EmbeddingIO.saveModel(spark, TransEModel(entity, label, p),
            s"$dir/epoch=$epoch")
        }
      }
    }
    if (profile) {
      System.err.println(
        f"[train-profile] broadcast=${tBroadcast / 1e9}%.1fs job=${tJob / 1e9}%.1fs " +
          f"merge=${tMerge / 1e9}%.1fs destroy=${tDestroy / 1e9}%.1fs " +
          f"rounds=${p.epochs * p.batches}")
    }
    lossHistory = history
    epochSecsHistory = epochSecs
    membBc.destroy()
    bernBc.destroy()
    data.unpersist()
    TransEModel(entity, label, params)
  }
}

object TransETrainer {

  /** CONTINUAL-TRAINING model growth (round 10): pad a trained model to a
    * larger vocabulary so `fit(warmStart = extended)` resumes with every
    * old row's learned weights intact and only the appended rows at
    * seeded fresh init (the same U(±6/√k) as cold start; new label rows
    * normalized once like init, new entity rows by fit's own epoch-start
    * normalization). Pairs with [[DictionaryEncoder.extendDictionary]]'s
    * id-stability contract: old id i is old matrix row i before and
    * after. The init seed is displaced by the OLD sizes so the appended
    * rows never replay the exact cold-start stream of the original
    * training (which rows 0..oldN-1 already consumed). */
  def extendModel(model: TransEModel, nEntities: Int, nLabels: Int): TransEModel = {
    require(nEntities >= model.nEntities && nLabels >= model.nLabels,
      s"extendModel cannot shrink: (${model.nEntities},${model.nLabels}) -> " +
        s"($nEntities,$nLabels)")
    val p = model.params
    val newEnt = Kernels.uniformInit(nEntities - model.nEntities, p.dim,
      p.seed + 2 + model.nEntities.toLong)
    val newLab = Kernels.uniformInit(nLabels - model.nLabels, p.dim,
      p.seed + 3 + model.nLabels.toLong)
    Kernels.normalizeAll(newLab)
    TransEModel(
      model.entity.map(_.clone()) ++ newEnt,
      model.label.map(_.clone()) ++ newLab,
      p)
  }

  private[transe] def requireWarmStartShape(p: TransEParams, nEntities: Int,
      nLabels: Int, warmStart: Option[TransEModel]): Unit =
    warmStart.foreach { m =>
      require(m.nEntities == nEntities && m.nLabels == nLabels,
        s"warm-start shape (${m.nEntities},${m.nLabels}) != (${nEntities},${nLabels})")
      // dim must match too: the delta pack/apply path reads exactly p.dim
      // floats per row — a wider checkpoint would silently truncate every
      // update and leave components beyond p.dim stale
      require(m.entity.headOption.forall(_.length == p.dim) &&
        m.label.headOption.forall(_.length == p.dim),
        s"warm-start dim ${m.entity.headOption.map(_.length).getOrElse(0)} != ${p.dim}")
    }

  /** The per-round sampling/corruption seed — part of the golden contract. */
  private[transe] def batchSeedOf(p: TransEParams, epoch: Int, batch: Int): Long =
    p.seed * 1000003L + epoch.toLong * p.batches + batch

  /** Materialize ONCE as a cached RDD of Triple objects: the SGD loop
    * re-samples this 2 * epochs * batches times, and staying in the RDD
    * API avoids re-running Catalyst analysis + whole-stage codegen
    * compilation for a fresh sample plan every round (measured: the
    * planning overhead dominated the loop at sf0.1).
    *
    * Partition count is sized by DELTA VOLUME, not CPU: every partition
    * ships its own copy of each hot embedding row it touched, so 32
    * partitions of a small batch multiply the per-round collect bytes
    * ~32x while the SGD compute itself is microseconds. Measured on sf0.1
    * (1.5M triples, 186k entities): 4-8 partitions beat 32 by ~2-4x wall
    * clock. ~200k triples/partition, clamped to [2, 16]
    * (GRAFT_TRAIN_PARTS overrides for experiments).
    *
    * LAYOUT-INDEPENDENT DETERMINISM: partition each triple by a content
    * hash and sort within partitions. The SGD result depends on which
    * rows share a partition (per-partition write-combining + LWW merge)
    * and on iteration order (Bernoulli sampling consumes the RNG stream
    * row-by-row); an upstream coalesce/repartition layout would leak the
    * session's shuffle-partition count and file-split geometry into the
    * trained weights. After this re-layout, fit() is a pure function of
    * (triple set, params) — what lets the driver gate transe_fit/eval on
    * golden recordings regardless of SPARK_GRAFT_CPUS. One extra shuffle
    * of the training set, paid once per fit, not per SGD round; partition
    * count stays delta-volume-sized (see above).
    *
    * Determinism here is fully hand-rolled ([[StableHash.tripleHash]] for
    * partition assignment, [[sampleBatch]] for Bernoulli sampling) so a
    * Scala/Spark upgrade cannot invalidate the golden recordings
    * (VERDICT r5 #4; HashStabilitySpec pins the bit patterns).
    *
    * ONE pass over the input lineage: persist at the incoming layout,
    * count (fills the cache + sizes partitions), then re-lay-out from
    * the cache.
    */
  private[transe] def relayout(triples: Dataset[Triple]): (RDD[Triple], Long, Int) = {
    val rawRdd = triples.rdd
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nTriples = rawRdd.count()
    val targetParts = sys.env.get("GRAFT_TRAIN_PARTS").map(_.toInt).getOrElse(
      math.max(2, math.min(16, (nTriples / 200000L).toInt + 1)))
    require(targetParts > 0,
      s"GRAFT_TRAIN_PARTS must be positive, got $targetParts")
    val relaid = rawRdd
      .keyBy(tr => Math.floorMod(StableHash.tripleHash(tr.h, tr.l, tr.t), targetParts))
      .partitionBy(new org.apache.spark.Partitioner {
        def numPartitions: Int = targetParts
        def getPartition(key: Any): Int = key.asInstanceOf[Int]
      })
      .mapPartitions({ it =>
        val arr = it.map(_._2).toArray
        java.util.Arrays.sort(arr, Ordering.by((t: Triple) => (t.h, t.l, t.t)))
        arr.iterator
      }, preservesPartitioning = false)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    relaid.count() // materialize from the parent cache, then drop it
    rawRdd.unpersist()
    (relaid, nTriples, targetParts)
  }

  /** Hand-rolled per-partition Bernoulli sampler (fraction 1/batches,
    * reference `TransE.py:120-122`). Replaces `RDD.sample`, whose
    * per-partition seeding is a Spark implementation detail — this way the
    * sampled row set is a pure function of [[StableHash.samplerSeed]] and
    * the relaid layout, stable across Spark upgrades. */
  private[transe] def sampleBatch(data: RDD[Triple], batches: Int,
      batchSeed: Long): RDD[Triple] = {
    val frac = 1.0 / batches
    data.mapPartitionsWithIndex({ (pid, it) =>
      val rng = new SplittableRandom(StableHash.samplerSeed(batchSeed, pid))
      it.filter(_ => rng.nextDouble() < frac)
    }, preservesPartitioning = true)
  }

  /** Negative-sampling membership, built from the CACHED relaid RDD (not
    * the original Dataset lineage). */
  private[transe] def buildMembership(spark: SparkSession, data: RDD[Triple],
      nTriples: Long, nEntities: Int, nLabels: Int, p: TransEParams): TripleMembership =
    if (p.exactMembership && PackedMembership.fits(nEntities, nLabels)) {
      val packed = data
        .map(tr => PackedMembership.pack(tr.h, tr.l, tr.t))
        .collect()
      java.util.Arrays.sort(packed)
      new PackedMembership(packed)
    } else if (p.exactMembership) {
      val s = new java.util.HashSet[(Int, Int, Int)]()
      data.collect().foreach(tr => s.add((tr.h, tr.l, tr.t)))
      new ExactMembership(s)
    } else {
      val bloom = spark.createDataFrame(data).stat.bloomFilter(
        org.apache.spark.sql.functions.concat_ws(":",
          org.apache.spark.sql.functions.col("h"),
          org.apache.spark.sql.functions.col("l"),
          org.apache.spark.sql.functions.col("t")),
        expectedNumItems = math.max(nTriples, 1L), fpp = 0.01)
      new BloomMembership(bloom)
    }

  /** Per-relation head-replacement probability for "bern" corruption
    * (Wang et al. 2014): p_head(l) = tph/(tph+hpt) which reduces to the
    * all-integer dt_l / (dh_l + dt_l) (distinct tails / (distinct heads
    * + distinct tails) of relation l) — one distinct-pair aggregation
    * over the cached training set, deterministic across layouts.
    * Relations absent from the data default to the uniform 1/2. */
  private[graft] def bernProbs(data: RDD[Triple], nLabels: Int): Array[Double] = {
    val counts = data
      .flatMap(tr => Seq(((tr.l, 0, tr.h), null), ((tr.l, 1, tr.t), null)))
      .reduceByKey((a, _) => a)
      .map { case ((l, side, _), _) => ((l, side), 1L) }
      .reduceByKey(_ + _)
      .collect()
    val dh = new Array[Long](nLabels)
    val dt = new Array[Long](nLabels)
    counts.foreach { case ((l, side), n) =>
      if (side == 0) dh(l) = n else dt(l) = n }
    Array.tabulate(nLabels)(l =>
      if (dh(l) + dt(l) == 0) 0.5 else dt(l).toDouble / (dh(l) + dt(l)))
  }

  /** Seeded init / warm-start restore (reference `TransE.py:45-60,97`). */
  private[transe] def initialMatrices(p: TransEParams, nEntities: Int,
      nLabels: Int, warmStart: Option[TransEModel]):
      (Array[Array[Float]], Array[Array[Float]]) =
    warmStart match {
      case Some(m) =>
        val e = m.entity.map(_.clone())
        // the reference normalizes entities at every epoch start INCLUDING
        // the restore-then-continue path (TransE.py:97); labels are only
        // normalized at init
        Kernels.normalizeAll(e)
        (e, m.label.map(_.clone()))
      case None =>
        val e = Kernels.uniformInit(nEntities, p.dim, p.seed)
        val l = Kernels.uniformInit(nLabels, p.dim, p.seed + 1)
        Kernels.normalizeAll(l)
        Kernels.normalizeAll(e)
        (e, l)
    }

  /** One partition's sparse update (reference yields a dict pair per
    * partition, `TransE.py:218`). Stored as FLAT primitive arrays —
    * ids plus row-major values — so task-result serialization is a
    * straight memcpy instead of per-row boxed tuples (this is the
    * dominant per-round byte volume: up to |touched rows| * dim floats
    * per partition). */
  final case class Delta(
      pid: Int,
      entIds: Array[Int], entVals: Array[Float],
      labIds: Array[Int], labVals: Array[Float],
      loss: Double) {

    /** In-place overwrite of the driver matrices (no per-row allocation —
      * safe: the previous round's broadcast is never read again once its
      * tasks' results are collected, and the next round re-broadcasts). */
    def applyTo(entity: Array[Array[Float]], label: Array[Array[Float]], dim: Int): Unit = {
      var i = 0
      while (i < entIds.length) {
        System.arraycopy(entVals, i * dim, entity(entIds(i)), 0, dim)
        i += 1
      }
      i = 0
      while (i < labIds.length) {
        System.arraycopy(labVals, i * dim, label(labIds(i)), 0, dim)
        i += 1
      }
    }
  }

  private def pack(m: mutable.HashMap[Int, Array[Float]], dim: Int): (Array[Int], Array[Float]) = {
    val n = m.size
    val ids = new Array[Int](n)
    val vals = new Array[Float](n * dim)
    var i = 0
    val it = m.iterator
    while (it.hasNext) {
      val (id, v) = it.next()
      ids(i) = id
      System.arraycopy(v, 0, vals, i * dim, dim)
      i += 1
    }
    (ids, vals)
  }

  /** Executor-side SGD over one partition of the sampled batch — the
    * reference's `corrupt_minimize` (`TransE.py:172-218`) re-expressed.
    * Touched rows are copied once into local maps (write-combining) and
    * emitted as the partition delta.
    *
    * Parameter access is through `entBase`/`labBase` READ closures so the
    * broadcast trainer (full matrices) and [[TransEPartitionedTrainer]]
    * (per-partition prefetched rows) share this kernel bit-for-bit; the
    * closures must return the batch-start value for every id in the
    * partition's read set ({h, t, final corruption candidate} entities and
    * {l} labels per sampled triple — see [[readSet]]).
    *
    * RNG DISCIPLINE (the partitioned trainer depends on it): the
    * corruption stream consumes exactly `nextBoolean + nextInt*(1+redraws)`
    * per triple, and redraw count depends only on the membership set —
    * never on parameter values. That makes the stream replayable by
    * [[readSet]] without knowing the parameters.
    */
  private[transe] def partitionSgd(
      pid: Int,
      it: Iterator[Triple],
      entBase: Int => Array[Float],
      labBase: Int => Array[Float],
      membership: TripleMembership,
      nEntities: Int,
      p: TransEParams,
      batchSeed: Long,
      bern: Array[Double] = null): Iterator[Delta] = {

    // Deterministic per-task stream: seed mixes batch and partition
    // (reference uses OS randomness, TransE.py:185 — SURVEY §7.5-3).
    val rng = new SplittableRandom(StableHash.corruptionSeed(batchSeed, pid))
    // Write-combining with DIRTY-ONLY shipping: rows enter the local maps
    // (and hence the emitted delta) only when actually updated. The
    // reference also ships rows it merely READ (`TransE.py:191-206`),
    // which lets an unchanged copy from a later partition stomp a real
    // update under last-writer-wins — shipping only dirty rows is both
    // cheaper (delta bytes track hinge violations, which decay as training
    // converges) and strictly better merge semantics (documented deviation,
    // SURVEY §7.5-2).
    val entLocal = new mutable.HashMap[Int, Array[Float]]()
    val labLocal = new mutable.HashMap[Int, Array[Float]]()
    def entRead(id: Int): Array[Float] = entLocal.getOrElse(id, entBase(id))
    def labRead(id: Int): Array[Float] = labLocal.getOrElse(id, labBase(id))
    def entWrite(id: Int): Array[Float] = entLocal.getOrElseUpdate(id, entBase(id).clone())
    def labWrite(id: Int): Array[Float] = labLocal.getOrElseUpdate(id, labBase(id).clone())

    var loss = 0.0
    it.foreach { tr =>
      // Corruption: flip head or tail — uniform 1/2 (TransE.py:252) or
      // the per-relation bern probability; redraw while the corrupted
      // triple is a real training triple (TransE.py:237-244), capped
      // (SURVEY §7.5-4). The bern array is DATA (relation statistics),
      // not parameters, so readSet's replay contract is preserved.
      val corruptHead =
        if (bern == null) rng.nextBoolean() else rng.nextDouble() < bern(tr.l)
      var candidate = rng.nextInt(nEntities)
      var tries = 0
      while (tries < p.rejectionCap &&
        (if (corruptHead) membership.contains(candidate, tr.l, tr.t)
         else membership.contains(tr.h, tr.l, candidate))) {
        candidate = rng.nextInt(nEntities)
        tries += 1
      }
      val nhId = if (corruptHead) candidate else tr.h
      val ntId = if (corruptHead) tr.t else candidate

      val dPos = Kernels.dist(p.distance, entRead(tr.h), labRead(tr.l), entRead(tr.t))
      val dNeg = Kernels.dist(p.distance, entRead(nhId), labRead(tr.l), entRead(ntId))
      val viol = p.margin + dPos - dNeg
      if (viol > 0) { // hinge activation (TransE.py:276)
        loss += viol
        val h = entWrite(tr.h)
        val l = labWrite(tr.l)
        val t = entWrite(tr.t)
        val nh = entWrite(nhId)
        val nt = entWrite(ntId)
        // Gradients computed from pre-update values, then applied jointly;
        // shared rows (l always; t or h on corruption overlap) accumulate
        // both contributions, which is exact joint SGD on the hinge term.
        val gPos = Kernels.gradient(p.distance, h, l, t)
        val gNeg = Kernels.gradient(p.distance, nh, l, nt)
        Kernels.axpyInPlace(p.lr, gPos, h)
        Kernels.axpyInPlace(p.lr, gPos, l)
        Kernels.axpyInPlace(-p.lr, gPos, t)
        Kernels.axpyInPlace(-p.lr, gNeg, nh)
        Kernels.axpyInPlace(-p.lr, gNeg, l)
        Kernels.axpyInPlace(p.lr, gNeg, nt)
        // Re-normalize touched ENTITY rows (TransE.py:214-217); labels are
        // only normalized at init (TransE.py:60).
        Kernels.normalizeInPlace(h)
        Kernels.normalizeInPlace(t)
        if (nhId != tr.h) Kernels.normalizeInPlace(nh)
        if (ntId != tr.t) Kernels.normalizeInPlace(nt)
      }
    }
    val (eIds, eVals) = pack(entLocal, p.dim)
    val (lIds, lVals) = pack(labLocal, p.dim)
    Iterator(Delta(pid, eIds, eVals, lIds, lVals, loss))
  }

  /** Replay the corruption stream WITHOUT parameters to compute the exact
    * set of entity ids one partition's [[partitionSgd]] call will read
    * ({h, t, final candidate} per sampled triple). Possible because RNG
    * consumption is parameter-independent (see partitionSgd scaladoc) —
    * this is what lets [[TransEPartitionedTrainer]] prefetch exactly the
    * needed parameter rows ahead of the SGD pass. */
  private[transe] def readSet(
      pid: Int,
      it: Iterator[Triple],
      membership: TripleMembership,
      nEntities: Int,
      p: TransEParams,
      batchSeed: Long,
      bern: Array[Double] = null): java.util.HashSet[Integer] = {
    val rng = new SplittableRandom(StableHash.corruptionSeed(batchSeed, pid))
    val ids = new java.util.HashSet[Integer]()
    it.foreach { tr =>
      ids.add(tr.h); ids.add(tr.t)
      val corruptHead =
        if (bern == null) rng.nextBoolean() else rng.nextDouble() < bern(tr.l)
      var candidate = rng.nextInt(nEntities)
      var tries = 0
      while (tries < p.rejectionCap &&
        (if (corruptHead) membership.contains(candidate, tr.l, tr.t)
         else membership.contains(tr.h, tr.l, candidate))) {
        candidate = rng.nextInt(nEntities)
        tries += 1
      }
      ids.add(candidate)
    }
    ids
  }
}
