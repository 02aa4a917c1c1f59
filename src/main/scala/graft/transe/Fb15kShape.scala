package graft.transe

import org.apache.spark.sql.{Dataset, SparkSession}

/** Seeded synthetic KG at the PUBLISHED FB15k-237 shape — 14,541 entities /
  * 237 relations / 272,115 triples — the shape the reference's baseline
  * epoch time (13.50 s, BASELINE.md) was measured at.
  *
  * Shared by the bench (epoch-time headline, `Bench.scala`) and the
  * ContractSpec golden gate (VERDICT r5 #8): the gate records the 3-epoch
  * loss curve of THIS KG under the reference hyperparameters, so bench
  * throttle triage can distinguish "slow" (wall-clock wobble, loss
  * unchanged) from "wrong" (loss drifted — training semantics changed).
  *
  * Construction is per-row seeded (SplittableRandom(base + i)) so the
  * triple SET is independent of partitioning/parallelism; the trainer's
  * content-hash re-layout then makes fit() a pure function of that set.
  */
object Fb15kShape {
  val nEntities = 14541
  val nLabels = 237
  val nTriples = 272115

  /** Reference hyperparameters at the published shape (k=50, 2 batches,
    * L1 — `example.py:30-36`), epochs chosen by the caller. */
  def params(epochs: Int): TransEParams = TransEParams(
    epochs = epochs, batches = 2, margin = 1.0f, lr = 0.01f, dim = 50,
    distance = L1)

  def kg(spark: SparkSession): Dataset[Triple] = {
    import spark.implicits._
    spark.range(nTriples).map { i =>
      val r = new java.util.SplittableRandom(0x5eed5eedL + i)
      Triple(r.nextInt(nEntities), r.nextInt(nLabels), r.nextInt(nEntities))
    }
  }

  // ------------------------------------------------- learnable twin (r10)
  /** Lattice factorization of the entity space: 14,541 = 131 groups x 111
    * indices. Each axis is a SHORT chain (~120 positions — the resolution
    * regime where the SyntheticKgSpec chain reaches hits@10 > 0.5), so
    * TransE can resolve individual entities; a single 14,541-entity line
    * was measured to cap hits@10 at ~0.12 because the true tail's
    * immediate line neighbors are inherently confusable. */
  val Groups = 131
  val Indices = 111 // Groups * Indices == nEntities

  /** Relation r moves along ONE lattice axis: every third relation
    * translates the index axis by 1..8, the rest translate the group axis
    * by 1..16 (both well under half the axis length, so the geometry
    * stays locally translation-like under the per-epoch unit-norm
    * projection). Several relations share an (axis, offset) — fine,
    * TransE converges their vectors. */
  def axisOffsetOf(r: Int): (Boolean, Int) =
    if (r % 3 == 2) (false, (r % 8) + 1) // index axis, 1..8
    else (true, (r % 16) + 1)            // group axis, 1..16

  /** LEARNABLE KG at the same PUBLISHED shape (14,541 / 237 / 272,115):
    * entities form a [[Groups]] x [[Indices]] lattice (id = g*Indices+i),
    * relation r translates one axis by a small offset, and every triple is
    * the lattice step (h, r, h + step_r) with the head drawn seeded per
    * row away from the moving axis's edge — exactly representable by a
    * rank-2 embedding e(g,i) = G(g) + I(i) with r the axis step, so
    * held-out triples have a unique analytic best answer in BOTH
    * directions (the [[graft.SyntheticKgSpec]] chain construction, scaled
    * to the shape the reference published its quality numbers at). The
    * random-uniform [[kg]] stays the bench/golden workload: its loss curve
    * is pinned, but random triples cannot support a HELD-OUT quality gate
    * — this KG exists to carry the >=200-epoch MeanRank / Hits@10
    * stand-in for the published 326.98 / 36.87
    * (`/root/reference/README.md:112-115`) while the FB15k TSVs are
    * stripped from the distribution (VERDICT r9 #1). */
  def structuredKg(spark: SparkSession): Dataset[Triple] = {
    import spark.implicits._
    spark.range(nTriples).map { j =>
      val rel = (j % nLabels).toInt
      val (onGroupAxis, d) = axisOffsetOf(rel)
      val r = new java.util.SplittableRandom(0x57a6fb15L + j)
      val (g, i) =
        if (onGroupAxis) (r.nextInt(Groups - d), r.nextInt(Indices))
        else (r.nextInt(Groups), r.nextInt(Indices - d))
      val h = g * Indices + i
      val t = if (onGroupAxis) (g + d) * Indices + i else g * Indices + i + d
      Triple(h, rel, t)
    }
  }

  /** Content-keyed holdout (~1/40): any duplicate draw of a held-out
    * (h, l) pair is held out WITH it, so no test triple leaks into
    * train. Entities keep ~36 train edges each, so the vocabulary stays
    * fully anchored (the skip-unknown protocol is a no-op here). */
  def isHoldout(t: Triple): Boolean = (t.h.toLong * 1009L + t.l) % 40L == 7L

  /** (train, test): test is DISTINCT (duplicate draws collapse). */
  def structuredSplit(spark: SparkSession): (Dataset[Triple], Dataset[Triple]) = {
    val all = structuredKg(spark)
    (all.filter((t: Triple) => !isHoldout(t)),
      all.filter((t: Triple) => isHoldout(t)).distinct())
  }
}
