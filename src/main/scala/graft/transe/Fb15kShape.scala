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
}
