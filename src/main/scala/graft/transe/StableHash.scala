package graft.transe

/** Hand-rolled stable mixers for every place where trained weights depend
  * on a hash: the layout re-partitioner, the per-batch Bernoulli sampler
  * and the per-task corruption RNG seeds.
  *
  * WHY HAND-ROLLED (VERDICT r5 #4 / ADVICE r4 #1): the golden recordings
  * in ContractSpec gate training correctness bit-for-bit, so any hash that
  * feeds partition assignment or RNG seeding is part of the recorded
  * contract. `scala.util.hashing.MurmurHash3.productHash` and Spark's
  * `RDD.sample` seeding are stable within a minor line but NOT contractual
  * across Scala/Spark upgrades — a toolchain bump could silently re-shuffle
  * partition assignment and invalidate every golden. These mixers are
  * self-contained constants (the splitmix64 finalizer, Steele et al. 2014,
  * public domain — same constants as `java.util.SplittableRandom`), so the
  * recorded values survive any upgrade. HashStabilitySpec pins recorded
  * input/output vectors; if that spec ever fails, the goldens are invalid.
  */
object StableHash {

  /** splitmix64 finalizer: a bijective 64-bit avalanche mix. */
  def mix64(z0: Long): Long = {
    var z = z0
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** Layout hash of a triple: assigns each training triple to a content-
    * determined partition (see TransETrainer's re-layout rationale). The
    * three multipliers are large odd constants (golden-ratio family) so
    * the linear combine is injective-enough before the avalanche. */
  def tripleHash(h: Int, l: Int, t: Int): Int = {
    val x = mix64(h.toLong * 0x9E3779B97F4A7C15L
      + l.toLong * 0xC2B2AE3D27D4EB4FL
      + t.toLong * 0x165667B19E3779F9L)
    (x ^ (x >>> 32)).toInt
  }

  /** Seed of the per-(batch, partition) Bernoulli sampling RNG stream.
    * Mixed differently from [[corruptionSeed]] so the two streams a task
    * consumes are decorrelated. */
  def samplerSeed(batchSeed: Long, pid: Int): Long =
    mix64(batchSeed * 0x9E3779B97F4A7C15L + pid.toLong)

  /** Seed of the per-(batch, partition) corruption-draw RNG stream
    * (the historical trainer formula, kept verbatim). */
  def corruptionSeed(batchSeed: Long, pid: Int): Long =
    batchSeed ^ (pid.toLong * 0x9E3779B97F4A7C15L)
}
