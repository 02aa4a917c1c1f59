package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Key-salting for skewed equi-joins — the manual lever for the case AQE's
  * skew-join split cannot reach (a single hot key whose rows exceed one
  * executor, or a build side that must replicate anyway).
  *
  * Mechanics: the probe side gets a salt in [0, salt) derived from a
  * CONTENT hash of the row (deterministic across retries, unlike rand();
  * any assignment is valid — the salt only routes rows), the build side is
  * replicated `salt` times, and the join key becomes (key, salt). A hot
  * key's rows then spread across `salt` reducers instead of serializing on
  * one. The result set is identical to the unsalted join — which is
  * exactly what the q15 oracle checks.
  *
  * Cost model: build-side bytes x salt extra shuffle volume buys probe-side
  * parallelism salt-fold on hot keys. Use for large-probe/modest-build
  * joins with known skew; prefer AQE's automatic split when row groups are
  * merely unbalanced rather than pathological.
  */
object SkewJoin {

  /** Salted inner equi-join on `key` (same column name on both sides). */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
      salt: Int = 8): DataFrame = {
    require(salt > 0, "salt must be positive")
    val l = left.withColumn("__salt",
      pmod(xxhash64(left.columns.map(col): _*), lit(salt.toLong)))
    val r = right.withColumn("__salt",
      explode(sequence(lit(0L), lit(salt.toLong - 1))))
    l.join(r, Seq(key, "__salt")).drop("__salt")
  }
}
