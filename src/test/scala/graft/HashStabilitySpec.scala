package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.transe.StableHash

/** Pins [[StableHash]]'s bit patterns against recorded vectors (computed
  * once with an independent Python replica of the splitmix64 finalizer).
  *
  * These hashes decide training-triple partition assignment, Bernoulli
  * sampling and corruption RNG seeding — i.e. they are part of the golden
  * recordings' contract (ContractSpec). If THIS spec fails, someone
  * changed the mixers and every golden is invalid; if this spec passes but
  * a golden gate fails, the trainer's behavior changed (or the testdata
  * was regenerated — see ContractSpec scaladoc). That disambiguation is
  * the point of recording the vectors here (VERDICT r5 #4).
  */
class HashStabilitySpec extends AnyFunSuite {

  test("mix64 matches recorded vectors") {
    assert(StableHash.mix64(0L) == 0L)
    assert(StableHash.mix64(1L) == 6238072747940578789L)
    assert(StableHash.mix64(-1L) == -5417735806833148549L)
    assert(StableHash.mix64(42L) == -6387817139659442654L)
    assert(StableHash.mix64(0x9E3779B97F4A7C15L) == -2152535657050944081L)
    assert(StableHash.mix64(123456789123456789L) == -348534286553932281L)
  }

  test("tripleHash matches recorded vectors") {
    assert(StableHash.tripleHash(0, 0, 0) == 0)
    assert(StableHash.tripleHash(1, 2, 3) == -1486577346)
    assert(StableHash.tripleHash(14540, 236, 14540) == -1290052758)
    assert(StableHash.tripleHash(123456, 7, 654321) == -1058715446)
    assert(StableHash.tripleHash(2147483647, 1023, 2147483647) == -151715869)
  }

  test("samplerSeed / corruptionSeed match recorded vectors and stay decorrelated") {
    assert(StableHash.samplerSeed(42000126L, 0) == 4951680569503181087L)
    assert(StableHash.samplerSeed(42000126L, 1) == 7883948427687003984L)
    assert(StableHash.samplerSeed(42000187L, 7) == -4580317243864783033L)
    assert(StableHash.corruptionSeed(42000126L, 0) == 42000126L)
    assert(StableHash.corruptionSeed(42000126L, 1) == -7046029254411509013L)
    assert(StableHash.corruptionSeed(42000187L, 7) == 6018027440399039400L)
    // the two streams a task consumes must not share a seed
    for (pid <- 0 until 16; b <- 0 until 4) {
      val bs = 42L * 1000003L + b
      assert(StableHash.samplerSeed(bs, pid) != StableHash.corruptionSeed(bs, pid))
    }
  }

  test("tripleHash spreads the KG id space evenly across small partition counts") {
    // layout quality guard: buckets within 2x of each other on a dense id
    // cube sample (a degenerate hash would silently serialize training)
    val parts = 8
    val counts = new Array[Int](parts)
    for (h <- 0 until 40; l <- 0 until 10; t <- 0 until 40)
      counts(Math.floorMod(StableHash.tripleHash(h, l, t), parts)) += 1
    assert(counts.min > 0 && counts.max < counts.min * 2,
      s"skewed layout buckets: ${counts.mkString(",")}")
  }
}
