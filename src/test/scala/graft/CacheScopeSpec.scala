package graft

import org.apache.spark.storage.StorageLevel

/** The query-scoped cache registry's contract (ADVICE r12 #1): caches
  * registered by operators are released by the harness BETWEEN queries
  * — never mid-plan — and the release is idempotent, exception-safe,
  * and leaves unregistered (memoized) caches alone. */
class CacheScopeSpec extends SparkSpec {
  import spark.implicits._

  test("releaseAll unpersists registered caches, leaves others, and is idempotent") {
    CacheScope.releaseAll() // drain anything earlier suites left behind
    val registered = CacheScope.register(
      Seq(1, 2, 3).toDF("a").persist(StorageLevel.MEMORY_AND_DISK))
    val memoized = Seq(4, 5).toDF("b").persist(StorageLevel.MEMORY_AND_DISK)
    registered.count(); memoized.count()
    assert(registered.storageLevel != StorageLevel.NONE)
    assert(memoized.storageLevel != StorageLevel.NONE)

    CacheScope.releaseAll()
    assert(registered.storageLevel == StorageLevel.NONE,
      "registered cache must release")
    assert(memoized.storageLevel != StorageLevel.NONE,
      "unregistered (memoized) cache must survive the release")
    // released caches recompute correctly and a second drain is a no-op
    assert(registered.count() == 3)
    CacheScope.releaseAll()
    memoized.unpersist()
  }

  test("register returns its argument and a released entry is forgotten") {
    val df = Seq(1).toDF("x").persist(StorageLevel.MEMORY_AND_DISK)
    assert(CacheScope.register(df) eq df)
    df.count()
    CacheScope.releaseAll()
    // re-persist after release: the registry must NOT release it again
    // (entries are forgotten once drained, not tracked forever)
    df.persist(StorageLevel.MEMORY_AND_DISK)
    df.count()
    CacheScope.releaseAll()
    assert(df.storageLevel != StorageLevel.NONE,
      "a drained entry must not be re-released by a later drain")
    df.unpersist()
  }
}
