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

  test("Verify's dump loop drains the registry between query dumps") {
    // VERDICT r13 #7: a full 211-query Verify sweep must not accumulate
    // dead disk blocks — the dump loop releases after EVERY query, so a
    // cache registered before a dump is gone once that dump completes
    CacheScope.releaseAll()
    val sentinel = CacheScope.register(
      Seq(1, 2).toDF("a").persist(StorageLevel.MEMORY_AND_DISK))
    sentinel.count()
    assert(sentinel.storageLevel != StorageLevel.NONE)
    val out = java.nio.file.Files.createTempDirectory("graft_drain").toString
    Verify.dumpQueries(spark, sf, out, Some(Set("q1_agg")))
    assert(sentinel.storageLevel == StorageLevel.NONE,
      "Verify.dumpQueries must drain the registry between query dumps")
  }

  test("register self-limits: entries past the cap drain oldest-first") {
    // ADVICE r13: outside the harness nothing calls releaseAll, so the
    // registry must not retain a strong Dataset reference per query for
    // the session lifetime — register() drains the oldest past the cap
    CacheScope.releaseAll()
    val dfs = (0 until 70).map(i => CacheScope.register(
      Seq(i).toDF("x").persist(StorageLevel.MEMORY_AND_DISK)))
    assert(dfs.head.storageLevel == StorageLevel.NONE,
      "oldest entry must be drained once the cap is exceeded")
    assert(dfs.last.storageLevel != StorageLevel.NONE,
      "recent entries must survive the cap drain")
    CacheScope.releaseAll()
    assert(dfs.forall(_.storageLevel == StorageLevel.NONE))
  }

  test("releaseAll unregisters tracked unfired release listeners") {
    // ADVICE r13: a listener whose query is only ever PLANNED never
    // fires and never self-unregisters; the harness drain removes it
    CacheScope.releaseAll()
    val hits = new java.util.concurrent.atomic.AtomicInteger(0)
    val l = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          durationNs: Long): Unit = hits.incrementAndGet()
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          exception: Exception): Unit = ()
    }
    spark.listenerManager.register(l)
    CacheScope.registerListener(spark.listenerManager, l)
    Seq(1).toDF("x").count()
    // the listener bus is async — wait until the live listener has
    // demonstrably fired, then let it go quiet
    var waited = 0
    while (hits.get == 0 && waited < 100) { Thread.sleep(100); waited += 1 }
    assert(hits.get >= 1, "listener never fired while registered")
    var last = -1
    while (hits.get != last) { last = hits.get; Thread.sleep(200) }
    CacheScope.releaseAll()
    val before = hits.get
    Seq(2).toDF("x").count()
    Thread.sleep(1000) // generous async-bus drain window
    assert(hits.get == before,
      "a drained listener must no longer observe actions")
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
