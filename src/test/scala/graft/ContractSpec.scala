package graft

/** Driver-contract invariants: the queries/oracles registries stay
  * consistent. `Map ++` silently shadows duplicate keys, so a name
  * reused across query packs would drop an operator from the driver's
  * sweep without any compile-time signal — this spec is that signal. */
class ContractSpec extends SparkSpec {

  test("query names are unique across all packs (no silent shadowing)") {
    val packs = Seq(
      queries.Relational.queries, queries.TransEQueries.queries,
      queries.PipelineQueries.queries, queries.StreamingQueries.queries)
    val total = packs.map(_.size).sum
    assert(SparkEntry.queries.size == total,
      s"duplicate query names shadow each other: ${total - SparkEntry.queries.size} lost")
    val oraclePacks = Seq(
      queries.Relational.oracles, queries.TransEQueries.oracles,
      queries.PipelineQueries.oracles, queries.StreamingQueries.oracles)
    val totalOracles = oraclePacks.map(_.size).sum
    assert(SparkEntry.oracleSql.size == totalOracles,
      "duplicate oracle names shadow each other")
  }

  test("every oracle refers to a registered query") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracles without queries: $orphans")
  }

  test("the rows-only set is exactly the two SGD training metrics") {
    val rowsOnly = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(rowsOnly == Set("transe_eval", "transe_fit"),
      s"unexpected rows-only queries: $rowsOnly")
  }

  test("flagship entry returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
