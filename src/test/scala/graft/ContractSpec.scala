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

  /** The O(n^2) exact baselines are the ONLY queries allowed a
    * nested-loop/cartesian plan — each is a deliberately-registered
    * verification yardstick with a scale-safe twin (see VERDICT r1 §6 and
    * the operator scaladocs). text_length_quantiles and sample_mix_sources
    * use a BROADCAST nested loop against constant-size tables (quantile
    * levels / source caps) — bounded by design, not corpus-shaped. */
  private val cartesianWhitelist = Set(
    "ann_near_dup", "mm_feature_near_dup",
    "text_length_quantiles", "sample_mix_sources")

  test("every registered query runs at sf0.001; no unexpected cartesians") {
    val sfDir = "/root/testdata/sf0.001"
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val df = fn(spark, sfDir)
      val plan = df.queryExecution.executedPlan.toString
      val hasCart = plan.contains("BroadcastNestedLoopJoin") ||
        plan.contains("CartesianProduct")
      assert(!hasCart || cartesianWhitelist.contains(name),
        s"$name has an unexpected cartesian/BNLJ plan:\n$plan")
      // decontaminate can legitimately flag nothing in a 150-doc corpus;
      // its content is still oracle-checked at sf0.01
      if (name != "decontaminate")
        assert(df.count() > 0, s"$name returned no rows at sf0.001")
    }
  }
}
