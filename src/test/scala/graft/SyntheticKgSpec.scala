package graft

import graft.transe._

/** Reference-grade model-quality demonstration (VERDICT round 1 §missing-2).
  *
  * The driver testdata KG cannot show head-direction learning: `placed_by`
  * heads are structurally interchangeable, so head ranks are ~random no
  * matter how good the model is. This synthetic CHAIN KG has analytically
  * known optimal ranks of ~1 in BOTH directions:
  *
  *   - entities e_0..e_999 on a chain, `next`: e_i -> e_{i+1} and
  *     `skip2`: e_i -> e_{i+2}. Both are satisfied EXACTLY by a line
  *     embedding (e_i = e_0 + i*u, r_next = u, r_skip2 = 2u) — unlike a
  *     cycle, whose wraparound forces r = 0;
  *   - a held-out (e_i, next, e_{i+1}) has a UNIQUE best answer in each
  *     direction (unique successor AND unique predecessor), and the
  *     geometry that implies it is anchored transitively by the remaining
  *     edges — so this is real generalization, not memorization;
  *   - every entity stays in the train vocabulary (holdout skips chain
  *     ends and is sparse), satisfying the skip-unknown protocol.
  *
  * The reference publishes MeanRank 326.98 / Hits@10 36.87 on FB15k-237
  * (~14.5k entities) — ~22x better than random, hits ~0.37. The gates
  * demand at least that relative margin here (random rank ~500) in BOTH
  * directions, plus hits@10 well above the reference's.
  */
class SyntheticKgSpec extends SparkSpec {

  test("TransE reaches reference-grade quality in BOTH directions on a learnable KG") {
    import spark.implicits._
    val n = 1000

    val next = (0 until n - 1).map(i => RawTriple(s"e$i", "next", s"e${i + 1}"))
    val skip2 = (0 until n - 2).map(i => RawTriple(s"e$i", "skip2", s"e${i + 2}"))
    val all = spark.createDataset(next ++ skip2)

    val (ents, labs) = DictionaryEncoder.buildDictionaries(all)
    val nEnt = ents.count().toInt
    val nLab = labs.count().toInt

    // hold out every 10th `next` edge away from the chain ends; the
    // entities stay anchored by their other edges
    val isHoldout = (t: RawTriple) => t.l == "next" && {
      val i = t.h.drop(1).toInt
      i % 10 == 5 && i > 2 && i < n - 3
    }
    val train = DictionaryEncoder.encode(all.filter(t => !isHoldout(t)), ents, labs)
    val test = DictionaryEncoder.encode(all.filter(t => isHoldout(t)), ents, labs)

    val p = TransEParams(epochs = 80, batches = 2, margin = 1.0f, lr = 0.05f,
      dim = 32, distance = L2Squared, seed = 42L)
    val model = new TransETrainer(p).fit(train, nEnt, nLab)

    val row = LinkPrediction.evaluate(test, model, hitsK = 10).collect().head
    val tail = row.getAs[Double]("mean_rank_tail")
    val head = row.getAs[Double]("mean_rank_head")
    val hits = row.getAs[Double]("hits_at_10")
    val random = nEnt / 2.0 // ~500
    info(f"tail=$tail%.1f head=$head%.1f hits@10=$hits%.3f (random=$random%.0f)")

    // both directions: at least the reference's ~22x-better-than-random
    // margin (the analytic ideal is rank ~1)
    assert(tail < random / 22, s"tail mean rank $tail not reference-grade")
    assert(head < random / 22, s"head mean rank $head not reference-grade")
    // hits@10: reference-grade is 0.37; the learnable chain should beat it
    assert(hits > 0.5, s"hits@10 $hits below reference grade")

    // ------- Table-4 protocol: per-cardinality-category breakdown -------
    // the chain relations are strictly functional both ways, so the
    // classifier must call them 1-1; the weighted per-category hits must
    // re-compose to the overall metric (internal consistency, no golden)
    val cats = LinkPrediction.relationCategories(
      DictionaryEncoder.encode(all, ents, labs).toDF())
      .collect().map(r => r.getAs[Int]("l") -> r.getAs[String]("category")).toMap
    assert(cats.values.toSet == Set("1-1"),
      s"chain relations are functional both ways, got $cats")
    val byCat = LinkPrediction.evaluateByCategory(test, model, train).collect()
    assert(byCat.map(_.getAs[Long]("n_triples")).sum == test.count())
    val recomposed = byCat.map(r =>
      (r.getAs[Double]("hits_head") + r.getAs[Double]("hits_tail")) / 2 *
        r.getAs[Long]("n_triples")).sum / test.count()
    assert(math.abs(recomposed - hits) < 1e-9,
      s"per-category hits do not recompose to the overall metric: $recomposed vs $hits")
  }

  test("relation categories: hand-built KG hits all four cardinality classes") {
    import spark.implicits._
    // f: functional both ways (1-1); one_to_n: each head fans to 3 tails;
    // n_to_one: 3 heads converge per tail; m: full bipartite 3x3 (N-N)
    val triples =
      (0 until 4).map(i => ("a" + i, "f", "b" + i)) ++
        (0 until 3).flatMap(i => (0 until 3).map(j => (s"h$i", "one_to_n", s"t${i}_$j"))) ++
        (0 until 3).flatMap(i => (0 until 3).map(j => (s"x${i}_$j", "n_to_one", s"y$i"))) ++
        (0 until 3).flatMap(i => (0 until 3).map(j => (s"p$i", "m", s"q$j")))
    val got = LinkPrediction.relationCategories(triples.toDF("h", "l", "t"))
      .collect().map(r => r.getAs[String]("l") -> r.getAs[String]("category")).toMap
    assert(got == Map("f" -> "1-1", "one_to_n" -> "1-N",
      "n_to_one" -> "N-1", "m" -> "N-N"), got.toString)
  }
}
