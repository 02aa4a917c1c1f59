package graft

import java.util.SplittableRandom

import graft.transe._

/** Property gate for the fused early-exit ranking (LinkPrediction r5
  * rewrite): against a NAIVE full-sum reimplementation on randomized
  * models, both evaluators must produce IDENTICAL ranks. The early exit
  * is exact only because every distance term is non-negative (monotone
  * partial sums); this spec is the tripwire if a future distance breaks
  * that precondition or the fused loops drift from the definition.
  * (scalacheck's scalatest bridge isn't in the offline cache, so
  * properties are seeded-loop style, like KernelsSpec.) */
class RankEquivalenceSpec extends SparkSpec {

  private def naiveRanks(test: Seq[Triple], model: TransEModel): Seq[(Long, Long)] = {
    val ent = model.entity
    val lab = model.label
    val l1 = model.params.distance == L1
    def f(z: Float): Double = if (l1) math.abs(z).toDouble else z.toDouble * z
    // head candidate score d(e + l, t) = sum f(e_i + u_i), u = l - t
    def scoreAdd(e: Array[Float], u: Array[Float]): Double =
      e.indices.foldLeft(0.0)((s, i) => s + f(e(i) + u(i)))
    // tail candidate score d(h + l, e) = sum f(v_i - e_i), v = h + l
    def scoreSub(v: Array[Float], e: Array[Float]): Double =
      e.indices.foldLeft(0.0)((s, i) => s + f(v(i) - e(i)))
    test.map { tr =>
      val l = lab(tr.l); val h = ent(tr.h); val t = ent(tr.t)
      val k = l.length
      val u = Array.tabulate(k)(i => l(i) - t(i))
      val v = Array.tabulate(k)(i => h(i) + l(i))
      val dh = scoreAdd(h, u)
      val dt = scoreSub(v, t)
      var lessH = 0L; var lessT = 0L
      ent.foreach { e =>
        if (scoreAdd(e, u) < dh) lessH += 1
        if (scoreSub(v, e) < dt) lessT += 1
      }
      (lessH + 1, lessT + 1)
    }
  }

  private def randomModel(rng: SplittableRandom, n: Int, nLab: Int, k: Int,
      dist: Distance): TransEModel = {
    def mat(rows: Int) = Array.fill(rows)(
      Array.fill(k)((rng.nextDouble() * 2 - 1).toFloat))
    TransEModel(mat(n), mat(nLab), TransEParams(dim = k, distance = dist))
  }

  test("fused early-exit ranks == naive full-sum ranks (L1 and L2, randomized)") {
    import spark.implicits._
    val rng = new SplittableRandom(7)
    for (dist <- Seq[Distance](L1, L2Squared); trial <- 1 to 3) {
      val n = 40 + rng.nextInt(60)
      val k = 4 + rng.nextInt(12)
      val model = randomModel(rng, n, 3, k, dist)
      val test = Seq.fill(25)(
        Triple(rng.nextInt(n), rng.nextInt(3), rng.nextInt(n)))
      val want = naiveRanks(test, model)
      val got = LinkPrediction.rankTriples(test.toDS(), model)
        .collect().map(r => (r.rank_head, r.rank_tail)).toSeq
      // rankTriples repartitions, so row order is not the input order —
      // compare as sorted multisets
      assert(got.sorted == want.sorted,
        s"dist=$dist trial=$trial n=$n k=$k: fused ranks diverged")
    }
  }
}
