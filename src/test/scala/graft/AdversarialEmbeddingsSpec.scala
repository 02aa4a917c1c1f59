package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{EmbeddingQuality, SimilaritySearch}

/** Adversarial EMBEDDINGS fixture — the third of the fixture trilogy
  * (events r7, documents r8): the garbage classes a 100 TB vector feed
  * actually contains, each of which poisons a different vector operator.
  * The contract under test is validate-then-assume
  * (EmbeddingQuality scaladoc): `validate` classifies every class
  * correctly, `valid` routes them out, and the ANN family runs
  * unpoisoned on the validated corpus while being a strict no-op
  * passthrough on clean data.
  */
class AdversarialEmbeddingsSpec extends SparkSpec {
  import spark.implicits._

  private val Dim = 64

  private def vec(seed: Int): Array[Float] =
    Array.tabulate(Dim)(i => ((seed * 31 + i * 7) % 13 - 6) / 6.0f)

  private lazy val adv: DataFrame = {
    val clean = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding"))
    val nearA = vec(3)
    val nearB = nearA.clone(); nearB(0) = nearB(0) + 1e-4f
    val planted = Seq(
      (900001L, Some(vec(1))), // valid extra
      (900002L, Some(nearA)), // near-dup pair A
      (900003L, Some(nearB)), // near-dup pair B
      (900004L, Some(Array.fill(Dim)(0.0f))), // zero vector
      (900005L, Some(Array.fill(Dim)(Float.NaN))), // NaN
      (900006L, Some({ val v = vec(6); v(7) = Float.PositiveInfinity; v })), // Inf
      (900007L, Some(Array.empty[Float])), // empty
      (900008L, Some(vec(8).take(17))), // ragged
      (900009L, None: Option[Array[Float]])) // null
      .toDF("vec_id", "embedding")
    clean.unionByName(planted)
  }

  test("validate classifies every planted garbage class; clean rows are ok") {
    val v = EmbeddingQuality.validate(adv, Dim)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(v(900004L) == "zero" && v(900005L) == "nonfinite" &&
      v(900006L) == "nonfinite" && v(900007L) == "empty" &&
      v(900008L) == "ragged" && v(900009L) == "null", v.filterKeys(_ >= 900000L).toString)
    assert(v(900001L) == "ok" && v(900002L) == "ok" && v(900003L) == "ok")
    assert(v.count { case (id, s) => id < 900000L && s == "ok" } ==
      Tables.embeddings(spark, sf).count())
  }

  test("valid() is identity on clean data and routes exactly the garbage out") {
    val clean = Tables.embeddings(spark, sf).select("vec_id", "embedding")
    assert(EmbeddingQuality.valid(clean, Dim).count() == clean.count())
    val kept = EmbeddingQuality.valid(adv, Dim)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(!kept.exists(id => id >= 900004L))
    assert(kept.contains(900001L) && kept.contains(900002L) && kept.contains(900003L))
    assert(kept.size == clean.count() + 3)
  }

  test("ANN family runs unpoisoned on the validated corpus") {
    val ok = EmbeddingQuality.valid(adv, Dim).cache()
    // exact near-dup finds the planted 1e-4-perturbed pair and emits no
    // NaN similarity anywhere
    val pairs = SimilaritySearch.cosineNearDupExact(ok, tau = 0.99)
    val pairSet = pairs.select("vec_a", "vec_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairSet.contains((900002L, 900003L)),
      s"planted near-identical pair missing from ${pairSet.size} pairs")
    // brute-force top-k over a garbage-adjacent query id: finite scores,
    // k neighbors, the near-dup ranks first for its twin
    val topk = SimilaritySearch.bruteForceTopK(ok, Seq(900002L), k = 5).collect()
    assert(topk.length == 5)
    val best = topk.minBy(_.getAs[Long]("rank"))
    assert(best.getAs[Long]("neighbor_id") == 900003L,
      s"twin not ranked first: $best")
    ok.unpersist()
  }

  test("embedding drift monitor: injected centroid shift moves the metric by a pinned amount; absent classes report NULL") {
    // VERDICT r12 #7: the monitor is hash-green on the standing fixture,
    // but nothing proved an actual shift MOVES it. Crafted fixture with
    // exactly representable values so the expected drift is pinned to the
    // integer (reference slice: vec_id % 10 != 7; arrival: == 7):
    //  - label 0: arrival == reference            -> l1_drift == 0
    //  - label 1: arrival = reference + 0.25/dim  -> 64 * 0.25 * 2^20
    //  - label 2: reference only (class stopped)  -> l1_drift NULL
    //  - label 3: arrival only (class appeared)   -> l1_drift NULL
    def const(x: Float): Array[Float] = Array.fill(Dim)(x)
    val fix = Seq(
      (1L, const(0.5f), 0),              // label 0 reference
      (7L, const(0.5f), 0),              // label 0 arrival (identical)
      (2L, const(0.25f), 1),             // label 1 reference
      (17L, const(0.5f), 1),             // label 1 arrival (+0.25 per dim)
      (3L, const(0.125f), 2),            // label 2 reference only
      (27L, const(0.125f), 3))           // label 3 arrival only
      .toDF("vec_id", "embedding", "label")
    val got = graft.operators.CorpusStats.embeddingDrift(fix)
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap
    val expectedShift = Dim.toLong * (1L << 20) / 4 // 64 dims * 0.25 * 2^20
    assert(got(0L) == Some(0L), s"identical slices must report zero drift: $got")
    assert(got(1L) == Some(expectedShift),
      s"expected pinned drift $expectedShift for the shifted class: $got")
    assert(got(2L).isEmpty, s"stopped class must surface as NULL, not drop: $got")
    assert(got(3L).isEmpty, s"new class must surface as NULL, not drop: $got")
  }
}
