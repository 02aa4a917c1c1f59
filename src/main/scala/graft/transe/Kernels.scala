package graft.transe

import java.util.SplittableRandom

/** Dense float vector kernels for the SGD hot path.
  *
  * Mirrors the reference's numpy element-wise ops (`Embedding.py:21-27`,
  * `TransE.py:298-369`) as JIT-friendly manual loops — no boxing, no
  * intermediate allocation beyond the returned array. These run inside
  * `mapPartitions` on executors, so they must be allocation-light: at
  * 100 TB scale this loop body executes trillions of times.
  */
object Kernels {

  /** Xavier-style uniform init U(-6/sqrt(k), +6/sqrt(k)) per element
    * (reference `TransE.py:45-57`, `Embedding.py:9`; from the TransE
    * paper). Seeded for reproducibility. */
  def uniformInit(n: Int, k: Int, seed: Long): Array[Array[Float]] = {
    val r = new SplittableRandom(seed)
    val bound = 6.0 / math.sqrt(k.toDouble)
    Array.fill(n)(Array.fill(k)((r.nextDouble() * 2 * bound - bound).toFloat))
  }

  /** In-place L2 row normalization v := v / ||v||_2 (reference
    * `Embedding.py:21-27`). No-op on the zero vector. */
  def normalizeInPlace(v: Array[Float]): Unit = {
    var s = 0.0
    var i = 0
    while (i < v.length) { s += v(i).toDouble * v(i); i += 1 }
    if (s > 0) {
      val inv = (1.0 / math.sqrt(s)).toFloat
      i = 0
      while (i < v.length) { v(i) *= inv; i += 1 }
    }
  }

  def normalizeAll(m: Array[Array[Float]]): Unit = {
    var i = 0
    while (i < m.length) { normalizeInPlace(m(i)); i += 1 }
  }

  def l2Norm(v: Array[Float]): Double = {
    var s = 0.0; var i = 0
    while (i < v.length) { s += v(i).toDouble * v(i); i += 1 }
    math.sqrt(s)
  }

  /** L1 distance sum |h_i + l_i - t_i| (reference `TransE.py:298-303`). */
  def distL1(h: Array[Float], l: Array[Float], t: Array[Float]): Double = {
    var s = 0.0; var i = 0
    while (i < h.length) { s += math.abs(h(i) + l(i) - t(i)).toDouble; i += 1 }
    s
  }

  /** Squared L2 distance sum (h_i + l_i - t_i)^2 — no sqrt, matching the
    * paper's dissimilarity (reference `TransE.py:304-309`). */
  def distL2Sq(h: Array[Float], l: Array[Float], t: Array[Float]): Double = {
    var s = 0.0; var i = 0
    while (i < h.length) { val d = h(i) + l(i) - t(i); s += d.toDouble * d; i += 1 }
    s
  }

  /** Two-arg squared L2 (no translation vector) — used by the ANN/IVF
    * operators; avoids allocating a zero vector per call. */
  def distL2Sq(a: Array[Float], b: Array[Float]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { val d = a(i) - b(i); s += d.toDouble * d; i += 1 }
    s
  }

  def dist(d: Distance, h: Array[Float], l: Array[Float], t: Array[Float]): Double =
    d match {
      case L1        => distL1(h, l, t)
      case L2Squared => distL2Sq(h, l, t)
    }

  /** Descent direction g = -dd/dh evaluated at (h, l, t):
    * L2: 2(t - h - l); L1: -sign(h + l - t) elementwise
    * (reference `gradient`, `TransE.py:352-369`). */
  def gradient(d: Distance, h: Array[Float], l: Array[Float], t: Array[Float]): Array[Float] = {
    val k = h.length
    val g = new Array[Float](k)
    var i = 0
    d match {
      case L2Squared =>
        while (i < k) { g(i) = 2f * (t(i) - h(i) - l(i)); i += 1 }
      case L1 =>
        while (i < k) { g(i) = if (h(i) + l(i) - t(i) >= 0f) -1f else 1f; i += 1 }
    }
    g
  }

  /** y := y + a*x (axpy), the SGD update primitive
    * (reference `gradient_descent`, `TransE.py:313-350`). */
  def axpyInPlace(a: Float, x: Array[Float], y: Array[Float]): Unit = {
    var i = 0
    while (i < y.length) { y(i) += a * x(i); i += 1 }
  }

  /** Hinge (margin ranking) loss max(0, margin + dPos - dNeg)
    * (reference `minimize_L`, `TransE.py:258-285`). */
  def hinge(margin: Float, dPos: Double, dNeg: Double): Double =
    math.max(0.0, margin + dPos - dNeg)

  def dot(a: Array[Float], b: Array[Float]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { s += a(i).toDouble * b(i); i += 1 }
    s
  }

  /** Cosine similarity, shared by the ANN / near-dup operators. */
  def cosine(a: Array[Float], b: Array[Float]): Double = {
    val na = l2Norm(a); val nb = l2Norm(b)
    if (na == 0 || nb == 0) 0.0 else dot(a, b) / (na * nb)
  }
}
