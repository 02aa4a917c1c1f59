package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions
import graft.transe.Kernels

/** Nearest-neighbor search and embedding-cosine near-duplicate detection
  * over an `ARRAY<FLOAT>` embedding column.
  *
  * Paths, by scale regime:
  *  - `bruteForceTopK` — exact baseline. Broadcast the (small) query set;
  *    one narrow pass over the corpus keeps a bounded heap per query per
  *    partition; the final merge shuffles only numPartitions * |q| * k
  *    candidate rows, independent of corpus size. This is the shape that
  *    survives a 100 TB corpus (the corpus is never shuffled, never
  *    cross-joined).
  *  - `cosineNearDupExact` — exact all-pairs at threshold tau; O(n^2)
  *    scoring via a range-free join, used as the verifiable baseline and
  *    the DuckDB oracle surface (integer-only output).
  *  - `randomHyperplaneAnn` — the at-scale ANN: sign-pattern LSH (random
  *    hyperplanes) assigns each vector to a bucket; candidates come from
  *    a bucket equi-join (plus optional 1-bit multiprobe); recall < 1 by
  *    design, so its oracle is rows-only.
  */
object SimilaritySearch {

  final case class Scored(query_id: Long, neighbor_id: Long, sim: Double)

  /** Exact top-k cosine neighbors for each of `queryIds`. Output:
    * (query_id, rank, neighbor_id) — integer-only for oracle stability;
    * ties broken by neighbor_id (measured top-k gaps on testdata are
    * ~2e-5, far above cross-engine float noise). */
  def bruteForceTopK(embeddings: DataFrame, queryIds: Seq[Long], k: Int = 10): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val qset = queryIds.toSet
    val queries: Array[(Long, Array[Float])] = embeddings
      .filter(col("vec_id").isin(queryIds: _*))
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])]
      .collect()
    val qBc = spark.sparkContext.broadcast(queries)

    val vecs = embeddings.select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])]

    val heapOrd: Ordering[Scored] =
      Ordering.by((s: Scored) => (s.sim, -s.neighbor_id)) // min-heap root = weakest
    val partial: Dataset[Scored] = vecs.mapPartitions { it =>
      val qs = qBc.value
      val heaps = qs.map { case (qid, _) =>
        qid -> new java.util.PriorityQueue[Scored](k + 1, heapOrd)
      }
      it.foreach { case (vid, vec) =>
        if (!qset.contains(vid)) {
          var qi = 0
          while (qi < qs.length) {
            val (qid, qvec) = qs(qi)
            val sim = Kernels.cosine(qvec, vec)
            val heap = heaps(qi)._2
            if (heap.size < k) heap.add(Scored(qid, vid, sim))
            else if (heapOrd.compare(Scored(qid, vid, sim), heap.peek()) > 0) {
              heap.poll(); heap.add(Scored(qid, vid, sim))
            }
            qi += 1
          }
        }
      }
      heaps.iterator.flatMap { case (_, h) =>
        val buf = scala.collection.mutable.ArrayBuffer.empty[Scored]
        val jt = h.iterator()
        while (jt.hasNext) buf += jt.next()
        buf
      }
    }

    // Final per-query merge of the small partial set.
    val w = Window.partitionBy("query_id")
      .orderBy(col("sim").desc, col("neighbor_id").asc)
    partial.toDF()
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("long").as("rank"), col("neighbor_id"))
      .orderBy("query_id", "rank")
  }

  /** DuckDB oracle for bruteForceTopK over the embeddings table. */
  def bruteForceTopKSql(queryIds: Seq[Long], k: Int = 10): String = {
    val ids = queryIds.mkString("(", ", ", ")")
    s"""SELECT query_id, rank, neighbor_id FROM (
       |  SELECT q.vec_id AS query_id, v.vec_id AS neighbor_id,
       |    ROW_NUMBER() OVER (
       |      PARTITION BY q.vec_id
       |      ORDER BY list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
       |                                      CAST(v.embedding AS DOUBLE[])) DESC,
       |               v.vec_id ASC) AS rank
       |  FROM embeddings q
       |  JOIN embeddings v ON v.vec_id NOT IN $ids
       |  WHERE q.vec_id IN $ids)
       |WHERE rank <= $k ORDER BY query_id, rank""".stripMargin
  }

  /** Exact embedding-cosine near-duplicate pairs at threshold `tau`.
    * All-pairs baseline (the LSH path below is the at-scale variant);
    * integer-only output keeps the oracle engine-stable. Uses the native
    * codegen'd VectorCosine expression — the scoring stays inside
    * whole-stage codegen across the join. */
  def cosineNearDupExact(embeddings: DataFrame, tau: Double = 0.45): DataFrame = {
    val spark = embeddings.sparkSession
    val a = embeddings.select(col("vec_id").as("vec_a"), col("embedding").as("emb_a"))
    val b = embeddings.select(col("vec_id").as("vec_b"), col("embedding").as("emb_b"))
    a.join(b, col("vec_a") < col("vec_b"))
      .filter(VectorFunctions.cosine(spark, col("emb_a"), col("emb_b")) >= tau)
      .select("vec_a", "vec_b")
      .orderBy("vec_a", "vec_b")
  }

  def cosineNearDupExactSql(tau: Double = 0.45): String =
    s"""SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
       |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
       |WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
       |                             CAST(b.embedding AS DOUBLE[])) >= $tau
       |ORDER BY vec_a, vec_b""".stripMargin

  /** Random-hyperplane LSH ANN: bucket vectors by the sign pattern of
    * `nPlanes` seeded random projections; candidates = bucket-mates
    * (single-probe). Returns each vector's top-k bucket-local neighbors.
    * Sub-linear candidate generation — the at-scale self-join path; rows-
    * only oracle (recall < 1 by construction). */
  def randomHyperplaneAnn(embeddings: DataFrame, nPlanes: Int = 8,
      k: Int = 5, seed: Long = 42L): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._

    val dim = embeddings.select(size(col("embedding"))).first().getInt(0)
    val r = new java.util.SplittableRandom(seed)
    // Gaussian-ish hyperplanes via sum of uniforms (deterministic, seeded)
    val planes: Array[Array[Float]] = Array.fill(nPlanes)(
      Array.fill(dim)(((r.nextDouble() + r.nextDouble() + r.nextDouble()) * 2 - 3).toFloat))
    val planesBc = spark.sparkContext.broadcast(planes)

    val bucketed = embeddings.select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])]
      .map { case (id, vec) =>
        val ps = planesBc.value
        var bucket = 0
        var i = 0
        while (i < ps.length) {
          if (Kernels.dot(ps(i), vec) >= 0) bucket |= (1 << i)
          i += 1
        }
        (id, vec, bucket)
      }
      .toDF("vec_id", "embedding", "bucket")

    val a = bucketed.select(col("vec_id").as("query_id"),
      col("embedding").as("emb_a"), col("bucket"))
    val b = bucketed.select(col("vec_id").as("neighbor_id"),
      col("embedding").as("emb_b"), col("bucket"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("sim").desc, col("neighbor_id").asc)
    a.join(b, Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("sim", VectorFunctions.cosine(spark, col("emb_a"), col("emb_b")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("long").as("rank"),
        col("neighbor_id"), round(col("sim"), 6).as("sim"))
      .orderBy("query_id", "rank")
  }
}
