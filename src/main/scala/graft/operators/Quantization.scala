package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Embedding compression for at-scale similarity search: scalar int8
  * quantization (4x memory cut, the standard serving format) and product
  * quantization (PQ — FAISS's billion-scale code layout: the vector is
  * split into `m` subspaces, each quantized against its own small
  * codebook, so a 64-float vector becomes `m` one-byte codes, a 32x cut).
  * Together with `IvfAnn` this is the IVF-PQ layout that makes 100 TB of
  * embeddings searchable: cells prune the scan, codes shrink residency.
  *
  * Beyond-reference surface (the reference stores full float32
  * embeddings only, `utils.py:44-49`).
  *
  * Determinism contracts (what makes both full hash oracles):
  *  - int8: `q = floor(x * 127 / maxabs + 0.5)` runs on exact float32 ->
  *    float64 promotions; `maxabs` is an order-independent MAX; every
  *    engine computes the identical IEEE double expression, and the
  *    output is integers only.
  *  - PQ: each subspace codebook is the SAME deterministic integer Lloyd
  *    as `IvfAnn` (md5-ordered seeds, `floor(x*2^20)` quantized exact
  *    integer arithmetic), run over the subspace slice; assignment
  *    tie-breaks on code index. No float accumulation order anywhere.
  *
  * Scale shape:
  *  - int8 is a narrow per-row expression — zero shuffle;
  *  - PQ trains m tiny codebooks (map-side-combinable integer sums — the
  *    corpus is aggregated, never shuffled), then ONE narrow encode pass
  *    with all m codebooks broadcast (m * nCells * subDim longs — KBs);
  *    at 100 TB you would train on a sample instead of the full corpus
  *    (codebooks need ~100k vectors), which drops the training scans to
  *    a constant — the encode pass is the only full read either way.
  */
object Quantization {

  // ------------------------------------------------ int8 scalar quantize
  /** Symmetric per-vector int8 quantization: `scale = maxabs(v)`,
    * `q_i = round_half_up(v_i * 127 / scale)` in [-127, 127]. Output is
    * exploded to scalar rows (vec_id, i, q, scale_q) — integer-only;
    * `scale_q = floor(scale * 2^20)` carries the dequant factor through
    * the integer-only oracle surface (production would keep the double
    * alongside; the parquet payload is the same 8 bytes per row). */
  def int8(embeddings: DataFrame): DataFrame = {
    val maxabs = aggregate(
      transform(col("embedding"), x => abs(x.cast("double"))),
      lit(0.0), (a, x) => greatest(a, x))
    embeddings
      .select(col("vec_id"), col("embedding"), maxabs.as("maxabs"))
      .select(col("vec_id"), col("maxabs"),
        posexplode(col("embedding")).as(Seq("i", "x")))
      .select(
        col("vec_id"),
        col("i").cast("long").as("i"),
        when(col("maxabs") === 0.0, 0L)
          .otherwise(floor(col("x").cast("double") * lit(127.0) / col("maxabs")
            + lit(0.5)).cast("long")).as("q"),
        floor(col("maxabs") * lit(1048576.0)).cast("long").as("scale_q"))
  }

  /** DuckDB replay of [[int8]]: the identical IEEE double expression over
    * the same float32 values. */
  def int8Sql(dim: Int = 64): String =
    s"""WITH v AS (SELECT vec_id, embedding FROM embeddings),
       |mx AS (SELECT vec_id, MAX(ABS(CAST(u.e AS DOUBLE))) AS maxabs
       |       FROM v, UNNEST(embedding) AS u(e) GROUP BY vec_id)
       |SELECT v.vec_id, CAST(ri.i AS BIGINT) AS i,
       |  CAST(CASE WHEN mx.maxabs = 0 THEN 0
       |    ELSE floor(CAST(embedding[CAST(ri.i + 1 AS INTEGER)] AS DOUBLE)
       |      * 127.0 / mx.maxabs + 0.5) END AS BIGINT) AS q,
       |  CAST(floor(mx.maxabs * 1048576.0) AS BIGINT) AS scale_q
       |FROM v JOIN mx USING (vec_id), range($dim) AS ri(i)
       |ORDER BY vec_id, i""".stripMargin

  // -------------------------------------------- product quantization
  /** PQ codes: split each embedding into `m` contiguous subspaces of
    * `dim/m` floats; train one `nCells`-entry codebook per subspace with
    * [[IvfAnn.trainCentroids]] (deterministic integer Lloyd) over that
    * slice of the corpus; encode = nearest codebook entry per subspace
    * (exact integer L2, ties to the lower code). Output: one row per
    * (vec_id, subspace) with the assigned `code` — integer-only.
    *
    * The encode is ONE narrow mapPartitions pass with all m codebooks
    * broadcast; the corpus is never shuffled. */
  /** m per-subspace codebooks (m small training aggregations over the
    * sliced corpus, integer sums combine map-side); at scale these run
    * over a sample — see scaladoc. Shape: m x nCells x (dim/m). */
  private def trainCodebooks(embeddings: DataFrame, dim: Int, m: Int,
      nCells: Int, iters: Int): Array[Array[Array[Long]]] = {
    val sub = dim / m
    (0 until m).toArray.map { s =>
      val sliced = embeddings.select(col("vec_id"),
        slice(col("embedding"), s * sub + 1, sub).as("embedding"))
      IvfAnn.trainCentroids(sliced, nCells, iters)
    }
  }

  private def embeddingDim(embeddings: DataFrame): Int =
    embeddings.select(size(col("embedding"))).first().getInt(0)

  def pqCodes(embeddings: DataFrame, m: Int = 8, nCells: Int = 16,
      iters: Int = 2): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val dim = embeddingDim(embeddings)
    require(dim % m == 0, s"dim $dim not divisible by m $m")
    val sub = dim / m
    val codebooks = trainCodebooks(embeddings, dim, m, nCells, iters)
    val bc = spark.sparkContext.broadcast(codebooks)

    embeddings.select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])]
      .mapPartitions { it =>
        val cbs = bc.value
        val mm = cbs.length
        it.flatMap { case (id, v) =>
          val q = IvfAnn.quantize(v)
          (0 until mm).iterator.map { s =>
            val slice = java.util.Arrays.copyOfRange(q, s * sub, (s + 1) * sub)
            (id, s.toLong, IvfAnn.nearestCell(cbs(s), slice).toLong)
          }
        }
      }
      .toDF("vec_id", "subspace", "code")
  }

  // ------------------------------------------------- ADC top-k search
  private final case class AdcHit(query_id: Long, neighbor_id: Long, dist: Long)

  /** PQ search by ADC (asymmetric distance computation) — the actual
    * billion-scale query path: queries stay full-precision, the corpus is
    * its 8-byte PQ codes. Per query, a lookup table of
    * `m x nCells` exact integer distances (query slice -> codebook entry)
    * is built once and broadcast; scoring a corpus vector is then m table
    * lookups + adds — no float math, no embedding reads. Per-partition
    * bounded heaps keep the k best per query (the `bruteForceTopK`
    * discipline: the corpus is never shuffled; only
    * numPartitions * |queries| * k candidate rows move).
    *
    * Output: (query_id, rank, neighbor_id, adc_qsq) — integer-only, fully
    * hash-oracled by [[pqTopKSql]] (ties: lower distance, then lower
    * neighbor id). */
  /** Exact re-rank of an ADC shortlist (FAISS's "refine" stage): fetch
    * the shortlist rows' embeddings (a selective id join — at scale the
    * shortlist is a vanishing fraction of the corpus), score exact
    * integer L2 against the broadcast query vectors, keep the k best.
    * Output: (query_id, rank, neighbor_id, l2_qsq). */
  private def exactRerank(embeddings: DataFrame, shortlist: DataFrame,
      queries: Array[(Long, Array[Long])], k: Int): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val qBc = spark.sparkContext.broadcast(queries.toMap)
    val scored = shortlist
      .join(embeddings.select(col("vec_id").as("neighbor_id"), col("embedding")),
        Seq("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"), col("embedding"))
      .as[(Long, Long, Array[Float])]
      .mapPartitions { it =>
        val qs = qBc.value
        it.map { case (qid, nid, v) =>
          val q = qs(qid)
          val n = IvfAnn.quantize(v)
          var d = 0L; var i = 0
          while (i < n.length) { val z = q(i) - n(i); d += z * z; i += 1 }
          (qid, nid, d)
        }
      }
      .toDF("query_id", "neighbor_id", "l2_qsq")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("query_id")
      .orderBy(col("l2_qsq").asc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("long").as("rank"),
        col("neighbor_id"), col("l2_qsq"))
  }

  /** The SQL tail shared by the refined spellings: exact integer L2 over
    * a full-dim quantized CTE for every (query, shortlisted neighbor)
    * pair, re-ranked to k. Expects a `ranked` CTE with
    * (query_id, neighbor_id, rank). */
  private def refineSqlTail(dim: Int, refine: Int, k: Int,
      src: String = "embeddings"): String =
    s"""qvf AS (SELECT vec_id, CAST(ri.i AS INTEGER) AS i,
       |    CAST(floor(CAST(embedding[CAST(ri.i + 1 AS INTEGER)] AS DOUBLE) * 1048576.0) AS BIGINT) AS q
       |  FROM $src, range($dim) AS ri(i)),
       |exact AS (
       |  SELECT r.query_id, r.neighbor_id,
       |    CAST(SUM((a.q - b.q) * (a.q - b.q)) AS BIGINT) AS l2_qsq
       |  FROM ranked r
       |  JOIN qvf a ON a.vec_id = r.query_id
       |  JOIN qvf b ON b.vec_id = r.neighbor_id AND b.i = a.i
       |  WHERE r.rank <= $refine
       |  GROUP BY r.query_id, r.neighbor_id),
       |rr AS (
       |  SELECT query_id, neighbor_id, l2_qsq, ROW_NUMBER() OVER (
       |    PARTITION BY query_id ORDER BY l2_qsq, neighbor_id) AS rank
       |  FROM exact)
       |SELECT query_id, rank, neighbor_id, l2_qsq FROM rr
       |WHERE rank <= $k ORDER BY query_id, rank""".stripMargin

  /** With `refine` > 0, ADC only SELECTS a shortlist of that size; exact
    * integer L2 re-ranks it to k (output column becomes l2_qsq) — the
    * FAISS refine pipeline, which buys back most of the recall lost to
    * 8-byte codes at the cost of `refine` exact scores per query. */
  def pqTopK(embeddings: DataFrame, queryIds: Seq[Long], m: Int = 8,
      nCells: Int = 16, iters: Int = 2, k: Int = 10,
      refine: Int = 0): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val dim = embeddingDim(embeddings)
    require(dim % m == 0, s"dim $dim not divisible by m $m")
    val sub = dim / m
    val codebooks = trainCodebooks(embeddings, dim, m, nCells, iters)

    // per-query ADC lookup tables: luts(q)(s)(c) = exact integer L2
    // between the query's subspace slice and codebook entry c
    val queries: Array[(Long, Array[Long])] = embeddings
      .filter(col("vec_id").isin(queryIds: _*))
      .select(col("vec_id"), col("embedding")).as[(Long, Array[Float])]
      .collect().map { case (id, v) => (id, IvfAnn.quantize(v)) }
    val luts: Array[(Long, Array[Array[Long]])] = queries.map { case (qid, q) =>
      qid -> codebooks.zipWithIndex.map { case (cb, s) =>
        cb.map { cent =>
          var d = 0L; var i = 0
          while (i < sub) { val z = q(s * sub + i) - cent(i); d += z * z; i += 1 }
          d
        }
      }
    }
    val cbBc = spark.sparkContext.broadcast(codebooks)
    val lutBc = spark.sparkContext.broadcast(luts)

    // encode + score in ONE narrow pass (codes never materialize; at
    // scale they would be a stored column and this pass reads them)
    val kEff = if (refine > 0) refine else k
    val partial = embeddings.select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])]
      .mapPartitions { it =>
        val cbs = cbBc.value
        val ls = lutBc.value
        // heap root = weakest hit (largest dist, then largest id), so
        // eviction keeps exactly SQL's (dist ASC, id ASC) top-k
        val ord: Ordering[AdcHit] =
          Ordering.by((h: AdcHit) => (-h.dist, -h.neighbor_id))
        val heaps = ls.map { case (qid, _) =>
          qid -> new java.util.PriorityQueue[AdcHit](kEff + 1, ord)
        }
        it.foreach { case (id, v) =>
          val q = IvfAnn.quantize(v)
          val codes = new Array[Int](cbs.length)
          var s = 0
          while (s < cbs.length) {
            codes(s) = IvfAnn.nearestCell(cbs(s),
              java.util.Arrays.copyOfRange(q, s * sub, (s + 1) * sub))
            s += 1
          }
          var qi = 0
          while (qi < ls.length) {
            val (qid, lut) = ls(qi)
            if (qid != id) {
              var d = 0L; var t = 0
              while (t < codes.length) { d += lut(t)(codes(t)); t += 1 }
              val heap = heaps(qi)._2
              if (heap.size < kEff) heap.offer(AdcHit(qid, id, d))
              else {
                val w = heap.peek()
                if (d < w.dist || (d == w.dist && id < w.neighbor_id)) {
                  heap.poll(); heap.offer(AdcHit(qid, id, d))
                }
              }
            }
            qi += 1
          }
        }
        heaps.iterator.flatMap { case (_, heap) =>
          scala.jdk.CollectionConverters.IteratorHasAsScala(heap.iterator())
            .asScala.map(h => (h.query_id, h.neighbor_id, h.dist))
        }
      }

    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("query_id")
      .orderBy(col("dist").asc, col("neighbor_id").asc)
    val adc = partial.toDF("query_id", "neighbor_id", "dist")
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= kEff)
    if (refine == 0)
      adc.select(col("query_id"), col("rank").cast("long").as("rank"),
          col("neighbor_id"), col("dist").as("adc_qsq"))
    else
      exactRerank(embeddings, adc.select("query_id", "neighbor_id"), queries, k)
  }

  /** DuckDB replay of [[pqTopK]]: the per-subspace `dF` CTE restricted to
    * the query set IS the ADC lookup table (distance of each query slice
    * to every codebook entry), so scoring is a join of codes to LUT rows
    * summed per (query, neighbor). */
  def pqTopKSql(queryIds: Seq[Long], dim: Int = 64, m: Int = 8,
      nCells: Int = 16, iters: Int = 2, k: Int = 10,
      refine: Int = 0): String = {
    require(dim % m == 0)
    val sub = dim / m
    val ids = queryIds.mkString(", ")
    val ctes = (0 until m)
      .map(s => IvfAnn.assignCtesSql(sub, nCells, iters,
        offset = s * sub, prefix = s"p${s}_"))
      .mkString(",\n")
    val codeArms = (0 until m)
      .map(s => s"SELECT vec_id, $s AS subspace, cell AS code FROM p${s}_assigned")
      .mkString("\nUNION ALL\n")
    val lutArms = (0 until m)
      .map(s => s"SELECT vec_id AS query_id, $s AS subspace, c AS code, dist FROM p${s}_dF WHERE vec_id IN ($ids)")
      .mkString("\nUNION ALL\n")
    val tail =
      if (refine == 0)
        s"""
           |SELECT query_id, rank, neighbor_id, adc_qsq FROM ranked
           |WHERE rank <= $k ORDER BY query_id, rank""".stripMargin
      else s",\n${refineSqlTail(dim, refine, k)}"
    s"""WITH $ctes,
       |codes AS ($codeArms),
       |luts AS ($lutArms),
       |scored AS (
       |  SELECT l.query_id, c.vec_id AS neighbor_id,
       |    CAST(SUM(l.dist) AS BIGINT) AS adc_qsq
       |  FROM codes c JOIN luts l
       |    ON l.subspace = c.subspace AND l.code = c.code
       |  WHERE c.vec_id <> l.query_id
       |  GROUP BY l.query_id, c.vec_id),
       |ranked AS (
       |  SELECT query_id, neighbor_id, adc_qsq, ROW_NUMBER() OVER (
       |    PARTITION BY query_id ORDER BY adc_qsq, neighbor_id) AS rank
       |  FROM scored)$tail""".stripMargin
  }

  // ---------------------------------------------- IVF-PQ combined search
  /** The complete FAISS IVF-PQ layout: the coarse quantizer
    * ([[IvfAnn]] cells) prunes the scan to `nProbe` cells per query, and
    * ADC over PQ codes scores the surviving candidates — cell pruning
    * cuts WHICH vectors are touched, codes cut WHAT is read per vector
    * (8 bytes, not 256). This is the non-residual variant (codes encode
    * the raw vector, not `v - centroid`; residual PQ is the same shape
    * with one extra integer subtract at encode time).
    *
    * Scale shape: the corpus is read once for cell assignment + encode;
    * at query time the probe table (|q| * nProbe rows) BROADCASTS onto
    * the coded corpus — candidates (id + m codes, ~10 bytes) are the
    * only rows that move, ~|corpus| * nProbe / nCells per query.
    *
    * Fully hash-oracled: coarse cells, codebooks, codes, LUTs are all
    * the shared deterministic integer constructions. */
  def ivfPqTopK(embeddings: DataFrame, queryIds: Seq[Long],
      nCells: Int = 16, nProbe: Int = 4, m: Int = 8, nCellsPq: Int = 16,
      iters: Int = 2, k: Int = 10, refine: Int = 0): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val dim = embeddingDim(embeddings)
    require(dim % m == 0, s"dim $dim not divisible by m $m")
    val sub = dim / m
    val coarse = IvfAnn.trainCentroids(embeddings, nCells, iters)
    val codebooks = trainCodebooks(embeddings, dim, m, nCellsPq, iters)

    val queriesDf = embeddings.filter(col("vec_id").isin(queryIds: _*))
    val probes = IvfAnn.probeCells(queriesDf, coarse, nProbe)
      .select(col("vec_id").as("query_id"), col("cell"))
    val qVecs: Array[(Long, Array[Long])] = queriesDf
      .select(col("vec_id"), col("embedding")).as[(Long, Array[Float])]
      .collect().map { case (qid, v) => (qid, IvfAnn.quantize(v)) }
    val luts: Array[(Long, Array[Array[Long]])] = qVecs.map { case (qid, q) =>
      qid -> codebooks.zipWithIndex.map { case (cb, s) =>
        cb.map { cent =>
          var d = 0L; var i = 0
          while (i < sub) { val z = q(s * sub + i) - cent(i); d += z * z; i += 1 }
          d
        }
      }
    }

    // one corpus pass: coarse cell + PQ codes per vector
    val coarseBc = spark.sparkContext.broadcast(coarse)
    val cbBc = spark.sparkContext.broadcast(codebooks)
    val coded = embeddings.select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])]
      .mapPartitions { it =>
        val cs = coarseBc.value
        val cbs = cbBc.value
        it.map { case (id, v) =>
          val q = IvfAnn.quantize(v)
          val codes = Array.tabulate(cbs.length) { s =>
            IvfAnn.nearestCell(cbs(s),
              java.util.Arrays.copyOfRange(q, s * sub, (s + 1) * sub))
          }
          (id, IvfAnn.nearestCell(cs, q), codes)
        }
      }
      .toDF("vec_id", "cell", "codes")

    // probes broadcast onto the coded corpus: only candidate id+code rows
    // ever move, never embeddings
    val lutBc = spark.sparkContext.broadcast(luts.toMap)
    val cands = coded.join(broadcast(probes), Seq("cell"))
      .filter(col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id"), col("codes"))
      .as[(Long, Long, Array[Int])]
      .mapPartitions { it =>
        val ls = lutBc.value
        it.map { case (qid, id, codes) =>
          val lut = ls(qid)
          var d = 0L; var s = 0
          while (s < codes.length) { d += lut(s)(codes(s)); s += 1 }
          (qid, id, d)
        }
      }
      .toDF("query_id", "neighbor_id", "adc_qsq")

    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("query_id")
      .orderBy(col("adc_qsq").asc, col("neighbor_id").asc)
    val kEff = if (refine > 0) refine else k
    val adc = cands.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= kEff)
    if (refine == 0)
      adc.select(col("query_id"), col("rank").cast("long").as("rank"),
          col("neighbor_id"), col("adc_qsq"))
    else
      exactRerank(embeddings, adc.select("query_id", "neighbor_id"), qVecs, k)
  }

  /** DuckDB replay of [[ivfPqTopK]]: the unprefixed coarse chain supplies
    * cells + probes; the prefixed per-subspace chains supply codes +
    * LUTs; each corpus vector lives in exactly one cell, so the
    * (query, neighbor) grouping sums exactly m LUT rows. */
  def ivfPqTopKSql(queryIds: Seq[Long], dim: Int = 64, nCells: Int = 16,
      nProbe: Int = 4, m: Int = 8, nCellsPq: Int = 16, iters: Int = 2,
      k: Int = 10, refine: Int = 0, src: String = "embeddings"): String = {
    require(dim % m == 0)
    val sub = dim / m
    val ids = queryIds.mkString(", ")
    val coarse = IvfAnn.assignCtesSql(dim, nCells, iters, src = src)
    val pqCtes = (0 until m)
      .map(s => IvfAnn.assignCtesSql(sub, nCellsPq, iters,
        offset = s * sub, prefix = s"p${s}_", src = src))
      .mkString(",\n")
    val codeArms = (0 until m)
      .map(s => s"SELECT vec_id, $s AS subspace, cell AS code FROM p${s}_assigned")
      .mkString("\nUNION ALL\n")
    val lutArms = (0 until m)
      .map(s => s"SELECT vec_id AS query_id, $s AS subspace, c AS code, dist FROM p${s}_dF WHERE vec_id IN ($ids)")
      .mkString("\nUNION ALL\n")
    s"""WITH $coarse,
       |$pqCtes,
       |probes AS (SELECT vec_id AS query_id, c AS cell FROM (
       |    SELECT vec_id, c, ROW_NUMBER() OVER (
       |      PARTITION BY vec_id ORDER BY dist, c) AS rn FROM dF
       |    WHERE vec_id IN ($ids))
       |  WHERE rn <= $nProbe),
       |codes AS ($codeArms),
       |luts AS ($lutArms),
       |scored AS (
       |  SELECT p.query_id, a.vec_id AS neighbor_id,
       |    CAST(SUM(l.dist) AS BIGINT) AS adc_qsq
       |  FROM assigned a
       |  JOIN probes p ON p.cell = a.cell AND a.vec_id <> p.query_id
       |  JOIN codes c ON c.vec_id = a.vec_id
       |  JOIN luts l ON l.query_id = p.query_id
       |    AND l.subspace = c.subspace AND l.code = c.code
       |  GROUP BY p.query_id, a.vec_id),
       |ranked AS (
       |  SELECT query_id, neighbor_id, adc_qsq, ROW_NUMBER() OVER (
       |    PARTITION BY query_id ORDER BY adc_qsq, neighbor_id) AS rank
       |  FROM scored)${
        if (refine == 0)
          s"""
             |SELECT query_id, rank, neighbor_id, adc_qsq FROM ranked
             |WHERE rank <= $k ORDER BY query_id, rank""".stripMargin
        else s",\n${refineSqlTail(dim, refine, k, src)}"}""".stripMargin
  }

  /** DuckDB replay of [[pqCodes]]: m prefixed copies of the IVF
    * assignment CTE chain, each over its subspace slice, unioned. */
  def pqCodesSql(dim: Int = 64, m: Int = 8, nCells: Int = 16,
      iters: Int = 2): String = {
    require(dim % m == 0)
    val sub = dim / m
    val ctes = (0 until m)
      .map(s => IvfAnn.assignCtesSql(sub, nCells, iters,
        offset = s * sub, prefix = s"p${s}_"))
      .mkString(",\n")
    val arms = (0 until m)
      .map(s => s"SELECT vec_id, CAST($s AS BIGINT) AS subspace, cell AS code FROM p${s}_assigned")
      .mkString("\nUNION ALL\n")
    s"""WITH $ctes
       |SELECT vec_id, subspace, code FROM ($arms)
       |ORDER BY vec_id, subspace""".stripMargin
  }
}
