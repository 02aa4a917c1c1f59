package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Random sign projection (Achlioptas/Johnson-Lindenstrauss) — the
  * dimensionality-reduction member of the embedding toolbox: project
  * `dim`-dimensional vectors onto `outDims` ±1 sign combinations,
  * cutting ANN memory and distance cost by dim/outDims while roughly
  * preserving pairwise geometry (the JL guarantee; the ±1 scheme is
  * Achlioptas's database-friendly variant — no Gaussians, just adds).
  *
  * Determinism: the sign matrix derives from md5("rproj:j:i") parity,
  * computed once in the driver and inlined as LITERALS into both the
  * Spark expression tree and the generated DuckDB SQL — identical by
  * construction. Inputs are floor(x*2^20)-quantized to integers first
  * (the repo-standard exact-arithmetic trick shared with LSH/IVF), so
  * every projected coordinate is an exact BIGINT sum in any engine —
  * full hash oracle, no float tolerance anywhere.
  *
  * Scale shape: one narrow codegen'd pass (the whole projection is a
  * literal-sign add tree per output dim — no shuffle, no UDF, no
  * matrix broadcast needed since the matrix is IN the plan); output is
  * outDims longs per vector. Downstream ANN over the projected table
  * costs dim/outDims less per comparison.
  */
object RandomProjection {

  /** ±1 from the low bit of md5("rproj:j:i") — engine-portable by
    * inlining (both the Column tree and the SQL carry the VALUE). */
  private[graft] def sign(j: Int, i: Int): Int = {
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest(s"rproj:$j:$i".getBytes("UTF-8"))
    if ((h(0) & 1) == 0) 1 else -1
  }

  private def quantized: Column =
    transform(col("embedding"), x => floor(x.cast("double") * 1048576.0).cast("long"))

  /** (vec_id, p00..p{outDims-1}) — projected integer coordinates. */
  def project(embeddings: DataFrame, outDims: Int = 16, dim: Int = 64): DataFrame = {
    val cols = (0 until outDims).map { j =>
      (0 until dim).map { i =>
        val e = element_at(col("q"), i + 1)
        if (sign(j, i) > 0) e else -e
      }.reduce(_ + _).as(f"p$j%02d")
    }
    embeddings.withColumn("q", quantized)
      .select(col("vec_id") +: cols: _*)
  }

  def projectSql(outDims: Int = 16, dim: Int = 64): String = {
    val ps = (0 until outDims).map { j =>
      val terms = (0 until dim).map { i =>
        val s = if (sign(j, i) > 0) "+" else "-"
        s"$s q[${i + 1}]"
      }.mkString(" ")
      f"  CAST(($terms) AS BIGINT) AS p$j%02d"
    }.mkString(",\n")
    s"""WITH qv AS (SELECT vec_id,
       |    list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1048576) AS BIGINT)) AS q
       |  FROM embeddings)
       |SELECT vec_id,
       |$ps
       |FROM qv ORDER BY vec_id""".stripMargin
  }
}
