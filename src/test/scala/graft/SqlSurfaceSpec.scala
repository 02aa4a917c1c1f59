package graft

import graft.functions.VectorFunctions

/** The SQL surface: registered native functions + temp views make the
  * engine usable from pure SQL, not just the Scala API. */
class SqlSurfaceSpec extends SparkSpec {

  test("vector functions are callable from spark.sql") {
    VectorFunctions.ensureRegistered(spark)
    Tables.embeddings(spark, sf).createOrReplaceTempView("embeddings_v")
    val rows = spark.sql(
      """SELECT a.vec_id AS va, b.vec_id AS vb,
        |  vector_cosine(a.embedding, b.embedding) AS cos,
        |  vector_dot(a.embedding, b.embedding) AS dot,
        |  vector_l1(a.embedding, b.embedding) AS l1,
        |  vector_l2sq(a.embedding, b.embedding) AS l2
        |FROM embeddings_v a JOIN embeddings_v b
        |  ON a.vec_id = 0 AND b.vec_id IN (0, 1)
        |ORDER BY vb""".stripMargin).collect()
    assert(rows.length == 2)
    val self = rows.head
    assert(math.abs(self.getAs[Double]("cos") - 1.0) < 1e-9)
    assert(self.getAs[Double]("l1") == 0.0 && self.getAs[Double]("l2") == 0.0)
    val other = rows(1)
    assert(other.getAs[Double]("cos") < 1.0 && other.getAs[Double]("l2") > 0.0)
  }

  test("vector function rejects wrong argument types with a clear error") {
    VectorFunctions.ensureRegistered(spark)
    Tables.documents(spark, sf).createOrReplaceTempView("documents_v")
    val e = intercept[Exception] {
      spark.sql("SELECT vector_cosine(text, text) FROM documents_v").collect()
    }
    assert(e.getMessage.contains("ARRAY<FLOAT>"),
      s"error should name the expected type: ${e.getMessage}")
  }

  test("a full pipeline query is expressible in one SQL statement") {
    VectorFunctions.ensureRegistered(spark)
    Tables.embeddings(spark, sf).createOrReplaceTempView("embeddings_v")
    // near-dup pairs, pure SQL over the registered expression
    val n = spark.sql(
      """SELECT a.vec_id, b.vec_id
        |FROM embeddings_v a JOIN embeddings_v b ON a.vec_id < b.vec_id
        |WHERE vector_cosine(a.embedding, b.embedding) >= 0.45""".stripMargin)
      .count()
    val viaApi = graft.operators.SimilaritySearch
      .cosineNearDupExact(Tables.embeddings(spark, sf), 0.45).count()
    assert(n == viaApi)
  }
}
