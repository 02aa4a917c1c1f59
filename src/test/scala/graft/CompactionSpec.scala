package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.Compaction

class CompactionSpec extends SparkSpec {

  test("compact merges small files; content identical; coalesce plans no shuffle") {
    val frag = Files.createTempDirectory("graft_ctest_frag").toString
    val comp = Files.createTempDirectory("graft_ctest_comp").toString
    val docs = Tables.documents(spark, sf)
    docs.repartition(16).write.mode("overwrite").parquet(frag)

    val (nIn, nOut) = Compaction.compact(spark, frag, comp, targetBytes = 256L << 20)
    assert(nIn == 16, s"expected 16 fragment files, got $nIn")
    assert(nOut == 1, s"tiny table must compact to 1 file, got $nOut")

    // layout-only: the row multiset is unchanged
    val before = docs.orderBy("doc_id").collect().toSeq
    val after = spark.read.parquet(comp).orderBy("doc_id").collect().toSeq
    assert(after == before)

    // the default rewrite is coalesce: no exchange anywhere in the plan
    val plan = spark.read.parquet(frag).coalesce(1)
      .queryExecution.executedPlan.toString
    assert(!plan.toLowerCase.contains("exchange"),
      s"coalesce compaction must not shuffle:\n$plan")
  }

  test("even=true uses repartition when output count exceeds input partitions") {
    val frag = Files.createTempDirectory("graft_ctest_frag2").toString
    val comp = Files.createTempDirectory("graft_ctest_comp2").toString
    Tables.documents(spark, sf).coalesce(1).write.mode("overwrite").parquet(frag)
    // absurdly small target forces n > 1 from a 1-file input — only
    // repartition can split upward, coalesce would stay at 1
    val (_, nOut) = Compaction.compact(spark, frag, comp,
      targetBytes = 1L << 12, even = true)
    assert(nOut > 1, s"expected an upward split, got $nOut files")
    assert(spark.read.parquet(comp).count() ==
      Tables.documents(spark, sf).count())
  }
}
