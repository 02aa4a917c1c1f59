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

  test("optimize: one rewrite fixes small files AND z-clusters both dims") {
    import spark.implicits._
    import graft.operators.Layout
    val frag = Files.createTempDirectory("graft_otest_frag").toString
    val opt = Files.createTempDirectory("graft_otest_opt").toString
    // 32x32 grid scattered across 16 randomly-laid-out files
    val grid = (for (a <- 0L until 32L; b <- 0L until 32L) yield (a, b))
      .toDF("a", "b").orderBy(md5(concat_ws(":", col("a"), col("b"))))
    grid.repartition(16).write.mode("overwrite").parquet(frag)
    // target 4 output files
    val totalBytes = {
      val fs = new org.apache.hadoop.fs.Path(frag)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      val it = fs.listFiles(new org.apache.hadoop.fs.Path(frag), true)
      var t = 0L
      while (it.hasNext) { val f = it.next(); if (f.getPath.getName.endsWith(".parquet")) t += f.getLen }
      t
    }
    val (nIn, nOut) = Compaction.optimize(spark, frag, opt,
      targetBytes = totalBytes / 4 + 1, colA = "a", colB = "b")
    assert(nIn == 16 && nOut <= 5 && nOut >= 3, s"got $nIn -> $nOut files")
    // content unchanged
    assert(spark.read.parquet(opt).count() == 1024)
    // EVERY output file covers a tight rectangle in BOTH dims (z-order
    // property): with 4 aligned quadrant files, each spans <= half the
    // domain per dim — the fragmented input spans the whole domain
    val spans = spark.read.parquet(opt)
      .select(input_file_name().as("f"), col("a"), col("b"))
      .groupBy("f")
      .agg((max("a") - min("a")).as("sa"), (max("b") - min("b")).as("sb"))
      .collect()
    assert(spans.forall(r => r.getLong(1) <= 16 && r.getLong(2) <= 16),
      s"z-clustering lost: ${spans.mkString(", ")}")
    assert(Layout.zValueRef(3, 5) >= 0) // anchor: shared bit math in play
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
