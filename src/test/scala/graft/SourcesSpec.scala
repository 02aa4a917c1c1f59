package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.JsonLines

class SourcesSpec extends SparkSpec {

  test("jsonl round-trip preserves every row and every text byte") {
    val original = Tables.documents(spark, sf)
      .select("doc_id", "text", "lang", "source", "n_chars")
    val dir = JsonLines.stagedDir(spark, sf)
    val back = spark.read.schema(JsonLines.documentsSchema)
      .option("mode", "FAILFAST").json(dir)
      .select("doc_id", "text", "lang", "source", "n_chars")
    assert(back.count() == original.count())
    // exact content equality both directions (newlines/quotes/unicode in
    // text must survive JSON escaping)
    assert(back.exceptAll(original).isEmpty && original.exceptAll(back).isEmpty)
  }

  test("jsonl source FAILFASTs on corrupt input instead of silent nulls") {
    val dir = Files.createTempDirectory("graft_jsonl_bad")
    Files.write(dir.resolve("part-0.json"),
      "{\"doc_id\": 1, \"text\": \"ok\", \"lang\": \"en\", \"source\": \"s\", \"n_chars\": 2}\nnot json at all\n"
        .getBytes("UTF-8"))
    val df = spark.read.schema(JsonLines.documentsSchema)
      .option("mode", "FAILFAST").json(dir.toString)
    intercept[Exception] { df.collect() }
  }
}
