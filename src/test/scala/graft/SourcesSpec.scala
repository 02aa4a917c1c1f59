package graft

import java.nio.file.Files

import scala.jdk.CollectionConverters._

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

  test("csv round-trip preserves every row and every text byte") {
    val original = Tables.documents(spark, sf)
      .select("doc_id", "text", "lang", "source", "n_chars")
    val dir = graft.sources.CsvLines.stagedDir(spark, sf)
    val back = spark.read.schema(JsonLines.documentsSchema)
      .option("header", "true").option("mode", "FAILFAST").csv(dir)
      .select("doc_id", "text", "lang", "source", "n_chars")
    assert(back.count() == original.count())
    assert(back.exceptAll(original).isEmpty && original.exceptAll(back).isEmpty)
  }

  test("csv writer quoting survives commas, quotes, unicode, edge spaces") {
    import spark.implicits._
    val tricky = Seq(
      (1L, "comma, separated, values", "en", "s", 24L),
      (2L, "a \"quoted\" phrase", "en", "s", 17L),
      (3L, "unicode é中文 text", "de", "s", 16L),
      // edge whitespace: the writer's ignoreLeading/TrailingWhiteSpace
      // defaults would silently TRIM these — CsvLines pins them off
      (4L, "  leading and trailing  ", "en", "s", 24L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = Files.createTempDirectory("graft_csv_tricky")
    tricky.write.mode("overwrite").option("header", "true")
      .option("ignoreLeadingWhiteSpace", "false")
      .option("ignoreTrailingWhiteSpace", "false")
      .csv(dir.toString)
    val back = spark.read.schema(JsonLines.documentsSchema)
      .option("header", "true").option("mode", "FAILFAST").csv(dir.toString)
    assert(back.exceptAll(tricky).isEmpty && tricky.exceptAll(back).isEmpty)
  }

  test("binaryFile source: bytes round-trip exactly; metadata pass prunes content") {
    import graft.sources.BinaryFiles
    val dir = BinaryFiles.stagedDir(spark, sf)
    val full = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.bin").load(dir)
    val expected = Tables.documents(spark, sf)
      .filter(col("doc_id") % 5 === 0)
    assert(full.count() == expected.count())
    // content bytes decode back to the exact original text
    val back = full.select(
      regexp_extract(col("path"), "doc_(\\d+)\\.bin$", 1).cast("long").as("doc_id"),
      decode(col("content"), "UTF-8").as("text"))
    val orig = expected.select("doc_id", "text")
    assert(back.exceptAll(orig).isEmpty && orig.exceptAll(back).isEmpty)
    // a manifest query that never touches `content` must not carry the
    // BYTES column into the scan: ReadSchema stays metadata-only (this is
    // what makes the pre-decode census pass cheap on a 100 TB image dir)
    val meta = full.select("path", "length")
    val scanPlan = meta.queryExecution.executedPlan.toString
    val readSchema = "ReadSchema: (\\S+)".r.findFirstMatchIn(scanPlan).map(_.group(1))
    assert(readSchema.exists(!_.contains("content")),
      s"content not pruned from scan: $readSchema")
    // glob filter prunes foreign files at listing time
    val stray = java.nio.file.Paths.get(dir, "not_media.txt")
    try {
      Files.write(stray, "x".getBytes)
      assert(spark.read.format("binaryFile").option("pathGlobFilter", "*.bin")
        .load(dir).count() == expected.count())
    } finally Files.deleteIfExists(stray)
  }

  test("schema evolution: merged read null-fills old files, pins the sentinel") {
    import org.apache.spark.sql.functions._
    val split = graft.sources.SchemaEvolution.splitDay
    val out = graft.sources.SchemaEvolution.evolvedRead(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.nonEmpty)
    // pre-evolution days surface the sentinel; evolved days a real count
    out.foreach { case (day, n, users) =>
      if (day < split) assert(users == -1L, s"day $day should be sentinel")
      else assert(users >= 1L && users <= n, s"day $day users $users vs n $n")
    }
    assert(out.exists(_._1 < split) && out.exists(_._1 >= split),
      "fixture must exercise both file generations")
    // v1 files alone genuinely lack the column — the evolution is real,
    // not a view trick
    val dir = graft.sources.SchemaEvolution.stagedDir(spark, sf)
    assert(!spark.read.parquet(s"$dir/v1").columns.contains("n_users"))
    assert(spark.read.parquet(s"$dir/v2").columns.contains("n_users"))
  }

  test("orc round-trip preserves every row and every text byte") {
    val original = Tables.documents(spark, sf)
      .select("doc_id", "text", "lang", "source", "n_chars")
    val back = spark.read.schema(JsonLines.documentsSchema)
      .orc(graft.sources.OrcSource.stagedDir(spark, sf))
      .select("doc_id", "text", "lang", "source", "n_chars")
    assert(back.count() == original.count())
    assert(back.exceptAll(original).isEmpty && original.exceptAll(back).isEmpty)
  }

  test("avro round-trip preserves every row and every text byte") {
    val original = Tables.documents(spark, sf)
      .select("doc_id", "text", "lang", "source", "n_chars")
    val back = spark.read
      .format(classOf[graft.sources.AvroSource].getName)
      .load(graft.sources.AvroSource.stagedDir(spark, sf))
      .select("doc_id", "text", "lang", "source", "n_chars")
    assert(back.count() == original.count())
    assert(back.exceptAll(original).isEmpty && original.exceptAll(back).isEmpty)
  }

  test("avro source: nulls, unicode, binary, and all primitive types survive") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_avro_prims").toString
    val df = Seq(
      (1L, Some("héllo 世界 🚀 \"quoted\"\nnewline"), Some(1.5), Some(2.5f),
        Some(true), Some(7), Some(Array[Byte](0, 1, -128, 127))),
      (2L, None: Option[String], None: Option[Double], None: Option[Float],
        None: Option[Boolean], None: Option[Int], None: Option[Array[Byte]]))
      .toDF("id", "s", "d", "f", "b", "i", "bin")
    graft.sources.AvroSource.write(df, dir)
    val back = spark.read
      .format(classOf[graft.sources.AvroSource].getName).load(dir)
    assert(back.schema.fieldNames.sameElements(df.schema.fieldNames))
    assert(back.count() == 2)
    assert(back.exceptAll(df).isEmpty && df.exceptAll(back).isEmpty)
    // drift contract under additive evolution (the parquet stance):
    // a file missing a NON-NULLABLE read-schema field is name drift and
    // fails the scan loudly — null-filling a required column would be
    // silent corruption
    val otherDir = Files.createTempDirectory("graft_avro_drift").toString
    graft.sources.AvroSource.write(df.withColumnRenamed("id", "renamed"), otherDir)
    val schemaOfFirst = graft.sources.AvroSource.readSchema(dir)
    val mixed = spark.read
      .format(classOf[graft.sources.AvroSource].getName)
      .schema(schemaOfFirst).load(otherDir)
    val e = intercept[Exception](mixed.collect())
    assert(e.getMessage.contains("missing non-nullable field id") ||
      e.getMessage.contains("name drift"), e.getMessage)
    // …while a missing NULLABLE field is additive evolution: it
    // null-fills, exactly like a parquet read with a pinned schema
    val nullableDrift = Files.createTempDirectory("graft_avro_ndrift").toString
    graft.sources.AvroSource.write(df.drop("s"), nullableDrift)
    val filled = spark.read
      .format(classOf[graft.sources.AvroSource].getName)
      .schema(schemaOfFirst).load(nullableDrift)
    assert(filled.count() == 2 && filled.filter(col("s").isNotNull).count() == 0)
  }

  test("avro logical types: timestamp-micros, date, decimal round-trip exactly") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_avro_logical").toString
    val df = Seq(
      (1L, Some(java.sql.Timestamp.valueOf("2024-03-01 12:34:56.123456")),
        Some(java.sql.Date.valueOf("2024-03-01")),
        Some(new java.math.BigDecimal("12345.67"))),
      // negative unscaled decimal: two's-complement bytes path
      (2L, Some(java.sql.Timestamp.valueOf("1969-12-31 23:59:59.999999")),
        Some(java.sql.Date.valueOf("1969-12-31")),
        Some(new java.math.BigDecimal("-0.01"))),
      (3L, None: Option[java.sql.Timestamp], None: Option[java.sql.Date],
        None: Option[java.math.BigDecimal]))
      .toDF("id", "ts", "day", "amt")
      .withColumn("amt", col("amt").cast("decimal(12,2)"))
    graft.sources.AvroSource.write(df, dir)
    // the EMBEDDED schema carries the logical annotations back
    val inferred = graft.sources.AvroSource.readSchema(dir)
    assert(inferred("ts").dataType == org.apache.spark.sql.types.TimestampType)
    assert(inferred("day").dataType == org.apache.spark.sql.types.DateType)
    assert(inferred("amt").dataType ==
      org.apache.spark.sql.types.DecimalType(12, 2))
    val back = spark.read
      .format(classOf[graft.sources.AvroSource].getName).load(dir)
    assert(back.count() == 3)
    assert(back.exceptAll(df).isEmpty && df.exceptAll(back).isEmpty)
    // TYPE drift (same names, long vs timestamp) fails loudly too — the
    // r9 check compared names only and let this reach row access
    // (ADVICE r9 #2)
    val driftDir = Files.createTempDirectory("graft_avro_tdrift").toString
    graft.sources.AvroSource.write(
      df.withColumn("ts", unix_micros(col("ts"))), driftDir)
    val mixed = spark.read
      .format(classOf[graft.sources.AvroSource].getName)
      .schema(graft.sources.AvroSource.readSchema(dir)).load(driftDir)
    val e = intercept[Exception](mixed.collect())
    assert(e.getMessage.contains("schema") || e.getMessage.contains("avro"),
      s"expected a loud per-file schema message, got: ${e.getMessage}")
  }

  test("avro arrays: array<float> round-trips exactly, incl. nullable elements") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_avro_arr").toString
    val df = Seq(
      (1L, Some(Seq(1.5f, -2.25f, 0.0f)), Seq(Some(7L), None, Some(-1L))),
      (2L, Some(Seq.empty[Float]), Seq[Option[Long]]()),
      (3L, None: Option[Seq[Float]], Seq(Some(42L))))
      .toDF("id", "fvec", "lvec")
    graft.sources.AvroSource.write(df, dir)
    val inferred = graft.sources.AvroSource.readSchema(dir)
    assert(inferred("fvec").dataType ==
      org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.FloatType, containsNull = false))
    assert(inferred("lvec").dataType ==
      org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.LongType, containsNull = true))
    val back = spark.read
      .format(classOf[graft.sources.AvroSource].getName).load(dir)
    assert(back.count() == 3)
    assert(back.exceptAll(df).isEmpty && df.exceptAll(back).isEmpty)
  }

  test("avro embeddings twin: quantized array checksum equals the raw-parquet spelling") {
    val viaAvro = graft.sources.AvroSource
      .embeddingsRoundTripAgg(spark, sf).collect()
    val raw = Tables.embeddings(spark, sf)
      .groupBy(col("label").cast("long").as("label"))
      .agg(count(lit(1)).as("n_vecs"),
        sum(size(col("embedding")).cast("long")).as("n_elems"),
        sum(expr("aggregate(embedding, CAST(0 AS BIGINT), " +
          "(acc, x) -> acc + CAST(floor(CAST(x AS DOUBLE) * 1048576.0) AS BIGINT))"))
          .as("q_sum"),
        min(col("vec_id")).as("min_id"),
        max(col("vec_id")).as("max_id"))
      .orderBy("label").collect()
    assert(viaAvro.nonEmpty && viaAvro.sameElements(raw),
      s"avro=${viaAvro.take(2).mkString(";")} raw=${raw.take(2).mkString(";")}")
  }

  test("avro column pruning: projection reaches the scan's read schema") {
    // row-major avro saves no IO from pruning, but the per-field decode
    // CPU tracks the scan's read schema — assert the pushdown actually
    // lands (ReadSchema narrowed) and the narrow read stays correct
    val dir = graft.sources.AvroSource.stagedDir(spark, sf)
    val narrow = spark.read
      .format(classOf[graft.sources.AvroSource].getName).load(dir)
      .select("lang")
    val scan = narrow.queryExecution.executedPlan.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }.head
    assert(scan.scan.readSchema().fieldNames.sameElements(Array("lang")),
      s"pruning did not reach the avro scan: ${scan.scan.readSchema()}")
    val full = spark.read
      .format(classOf[graft.sources.AvroSource].getName).load(dir)
    assert(narrow.groupBy("lang").count().collect().toSet ==
      full.groupBy("lang").count().collect().toSet)
    // count(*) prunes to ZERO columns and still counts every row
    val empty = full.select()
    val emptyScan = empty.queryExecution.executedPlan.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }.head
    assert(emptyScan.scan.readSchema().isEmpty,
      s"zero-column read not pruned: ${emptyScan.scan.readSchema()}")
    assert(full.count() == Tables.documents(spark, sf).count())
  }

  test("avro foreign shapes: ENUM and FIXED files from other producers read correctly") {
    // hand-write a container the way a FOREIGN producer would — enum for
    // a closed string set, fixed(4) for a constant-width blob, fixed(6)
    // with a decimal annotation — none of which our writer emits
    import org.apache.avro.{Schema, SchemaBuilder}
    import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
    import org.apache.avro.file.DataFileWriter
    val dir = Files.createTempDirectory("graft_avro_foreign")
    val schema: Schema = SchemaBuilder.record("ev").namespace("ext").fields()
      .requiredLong("id")
      .name("status").`type`(SchemaBuilder.enumeration("status_t")
        .namespace("ext").symbols("OPEN", "CLOSED")).noDefault()
      .name("tag").`type`(SchemaBuilder.fixed("tag_t").namespace("ext")
        .size(4)).noDefault()
      .name("amt").`type`(org.apache.avro.LogicalTypes.decimal(12, 2)
        .addToSchema(SchemaBuilder.fixed("amt_t").namespace("ext").size(6)))
      .noDefault()
      .endRecord()
    val f = dir.resolve("part-0.avro").toFile
    val w = new DataFileWriter[GenericRecord](
      new GenericDatumWriter[GenericRecord](schema))
    w.create(schema, f)
    def rec(id: Long, st: String, tag: Array[Byte], unscaled: Long) = {
      val r = new GenericData.Record(schema)
      r.put(0, java.lang.Long.valueOf(id))
      r.put(1, new GenericData.EnumSymbol(schema.getField("status").schema(), st))
      r.put(2, new GenericData.Fixed(schema.getField("tag").schema(), tag))
      val dec = java.math.BigDecimal.valueOf(unscaled, 2)
      val bytes = dec.unscaledValue().toByteArray
      val padded = new Array[Byte](6)
      // sign-extend into the fixed width (avro decimal-on-fixed contract)
      val fill: Byte = if (dec.signum() < 0) -1 else 0
      java.util.Arrays.fill(padded, fill)
      System.arraycopy(bytes, 0, padded, 6 - bytes.length, bytes.length)
      r.put(3, new GenericData.Fixed(schema.getField("amt").schema(), padded))
      r
    }
    w.append(rec(1L, "OPEN", Array[Byte](1, 2, 3, 4), 123456L))
    w.append(rec(2L, "CLOSED", Array[Byte](-1, 0, 1, 2), -99L))
    w.close()
    val back = spark.read
      .format(classOf[graft.sources.AvroSource].getName)
      .load(dir.toString)
    assert(back.schema("status").dataType == org.apache.spark.sql.types.StringType)
    assert(back.schema("tag").dataType == org.apache.spark.sql.types.BinaryType)
    assert(back.schema("amt").dataType ==
      org.apache.spark.sql.types.DecimalType(12, 2))
    val rows = back.orderBy("id").collect()
    assert(rows(0).getString(1) == "OPEN" && rows(1).getString(1) == "CLOSED")
    assert(rows(0).getAs[Array[Byte]](2).sameElements(Array[Byte](1, 2, 3, 4)))
    assert(rows(0).getDecimal(3) == new java.math.BigDecimal("1234.56"))
    assert(rows(1).getDecimal(3) == new java.math.BigDecimal("-0.99"))
  }

  test("avro foreign shapes: non-nullable and multi-branch unions read correctly") {
    // the next thing a real producer emits past ENUM/FIXED (VERDICT r10
    // #5): numeric-widening unions collapse to the wider type; a mixed
    // union becomes a memberN struct with exactly one branch set per row
    import org.apache.avro.{Schema, SchemaBuilder}
    import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
    import org.apache.avro.file.DataFileWriter
    import org.apache.spark.sql.types._
    val dir = Files.createTempDirectory("graft_avro_union")
    def u(ts: Schema.Type*) = Schema.createUnion(ts.map(Schema.create): _*)
    val schema: Schema = SchemaBuilder.record("ev").namespace("ext").fields()
      .requiredLong("id")
      .name("n").`type`(u(Schema.Type.INT, Schema.Type.LONG)).noDefault()
      .name("x").`type`(u(Schema.Type.FLOAT, Schema.Type.DOUBLE)).noDefault()
      .name("mix").`type`(
        u(Schema.Type.NULL, Schema.Type.STRING, Schema.Type.LONG)).noDefault()
      .endRecord()
    val f = dir.resolve("part-0.avro").toFile
    val w = new DataFileWriter[GenericRecord](
      new GenericDatumWriter[GenericRecord](schema))
    w.create(schema, f)
    def rec(id: Long, n: AnyRef, x: AnyRef, mix: AnyRef) = {
      val r = new GenericData.Record(schema)
      r.put(0, java.lang.Long.valueOf(id)); r.put(1, n); r.put(2, x)
      r.put(3, mix); r
    }
    w.append(rec(1L, java.lang.Integer.valueOf(7),
      java.lang.Float.valueOf(1.5f), new org.apache.avro.util.Utf8("hi")))
    w.append(rec(2L, java.lang.Long.valueOf(1L << 40),
      java.lang.Double.valueOf(2.25), java.lang.Long.valueOf(99L)))
    w.append(rec(3L, java.lang.Integer.valueOf(-3),
      java.lang.Double.valueOf(-0.5), null))
    w.close()
    val back = spark.read
      .format(classOf[graft.sources.AvroSource].getName)
      .load(dir.toString)
    // schema mapping: widened numerics; mixed union -> nullable memberN
    assert(back.schema("n").dataType == LongType &&
      !back.schema("n").nullable)
    assert(back.schema("x").dataType == DoubleType)
    assert(back.schema("mix").nullable)
    assert(back.schema("mix").dataType ==
      StructType(Seq(StructField("member0", StringType),
        StructField("member1", LongType))))
    val rows = back.orderBy("id").collect()
    assert(rows.map(_.getLong(1)).sameElements(Array(7L, 1L << 40, -3L)))
    assert(rows.map(_.getDouble(2)).sameElements(Array(1.5, 2.25, -0.5)))
    val m0 = rows(0).getStruct(3)
    assert(m0.getString(0) == "hi" && m0.isNullAt(1))
    val m1 = rows(1).getStruct(3)
    assert(m1.isNullAt(0) && m1.getLong(1) == 99L)
    assert(rows(2).isNullAt(3))
  }

  test("avro one-of structs write back as true unions (foreign round trip)") {
    // VERDICT r11 missing #1, write half: a foreign union read as a
    // memberN struct must survive read -> transform -> WRITE as a real
    // multi-branch Avro union (deflate container), not a graft-private
    // record — a downstream non-Spark consumer sees the shape it sent
    import org.apache.avro.Schema
    import org.apache.spark.sql.types._
    import spark.implicits._
    val df = Seq(
      (1L, Some("hi"), None: Option[Long]),
      (2L, None: Option[String], Some(99L)),
      (3L, None: Option[String], None: Option[Long]))
      .toDF("id", "s", "l")
      .selectExpr("id",
        "CASE WHEN s IS NULL AND l IS NULL THEN NULL " +
          "ELSE named_struct('member0', s, 'member1', l) END AS mix")
    val dir = Files.createTempDirectory("graft_avro_oneof").toString
    graft.sources.AvroSource.write(df, dir, "deflate")
    // raw container header: mix is UNION(null, string, long) — flattened,
    // never a nested union or a record named member*
    val part = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".avro")).minBy(_.getName)
    val rdr = new org.apache.avro.file.DataFileReader[AnyRef](part,
      new org.apache.avro.generic.GenericDatumReader[AnyRef]())
    val mixSchema = try rdr.getSchema.getField("mix").schema() finally rdr.close()
    assert(mixSchema.getType == Schema.Type.UNION)
    assert(mixSchema.getTypes.size() == 3)
    import scala.jdk.CollectionConverters._
    assert(mixSchema.getTypes.asScala.map(_.getType).toSeq ==
      Seq(Schema.Type.NULL, Schema.Type.STRING, Schema.Type.LONG))
    // and the source reads it straight back to the same memberN shape
    val back = spark.read
      .format(classOf[graft.sources.AvroSource].getName).load(dir)
    assert(back.schema("mix").dataType ==
      StructType(Seq(StructField("member0", StringType),
        StructField("member1", LongType))))
    val rows = back.orderBy("id").collect()
    assert(rows(0).getStruct(1).getString(0) == "hi" &&
      rows(0).getStruct(1).isNullAt(1))
    assert(rows(1).getStruct(1).isNullAt(0) &&
      rows(1).getStruct(1).getLong(1) == 99L)
    assert(rows(2).isNullAt(1))
    // a one-of row with BOTH branches set is a contract violation — loud,
    // and since r13 (ADVICE r12 #3) it fails FAST on the driver (up-front
    // pruned-column validation pass) instead of aborting a write task
    // after part files already landed
    val badDir = Files.createTempDirectory("graft_avro_oneof_bad")
    val bad = Seq((1L, "x", 2L)).toDF("id", "s", "l")
      .selectExpr("id", "named_struct('member0', s, 'member1', l) AS mix")
    val e = intercept[IllegalArgumentException] {
      graft.sources.AvroSource.write(bad, badDir.toString, "null")
    }
    assert(e.getMessage.contains("one-of"))
    // fail-fast means no partial output was ever written
    assert(!Files.list(badDir).iterator().hasNext,
      "up-front validation must reject BEFORE any part file lands")
  }

  test("avro sink generations: an evolved writer's files merge null-filled") {
    // the sink side of the schema-evolution story: OUR OWN containers
    // written over a producer's lifetime (old schema + a later writer
    // with an extra column, different codecs) must merge exactly like
    // the foreign-fixture generations — additive union, old files
    // null-filling the new field
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_avro_gen").toString
    graft.sources.AvroSource.write(
      Seq((1L, "a"), (2L, "b")).toDF("id", "s"), dir, "snappy")
    val tmp2 = Files.createTempDirectory("graft_avro_gen2").toString
    graft.sources.AvroSource.write(
      Seq((3L, "c", 30L)).toDF("id", "s", "extra"), tmp2, "deflate")
    new java.io.File(tmp2).listFiles()
      .filter(_.getName.endsWith(".avro")).zipWithIndex
      .foreach { case (f, i) =>
        Files.copy(f.toPath,
          java.nio.file.Paths.get(dir, f"gen2-$i%03d.avro"))
      }
    val back = spark.read
      .format(classOf[graft.sources.AvroSource].getName).load(dir)
    assert(back.schema("extra").nullable,
      "field absent from a generation must merge nullable")
    val rows = back.orderBy("id").collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
    assert(rows(0).isNullAt(2) && rows(1).isNullAt(2))
    assert(rows(2).getLong(2) == 30L)
  }

  test("avro codecs: snappy and uncompressed containers read back exactly") {
    import spark.implicits._
    val df = (1L to 500L).map(i => (i, s"doc_$i", i * 1.5)).toDF("id", "s", "v")
    for (codec <- Seq("snappy", "null")) {
      val dir = Files.createTempDirectory(s"graft_avro_$codec").toString
      graft.sources.AvroSource.write(df, dir, codec)
      val back = spark.read
        .format(classOf[graft.sources.AvroSource].getName).load(dir)
      assert(back.collect().map(_.toString).sorted
        .sameElements(df.collect().map(_.toString).sorted),
        s"$codec round trip diverged")
    }
  }

  test("avro unrecognized logical types fall back to the underlying type") {
    // spec: a reader that doesn't recognize a logical annotation must
    // IGNORE it and use the base type — rejecting blocks interop
    import org.apache.avro.{Schema, SchemaBuilder}
    import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
    import org.apache.avro.file.DataFileWriter
    import org.apache.spark.sql.types._
    val dir = Files.createTempDirectory("graft_avro_ltfallback")
    val schema: Schema = SchemaBuilder.record("ev").namespace("ext").fields()
      .name("t_ms").`type`(org.apache.avro.LogicalTypes.timestampMillis()
        .addToSchema(Schema.create(Schema.Type.LONG))).noDefault()
      .name("u").`type`(org.apache.avro.LogicalTypes.uuid()
        .addToSchema(Schema.create(Schema.Type.STRING))).noDefault()
      .endRecord()
    val f = dir.resolve("part-0.avro").toFile
    val w = new DataFileWriter[GenericRecord](
      new GenericDatumWriter[GenericRecord](schema))
    w.create(schema, f)
    val r = new GenericData.Record(schema)
    r.put(0, java.lang.Long.valueOf(1723680000123L))
    r.put(1, new org.apache.avro.util.Utf8("0-1-2-3-4"))
    w.append(r); w.close()
    val back = spark.read
      .format(classOf[graft.sources.AvroSource].getName)
      .load(dir.toString)
    assert(back.schema("t_ms").dataType == LongType)
    assert(back.schema("u").dataType == StringType)
    val row = back.collect().head
    assert(row.getLong(0) == 1723680000123L && row.getString(1) == "0-1-2-3-4")
  }

  test("avro additive evolution: old generations null-fill, type drift still loud") {
    import spark.implicits._
    import org.apache.spark.sql.types._
    // generation 1: (id, text); generation 2 adds lang — merged schema
    // must union the fields and mark lang nullable
    val dir = Files.createTempDirectory("graft_avro_gen").toString
    val g1 = Files.createTempDirectory("graft_avro_g1").toString
    val g2 = Files.createTempDirectory("graft_avro_g2").toString
    graft.sources.AvroSource.write(
      Seq((1L, "alpha"), (2L, "beta")).toDF("id", "text"), g1)
    graft.sources.AvroSource.write(
      Seq((3L, "gamma", "en"), (4L, "delta", "fr")).toDF("id", "text", "lang"), g2)
    def adopt(src: String, prefix: String): Unit = {
      val s = Files.list(java.nio.file.Paths.get(src))
      try s.iterator().asScala.toList
        .filter(_.getFileName.toString.endsWith(".avro"))
        .foreach(p => Files.copy(p,
          java.nio.file.Paths.get(dir, s"$prefix-${p.getFileName}")))
      finally s.close()
    }
    adopt(g1, "g1"); adopt(g2, "g2")
    val merged = graft.sources.AvroSource.readSchema(dir)
    assert(merged("lang").nullable, "added column must merge as nullable")
    assert(!merged("id").nullable, "shared column must keep its nullability")
    val back = spark.read
      .format(classOf[graft.sources.AvroSource].getName).load(dir)
      .orderBy("id").collect()
    assert(back.map(_.getLong(0)).sameElements(Array(1L, 2L, 3L, 4L)))
    assert(back(0).isNullAt(2) && back(1).isNullAt(2),
      "old-generation rows must null-fill the added column")
    assert(back(2).getString(2) == "en" && back(3).getString(2) == "fr")
    // projection confined to the evolved column still works per file
    val langs = spark.read
      .format(classOf[graft.sources.AvroSource].getName).load(dir)
      .select("lang").collect().map(r => Option(r.getString(0)))
    assert(langs.count(_.isEmpty) == 2 && langs.flatten.sorted
      .sameElements(Array("en", "fr")))
    // TYPE drift on a shared name is still a loud merge failure
    val g3 = Files.createTempDirectory("graft_avro_g3").toString
    graft.sources.AvroSource.write(
      Seq(("5", "epsilon")).toDF("id", "text"), g3)
    adopt(g3, "g3")
    val e = intercept[Exception](
      graft.sources.AvroSource.readSchema(dir))
    assert(e.getMessage.contains("type conflict"), e.getMessage)
  }

  test("avro maps: string-keyed map<string,long> round-trips exactly") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_avro_map").toString
    val df = Seq(
      (1L, Map("a" -> 1L, "b" -> -2L)),
      (2L, Map.empty[String, Long]),
      (3L, Map("只" -> 42L)))
      .toDF("id", "tags")
    graft.sources.AvroSource.write(df, dir)
    val inferred = graft.sources.AvroSource.readSchema(dir)
    assert(inferred("tags").dataType.isInstanceOf[org.apache.spark.sql.types.MapType])
    val back = spark.read
      .format(classOf[graft.sources.AvroSource].getName).load(dir)
    // map columns can't join set operations — compare as collected maps
    def toMaps(d: org.apache.spark.sql.DataFrame) = d.collect()
      .map(r => r.getLong(0) -> r.getMap[String, Long](1).toMap).toMap
    assert(toMaps(back) == toMaps(df))
    // null map values survive the UNION(null, T) value branch
    val dir2 = Files.createTempDirectory("graft_avro_mapnull").toString
    val df2 = Seq((1L, Map("x" -> Some(5L), "y" -> (None: Option[Long]))))
      .toDF("id", "tags")
    graft.sources.AvroSource.write(df2, dir2)
    val back2 = spark.read
      .format(classOf[graft.sources.AvroSource].getName).load(dir2)
    val m = back2.collect().head.getMap[String, Any](1).toMap
    assert(m == Map("x" -> 5L, "y" -> null), m.toString)
  }

  test("avro nested records: struct fields round-trip exactly, incl. null structs") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_avro_nest").toString
    val df = Seq(
      (1L, Some(("alpha", 2.5, Some(7L)))),
      (2L, Some(("beta", -1.0, None: Option[Long]))),
      (3L, None: Option[(String, Double, Option[Long])]))
      .toDF("id", "meta")
    graft.sources.AvroSource.write(df, dir)
    val inferred = graft.sources.AvroSource.readSchema(dir)
    assert(inferred("meta").dataType.isInstanceOf[org.apache.spark.sql.types.StructType])
    val back = spark.read
      .format(classOf[graft.sources.AvroSource].getName).load(dir)
    assert(back.count() == 3)
    assert(back.exceptAll(df).isEmpty && df.exceptAll(back).isEmpty)
    // and a struct INSIDE an array (chunked-payload shape) survives too
    val dir2 = Files.createTempDirectory("graft_avro_nestarr").toString
    val df2 = Seq((1L, Seq(("x", 1L), ("y", 2L))), (2L, Seq.empty[(String, Long)]))
      .toDF("id", "parts")
    graft.sources.AvroSource.write(df2, dir2)
    val back2 = spark.read
      .format(classOf[graft.sources.AvroSource].getName).load(dir2)
    assert(back2.exceptAll(df2).isEmpty && df2.exceptAll(back2).isEmpty)
  }

  test("avro nested twin: struct-field aggregate equals the raw-parquet spelling") {
    val viaAvro = graft.sources.AvroSource.nestedRoundTripAgg(spark, sf).collect()
    val raw = Tables.events(spark, sf)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(12,2)")).cast("double").as("sum_amount"),
        countDistinct(col("user_id")).as("n_users"),
        max(unix_micros(col("ts"))).as("max_ts_us"))
      .orderBy("event_type").collect()
    assert(viaAvro.nonEmpty && viaAvro.sameElements(raw),
      s"avro=${viaAvro.take(2).mkString(";")} raw=${raw.take(2).mkString(";")}")
  }

  test("avro events twin: logical-type aggregate equals the raw-parquet spelling") {
    // the registered source_avro_events query vs the same aggregate off
    // the raw events table — the in-JVM twin of its DuckDB oracle
    val viaAvro = graft.sources.AvroSource.eventsRoundTripAgg(spark, sf).collect()
    val raw = Tables.events(spark, sf)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(12,2)")).cast("double").as("sum_amount"),
        min(unix_micros(col("ts"))).as("min_ts_us"),
        max(unix_micros(col("ts"))).as("max_ts_us"))
      .orderBy("event_type").collect()
    assert(viaAvro.nonEmpty && viaAvro.sameElements(raw),
      s"avro=${viaAvro.mkString(";")} raw=${raw.mkString(";")}")
  }

  test("sharded sink: shards partition the corpus; assignment is content-keyed") {
    val m = graft.operators.ShardedSink.manifest(spark, sf).collect()
    val docs = Tables.documents(spark, sf)
    assert(m.map(_.getAs[Long]("n_docs")).sum == docs.count())
    val shards = m.map(_.getAs[Long]("shard")).toSet
    assert(shards.subsetOf((0L until 16L).toSet) && shards.nonEmpty)
    // content-keyed: identical texts land in the same shard, so the
    // per-shard checksum equals a direct computation off the raw table
    val direct = docs
      .select(org.apache.spark.sql.functions.pmod(
        graft.operators.Dedup.hash64Col(col("text")), lit(16)).as("shard"))
      .groupBy("shard").count().collect()
      .map(r => r.getAs[Long]("shard") -> r.getAs[Long]("count")).toMap
    val fromFiles = m.map(r => r.getAs[Long]("shard") -> r.getAs[Long]("n_docs")).toMap
    assert(fromFiles == direct)
  }

  test("quarantine routing: nothing dropped, nothing poisoned, clean side byte-true") {
    val (clean, quarantine, release) = graft.sources.JsonQuarantine.route(spark, sf)
    val docs = Tables.documents(spark, sf)
    // conservation: every staged line is exactly one of clean/quarantined
    assert(clean.count() + quarantine.count() == docs.count())
    // the routing decision is exactly the staged corruption rule
    val cleanIds = clean.select("doc_id").collect().map(_.getLong(0)).toSet
    val expected = docs.filter(col("doc_id") % 37 =!= 0)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(cleanIds == expected, "routing decision diverged from the corruption rule")
    // clean rows survive parse byte-true (PERMISSIVE must not null-pad
    // fields of VALID lines)
    val back = clean.select("doc_id", "text", "lang", "source", "n_chars")
    val orig = docs.filter(col("doc_id") % 37 =!= 0)
      .select("doc_id", "text", "lang", "source", "n_chars")
    assert(back.exceptAll(orig).isEmpty && orig.exceptAll(back).isEmpty)
    // quarantined lines carry the raw offending bytes, not nulls
    assert(quarantine.filter(col("raw_line").isNull).isEmpty)
    release() // the routed frames' parse cache is caller-owned
  }
}
