package graft

import org.apache.spark.sql.functions._

import graft.operators.Layout

class LayoutSpec extends SparkSpec {

  test("magic-number z-value equals the bit-by-bit reference interleave") {
    import spark.implicits._
    val keys = Seq(
      (0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L),
      (0xFFFFFFFFL, 0L), (0L, 0xFFFFFFFFL), (0xFFFFFFFFL, 0xFFFFFFFFL),
      (123456789L, 987654321L), (1L << 31, 1L << 31), (42L, 7L))
    val got = keys.toDF("a", "b")
      .select(Layout.zValue(col("a"), col("b")).as("z"))
      .as[Long].collect()
    val want = keys.map { case (a, b) => Layout.zValueRef(a, b) }
    assert(got.toSeq == want)
    // interleave is a bijection on 32-bit pairs: distinct inputs, distinct z
    assert(got.distinct.length == keys.length)
  }

  test("z-value is monotone-local: quadrant prefix bits match key prefixes") {
    // points in the same power-of-two quadrant share the z prefix — the
    // property that makes z-ranges tile the plane in aligned squares
    val z1 = Layout.zValueRef(0x10L, 0x20L)
    val z2 = Layout.zValueRef(0x1FL, 0x2FL) // same 2^4-aligned quadrant
    val z3 = Layout.zValueRef(0x40L, 0x20L) // different quadrant in a
    assert((z1 >> 8) == (z2 >> 8), "same quadrant must share z prefix")
    assert((z1 >> 8) != (z3 >> 8), "different quadrant must differ")
  }

  test("z-layout gives tight per-file spans on BOTH dims; lex sort only one") {
    // a full 64x64 key grid in 16 "files" (partitions): z-ordering tiles
    // the grid into aligned squares (expected 16x16 -> minor-dim span 15),
    // while range-sorting on the major key alone leaves every file
    // spanning the ENTIRE minor domain (min/max stats useless for b).
    // The grid (not testdata) makes the claim exact and scale-free — the
    // testdata minor-key domain (10 suppliers at sf0.001) is smaller than
    // a tile, where no layout could tighten anything.
    import spark.implicits._
    val grid = spark.range(64L * 64L)
      .select((col("id") / 64).cast("long").as("a"),
        (col("id") % 64).cast("long").as("b"))

    def maxMinorSpan(df: org.apache.spark.sql.DataFrame): Long =
      df.withColumn("pid", spark_partition_id())
        .groupBy("pid")
        .agg((max("b") - min("b")).as("span"))
        .select(max("span")).as[Long].collect().head

    val lex = grid.repartitionByRange(16, col("a"))
      .sortWithinPartitions("a", "b")
    val zed = Layout.zOrdered(grid, "a", "b", 16)

    val lexSpan = maxMinorSpan(lex)
    val zSpan = maxMinorSpan(zed)
    // lexicographic: every partition spans the whole b domain
    assert(lexSpan == 63L, s"expected lex layout to span the b domain, got $lexSpan")
    // z-order: aligned-square tiles; range-partitioner sampling can land a
    // boundary mid-tile, so allow 2 tiles' worth, still far under 63
    assert(zSpan <= 31L, s"z layout minor span $zSpan not tile-tight")
  }

  test("zOrdered plan is one range-partition exchange, schema unchanged") {
    val li = Tables.lineitem(spark, sf).select("l_partkey", "l_suppkey")
    val zed = Layout.zOrdered(li, "l_partkey", "l_suppkey", 4)
    assert(zed.columns.toSeq == Seq("l_partkey", "l_suppkey"))
    val plan = zed.queryExecution.executedPlan.toString
    assert(plan.contains("rangepartitioning"),
      s"expected a range partitioning exchange, got:\n$plan")
    assert(zed.count() == li.count())
  }

  test("zone maps: footer manifest admits a strict file subset and loses no row") {
    import graft.operators.ZoneMaps
    val day = 86400000000L
    val t0 = Tables.events(spark, sf)
      .agg(min(expr("unix_micros(ts)"))).head.getLong(0)
    val (scan, admitted, total) = ZoneMaps.skipScan(spark, sf, t0 + 2 * day, t0 + 4 * day - 1)
    assert(total > 1, "staging must produce multiple range-clustered files")
    assert(admitted < total, s"no skipping: $admitted/$total files admitted")
    assert(admitted > 0)
    // the skipping is REAL at the scan level: Spark's planned input file
    // set is exactly the admitted subset, not the whole directory
    assert(scan.inputFiles.length == admitted,
      s"scan reads ${scan.inputFiles.length} files, manifest admitted $admitted")
    // the skipped route must equal the raw-table filter row-for-row
    val viaZoneMap = scan.collect().map(_.toString).sorted
    val raw = Tables.events(spark, sf)
      .select(expr("unix_micros(ts)").as("ts_us"), col("event_type"), col("value"))
      .filter(col("ts_us").between(t0 + 2 * day, t0 + 4 * day - 1))
      .collect().map(_.toString).sorted
    assert(viaZoneMap.nonEmpty)
    assert(viaZoneMap.sameElements(raw),
      s"zone-mapped scan diverges: ${viaZoneMap.length} vs ${raw.length} rows")
  }

  test("zone maps: manifest bands are range-disjoint under the clustered layout") {
    import graft.operators.ZoneMaps
    val dir = ZoneMaps.stagedDir(spark, sf)
    val bands = ZoneMaps.footerManifest(spark, dir).map { case (_, lo, hi) => (lo, hi) }
      .sortBy(_._1)
    assert(bands.forall { case (lo, hi) => lo <= hi })
    // repartitionByRange gives non-overlapping bands (boundary duplicates
    // of a single key value aside) — the property that makes range
    // predicates prune well; allow touching endpoints, forbid containment
    bands.sliding(2).foreach {
      case Seq((_, hi1), (lo2, _)) => assert(lo2 >= hi1,
        s"overlapping zone bands: ($hi1) vs ($lo2) — clustering broken")
      case _ =>
    }
  }

  test("zone maps: overlap sweep counts every band a wide band blankets") {
    import graft.operators.ZoneMaps.overlapCount
    // disjoint bands: zero overlaps; touching endpoints don't count
    assert(overlapCount(Seq((0L, 10L), (10L, 20L), (20L, 30L))) == 0)
    // the ADVICE r10 case: one wide band containing many later disjoint
    // bands — the pairwise-predecessor check saw ONE overlap here and a
    // broken layout stayed under the majority threshold; the running
    // max-hi sweep counts all five
    val wide = Seq((0L, 100L), (10L, 12L), (20L, 22L), (30L, 32L),
      (40L, 42L), (50L, 52L))
    assert(overlapCount(wide) == 5, s"got ${overlapCount(wide)}")
    // fully random layout: nearly every consecutive pair overlaps
    assert(overlapCount(Seq((0L, 50L), (25L, 75L), (50L, 100L),
      (75L, 125L))) == 3)
  }
}
