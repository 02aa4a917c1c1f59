package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) data layout — multi-dimensional clustering for
  * scan pruning.
  *
  * Why it exists: parquet pruning (row-group min/max stats, file skipping,
  * partition dirs) is only as good as the data LAYOUT. Sorting 100 TB by
  * `(a, b)` lexicographically makes min/max stats razor-sharp on `a` and
  * useless on `b`: every file spans b's whole domain. Interleaving the
  * bits of both keys into one z-value and range-partitioning + sorting on
  * THAT gives every file a narrow span in BOTH dimensions — a predicate on
  * either column (or both) skips most files at planning/footer time. This
  * is the standard lakehouse clustering primitive (Delta/Iceberg
  * `OPTIMIZE ZORDER BY`), built here from Spark primitives: a codegen'd
  * bit-interleave expression + `repartitionByRange` + `sortWithinPartitions`.
  *
  * Scale shape:
  *  - computing z is a narrow per-row map (6 shift/mask ops per column,
  *    whole-stage codegen'd — no UDF);
  *  - the only shuffle is the range partitioner's (sampled bounds, same
  *    cost class as any global sort of the data being laid out — paid ONCE
  *    at write time, amortized over every subsequent pruned read);
  *  - per-file z-ranges tile the key space in aligned squares: with `p`
  *    output files over two uniform 32-bit keys, each file spans ~sqrt of
  *    the per-dimension range a plain sort would give the minor key — the
  *    quantitative claim LayoutSpec asserts on testdata.
  *
  * Determinism: the interleave is pure integer bit math (the classic
  * magic-number bit spread), identical in Spark and DuckDB (`<<`, `&`,
  * `|` on BIGINT), so the registered query carries a full hash oracle —
  * [[zValueSql]] is generated from the same masks as [[zValue]].
  *
  * Reference scope note: the reference engine has no layout surface at
  * all (its only sink is a driver pickle, `utils.py:44-49`); this operator
  * is part of the beyond-parity 100 TB surface.
  */
object Layout {

  /** (shift, mask) pairs that spread the low 32 bits of a long so bit i
    * lands at bit 2i — the classic Morton magic numbers. */
  private val spreadSteps: Seq[(Int, Long)] = Seq(
    16 -> 0x0000FFFF0000FFFFL,
    8  -> 0x00FF00FF00FF00FFL,
    4  -> 0x0F0F0F0F0F0F0F0FL,
    2  -> 0x3333333333333333L,
    1  -> 0x5555555555555555L)

  /** Spread the low 32 bits of `c` to even bit positions (Column form). */
  private def spread(c: Column): Column =
    spreadSteps.foldLeft(c.bitwiseAND(lit(0xFFFFFFFFL))) {
      case (x, (s, m)) => x.bitwiseOR(shiftleft(x, s)).bitwiseAND(lit(m))
    }

  /** Same spread as a DuckDB SQL expression string (same masks, same
    * order — single source of truth for both engines). The explicit
    * BIGINT cast matters: DuckDB's `<<` on a 32-bit column shifts in
    * 32-bit space and would overflow. */
  private def spreadSql(e: String): String =
    spreadSteps.foldLeft(s"(CAST($e AS BIGINT) & ${0xFFFFFFFFL})") {
      case (x, (s, m)) => s"(($x | ($x << $s)) & $m)"
    }

  /** 64-bit Morton z-value of two non-negative 32-bit keys: bits of `a`
    * at even positions, bits of `b` at odd. Monotone locality: nearby
    * (a, b) points get nearby z — the property range-partitioning on z
    * turns into per-file min/max tightness on BOTH columns. */
  def zValue(a: Column, b: Column): Column =
    spread(a).bitwiseOR(shiftleft(spread(b), 1))

  /** SQL spelling of [[zValue]] for the oracle. */
  def zValueSql(a: String, b: String): String =
    s"(${spreadSql(a)} | (${spreadSql(b)} << 1))"

  /** Reference scalar implementation (tests only): the straightforward
    * bit-by-bit interleave the magic-number form must equal. */
  private[graft] def zValueRef(a: Long, b: Long): Long = {
    var z = 0L
    var i = 0
    while (i < 32) {
      z |= ((a >> i) & 1L) << (2 * i)
      z |= ((b >> i) & 1L) << (2 * i + 1)
      i += 1
    }
    z
  }

  /** Lay `df` out z-ordered on (`colA`, `colB`): range-partition into
    * `numFiles` z-ranges and sort each partition by z, so row-group
    * min/max stats are tight in both dimensions. The z column itself is
    * dropped — layout is a storage property, not schema. */
  def zOrdered(df: DataFrame, colA: String, colB: String,
      numFiles: Int): DataFrame = {
    val z = zValue(col(colA).cast("long"), col(colB).cast("long")).as("__z")
    df.withColumn("__z", z)
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
  }

  /** Registered query: the z-value of every lineitem (part, supplier)
    * pair — the clustering key [[zOrdered]] lays files out by, exposed
    * relationally so the bit math itself is oracle-certified (the layout
    * side effect — per-file span tightness — is asserted in LayoutSpec,
    * since file boundaries are an engine property no SQL replay sees). */
  def zOrderKeys(spark: org.apache.spark.sql.SparkSession,
      dir: String): DataFrame =
    graft.Tables.lineitem(spark, dir).select(
      col("l_partkey").cast("long").as("l_partkey"),
      col("l_suppkey").cast("long").as("l_suppkey"),
      zValue(col("l_partkey").cast("long"), col("l_suppkey").cast("long")).as("z"))
      .orderBy("z", "l_partkey", "l_suppkey")

  val zOrderKeysSql: String =
    s"""SELECT CAST(l_partkey AS BIGINT) AS l_partkey,
       |  CAST(l_suppkey AS BIGINT) AS l_suppkey,
       |  ${zValueSql("l_partkey", "l_suppkey")} AS z
       |FROM lineitem ORDER BY z, l_partkey, l_suppkey""".stripMargin
}
