package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-quality / operations primitives: the profiling passes a pipeline
  * runs BEFORE committing to a 100 TB job — null/distinct census per
  * column and join-key skew diagnosis. Both emit exact integers only, so
  * the DuckDB oracles replay bit-for-bit.
  */
object Profiling {

  /** Per-column profile: null count and exact distinct count for the
    * named columns, one output row per column.
    *
    * Shape: columns are stacked to (col_name, value-as-string) rows with
    * a narrow Expand (no UDF, null-preserving cast), then ONE aggregate
    * keyed by column name computes both stats. One shuffle whose key
    * cardinality is the column count; the count_distinct is per-group
    * exact. At 100 TB the Expand multiplies scan rows by |columns| —
    * bounded by profiling a column subset (the signature takes the list)
    * or sampling upstream; a sketch (HLL, `Sketches.hllDistinct`) is the
    * approximate alternative when exactness isn't required. */
  def profileColumns(df: DataFrame, columns: Seq[String]): DataFrame = {
    val stacked = df.select(explode(array(columns.map(c =>
      struct(lit(c).as("col_name"), col(c).cast("string").as("v"))): _*))
      .as("s"))
      .select(col("s.col_name"), col("s.v"))
    stacked.groupBy("col_name")
      .agg(
        count(lit(1)).as("n_rows"),
        sum(when(col("v").isNull, 1L).otherwise(0L)).as("n_nulls"),
        count_distinct(col("v")).as("n_distinct"))
      .orderBy("col_name")
  }

  /** DuckDB replay: one UNION ALL branch per column. */
  def profileColumnsSql(table: String, columns: Seq[String]): String =
    columns.sorted.map { c =>
      s"""SELECT '$c' AS col_name, COUNT(*) AS n_rows,
         |  COUNT(*) - COUNT($c) AS n_nulls,
         |  COUNT(DISTINCT CAST($c AS VARCHAR)) AS n_distinct
         |FROM $table""".stripMargin
    }.mkString("", "\nUNION ALL\n", "\nORDER BY col_name")

  /** Join-key skew report: the top-k heaviest values of `key` with their
    * row counts and per-million share — the pre-join diagnostic that
    * decides whether a 100 TB join needs salting (`Relational.q15`) or
    * AQE skew splitting before it is launched. Share is exact integer
    * ppm (floor), so the oracle replays exactly.
    *
    * Plan: one map-side-combinable count aggregate keyed by the join
    * key, then the bounded TakeOrderedAndProject top-k — no full sort,
    * no second shuffle of corpus volume. */
  def keySkew(df: DataFrame, key: String, k: Int = 10): DataFrame = {
    val counts = df.groupBy(col(key).cast("long").as("key_value"))
      .agg(count(lit(1)).as("n_rows"))
    val total = counts.agg(sum("n_rows").cast("long").as("n_total"))
    counts.join(broadcast(total))
      // integer floor division end-to-end — no engine float rounding
      .withColumn("share_ppm", expr("(n_rows * 1000000L) div n_total"))
      .select("key_value", "n_rows", "share_ppm")
      .orderBy(col("n_rows").desc, col("key_value").asc)
      .limit(k)
  }

  def keySkewSql(table: String, key: String, k: Int = 10): String =
    s"""SELECT CAST($key AS BIGINT) AS key_value, COUNT(*) AS n_rows,
       |  COUNT(*) * 1000000 // (SELECT COUNT(*) FROM $table) AS share_ppm
       |FROM $table GROUP BY 1
       |ORDER BY n_rows DESC, key_value ASC LIMIT $k""".stripMargin

  // ------------------------------------------------- referential integrity
  /** One declared foreign-key relationship: `child.fkCol` should only
    * hold values present in `parent.pkCol`. */
  final case class FkCheck(name: String, child: DataFrame, fkCol: String,
      parent: DataFrame, pkCol: String)

  /** Referential-integrity audit: per declared FK, the child row count
    * and the number of ORPHAN rows (fk value absent from the parent) —
    * the pre-flight check that catches a broken upstream export before a
    * join silently drops (inner) or null-pads (outer) at 100 TB.
    *
    * Shape per check: LEFT ANTI join child -> parent on the key, then a
    * single-row count — the anti join broadcasts whenever the parent's
    * KEY COLUMN fits (it is pruned to one column first), so the child
    * never shuffles for dimension-sized parents; a fact-fact FK falls
    * back to an ordinary key shuffle. Checks are unioned lazily — each
    * is an independent 1-row aggregate, no cross-check dependency. */
  def fkOrphans(checks: Seq[FkCheck]): DataFrame = {
    require(checks.nonEmpty)
    checks.map { c =>
      val parentKeys = c.parent.select(col(c.pkCol).as(c.fkCol))
      // NULL fks are excluded on both sides (an anti join counts an
      // unmatched NULL as an orphan; SQL NOT IN silently drops it — pin
      // one contract: orphan = NON-NULL value absent from the parent)
      val orphans = c.child.select(col(c.fkCol)).filter(col(c.fkCol).isNotNull)
        .join(parentKeys, Seq(c.fkCol), "left_anti")
      c.child.select(count(lit(1)).as("n_rows"))
        .join(orphans.select(count(lit(1)).as("n_orphans")))
        .select(lit(c.name).as("fk_name"), col("n_rows"), col("n_orphans"))
    }.reduce(_ unionByName _)
  }

  /** The standard audit over the TPC-H-ish testdata's declared keys. */
  def fkOrphansSql(checks: Seq[(String, String, String, String, String)]): String =
    checks.map { case (name, child, fk, parent, pk) =>
      s"""SELECT '$name' AS fk_name,
         |  (SELECT COUNT(*) FROM $child) AS n_rows,
         |  (SELECT COUNT(*) FROM (
         |     SELECT $fk FROM $child WHERE $fk IS NOT NULL AND $fk NOT IN
         |       (SELECT $pk FROM $parent WHERE $pk IS NOT NULL)
         |   )) AS n_orphans""".stripMargin
    }.mkString("\nUNION ALL\n") + "\nORDER BY fk_name"
}
