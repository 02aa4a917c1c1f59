package graft.operators

/** Shared DuckDB SQL fragments for oracles that hash with md5.
  *
  * The engine-portable hash discipline: every content hash used by an
  * oracle-checked operator is derived from `md5(utf8-bytes)` — computable
  * bit-for-bit in Spark (`md5` + `conv`) AND in DuckDB (md5 + the hex
  * parser below), so DuckDB can replay the full operator. DuckDB has no
  * native hex→int cast, so digits are folded positionally; per-digit
  * weights 16^(len-p) stay exact (powers of two are exactly representable
  * doubles up to far beyond 16^15, and parsed chunks are kept <= 32 bits
  * so BIGINT sums never overflow).
  */
object OracleSql {

  /** SQL expression parsing hex digits [pos, pos+len) of `hexExpr`
    * (1-based, len <= 8) into a BIGINT. */
  def hexVal(hexExpr: String, pos: Int, len: Int): String = {
    require(len <= 8, "parse at most 32 bits per chunk (BIGINT-safe sums)")
    s"list_sum(list_transform(range(1,${len + 1}), p -> " +
      s"(strpos('0123456789abcdef', substr($hexExpr, CAST($pos+p-1 AS INTEGER), 1)) - 1)" +
      s" * CAST(power(16, $len-p) AS BIGINT)))"
  }

  /** SQL expression: first 16 hex chars of `hexExpr` as a SIGNED 64-bit
    * BIGINT (two 32-bit halves combined in HUGEINT, wrapped to signed) —
    * matches the JVM's big-endian first-8-md5-bytes-as-Long. */
  def hex64Signed(hexExpr: String): String = {
    val v = s"CAST(${hexVal(hexExpr, 1, 8)} AS HUGEINT) * 4294967296 + ${hexVal(hexExpr, 9, 8)}"
    s"CAST(CASE WHEN ($v) >= CAST('9223372036854775808' AS HUGEINT) " +
      s"THEN ($v) - CAST('18446744073709551616' AS HUGEINT) ELSE ($v) END AS BIGINT)"
  }
}
