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

  /** SQL expression for SimilaritySearch.planeValue(seed, t, j, i): a
    * Gaussian-ish integer hyperplane component, sum of three md5-derived
    * 32-bit uniforms centered at zero. `t`/`j`/`i` are column refs. */
  def planeValSql(seed: Long, t: String, j: String, i: String): String = {
    def u(k: Int) = hexVal(
      s"md5('plane:$seed:' || CAST($t AS VARCHAR) || ':' || CAST($j AS VARCHAR)" +
        s" || ':' || CAST($i AS VARCHAR) || ':$k')", 1, 8)
    s"CAST(${u(0)} + ${u(1)} + ${u(2)} - 6442450944 AS BIGINT)"
  }

  /** WITH-clause fragment (no leading/trailing comma) replaying
    * SimilaritySearch.lshCandidates over a preceding CTE
    * `vecs(vec_id BIGINT, v FLOAT[])`; defines a final CTE
    * `cands(vec_a, vec_b)` with vec_a < vec_b, DISTINCT.
    *
    * Bit-exactness: vector elements are quantized `floor(x * 2^20)` and
    * the hyperplane sign test runs entirely in integer arithmetic, so the
    * bucket signatures here equal the Spark side's regardless of
    * summation order; the optional centering subtracts the FLOOR of the
    * exact integer mean, also order-independent. Mirrors the 1-bit
    * multiprobe (probe side = left, identity included). */
  def lshCandidatesSql(dim: Int, nTables: Int, bitsPerTable: Int,
      seed: Long, center: Boolean): String = {
    val qExpr =
      "CAST(floor(CAST(v[CAST(ri.i + 1 AS INTEGER)] AS DOUBLE) * 1048576.0) AS BIGINT)"
    val centered =
      if (!center) "cq AS (SELECT vec_id, i, q FROM qv)"
      else
        """ctr AS (SELECT i, CAST(floor(CAST(SUM(q) AS DOUBLE) / COUNT(*)) AS BIGINT) AS m
          |        FROM qv GROUP BY i),
          |cq AS (SELECT vec_id, qv.i, qv.q - ctr.m AS q FROM qv JOIN ctr USING (i))""".stripMargin
    s"""qv AS (SELECT vec_id, CAST(ri.i AS INTEGER) AS i, $qExpr AS q
       |       FROM vecs, range($dim) AS ri(i)),
       |$centered,
       |planes AS (SELECT CAST(rt.t AS INTEGER) AS t, CAST(rj.j AS INTEGER) AS j,
       |                  CAST(ri.i AS INTEGER) AS i,
       |                  ${planeValSql(seed, "rt.t", "rj.j", "ri.i")} AS pv
       |           FROM range($nTables) AS rt(t), range($bitsPerTable) AS rj(j),
       |                range($dim) AS ri(i)),
       |dots AS (SELECT c.vec_id, p.t, p.j, SUM(c.q * p.pv) AS d
       |         FROM cq c JOIN planes p USING (i) GROUP BY c.vec_id, p.t, p.j),
       |sigs AS (SELECT vec_id, t,
       |           CAST(SUM(CASE WHEN d >= 0 THEN CAST(1 AS BIGINT) << j
       |                         ELSE CAST(0 AS BIGINT) END) AS BIGINT) AS sig
       |         FROM dots GROUP BY vec_id, t),
       |probes AS (SELECT vec_id, t, sig FROM sigs
       |           UNION ALL
       |           SELECT vec_id, t, xor(sig, CAST(1 AS BIGINT) << CAST(rb.b AS INTEGER))
       |           FROM sigs, range($bitsPerTable) AS rb(b)),
       |cands AS (SELECT DISTINCT l.vec_id AS vec_a, r.vec_id AS vec_b
       |          FROM probes l JOIN sigs r
       |            ON l.t = r.t AND l.sig = r.sig AND l.vec_id < r.vec_id)""".stripMargin
  }
}
