package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Probabilistic sketches for pipeline-scale cardinality and frequency
  * estimation: HyperLogLog distinct counting and count-min heavy hitters.
  *
  * Both are the DETERMINISTIC, engine-replayable spellings of their
  * algorithms: every hash is md5-derived (the repo's portable-hash
  * discipline — see OracleSql), bucket and rank extraction is plain
  * integer arithmetic on hex chunks, and the only floating-point (HLL's
  * harmonic mean) is an identical expression on both engines, rounded to
  * an integer at the end. So unlike `approx_count_distinct`-style
  * built-ins (whose sketch internals differ per engine), these carry
  * full hash-match DuckDB oracles.
  *
  * Scale shape (the reason sketches exist at 100 TB):
  *  - HLL: one map-side-combinable aggregation to at most m=2^p register
  *    rows PER GROUP (p=12 → 4 KB/group), independent of cardinality —
  *    vs an exact distinct whose shuffle grows with the key count. The
  *    register table is mergeable across days/partitions by max(rank).
  *  - Count-min: the counter table is a FIXED d x w grid (4 x 1024 here)
  *    built by one counting aggregation over the token stream; estimation
  *    is an equi-join of candidates against the (broadcastable) grid.
  *    Memory is O(d*w), never O(vocabulary).
  */
object Sketches {

  // ------------------------------------------------------- HyperLogLog
  /** Register-index bits: m = 2^12 = 4096 registers (~1.6% rel. error). */
  val HllP = 12
  val HllM = 4096
  /** Bias constant alpha_m for m >= 128 (Flajolet et al. 2007). */
  val HllAlpha: Double = 0.7213 / (1 + 1.079 / HllM)

  /** Per-row (grp, bucket, rank) register contributions — the map side
    * of the sketch, shared by the batch and STREAMING spellings.
    *
    * Hash layout per value: md5 hex chars [1,3] → register index (12
    * bits); chars [4,16] → a 52-bit tail whose leading-zero rank feeds
    * the register (rank = 53 - bitlen, 53 for an all-zero tail). */
  private[graft] def hllRegisterRows(df: DataFrame, groupCol: String,
      valueCol: String): DataFrame = {
    val hex = md5(col(valueCol).cast("string"))
    val bucket = conv(substring(hex, 1, 3), 16, 10).cast("long")
    // 52-bit tail in two BIGINT-safe chunks: 32 + 20 bits
    val tail = conv(substring(hex, 4, 8), 16, 10).cast("long") * lit(1048576L) +
      conv(substring(hex, 12, 5), 16, 10).cast("long")
    val rank = when(tail === 0L, lit(53)).otherwise(lit(53) - length(bin(tail)))
    df.select(col(groupCol).as("grp"), bucket.as("bucket"), rank.as("rank"))
  }

  /** Estimate per group from a completed register table (grp, bucket, r):
    * bias-corrected harmonic mean with linear-counting fallback. Output:
    * (grp, n_est). */
  private[graft] def hllEstimate(registers: DataFrame): DataFrame =
    registers.groupBy("grp")
      .agg(sum(pow(lit(2.0), -col("r"))).as("z_filled"),
        count(lit(1)).as("n_regs"))
      .withColumn("v_empty", lit(HllM) - col("n_regs"))
      .withColumn("z", col("z_filled") + col("v_empty").cast("double"))
      .withColumn("e_raw", lit(HllAlpha) * lit(HllM.toDouble) * lit(HllM.toDouble) / col("z"))
      .withColumn("e",
        when(col("e_raw") <= lit(2.5 * HllM) && col("v_empty") > 0,
          lit(HllM.toDouble) * log(lit(HllM.toDouble) / col("v_empty").cast("double")))
          .otherwise(col("e_raw")))
      .select(col("grp"), round(col("e")).cast("long").as("n_est"))

  /** Exact distinct per group joined to an estimate — the shared output
    * shape (event_type, n_exact, n_est). */
  private[graft] def withExactYardstick(df: DataFrame, groupCol: String,
      valueCol: String, est: DataFrame): DataFrame = {
    val exact = df.groupBy(col(groupCol).as("grp"))
      .agg(countDistinct(col(valueCol)).as("n_exact"))
    exact.join(est, "grp")
      .select(col("grp").as("event_type"), col("n_exact"), col("n_est"))
      .orderBy("event_type")
  }

  /** HLL distinct-count estimate of `valueCol` per `groupCol`, with the
    * exact count alongside as the quality yardstick. Output:
    * (group, n_exact, n_est) — integer-only. The estimate is the
    * standard bias-corrected harmonic mean with linear-counting fallback
    * for the small range. */
  def hllDistinct(df: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    val registers = hllRegisterRows(df, groupCol, valueCol)
      .groupBy("grp", "bucket").agg(max("rank").as("r"))
    withExactYardstick(df, groupCol, valueCol, hllEstimate(registers))
  }

  /** [[hllDistinct]] spelled through the native `hll_sketch`
    * TypedImperativeAggregate ([[graft.functions.HllSketchAgg]]): one
    * ObjectHashAggregate pair whose partial state is the 4 KB register
    * buffer itself — the shuffle moves one buffer per group per map
    * partition, never register rows. Same estimates, same oracle. */
  def hllDistinctAgg(df: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    val spark = df.sparkSession
    graft.functions.VectorFunctions.ensureRegistered(spark)
    val est = df.groupBy(col(groupCol).as("grp"))
      .agg(call_function("hll_sketch", col(valueCol).cast("string")).as("n_est"))
    withExactYardstick(df, groupCol, valueCol, est)
  }

  /** DuckDB replay of [[hllDistinct]] over events.user_id by event_type. */
  def hllDistinctSql: String = {
    def hv(pos: Int, len: Int) = OracleSql.hexVal("hex", pos, len)
    s"""WITH h AS (SELECT event_type AS grp, md5(CAST(user_id AS VARCHAR)) AS hex
       |           FROM events),
       |hr AS (SELECT grp, CAST(${hv(1, 3)} AS BIGINT) AS bucket,
       |         CAST(${hv(4, 8)} AS BIGINT) * 1048576 +
       |         CAST(${hv(12, 5)} AS BIGINT) AS tail FROM h),
       |registers AS (SELECT grp, bucket,
       |    MAX(CASE WHEN tail = 0 THEN 53 ELSE 53 - length(bin(tail)) END) AS r
       |  FROM hr GROUP BY grp, bucket),
       |exact AS (SELECT event_type AS grp, COUNT(DISTINCT user_id) AS n_exact
       |          FROM events GROUP BY event_type),
       |agg AS (SELECT grp, SUM(power(2.0, -r)) AS z_filled, COUNT(*) AS n_regs
       |        FROM registers GROUP BY grp),
       |est AS (SELECT grp,
       |    CAST(round(CASE
       |      WHEN (CAST($HllAlpha AS DOUBLE) * ${HllM.toDouble} * ${HllM.toDouble} /
       |            (z_filled + CAST($HllM - n_regs AS DOUBLE))) <= ${2.5 * HllM}
       |           AND ($HllM - n_regs) > 0
       |      THEN ${HllM.toDouble} * ln(${HllM.toDouble} / CAST($HllM - n_regs AS DOUBLE))
       |      ELSE (CAST($HllAlpha AS DOUBLE) * ${HllM.toDouble} * ${HllM.toDouble} /
       |            (z_filled + CAST($HllM - n_regs AS DOUBLE)))
       |    END) AS BIGINT) AS n_est
       |  FROM agg)
       |SELECT e.grp AS event_type, e.n_exact, s.n_est
       |FROM exact e JOIN est s ON e.grp = s.grp
       |ORDER BY event_type""".stripMargin
  }

  // -------------------------------------------------- count-min sketch
  val CmsDepth = 4
  val CmsWidth = 1024

  private def tokens(docs: DataFrame): DataFrame =
    docs.select(explode(split(trim(col("text")), "\\s+")).as("raw"))
      .filter(col("raw") =!= "")
      .select(lower(col("raw")).as("tok"))

  private[graft] def cmsBucket(tok: org.apache.spark.sql.Column, salt: org.apache.spark.sql.Column) =
    conv(substring(md5(concat(lit("cms:"), salt.cast("string"), lit(":"), tok)), 1, 5),
      16, 10).cast("long") % CmsWidth

  /** Count-min heavy hitters over whitespace tokens of the documents
    * table: build the d x w counter grid, estimate every distinct token
    * as min over rows, emit the top `k` by estimate with the exact count
    * alongside (est >= exact always — CMS never undercounts). Output:
    * (token, est_count, exact_count) — integer-only.
    *
    * One token-count aggregation feeds BOTH sides: the counter grid is
    * the per-token counts re-bucketed and summed (identical to counting
    * raw occurrences, since every occurrence of a token lands in the
    * same bucket) — so the expensive explode+count over the corpus runs
    * once, and the salt expansion touches only distinct tokens. */
  def cmsTopK(docs: DataFrame, k: Int = 20): DataFrame = {
    val candidates = tokens(docs).groupBy("tok").agg(count(lit(1)).as("exact_count"))
      .persist().transform(graft.CacheScope.register) // read by the grid build and the estimation join
    val salts = explode(array((0 until CmsDepth).map(lit): _*)).as("s")

    val counters = candidates.select(col("tok"), col("exact_count"), salts)
      .select(col("s"), cmsBucket(col("tok"), col("s")).as("b"), col("exact_count"))
      .groupBy("s", "b").agg(sum("exact_count").as("c"))

    cmsTopKFromGrid(candidates, counters, k)
  }

  /** Estimate + top-k from a COMPLETED counter grid (s, b, c) — shared
    * by the batch build above and the streaming grid maintenance
    * (`EventStreams.streamingCmsHeavyUsers`). `candidates` must carry
    * (tok, exact_count). */
  private[graft] def cmsTopKFromGrid(candidates: DataFrame, grid: DataFrame,
      k: Int): DataFrame = {
    val salts = explode(array((0 until CmsDepth).map(lit): _*)).as("s")
    candidates.select(col("tok"), col("exact_count"), salts)
      .withColumn("b", cmsBucket(col("tok"), col("s")))
      .join(grid, Seq("s", "b"))
      .groupBy("tok", "exact_count").agg(min("c").as("est_count"))
      .orderBy(col("est_count").desc, col("tok").asc)
      .limit(k)
      .select(col("tok").as("token"), col("est_count"), col("exact_count"))
  }

  /** DuckDB replay of [[cmsTopK]]. */
  def cmsTopKSql(k: Int = 20): String = cmsSqlOver(
    """SELECT lower(t.raw) AS tok
      |  FROM documents, unnest(string_split_regex(trim(text), '\s+')) AS t(raw)
      |  WHERE t.raw <> ''""".stripMargin, k)

  /** DuckDB replay of the CMS pipeline over user-id occurrences — the
    * oracle for the STREAMING grid maintenance (the streamed grid equals
    * this batch grid exactly: counting aggregation is order-insensitive
    * over a finite replay). */
  def cmsHeavyUsersSql(k: Int = 20): String =
    cmsSqlOver("SELECT CAST(user_id AS VARCHAR) AS tok FROM events", k)

  private def cmsSqlOver(toksSql: String, k: Int): String = {
    def bucket(tokExpr: String, saltExpr: String) =
      s"CAST(${OracleSql.hexVal(s"md5('cms:' || CAST($saltExpr AS VARCHAR) || ':' || $tokExpr)", 1, 5)} AS BIGINT)" +
        s" % $CmsWidth"
    s"""WITH toks AS (
       |  $toksSql),
       |candidates AS (SELECT tok, COUNT(*) AS exact_count FROM toks GROUP BY tok),
       |counters AS (
       |  SELECT s.s AS s, ${bucket("tok", "s.s")} AS b, CAST(SUM(exact_count) AS BIGINT) AS c
       |  FROM candidates CROSS JOIN range($CmsDepth) AS s(s) GROUP BY 1, 2),
       |est AS (
       |  SELECT d.tok, d.exact_count, MIN(c.c) AS est_count
       |  FROM candidates d CROSS JOIN range($CmsDepth) AS s(s)
       |  JOIN counters c ON c.s = s.s AND c.b = ${bucket("d.tok", "s.s")}
       |  GROUP BY d.tok, d.exact_count)
       |SELECT tok AS token, est_count, exact_count FROM est
       |ORDER BY est_count DESC, tok ASC LIMIT $k""".stripMargin
  }

  // --------------------------------------------- HDR quantile histogram
  /** Per-language length-distribution quantiles through the native
    * `hdr_quantile` TypedImperativeAggregate
    * ([[graft.functions.HdrQuantileAgg]]): a FIXED 7.5 KB bucket table
    * per group regardless of value domain (vs lengthQuantiles' one row
    * per distinct value), merged by element-wise add — map-side partials
    * through ObjectHashAggregate, relative error < 2^-4 on every
    * reported quantile. Values and results are integers; the reported
    * quantile is the containing HDR bucket's LOWER BOUND at rank
    * ceil(q*n), which the DuckDB oracle replays exactly from the same
    * bucket formula. */
  def hdrQuantileHist(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    graft.functions.VectorFunctions.ensureRegistered(spark)
    def p(q: Double, name: String) =
      call_function("hdr_quantile", col("n_chars").cast("long"), lit(q)).as(name)
    docs.groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        p(0.5, "p50"), p(0.9, "p90"), p(0.99, "p99"))
  }

  /** DuckDB replay of [[hdrQuantileHist]]: identical HDR bucket math in
    * SQL — exponent via `length(printf('%b', x)) - 1`, bucket
    * ((e-K+1)<<K) | topKbits, lower bound reconstructed with the same
    * shifts (K = [[graft.functions.HdrHist.K]] = 4). */
  def hdrQuantileHistSql: String = hdrQuantileSqlOver(
    "SELECT lang AS grp, CAST(n_chars AS BIGINT) AS x FROM documents",
    grpOut = "lang", nOut = "n_docs")

  /** Shared HDR-quantile SQL over any `(grp, x BIGINT >= 0)` source —
    * also the oracle of the STREAMING bucket-state twin
    * ([[graft.streaming.EventStreams.streamingQuantileHist]]). */
  private[graft] def hdrQuantileSqlOver(valsSql: String, grpOut: String,
      nOut: String): String = {
    def lb(b: String) =
      s"CASE WHEN $b < 16 THEN $b ELSE (CAST(1 AS BIGINT) << " +
        s"CAST($b // 16 + 3 AS INTEGER)) | (($b % 16) << " +
        s"CAST($b // 16 - 1 AS INTEGER)) END"
    s"""WITH vals AS ($valsSql),
       |buck AS (
       |  SELECT grp,
       |    CASE WHEN x < 16 THEN x
       |         ELSE CAST((length(printf('%b', x)) - 4) * 16
       |              + ((x >> (length(printf('%b', x)) - 5)) & 15) AS BIGINT)
       |    END AS b
       |  FROM vals),
       |cnt AS (SELECT grp, b, COUNT(*) AS c FROM buck GROUP BY 1, 2),
       |cum AS (SELECT grp, b, c,
       |        CAST(SUM(c) OVER (PARTITION BY grp ORDER BY b) AS BIGINT) AS cm,
       |        CAST(SUM(c) OVER (PARTITION BY grp) AS BIGINT) AS n FROM cnt),
       |pick AS (
       |  SELECT grp, n,
       |    MIN(CASE WHEN cm >= ceil(0.5 * n) THEN b END) AS b50,
       |    MIN(CASE WHEN cm >= ceil(0.9 * n) THEN b END) AS b90,
       |    MIN(CASE WHEN cm >= ceil(0.99 * n) THEN b END) AS b99
       |  FROM cum GROUP BY grp, n)
       |SELECT grp AS $grpOut, n AS $nOut, ${lb("b50")} AS p50,
       |  ${lb("b90")} AS p90, ${lb("b99")} AS p99
       |FROM pick ORDER BY $grpOut""".stripMargin
  }

  /** HDR bucket of the non-negative BIGINT column `x` — the
    * [[graft.functions.HdrHist.bucketOf]] formula as codegen'd
    * expressions (exponent via `length(bin(x)) - 1`, Spark's spelling of
    * the oracle's printf('%b')). Input frame must expose columns `x`;
    * emits `b`. */
  private[graft] def withHdrBucket(df: DataFrame): DataFrame =
    df.withColumn("eb", (length(bin(col("x"))) - 1).cast("long"))
      .withColumn("b", when(col("x") < 16, col("x")).otherwise(
        (col("eb") - 3L) * 16L +
          expr("shiftright(x, CAST(eb - 4 AS INT)) % 16")))
      .drop("eb")

  /** Quantiles from a completed HDR bucket-count table `(grp, b, c)` —
    * the read side of the streaming sketch split. The cumulative window
    * runs over the BOUNDED bucket table (groups x <=960 rows), never
    * event-scale data. */
  private[graft] def quantilesFromBuckets(bc: DataFrame, grpOut: String,
      nOut: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cum = bc
      .withColumn("cm", sum("c").over(
        Window.partitionBy("grp").orderBy("b")))
      .withColumn("n", sum("c").over(Window.partitionBy("grp")))
    def pick(q: Double, name: String) =
      min(when(col("cm") >= ceil(lit(q) * col("n")), col("b"))).as(name)
    def lb(b: String, out: String) = expr(
      s"CASE WHEN $b < 16 THEN $b " +
        s"ELSE shiftleft(CAST(1 AS BIGINT), CAST($b DIV 16 + 3 AS INT)) | " +
        s"shiftleft($b % 16, CAST($b DIV 16 - 1 AS INT)) END").as(out)
    cum.groupBy(col("grp"), col("n"))
      .agg(pick(0.5, "b50"), pick(0.9, "b90"), pick(0.99, "b99"))
      .select(col("grp").as(grpOut), col("n").as(nOut),
        lb("b50", "p50"), lb("b90", "p90"), lb("b99", "p99"))
  }

  // --------------------------------------------- KMV / theta sketches
  /** Bottom-k size (k=256 → ~6% relative error, 2 KB buffers). */
  val KmvK = 256
  /** The 52-bit hash space bound: 16^13 = 2^52. */
  val KmvSpace = 4503599627370496L

  private def kmvSketches(events: DataFrame, grpCol: String,
      valCol: String): DataFrame = {
    val spark = events.sparkSession
    graft.functions.VectorFunctions.ensureRegistered(spark)
    events.groupBy(col(grpCol).as("grp"))
      .agg(
        call_function("kmv_sketch", col(valCol).cast("string"), lit(KmvK)).as("arr"),
        countDistinct(col(valCol)).as("n_exact"))
  }

  /** Per-group distinct estimate from the KMV sketch, with the exact
    * count alongside as the yardstick (the HLL query's contract). The
    * estimator is all-integer: exact below k, else
    * (k-1) * 2^52 DIV h_(k) — the classic KMV unbiased form on the
    * 52-bit hash space, identical integer division in DuckDB. */
  def kmvDistinct(events: DataFrame, grpCol: String = "event_type",
      valCol: String = "user_day"): DataFrame =
    kmvEstimateCols(kmvSketches(events, grpCol, valCol), grpCol)

  /** Read side of the sketch: (grp, arr, n_exact) → the estimator
    * columns. Split out so the STREAMING twin (bottom-k buffers as keyed
    * state) reads its completed sketches through the identical integer
    * estimator ([[graft.streaming.EventStreams.streamingKmvDistinct]]). */
  private[graft] def kmvEstimateCols(sk: DataFrame, grpCol: String): DataFrame =
    sk.select(col("grp").as(grpCol),
      when(size(col("arr")) < KmvK, size(col("arr")).cast("long"))
        .otherwise(expr(s"CAST((${KmvK - 1} * ${KmvSpace}L)" +
          s" DIV element_at(arr, $KmvK) AS BIGINT)")).as("n_est"),
      col("n_exact"))

  /** Pairwise distinct-INTERSECTION estimates between groups — the
    * theta-sketch operation HLL registers cannot express ("how many
    * users did both X and Y"). Both sketches clip to the shared
    * theta = least(theta_A, theta_B) (a sketch below k retains its whole
    * hash set, theta = 2^52), common hashes below theta are counted by
    * `array_intersect` on the tiny sorted arrays, and the count scales
    * by the sampled fraction: common * 2^52 DIV theta. Exact pair
    * overlap rides alongside as the yardstick. The pair join is
    * group-cardinality-sized (sketch rows), never event-scale. */
  def kmvIntersect(events: DataFrame, grpCol: String = "event_type",
      valCol: String = "user_day"): DataFrame = {
    val sk = kmvSketches(events, grpCol, valCol)
      .select(col("grp"), col("arr"),
        when(size(col("arr")) < KmvK, lit(KmvSpace))
          .otherwise(expr(s"element_at(arr, $KmvK)")).as("theta"))
    val pairs = sk.as("a").join(sk.as("b"), col("a.grp") < col("b.grp"))
      .select(col("a.grp").as("ga"), col("b.grp").as("gb"),
        least(col("a.theta"), col("b.theta")).as("th"),
        col("a.arr").as("aa"), col("b.arr").as("ba"))
      .withColumn("common", size(array_intersect(
        filter(col("aa"), _ < col("th")), filter(col("ba"), _ < col("th")))))
    // exact pairwise overlap: distinct (grp, val) self-joined on val —
    // the yardstick the estimate is judged against
    val dv = events.select(col(grpCol).as("grp"), col(valCol).as("v")).distinct()
    val exact = dv.as("x").join(dv.as("y"),
        col("x.v") === col("y.v") && col("x.grp") < col("y.grp"))
      .groupBy(col("x.grp").as("ga"), col("y.grp").as("gb"))
      .agg(count(lit(1)).as("exact_common"))
    pairs.select(col("ga").as("type_a"), col("gb").as("type_b"),
        expr(s"CAST((common * ${KmvSpace}L) DIV th AS BIGINT)").as("est_common"))
      .join(exact.select(col("ga").as("type_a"), col("gb").as("type_b"),
        col("exact_common")), Seq("type_a", "type_b"), "left")
      .na.fill(0L, Seq("exact_common"))
  }

  /** 52-bit md5-prefix hash in DuckDB: hex chars [1,8] << 20 | [9,13]
    * — the exact integer [[graft.functions.KmvSketchAgg]] computes. */
  private def kmvHash52Sql(e: String): String =
    // outer CAST: list_sum returns HUGEINT, which pandas reads as float64
    s"CAST(${OracleSql.hexVal(s"md5($e)", 1, 8)} * 1048576 + " +
      s"${OracleSql.hexVal(s"md5($e)", 9, 5)} AS BIGINT)"

  /** Active USER-DAY key — cardinality scales with the event log (so
    * the beyond-k estimator path is exercised at every sf), and "how
    * many user-days saw both X and Y" is the actual product question.
    * Spark `concat_ws("/", user_id, to_date(ts))` and this SQL render
    * identically ('<id>/yyyy-MM-dd'). */
  val KmvUserDaySql = "(user_id || '/' || CAST(CAST(ts AS DATE) AS VARCHAR))"

  /** The Spark-side twin of [[KmvUserDaySql]]. */
  def withUserDay(events: DataFrame): DataFrame =
    events.withColumn("user_day",
      concat_ws("/", col("user_id"), to_date(col("ts"))))

  private def kmvBottomKSql(grpCol: String, valCol: String): String =
    s"""hs AS (SELECT DISTINCT $grpCol AS grp,
       |  ${kmvHash52Sql(s"CAST($valCol AS VARCHAR)")} AS h FROM events),
       |bk AS (SELECT grp, h,
       |  row_number() OVER (PARTITION BY grp ORDER BY h) AS rn FROM hs
       |  QUALIFY rn <= $KmvK)""".stripMargin

  /** DuckDB replay of [[kmvDistinct]]: identical retained set (bottom-k
    * over the same 52-bit hashes), identical integer estimator. */
  def kmvDistinctSql(grpCol: String = "event_type",
      valCol: String = KmvUserDaySql): String =
    s"""WITH ${kmvBottomKSql(grpCol, valCol)},
       |agg AS (SELECT grp, max(rn) AS sz,
       |  max(CASE WHEN rn = $KmvK THEN h END) AS hk FROM bk GROUP BY grp),
       |ex AS (SELECT $grpCol AS grp, COUNT(DISTINCT $valCol) AS n_exact
       |  FROM events GROUP BY 1)
       |SELECT agg.grp AS $grpCol,
       |  CASE WHEN sz < $KmvK THEN sz
       |       ELSE (${KmvK - 1} * $KmvSpace) // hk END AS n_est,
       |  n_exact
       |FROM agg JOIN ex ON agg.grp = ex.grp
       |ORDER BY $grpCol""".stripMargin

  /** DuckDB replay of [[kmvIntersect]]: same clipped-sample count, same
    * integer scaling, same exact-overlap yardstick. */
  def kmvIntersectSql(grpCol: String = "event_type",
      valCol: String = KmvUserDaySql): String =
    s"""WITH ${kmvBottomKSql(grpCol, valCol)},
       |th AS (SELECT grp,
       |  CASE WHEN max(rn) < $KmvK THEN $KmvSpace
       |       ELSE max(CASE WHEN rn = $KmvK THEN h END) END AS theta
       |  FROM bk GROUP BY grp),
       |pr AS (SELECT a.grp AS ga, b.grp AS gb,
       |  least(a.theta, b.theta) AS t FROM th a JOIN th b ON a.grp < b.grp),
       |cm AS (SELECT pr.ga, pr.gb, pr.t,
       |  (SELECT COUNT(*) FROM bk x JOIN bk y ON x.h = y.h
       |   WHERE x.grp = pr.ga AND y.grp = pr.gb AND x.h < pr.t) AS common
       |  FROM pr),
       |dv AS (SELECT DISTINCT $grpCol AS grp, $valCol AS v FROM events),
       |ex AS (SELECT x.grp AS ga, y.grp AS gb, COUNT(*) AS exact_common
       |  FROM dv x JOIN dv y ON x.v = y.v AND x.grp < y.grp GROUP BY 1, 2)
       |SELECT cm.ga AS type_a, cm.gb AS type_b,
       |  (common * $KmvSpace) // t AS est_common,
       |  COALESCE(exact_common, 0) AS exact_common
       |FROM cm LEFT JOIN ex ON cm.ga = ex.ga AND cm.gb = ex.gb
       |ORDER BY type_a, type_b""".stripMargin

  // -------------------------------------------------------- winsorization
  /** Sketch-driven winsorization — the outlier-clipping cleaning pass a
    * feature/metrics pipeline runs before aggregation: per group, clip
    * values to the [p01, p99] cutoffs estimated by the SAME bounded
    * `hdr_quantile` aggregate the sketch family exposes (an EXACT
    * per-group percentile is a per-group sort; at 100 TB the histogram
    * cutoff — bucket lower bound, relative error < 2^-4 — is the
    * production trade, and the clip is a narrow codegen'd pass).
    *
    * Shape: ONE bounded-buffer aggregate pass (ObjectHashAggregate,
    * <= 960 bucket counts per group) -> cutoffs broadcast back -> narrow
    * LEAST/GREATEST map. The corpus shuffles once, for the aggregate's
    * map-side partials only. Integer cents end-to-end, so the DuckDB
    * bucket-math replay is a full hash oracle. */
  def winsorizedPrices(orders: DataFrame): DataFrame = {
    graft.functions.VectorFunctions.ensureRegistered(orders.sparkSession)
    val base = orders.select(col("o_orderkey"), col("o_orderpriority"),
      (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long").as("cents"))
    val cuts = base.groupBy("o_orderpriority").agg(
      call_function("hdr_quantile", col("cents"), lit(0.01)).as("lo"),
      call_function("hdr_quantile", col("cents"), lit(0.99)).as("hi"))
    base.join(broadcast(cuts), Seq("o_orderpriority"))
      .withColumn("clipped", least(greatest(col("cents"), col("lo")), col("hi")))
      .select("o_orderkey", "o_orderpriority", "cents", "lo", "hi", "clipped")
  }

  /** DuckDB replay of [[winsorizedPrices]]: the shared HDR bucket math
    * (exponent via printf('%b'), K = 4) at q = 0.01 / 0.99, joined back
    * and clipped with the identical LEAST/GREATEST. */
  def winsorizedPricesSql: String = {
    def lb(b: String) =
      s"CASE WHEN $b < 16 THEN $b ELSE (CAST(1 AS BIGINT) << " +
        s"CAST($b // 16 + 3 AS INTEGER)) | (($b % 16) << " +
        s"CAST($b // 16 - 1 AS INTEGER)) END"
    s"""WITH vals AS (
       |  SELECT o_orderkey, o_orderpriority AS grp,
       |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS x
       |  FROM orders),
       |buck AS (
       |  SELECT grp,
       |    CASE WHEN x < 16 THEN x
       |         ELSE CAST((length(printf('%b', x)) - 4) * 16
       |              + ((x >> (length(printf('%b', x)) - 5)) & 15) AS BIGINT)
       |    END AS b
       |  FROM vals),
       |cnt AS (SELECT grp, b, COUNT(*) AS c FROM buck GROUP BY 1, 2),
       |cum AS (SELECT grp, b, c,
       |        CAST(SUM(c) OVER (PARTITION BY grp ORDER BY b) AS BIGINT) AS cm,
       |        CAST(SUM(c) OVER (PARTITION BY grp) AS BIGINT) AS n FROM cnt),
       |pick AS (
       |  SELECT grp,
       |    MIN(CASE WHEN cm >= ceil(0.01 * n) THEN b END) AS blo,
       |    MIN(CASE WHEN cm >= ceil(0.99 * n) THEN b END) AS bhi
       |  FROM cum GROUP BY grp)
       |SELECT v.o_orderkey, v.grp AS o_orderpriority, v.x AS cents,
       |  ${lb("blo")} AS lo, ${lb("bhi")} AS hi,
       |  LEAST(GREATEST(v.x, ${lb("blo")}), ${lb("bhi")}) AS clipped
       |FROM vals v JOIN pick p ON v.grp = p.grp
       |ORDER BY v.o_orderkey""".stripMargin
  }
}
