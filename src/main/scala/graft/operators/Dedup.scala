package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Document deduplication operators for a large-scale training-data
  * pipeline: exact (hash-groupBy), word n-gram Jaccard (inverted-index
  * join), MinHash+LSH (signature -> band -> bucket-join -> exact verify),
  * and SimHash (per-doc fingerprint -> bit-band candidates -> Hamming
  * verify).
  *
  * Scale design notes (the point of each spelling):
  *  - NOTHING here is O(n^2) in documents: candidate pairs always come
  *    from an equi-join (shared shingle / LSH bucket / bit band), which
  *    Catalyst executes as a shuffled hash join keyed by the token — the
  *    classic inverted-index pattern that survives 100 TB corpora;
  *  - the exact-Jaccard verify joins only candidate pairs back to shingle
  *    sets (semi-join pattern), so verification cost tracks candidate
  *    count, not corpus size;
  *  - hot shingles (stop-phrases) are the skew risk at scale: cap document
  *    frequency with `maxDocFreq` (drops shingles shared by more than that
  *    many docs — they generate quadratic candidate fan-out and carry no
  *    dedup signal). ON by default (cap 500): the testdata's max shingle
  *    doc-freq is 4 (measured, both SFs), so the oracle output is
  *    unchanged while production corpora get the protection.
  */
object Dedup {

  // --------------------------------------------------------------- exact
  /** Exact dedup via content-hash groupBy (SURVEY A1's distinct,
    * upgraded): one shuffle on md5(text), map-side partial agg. Returns
    * one row per distinct text: representative (min doc_id) + copy count.
    */
  def exact(docs: DataFrame): DataFrame =
    docs.groupBy(md5(col("text").cast("binary")).as("text_md5"))
      .agg(
        min(col("doc_id")).as("keep_doc_id"),
        count(lit(1)).as("n_copies"))

  val exactSql: String =
    """SELECT md5(text) AS text_md5, MIN(doc_id) AS keep_doc_id, COUNT(*) AS n_copies
      |FROM documents GROUP BY md5(text) ORDER BY keep_doc_id""".stripMargin

  // ------------------------------------------------------------ shingles
  /** (doc_id, shingle) pairs: distinct word n-grams per document. A doc
    * with fewer than n words yields one shingle (its whole text). */
  def shingles(docs: DataFrame, n: Int): DataFrame = {
    val words = split(trim(col("text")), "\\s+")
    // per-document dedup happens INSIDE the row (array_distinct before the
    // explode): same output as a global distinct on (doc_id, shingle) when
    // doc_id is a key — which it is at every call site — but a narrow
    // codegen'd map instead of a corpus-sized string shuffle.
    // NULL text has NO shingles: Spark's null-skipping `greatest` would
    // otherwise turn size(NULL)-n into 0 and mint a '' shingle — pairing
    // null docs with genuinely-empty ones — while the DuckDB replay's
    // NULL-propagating greatest() yields no rows; drop nulls to agree.
    docs.filter(col("text").isNotNull).select(
      col("doc_id"),
      explode(
        array_distinct(transform(
          sequence(lit(0), greatest(size(words) - n, lit(0))),
          i => concat_ws(" ", slice(words, i + 1, lit(n)))))).as("shingle"))
  }

  /** md5-derived signed 64-bit hash of a string column — the
    * engine-portable shingle KEY. Spark evaluates
    * `conv(first-16-md5-hex-chars, 16, -10)` (signed two's-complement,
    * all codegen'd built-ins); DuckDB replays the identical value via
    * [[OracleSql.hex64Signed]], and the JVM via [[md5Hash64]]. Keying on
    * this instead of `xxhash64` keeps shuffles on 8-byte longs AND makes
    * any hash collision hit both engines identically, so an oracle replay
    * can never silently diverge from the Spark side. */
  def hash64Col(c: Column): Column =
    conv(substring(md5(c.cast("binary")), 1, 16), 16, -10).cast("long")

  // ----------------------------------------- shared dedup-first machinery
  /** md5 clone clusters, shared by the Jaccard operators: members maps
    * every doc to its content hash; reps keep one representative (min
    * doc_id) per DISTINCT text with the cluster size. Both persisted —
    * released by [[expandPairs]]. */
  private def dedupClusters(docs: DataFrame): (DataFrame, DataFrame) = {
    val withMd5 = docs.select(col("doc_id"), col("text"),
      md5(col("text").cast("binary")).as("text_md5"))
    val members = withMd5.select(col("doc_id"), col("text_md5")).persist()
    val reps = withMd5.groupBy("text_md5")
      .agg(min(col("doc_id")).as("doc_id"), min(col("text")).as("text"),
        count(lit(1)).as("n_members"))
      .persist()
    (members, reps)
  }

  /** Expand representative pairs (doc_a, doc_b, n_common, n_union,
    * jaccard) to ALL member pairs, plus the intra-cluster pairs
    * (identical texts, jaccard exactly 1.0 at the rep's distinct-shingle
    * size — no recompute). Only CLONE clusters (n_members > 1) can add
    * pairs beyond the rep pairs themselves, so expansion touches clone
    * rows only; singleton reps pass through via coalesce with no
    * corpus-wide mapping join. The result is materialized eagerly so the
    * persisted intermediates (members, reps, and the caller's extras)
    * can be released.
    *
    * Count caveat: intra-cluster rows report UNCAPPED distinct-shingle
    * counts (identical texts are jaccard 1.0 under any cap); if a
    * caller's maxDocFreq cap actually binds, cross-cluster counts use
    * the capped universe — the pair SET is unaffected, only the count
    * columns mix definitions, and only on corpora where the cap fires
    * (the oracle corpora are far below it). */
  private def expandPairs(repPairs: DataFrame, members: DataFrame,
      reps: DataFrame, n: Int, alsoUnpersist: Seq[DataFrame]): DataFrame = {
    val spark = repPairs.sparkSession
    import spark.implicits._
    val cloneClusters = reps.filter(col("n_members") > 1)
    val cloneMembers = members.join(
      cloneClusters.select(col("text_md5"), col("doc_id").as("rep_id")), "text_md5")
      .select(col("rep_id"), col("doc_id").as("member_id"))
      .persist()

    val eA = cloneMembers.select(col("rep_id").as("rep_a"), col("member_id").as("m_a2"))
    val eB = cloneMembers.select(col("rep_id").as("rep_b"), col("member_id").as("m_b2"))
    val cross = repPairs
      .withColumnRenamed("doc_a", "rep_a").withColumnRenamed("doc_b", "rep_b")
      .join(eA, Seq("rep_a"), "left")
      .join(eB, Seq("rep_b"), "left")
      .withColumn("m_a", coalesce(col("m_a2"), col("rep_a")))
      .withColumn("m_b", coalesce(col("m_b2"), col("rep_b")))

    val cloneSizes = cloneClusters
      .select(col("text_md5"), col("text")).as[(String, String)]
      .map { case (h, text) => (h, distinctShingleCount(text, n).toLong) }
      .toDF("text_md5", "n_sh")
    val intra = members.join(cloneSizes, "text_md5")
      .select(col("text_md5"), col("doc_id"), col("n_sh"))
    val intraPairs = intra.as("x")
      .join(intra.as("y"),
        col("x.text_md5") === col("y.text_md5") && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("m_a"), col("y.doc_id").as("m_b"),
        col("x.n_sh").as("n_common"), col("x.n_sh").as("n_union"),
        lit(1.0).as("jaccard"))

    val out = cross
      .select(
        least(col("m_a"), col("m_b")).as("doc_a"),
        greatest(col("m_a"), col("m_b")).as("doc_b"),
        col("n_common"), col("n_union"), col("jaccard"))
      .union(intraPairs.select(
        least(col("m_a"), col("m_b")).as("doc_a"),
        greatest(col("m_a"), col("m_b")).as("doc_b"),
        col("n_common"), col("n_union"), col("jaccard")))
      .persist()
    out.count() // materialize so the intermediates below can be dropped
    (Seq(members, reps, cloneMembers) ++ alsoUnpersist).foreach(_.unpersist())
    out
  }

  // -------------------------------------------------- n-gram Jaccard join
  /** PPJoin-style prefix filter (Xiao et al., WWW'08; Bayardo et al.,
    * WWW'07): under a global total order on tokens, two sets with
    * J(A,B) >= tau must share a token within each set's first
    * ⌊(1−tau)·|set|⌋+1 tokens. Proof sketch: the length filter forces
    * |B| >= tau·|A|, so |A ∩ B| >= tau(|A|+|B|)/(1+tau) >= ⌈tau·|A|⌉;
    * a set missing all of its first |A|−⌈tau·|A|⌉+1 ordered tokens
    * cannot reach that overlap. Ordering by ascending document frequency
    * (ties by hash) puts the RAREST shingles in prefixes, minimizing
    * candidate fan-out: a boilerplate phrase shared by thousands of docs
    * lands at the back of every prefix and generates no candidates.
    *
    * Only the prefix rows are self-joined; candidates then pass the
    * symmetric length filter min >= tau·max before exact verification.
    * The 1e-9 nudges guard the float boundary in the UNSAFE direction
    * only (a prefix one row longer / a size pair kept is slower, never
    * wrong; shorter/dropped would lose true pairs).
    *
    * Returns distinct (doc_a < doc_b) candidate pairs. Package-visible so
    * the spec can assert the measured candidate reduction vs the naive
    * share-any-shingle join. */
  private[graft] def prefixCandidates(sh: DataFrame, dfTab: DataFrame,
      tau: Double): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byDoc = Window.partitionBy("doc_id")
    val ranked = sh.join(dfTab, "sh")
      .withColumn("n_sh", count(lit(1)).over(byDoc))
      .withColumn("rk", row_number().over(byDoc.orderBy(col("df"), col("sh"))))
    val prefix = ranked
      .filter(col("rk") <= floor(lit(1.0 - tau) * col("n_sh") + lit(1e-9)) + 1)
      .select(col("doc_id"), col("sh"), col("n_sh"))
    val pa = prefix.select(col("doc_id").as("doc_a"), col("sh"), col("n_sh").as("n_a"))
    val pb = prefix.select(col("doc_id").as("doc_b"), col("sh"), col("n_sh").as("n_b"))
    pa.join(pb, Seq("sh"))
      .filter(col("doc_a") < col("doc_b"))
      .filter(least(col("n_a"), col("n_b")).cast("double") >=
        lit(tau) * greatest(col("n_a"), col("n_b")) - lit(1e-9))
      .select("doc_a", "doc_b")
      .distinct()
  }

  /** All-pairs n-gram Jaccard >= tau over the DISTINCT texts (exact dedup
    * first, like minhashLsh — clone clusters cost one representative
    * each; their pairs come from the md5 equi-join in [[expandPairs]]).
    * Candidate pairs come from [[prefixCandidates]] — a PPJoin
    * prefix-filtered self-join on the shingle HASH (xxhash64 longs
    * shuffle ~5x less than shingle strings; a 64-bit collision would
    * merge two shingles with probability ~n_shingles^2/2^65 —
    * negligible) instead of the full inverted-index self-join, so join
    * volume tracks the prefix index (~(1−tau) of the shingle table) and
    * the shared-RARE-shingle pair count, not shared-ANY-shingle.
    * Candidates are then verified exactly: count shared shingles per
    * pair, |A ∩ B| / (|A| + |B| - |A ∩ B|). Output is integer-exact
    * (counts) plus the ratio, so Spark and DuckDB agree bit-for-bit —
    * the prefix filter is candidate-complete (see proof above), so the
    * oracle's naive spelling replays the identical pair set. */
  def ngramJaccard(docs: DataFrame, n: Int = 5, tau: Double = 0.5,
      maxDocFreq: Option[Int] = Some(500)): DataFrame = {
    val (members, reps) = dedupClusters(docs)
    // persisted: read by the df stats, the prefix ranking, BOTH verify
    // joins, and the sizes agg — without the cache the shingle explode +
    // distinct recomputes ~5x (measured: dominated the operator). Hashing
    // BEFORE the distinct keeps every shuffle in this operator on longs.
    val words = split(trim(col("text")), "\\s+")
    // null text: no shingles (same rule as `shingles()` — the
    // null-skipping greatest would otherwise mint a '' shingle and pair
    // the null rep with genuinely-empty docs, which the oracle never does)
    val sh0 = reps.filter(col("text").isNotNull).select(
      col("doc_id"),
      explode(transform(
        sequence(lit(0), greatest(size(words) - n, lit(0))),
        i => concat_ws(" ", slice(words, i + 1, lit(n))))).as("shingle"))
      .select(col("doc_id"), xxhash64(col("shingle")).as("sh"))
      .distinct()
      .persist()
    // one doc-frequency aggregate serves both the hot-shingle cap and the
    // prefix order
    val dfTab = sh0.groupBy("sh").agg(count(lit(1)).as("df")).persist()
    val sh = (maxDocFreq match {
      case Some(cap) =>
        val hot = dfTab.filter(col("df") > cap).select("sh")
        sh0.join(hot, Seq("sh"), "left_anti")
      case None => sh0
    }).persist()
    val candidates = prefixCandidates(sh, dfTab, tau)
    // exact verification bound to candidates: two hash joins against the
    // full shingle index + one agg — cost tracks candidate count
    val shA = sh.select(col("doc_id").as("doc_a"), col("sh").as("sh_a"))
    val shB = sh.select(col("doc_id").as("doc_b"), col("sh").as("sh_b"))
    val inter = candidates
      .join(shA, "doc_a")
      .join(shB, Seq("doc_b"))
      .filter(col("sh_a") === col("sh_b"))
      .groupBy("doc_a", "doc_b")
      .agg(count(lit(1)).as("n_common"))
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
    val sa = sizes.select(col("doc_id").as("doc_a"), col("n_sh").as("n_a"))
    val sb = sizes.select(col("doc_id").as("doc_b"), col("n_sh").as("n_b"))
    val repPairs = inter.join(sa, "doc_a").join(sb, "doc_b")
      .withColumn("n_union", col("n_a") + col("n_b") - col("n_common"))
      .withColumn("jaccard",
        round(col("n_common").cast("double") / col("n_union"), 6))
      .filter(col("jaccard") >= tau)
      .select("doc_a", "doc_b", "n_common", "n_union", "jaccard")
    expandPairs(repPairs, members, reps, n, Seq(sh0, dfTab, sh))
  }

  /** Full replay of the dedup-first ngramJaccard pipeline, INCLUDING the
    * maxDocFreq cap — exact dedup over distinct texts, hot-shingle drop
    * (doc-frequency counted over REPRESENTATIVES, matching the Spark
    * side), inverted-index Jaccard over reps, then expansion to member
    * pairs plus intra-cluster pairs (uncapped sizes, see expandPairs).
    * Validated identical to the direct uncapped all-docs spelling on the
    * testdata (where neither the cap nor clone expansion changes
    * anything). */
  def ngramJaccardSql(n: Int = 5, tau: Double = 0.5,
      maxDocFreq: Option[Int] = Some(500)): String = {
    val capFilter = maxDocFreq.map(c => s"WHERE df <= $c").getOrElse("")
    s"""WITH reps AS (SELECT min(doc_id) AS doc_id, text FROM documents GROUP BY text),
       |members AS (SELECT d.doc_id AS member_id, r.doc_id AS rep_id
       |            FROM documents d JOIN reps r ON d.text = r.text),
       |sh0 AS (
       |  SELECT DISTINCT doc_id, array_to_string(w[i:i+${n - 1}], ' ') AS shingle
       |  FROM (SELECT doc_id, w, unnest(range(1, greatest(len(w) - ${n - 1}, 1) + 1)) AS i
       |        FROM (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w FROM reps))
       |), sh AS (
       |  SELECT doc_id, shingle FROM (
       |    SELECT doc_id, shingle, COUNT(*) OVER (PARTITION BY shingle) AS df FROM sh0)
       |  $capFilter
       |), sizes AS (
       |  SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id
       |), sizes0 AS (
       |  SELECT doc_id, COUNT(*) AS n_sh FROM sh0 GROUP BY doc_id
       |), inter AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
       |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2
       |), rep_pairs AS (
       |  SELECT doc_a, doc_b, n_common,
       |    sa.n_sh + sb.n_sh - n_common AS n_union,
       |    ROUND(CAST(n_common AS DOUBLE) / (sa.n_sh + sb.n_sh - n_common), 6) AS jaccard
       |  FROM inter
       |  JOIN sizes sa ON doc_a = sa.doc_id
       |  JOIN sizes sb ON doc_b = sb.doc_id
       |  WHERE ROUND(CAST(n_common AS DOUBLE) / (sa.n_sh + sb.n_sh - n_common), 6) >= $tau
       |), cross_pairs AS (
       |  SELECT least(ma.member_id, mb.member_id) AS doc_a,
       |         greatest(ma.member_id, mb.member_id) AS doc_b,
       |         p.n_common, p.n_union, p.jaccard
       |  FROM rep_pairs p
       |  JOIN members ma ON p.doc_a = ma.rep_id
       |  JOIN members mb ON p.doc_b = mb.rep_id
       |), intra_pairs AS (
       |  SELECT x.member_id AS doc_a, y.member_id AS doc_b,
       |         s.n_sh AS n_common, s.n_sh AS n_union, 1.0 AS jaccard
       |  FROM members x
       |  JOIN members y ON x.rep_id = y.rep_id AND x.member_id < y.member_id
       |  JOIN sizes0 s ON s.doc_id = x.rep_id
       |)
       |SELECT * FROM cross_pairs UNION ALL SELECT * FROM intra_pairs
       |ORDER BY doc_a, doc_b""".stripMargin
  }

  // ------------------------------------------------------- MinHash + LSH
  /** MinHash signatures + banded LSH + exact-Jaccard verification, with
    * exact dedup run FIRST so the expensive stages only ever see distinct
    * texts.
    *
    * Pipeline: md5-groupBy picks one representative per distinct text ->
    * shingle the representatives -> hash family member j =
    * xxhash64(shingle, j) (ANSI-safe: no wraparound arithmetic) -> 64
    * minima per rep (one hash-groupBy, 64 codegen'd min aggregates) ->
    * split into `bands` band signatures -> explode -> bucket-join on
    * (band_idx, band_hash) for candidates -> exact Jaccard verify ->
    * expand representative pairs back to ALL member pairs (equi-joins on
    * text_md5), plus the intra-cluster pairs (identical texts, jaccard
    * exactly 1.0, no recompute).
    *
    * Scale properties:
    *  - exact-dedup-first kills the classic LSH blow-up: a cluster of m
    *    identical documents shares every band, so without dedup it alone
    *    generates m^2/2 candidates through all 16 bands; with dedup it
    *    costs ONE signature and the m^2/2 output pairs (inherent to the
    *    output contract) are produced by a cheap md5 equi-join instead;
    *  - `maxBucket` drops degenerate LSH buckets wider than the cap
    *    (near-identical boilerplate at corpus scale): candidate fan-out
    *    is bounded by bands * n_buckets * maxBucket^2 instead of
    *    quadratic in the corpus. At the default the testdata is far
    *    below the cap, so oracle output is unchanged;
    *  - the banded signature table is persisted and materialized once —
    *    the bucket self-join would otherwise recompute the whole
    *    signature aggregation for each side (measured 2x on sf0.1);
    *  - intermediates are unpersisted before returning: the result
    *    (small: near-dup pairs) is itself persisted eagerly instead.
    *
    * Because candidates are verified exactly, the output equals the exact
    * all-pairs result restricted to LSH-recalled pairs; with
    * 64 hashes / 16 bands x 4 rows, recall at j >= 0.8 is > 1 - 1e-6,
    * which is why the exact-Jaccard SQL serves as its oracle on testdata
    * (planted near-dup pairs all have j >= 0.87; background pairs are
    * <= 0.02 — measured, see DedupSpec).
    */
  def minhashLsh(docs: DataFrame, n: Int = 5, numHashes: Int = 64,
      bands: Int = 16, tau: Double = 0.5, seed: Long = 42L,
      maxBucket: Int = 5000): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rowsPerBand = numHashes / bands

    // ---- 1. exact dedup: one md5 shuffle; LSH sees distinct texts only
    val (members, reps) = dedupClusters(docs)

    // ---- 2. LSH over representatives: signatures in ONE narrow pass.
    // Per doc: distinct shingles -> 64 minima (seeded splitmix family over
    // one base hash per shingle) -> 16 band hashes, all inside a single
    // mapPartitions — no shingle explode, no 1M-row distinct shuffle, no
    // 64-aggregate groupBy (which also cost seconds of codegen compile).
    // Signature hash values never surface in the output (candidates are
    // verified with exact Jaccard), so a JVM-stable hash is sufficient.
    val spark = docs.sparkSession
    import spark.implicits._
    // null text = no shingles = no signature (the relational `shingles()`
    // and the DuckDB replay both drop null docs the same way) — such docs
    // stay in `members` as exact-dup singletons but cannot near-match
    val banded = reps.select(col("doc_id"), col("text"))
      .filter(col("text").isNotNull).as[(Long, String)]
      .mapPartitions { it =>
        it.flatMap { case (id, text) =>
          val mins = minhashSignature(text, n, numHashes, seed)
          (0 until bands).map { b =>
            var h = seed
            var r = 0
            while (r < rowsPerBand) { h = mix64(h ^ mins(b * rowsPerBand + r)); r += 1 }
            (id, b, h)
          }
        }
      }
      .toDF("doc_id", "band_idx", "band_hash")
      .persist()

    val hot = banded.groupBy("band_idx", "band_hash").count()
      .filter(col("count") > maxBucket).select("band_idx", "band_hash")
    val pruned = banded.join(hot, Seq("band_idx", "band_hash"), "left_anti")
    val left = pruned.select(col("doc_id").as("doc_a"), col("band_idx"), col("band_hash"))
    val right = pruned.select(col("doc_id").as("doc_b"), col("band_idx"), col("band_hash"))
    val candidates = left.join(right, Seq("band_idx", "band_hash"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b")
      .distinct()
      .persist()

    // exact-Jaccard verify needs the shingle index ONLY for docs that
    // appear in some candidate pair — a broadcast semi-join keeps the
    // explode+distinct confined to that small set
    val candDocs = candidates.select(col("doc_a").as("doc_id"))
      .union(candidates.select(col("doc_b").as("doc_id"))).distinct()
    val sh = shingles(
      reps.join(broadcast(candDocs), Seq("doc_id"), "left_semi")
        .select("doc_id", "text"), n).persist()

    val repPairs = verifyJaccard(candidates, sh, tau)

    // ---- 3. expand representative pairs to member pairs (shared helper;
    // eagerly materializes and releases every persisted intermediate)
    expandPairs(repPairs, members, reps, n, Seq(sh, banded, candidates))
  }

  // --------------------------------------- minhash JVM-side hash helpers
  /** splitmix64 finalizer — JVM-stable mixing for the minhash family. */
  private def mix64(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** FNV-1a over UTF-16 code units + splitmix finalize: a JVM-stable
    * string hash. Minhash signature values never reach the output (exact
    * verify decides), so the only requirements are determinism across
    * executors and decent mixing. */
  private def stableHash64(s: String): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < s.length) { h ^= s.charAt(i).toLong; h *= 0x100000001b3L; i += 1 }
    mix64(h)
  }

  /** Space-only trim matching Spark's `trim()` and DuckDB's `trim()`.
    * `String.trim` strips every char <= 0x20 (tabs, newlines) — a doc
    * starting with "\t" would shingle differently in the JVM helpers than
    * in the relational/SQL paths they must agree with bit-for-bit. */
  private[operators] def trimSpaces(s: String): String = {
    var b = 0
    var e = s.length
    while (b < e && s.charAt(b) == ' ') b += 1
    while (e > b && s.charAt(e - 1) == ' ') e -= 1
    if (b == 0 && e == s.length) s else s.substring(b, e)
  }

  /** Streams the DISTINCT word n-grams of one text — the per-doc
    * equivalent of `shingles()` (same trim/split/truncation semantics,
    * asserted equal in DedupSpec-style tests). */
  private def foreachDistinctShingle(text: String, n: Int)(f: String => Unit): Unit = {
    val words = trimSpaces(text).split("\\s+", -1)
    val m = math.max(words.length - n, 0) + 1
    val seen = new java.util.HashSet[String]()
    var i = 0
    while (i < m) {
      val end = math.min(i + n, words.length)
      val sb = new java.lang.StringBuilder
      var j = i
      while (j < end) { if (j > i) sb.append(' '); sb.append(words(j)); j += 1 }
      val g = sb.toString
      if (seen.add(g)) f(g)
      i += 1
    }
  }

  /** numHashes minima over the seeded splitmix family — one narrow pass
    * over the doc's distinct shingles. */
  def minhashSignature(text: String, n: Int, numHashes: Int, seed: Long): Array[Long] = {
    val mins = Array.fill(numHashes)(Long.MaxValue)
    foreachDistinctShingle(text, n) { g =>
      val h0 = stableHash64(g)
      var j = 0
      while (j < numHashes) {
        val hj = mix64(h0 ^ (seed + j * 0x9E3779B97F4A7C15L))
        if (hj < mins(j)) mins(j) = hj
        j += 1
      }
    }
    mins
  }

  /** Distinct-shingle count of one text (= per-doc row count of
    * `shingles()`). */
  def distinctShingleCount(text: String, n: Int): Int = {
    var c = 0
    foreachDistinctShingle(text, n)(_ => c += 1)
    c
  }

  /** Exact-Jaccard verification restricted to candidate pairs: two hash
    * joins against the shingle index + one agg — cost tracks candidates,
    * not corpus. */
  private def verifyJaccard(candidates: DataFrame, sh: DataFrame, tau: Double): DataFrame = {
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
    val shA = sh.select(col("doc_id").as("doc_a"), col("shingle").as("sh_a"))
    val shB = sh.select(col("doc_id").as("doc_b"), col("shingle").as("sh_b"))
    val inter = candidates
      .join(shA, "doc_a")
      .join(shB, Seq("doc_b"))
      .filter(col("sh_a") === col("sh_b"))
      .groupBy("doc_a", "doc_b")
      .agg(count(lit(1)).as("n_common"))
    val sa = sizes.select(col("doc_id").as("doc_a"), col("n_sh").as("n_a"))
    val sb = sizes.select(col("doc_id").as("doc_b"), col("n_sh").as("n_b"))
    inter.join(sa, "doc_a").join(sb, "doc_b")
      .withColumn("n_union", col("n_a") + col("n_b") - col("n_common"))
      .withColumn("jaccard",
        round(col("n_common").cast("double") / col("n_union"), 6))
      .filter(col("jaccard") >= tau)
      .select("doc_a", "doc_b", "n_common", "n_union", "jaccard")
  }

  // ------------------------------------------------------------- SimHash
  /** 64-bit term hash = first 8 md5 bytes (big-endian, signed). Stable
    * across JVMs AND replayable in DuckDB SQL ([[OracleSql.hex64Signed]]),
    * which is what lets simhashPairs carry a full value-hash oracle. */
  def md5Hash64(md: java.security.MessageDigest, s: String): Long = {
    md.reset()
    val d = md.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    var h = 0L
    var i = 0
    while (i < 8) { h = (h << 8) | (d(i) & 0xffL); i += 1 }
    h
  }

  def simhash64(terms: Iterator[String]): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val acc = new Array[Int](64)
    terms.foreach { term =>
      val h = md5Hash64(md, term)
      var bit = 0
      while (bit < 64) {
        if (((h >>> bit) & 1L) == 1L) acc(bit) += 1 else acc(bit) -= 1
        bit += 1
      }
    }
    var sig = 0L
    var bit = 0
    while (bit < 64) {
      if (acc(bit) > 0) sig |= (1L << bit)
      bit += 1
    }
    sig
  }

  /** Per-doc 64-bit SimHash over distinct word n-grams — a single narrow
    * map, no shuffle (each doc is fingerprinted independently;
    * embarrassingly parallel at any scale). n-gram features rather than
    * unigrams: with a small shared vocabulary, unigram sets are nearly
    * identical across documents and carry no signal. */
  def simhashSignatures(docs: DataFrame, n: Int = 5): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("text"))
      // null text = no terms = no signature, matching the SQL replay's
      // shingle-table absence (minhashLsh applies the same rule)
      .filter(col("text").isNotNull).as[(Long, String)]
      .map { case (id, text) =>
        // trimSpaces, not String.trim: must shingle identically to the
        // SQL replay (simhashPairsSql trims spaces only)
        val words = trimSpaces(text).split("\\s+", -1)
        val grams = (0 to math.max(words.length - n, 0)).iterator
          .map(i => words.slice(i, i + n).mkString(" "))
        (id, simhash64(grams.distinct))
      }
      .toDF("doc_id", "simhash")
  }

  /** SimHash near-dup pairs via block-PAIR keys (Manku et al.'s simhash
    * blocking): split the 64-bit signature into 8 blocks of 8 bits; a
    * candidate key is the concatenation of two blocks — C(8,2) = 28 keys
    * of 16 bits each. Pigeonhole: d <= 6 errors touch at most 6 blocks,
    * leaving an untouched PAIR, so candidate generation is EXACT for
    * maxHamming <= 6. Single 8-bit blocks would be exact to d <= 7 but
    * have only 256 distinct values — every bucket holds |corpus|/256
    * docs and candidates grow quadratically; 16-bit pair keys keep
    * buckets selective at scale. Candidates are verified with exact
    * Hamming anyway. */
  def simhashPairs(docs: DataFrame, maxHamming: Int = 6): DataFrame = {
    require(maxHamming <= 6, "block-pair keys are exact only to Hamming 6")
    val sig = simhashSignatures(docs)
    val pairKeys = for (i <- 0 until 8; j <- (i + 1) until 8) yield {
      val bi = shiftrightunsigned(col("simhash"), i * 8).bitwiseAND(lit(0xFFL))
      val bj = shiftrightunsigned(col("simhash"), j * 8).bitwiseAND(lit(0xFFL))
      shiftleft(bi, 8).bitwiseOR(bj)
    }
    val banded = sig.select(
      col("doc_id"), col("simhash"),
      posexplode(array(pairKeys: _*)).as(Seq("band_idx", "band_bits")))
    val l = banded.select(col("doc_id").as("doc_a"), col("simhash").as("sig_a"),
      col("band_idx"), col("band_bits"))
    val r = banded.select(col("doc_id").as("doc_b"), col("simhash").as("sig_b"),
      col("band_idx"), col("band_bits"))
    l.join(r, Seq("band_idx", "band_bits"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b", "sig_a", "sig_b")
      .distinct()
      .withColumn("hamming", bit_count(col("sig_a").bitwiseXOR(col("sig_b"))))
      .filter(col("hamming") <= maxHamming)
      .select(col("doc_a"), col("doc_b"), col("hamming").cast("long").as("hamming"))
  }

  /** DuckDB oracle for simhashPairs: replays the md5-term simhash
    * signature in SQL, then checks ALL pairs with exact Hamming — valid
    * because block-pair banding is candidate-EXACT for Hamming <= 6
    * (pigeonhole, see simhashPairs), so banded Spark output == all-pairs
    * SQL output. */
  def simhashPairsSql(n: Int = 5, maxHamming: Int = 6): String = {
    val h64 = OracleSql.hex64Signed("md5(gram)")
    s"""WITH words AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w FROM documents),
       |grams AS (
       |  SELECT DISTINCT doc_id, array_to_string(w[i:i+${n - 1}], ' ') AS gram
       |  FROM (SELECT doc_id, w, unnest(range(1, greatest(len(w)-${n - 1},1)+1)) AS i FROM words)
       |),
       |ghash AS (SELECT doc_id, $h64 AS h FROM grams),
       |bits AS (
       |  SELECT doc_id, b, SUM(CASE WHEN (h >> CAST(b AS INTEGER)) & 1 = 1 THEN 1 ELSE -1 END) AS acc
       |  FROM ghash CROSS JOIN (SELECT unnest(range(0,64)) AS b)
       |  GROUP BY doc_id, b
       |),
       |sig AS (
       |  SELECT doc_id, CAST(SUM(CASE
       |      WHEN acc <= 0 THEN 0
       |      WHEN b = 63 THEN -9223372036854775808
       |      ELSE (CAST(1 AS BIGINT) << CAST(b AS INTEGER)) END) AS BIGINT) AS sig
       |  FROM bits GROUP BY doc_id
       |)
       |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |       CAST(bit_count(xor(a.sig, b.sig)) AS BIGINT) AS hamming
       |FROM sig a JOIN sig b ON a.doc_id < b.doc_id
       |WHERE bit_count(xor(a.sig, b.sig)) <= $maxHamming
       |ORDER BY doc_a, doc_b""".stripMargin
  }

  // ---------------------------------------------- paragraph-level dedup
  /** Paragraph-level dedup with document RECONSTRUCTION — the CCNet /
    * RefinedWeb boilerplate-removal step, distinct from whole-document
    * dedup above: segment each document into consecutive non-overlapping
    * `parWords`-word chunks ("paragraphs" — the corpus has no newline
    * structure, so segmentation is positional), count each chunk's
    * corpus-wide DOCUMENT frequency by the md5-derived 64-bit hash, drop
    * every chunk shared by more than `maxDf` documents (cross-document
    * boilerplate — headers, licence blocks, navigation), and reassemble
    * the surviving chunks in original order.
    *
    * Output per doc (integer/string only — full hash oracle, replayed by
    * [[paragraphDedupSql]]): n_pars, n_dup_pars removed, kept_chars and
    * kept_md5 of the reconstructed text (md5('') when everything was
    * boilerplate). Within-doc repeats of a globally-unique chunk are
    * KEPT — that is `repetition`'s signal, not boilerplate.
    *
    * Scale shape: chunking is a narrow codegen'd explode whose output
    * volume EQUALS corpus volume (non-overlapping chunks — no k-fold
    * blowup, unlike k-gram explodes); the doc-frequency aggregate on the
    * 8-byte hash is map-side combinable and is the first of two
    * corpus-volume shuffles; the duplicated-chunk set flows back as a
    * LEFT ANTI equi-join on the hash (far smaller than the corpus by
    * Zipf — AQE broadcasts it while it fits); the groupBy-doc_id
    * reassembly is the second shuffle, the unavoidable price of
    * reconstruction (a counts-only variant would skip it, but the
    * cleaned text is the product). */
  def paragraphDedup(docs: DataFrame, parWords: Int = 10, maxDf: Int = 1): DataFrame = {
    val words = split(trim(col("text")), "\\s+")
    // ceil(len/parWords) chunks; split('') = [''] so every doc has >= 1
    val nPars = floor((size(words) + lit(parWords - 1)) / lit(parWords)).cast("long")
    val pars = transform(
      sequence(lit(0), (nPars - 1).cast("int")),
      c => concat_ws(" ", slice(words, c * parWords + 1, lit(parWords))))

    // ONE corpus pass (r12, the dup-span tally discipline): n_pars rides
    // the persisted positional chunk tally, explode_outer keeps
    // chunkless (null-text) docs as a null row for the base rollup —
    // null chunks never group-join (h null) and are filtered out of the
    // reassembly side explicitly (an anti join KEEPS null keys).
    val tally = docs
      .select(col("doc_id"), nPars.as("n_pars"),
        posexplode_outer(pars).as(Seq("pos", "par")))
      .select(col("doc_id"), col("n_pars"), col("pos"), col("par"),
        hash64Col(col("par")).as("h"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      .transform(graft.CacheScope.register)
    val base = tally.groupBy("doc_id").agg(max("n_pars").as("n_pars"))

    val dup = tally.groupBy("h")
      .agg(countDistinct(col("doc_id")).as("df"))
      .filter(col("df") > maxDf)
      .select("h")
    val kept = tally.where(col("par").isNotNull)
      .join(dup, Seq("h"), "left_anti")
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_kept"),
        array_join(
          transform(
            array_sort(collect_list(struct(col("pos"), col("par")))),
            s => s.getField("par")),
          " ").as("kept_text"))

    base.join(kept, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        col("n_pars"),
        (col("n_pars") - coalesce(col("n_kept"), lit(0L))).as("n_dup_pars"),
        coalesce(length(col("kept_text")), lit(0)).cast("long").as("kept_chars"),
        md5(coalesce(col("kept_text"), lit("")).cast("binary")).as("kept_md5"))
  }

  /** DuckDB replay of [[paragraphDedup]]: identical positional chunking,
    * identical md5-derived hash, identical reassembly order. */
  def paragraphDedupSql(parWords: Int = 10, maxDf: Int = 1): String = {
    val h = OracleSql.hex64Signed("md5(par)")
    val p = parWords
    s"""WITH words AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w FROM documents),
       |base AS (SELECT doc_id, CAST((len(w) + ${p - 1}) // $p AS BIGINT) AS n_pars FROM words),
       |pars AS (
       |  SELECT doc_id, c AS pos, array_to_string(w[c*$p+1 : c*$p+$p], ' ') AS par
       |  FROM (SELECT doc_id, w, unnest(range(0, (len(w) + ${p - 1}) // $p)) AS c FROM words)),
       |hashed AS (SELECT doc_id, pos, par, $h AS h FROM pars),
       |dup AS (SELECT h FROM (
       |    SELECT h, COUNT(DISTINCT doc_id) AS df FROM hashed GROUP BY h)
       |  WHERE df > $maxDf),
       |kept AS (
       |  SELECT doc_id, COUNT(*) AS n_kept,
       |         string_agg(par, ' ' ORDER BY pos) AS kept_text
       |  FROM hashed WHERE h NOT IN (SELECT h FROM dup) GROUP BY doc_id)
       |SELECT b.doc_id, b.n_pars,
       |  CAST(b.n_pars - COALESCE(k.n_kept, 0) AS BIGINT) AS n_dup_pars,
       |  CAST(COALESCE(len(k.kept_text), 0) AS BIGINT) AS kept_chars,
       |  md5(COALESCE(k.kept_text, '')) AS kept_md5
       |FROM base b LEFT JOIN kept k ON b.doc_id = k.doc_id
       |ORDER BY b.doc_id""".stripMargin
  }
}
