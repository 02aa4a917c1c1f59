package graft.operators

import graft.Checkpoints.DatasetTruncate
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over near-duplicate pairs — the step every real
  * dedup pipeline needs after candidate generation: pair lists say "a ~ b",
  * but retention decisions need CLUSTERS ("keep one representative per
  * group"), and near-dup similarity is not transitive-closed by
  * construction (a~b, b~c does not output a~c), so the closure must be
  * computed.
  *
  * Algorithm: iterative min-label propagation. Every node starts labeled
  * with its own id; each round, a node's label becomes the minimum of its
  * own and its neighbors' labels (one equi-join + one min-aggregate — two
  * narrow-keyed shuffles per round). The fixpoint label is the minimum doc
  * id of the component, which doubles as the deterministic cluster
  * representative.
  *
  * Scale properties:
  *  - rounds needed = graph diameter. Dedup graphs are overwhelmingly
  *    clique-ish (clone clusters expand to all-pairs; near-dup groups are
  *    mutually similar), so diameter is tiny — single digits even on
  *    billion-doc corpora. The worst case (a long path) needs
  *    diameter rounds; production engines switch to large-star/small-star
  *    (Kiveris et al.) for O(log^2 n) guaranteed rounds — same join
  *    shape, IMPLEMENTED here as the [[LargeSmallStar]] strategy;
  *  - each round shuffles only (node, label) longs keyed by id — the edge
  *    list is never reshaped, and labels shrink nothing grows;
  *  - every round checkpoint-truncates its label table (Checkpoints seam), which cuts the
  *    logical plan. This is load-bearing, not hygiene: persist() alone
  *    caches data but Catalyst still re-analyzes the full accumulated
  *    tree, which references the previous round's plan three times — tree
  *    size grows ~3^rounds and planning time dwarfs execution within a
  *    few rounds (measured: 2-round run >100 s/round on a 50-pair graph;
  *    flat plans run the same rounds in well under a second). Truncation
  *    goes through the [[graft.Checkpoints]] seam: `local` blocks by
  *    default, reliable cluster-FS `checkpoint()` under
  *    `spark.graft.checkpoint.mode=reliable` (executor loss on a
  *    preemptible fleet must not drop label partitions);
  *  - convergence detection is FREE of extra shuffles: the previous label
  *    rides through the min-aggregate as a second column (the labels side
  *    contributes its own label as `prev`, neighbor rows contribute
  *    Long.MaxValue, and min() recovers it), so the changed-row count is
  *    a narrow filter over the already-checkpointed round output instead
  *    of a per-round join of old vs new labels.
  *
  * Output: (doc_id, component_id, component_size) for every document that
  * appears in at least one input pair; component_id = min doc id of the
  * component. Deterministic, hence fully oracle-able: DuckDB replays the
  * closure with a recursive CTE over the same pair set.
  */
object DedupComponents {

  /** Strategy flag for [[components]]: [[MinLabel]] (rounds = graph
    * diameter — right for the clique-ish graphs dedup produces) or
    * [[LargeSmallStar]] (Kiveris et al.'s alternating large-star /
    * small-star, O(log^2 n) guaranteed rounds — the escape hatch when the
    * pair graph may contain long paths, e.g. chained near-dups). Both
    * produce IDENTICAL output (property-tested on random graphs). */
  sealed trait Strategy
  case object MinLabel extends Strategy
  case object LargeSmallStar extends Strategy

  /** Below this vertex count the per-round label table broadcasts
    * (~16 B/vertex -> <= ~80 MB); above it the rounds fall back to a
    * shuffle-hash join into the dst-partitioned checkpointed edge layout,
    * where only the |V|-sized labels move. Mirrors
    * [[GraphAnalytics.BroadcastRanksMax]]. */
  private val BroadcastLabelsMax = 5000000L

  /** Components of the undirected pair graph. `pairs` must have long
    * columns doc_a, doc_b.
    *
    * Hybrid execution: when the pair set is small (probed with a BOUNDED
    * limit-count, never a full count of an unbounded set), the closure is
    * solved by driver-side union-find in one collect — identical output,
    * none of the per-round scheduling latency that dominates tiny graphs
    * (a 20-round fixpoint costs ~20 Spark job launches to label 50
    * pairs). Above the threshold the distributed strategies run
    * unchanged; dedup pair graphs after LSH banding are edge-sparse, so
    * the threshold covers the common case while the iterative path
    * remains the 100 TB contract. `localThreshold = 0` disables the
    * fallback (used by the diameter-proof tests). */
  /** Default [[components]] `localThreshold`, shared with callers that
    * run the hybrid branch themselves over a memoized layout. */
  val DefaultLocalThreshold = 100000

  def components(pairs: DataFrame, maxRounds: Int = 50,
      strategy: Strategy = MinLabel,
      localThreshold: Int = DefaultLocalThreshold): DataFrame = {
    if (localThreshold > 0 &&
        pairs.limit(localThreshold + 1).count() <= localThreshold)
      componentsLocal(pairs)
    else strategy match {
      case MinLabel => componentsMinLabel(pairs, maxRounds)
      case LargeSmallStar => componentsStar(pairs, maxRounds)._1
    }
  }

  /** Driver-side union-find over a collected pair list — exact same
    * output contract as the distributed strategies (component_id = min
    * member, every node appearing in a pair reported). */
  private def componentsLocal(pairs: DataFrame): DataFrame = {
    val spark = pairs.sparkSession
    import spark.implicits._
    val edges = pairs.select(col("doc_a").cast("long"), col("doc_b").cast("long"))
      .as[(Long, Long)].collect()
    val parent = scala.collection.mutable.HashMap.empty[Long, Long]
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
      var c = x
      while (parent.getOrElse(c, c) != c) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    edges.foreach { case (a, b) =>
      parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
      val (ra, rb) = (find(a), find(b))
      // union by MIN root so the representative is the component minimum
      if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
    }
    val byComp = parent.keys.toSeq.map(id => id -> find(id))
    val sizes = byComp.groupBy(_._2).map { case (c, xs) => c -> xs.size.toLong }
    byComp.sortBy(_._1)
      .map { case (id, c) => (id, c, sizes(c)) }
      .toDF("doc_id", "component_id", "component_size")
  }

  private def componentsMinLabel(pairs: DataFrame, maxRounds: Int): DataFrame =
    // eager localCheckpoint: materialized AND plan-truncated — both sides
    // of every per-round join are flat scans of checkpointed partitions.
    componentsMinLabelOnLayout(minLabelLayout(pairs).truncateLineage, maxRounds)

  /** The doubled, dst-hash-partitioned edge layout the min-label rounds
    * iterate over (r14): the per-round expansion joins `labels` into the
    * edge table on dst every round, and an un-laid-out edge list
    * re-exchanged (and re-sorted, under SMJ) all 2|E| rows per round.
    * LogicalRDD/InMemoryRelation preserve the partitioning, so with the
    * |V|-sized labels as the broadcast/hinted hash-build side each round
    * moves ONLY labels — the pagerank/BFS edge-layout discipline applied
    * to min-label. Split out so the query layer can build + persist it
    * once per data dir instead of per invocation. */
  private[graft] def minLabelLayout(pairs: DataFrame): DataFrame =
    pairs
      .select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .union(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
      .repartition(col("dst"))

  /** [[componentsMinLabel]] over a pre-built, already-materialized
    * [[minLabelLayout]] (checkpointed or persisted — the caller owns its
    * lifecycle; nothing here unpersists it). */
  private[graft] def componentsMinLabelOnLayout(edges: DataFrame,
      maxRounds: Int): DataFrame = {
    var labels = edges.select(col("src").as("id")).distinct()
      .withColumn("label", col("id"))
      .truncateLineage
    // |V| is CONSTANT across rounds (every vertex keeps a label row), so
    // the broadcast decision is made once. Checkpointed tables carry no
    // size statistics — without the explicit broadcast the planner can
    // never auto-broadcast the label table, and every round paid a full
    // 2|E| exchange+sort (r14; the pagerankInt BroadcastRanksMax
    // discipline applied to min-label).
    val nVerts = labels.count()

    var round = 0
    var converged = false
    while (!converged && round < maxRounds) {
      // neighbor rows carry prev = MaxValue; the (unique-per-id) labels row
      // carries prev = its current label, so min(prev) is the old label and
      // the convergence count needs no join against the previous round
      val labelsByDst = labels.select(col("id").as("dst"), col("label"))
      val labelSide =
        if (nVerts <= BroadcastLabelsMax) broadcast(labelsByDst)
        else labelsByDst.hint("shuffle_hash")
      val viaNeighbor = edges
        .join(labelSide, "dst")
        .select(col("src").as("id"), col("label"),
          lit(Long.MaxValue).as("prev"))
      val next = viaNeighbor
        .union(labels.select(col("id"), col("label"), col("label").as("prev")))
        .groupBy("id").agg(min("label").as("label"), min("prev").as("prev"))
        .truncateLineage
      val nChanged = next.filter(col("label") =!= col("prev")).count()
      labels = next.select("id", "label")
      converged = nChanged == 0
      round += 1
    }

    val sizes = labels.groupBy("label").agg(count(lit(1)).as("component_size"))
    labels.join(sizes, "label")
      .select(col("id").as("doc_id"), col("label").as("component_id"),
        col("component_size"))
  }

  // ---------------------------------------- large-star / small-star
  /** One large-star step over a canonical (a < b, distinct) edge set:
    * every directed copy (u, v) with v > u is rewired to
    * (min(Γ(u) ∪ {u}), v). Since m <= u < v, the output is canonical by
    * construction and never needs least/greatest. */
  private def largeStar(edges: DataFrame): DataFrame = {
    val d = edges.select(col("a").as("u"), col("b").as("v"))
      .union(edges.select(col("b").as("u"), col("a").as("v")))
    val mins = d.groupBy("u").agg(min("v").as("mn"))
      .select(col("u"), least(col("mn"), col("u")).as("m"))
    d.join(mins, "u")
      .filter(col("v") > col("u"))
      .select(col("m").as("a"), col("v").as("b"))
      .distinct()
      .truncateLineage
  }

  /** One small-star step: each node u rewires its SMALLER neighbors (and
    * itself) to their minimum m = min{v in Γ(u) : v < u}; self-loops
    * (v == m) drop. m <= v < u keeps the output canonical. */
  private def smallStar(edges: DataFrame): DataFrame = {
    val d = edges.select(col("a").as("u"), col("b").as("v"))
      .union(edges.select(col("b").as("u"), col("a").as("v")))
    val smaller = d.filter(col("v") < col("u"))
    val mins = smaller.groupBy("u").agg(min("v").as("m"))
    smaller.join(mins, "u")
      .select(col("m").as("a"), col("v").as("b"))
      .filter(col("a") =!= col("b"))
      .union(mins.select(col("m").as("a"), col("u").as("b")))
      .distinct()
      .truncateLineage
  }

  /** Alternating large-star/small-star components (Kiveris et al.,
    * "Connected Components in MapReduce and Beyond"): each round is one
    * [[largeStar]] + one [[smallStar]]; the edge set converges to a
    * forest of stars centered at each component's minimum id in
    * O(log^2 n) rounds REGARDLESS of diameter — a 1000-node path needs
    * ~3 rounds here vs 999 min-label rounds (asserted in DedupSpec).
    * Same localCheckpoint plan-truncation discipline as min-label; each
    * step shuffles only canonical (long, long) edges, and the edge count
    * never grows (both stars map each input edge to exactly one output
    * edge before dedup).
    *
    * Returns (labels table, rounds used). Convergence = a full round
    * leaves the canonical edge set unchanged (count equality + empty
    * except — exact, no checksum shortcut). */
  private[graft] def componentsStar(pairs: DataFrame,
      maxRounds: Int = 50): (DataFrame, Int) = {
    var edges = pairs
      .filter(col("doc_a") =!= col("doc_b"))
      .select(least(col("doc_a"), col("doc_b")).as("a"),
        greatest(col("doc_a"), col("doc_b")).as("b"))
      .distinct()
      .truncateLineage

    var round = 0
    var converged = edges.isEmpty
    while (!converged && round < maxRounds) {
      val next = smallStar(largeStar(edges))
      converged = next.count() == edges.count() && next.except(edges).isEmpty
      edges = next
      round += 1
    }

    // at the fixpoint every edge is (component min, member); the min node
    // itself labels through the a-side union
    val labels = edges.select(col("b").as("id"), col("a").as("label"))
      .union(edges.select(col("a").as("id"), col("a").as("label")))
      .groupBy("id").agg(min("label").as("label"))
    val sizes = labels.groupBy("label").agg(count(lit(1)).as("component_size"))
    val out = labels.join(sizes, "label")
      .select(col("id").as("doc_id"), col("label").as("component_id"),
        col("component_size"))
    (out, round)
  }

  // ------------------------------------------------- quality retention
  /** Quality-ranked cluster RETENTION — the decision step a production
    * dedup pipeline runs after [[components]]: per near-dup cluster keep
    * the highest-QUALITY member (ties to the smaller doc_id), not the
    * smallest id — "first crawl wins" throws away the best copy when a
    * cleaner duplicate arrived later. Documents in no pair are singleton
    * clusters and always kept. Output: one row per document,
    * (doc_id, component_id, quality_score, keep).
    *
    * Shape at scale: the closure touches only PAIRED docs (tiny vs the
    * corpus); the quality score is a narrow per-row expression; the
    * per-cluster argmax is a window whose state is bounded by cluster
    * size, partitioned on component_id. Fully oracle-able — closure CTE
    * + the identical quality expression ([[retentionSql]]). */
  def retention(docs: DataFrame, pairs: DataFrame,
      strategy: Strategy = MinLabel): DataFrame = {
    val comp = components(pairs, strategy = strategy)
      .select(col("doc_id"), col("component_id"))
    val scored = docs.select(col("doc_id"),
      TextAnalysis.qualityScoreExpr.as("quality_score"))
    val clustered = scored.join(comp, Seq("doc_id"), "left")
      .withColumn("component_id",
        coalesce(col("component_id"), col("doc_id")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("component_id")
      .orderBy(col("quality_score").desc, col("doc_id").asc)
    clustered
      .withColumn("keep", row_number().over(w) === 1)
      .select(col("doc_id"), col("component_id"), col("quality_score"),
        col("keep"))
  }

  /** DuckDB replay of [[retention]] over the documents table. */
  def retentionSql(pairsSql: String): String =
    s"""WITH RECURSIVE ${closureCte(pairsSql)},
       |scored AS (SELECT doc_id, ${TextAnalysis.qualityScoreExprSql} AS quality_score
       |           FROM documents),
       |clustered AS (
       |  SELECT s.doc_id, COALESCE(c.component_id, s.doc_id) AS component_id,
       |         s.quality_score
       |  FROM scored s LEFT JOIN comp c ON s.doc_id = c.doc_id),
       |ranked AS (
       |  SELECT *, ROW_NUMBER() OVER (PARTITION BY component_id
       |    ORDER BY quality_score DESC, doc_id ASC) AS rn
       |  FROM clustered)
       |SELECT doc_id, component_id, quality_score, rn = 1 AS keep
       |FROM ranked ORDER BY doc_id""".stripMargin

  // ------------------------------------------------ leakage-free split
  /** GROUPED train/val/test split — the leakage guard every pretraining
    * split needs: a per-doc hash split (Sampling.trainValTestSplit) puts
    * ~10% of near-duplicate PAIRS across the train/test boundary, which
    * is test-set contamination by construction. Keying the split draw on
    * the dedup COMPONENT representative instead sends every member of a
    * near-dup cluster to the same side; docs in no pair key on
    * themselves (identical distribution to the plain split).
    *
    * The analogue in supervised ML is GroupKFold; at pretraining scale
    * the group is the near-dup cluster. Output: (doc_id, split).
    *
    * Shape at scale: [[components]] touches only PAIRED docs; one
    * broadcast-sized left join attaches representatives to the corpus
    * (pairs are a small fraction of docs in a cleaned corpus; if not,
    * the join is an ordinary key shuffle); the draw itself is the
    * narrow md5 filter of the sampling family. */
  def groupedSplit(docs: DataFrame, pairs: DataFrame,
      salt: String = "gsplit"): DataFrame = {
    val comp = components(pairs).select(col("doc_id"), col("component_id"))
    val u = Sampling.hashUnit(col("split_key"), salt)
    docs.select("doc_id").join(comp, Seq("doc_id"), "left")
      .withColumn("split_key", coalesce(col("component_id"), col("doc_id")))
      .select(col("doc_id"),
        when(u < 0.8, "train").when(u < 0.9, "val").otherwise("test").as("split"))
  }

  /** DuckDB replay of [[groupedSplit]]: closure CTE + the identical
    * md5 draw on the component representative. */
  def groupedSplitSql(pairsSql: String, salt: String = "gsplit"): String = {
    val u = Sampling.hashUnitSql("COALESCE(c.component_id, d.doc_id)", salt)
    s"""WITH RECURSIVE ${closureCte(pairsSql)}
       |SELECT d.doc_id,
       |  CASE WHEN $u < 0.8 THEN 'train'
       |       WHEN $u < 0.9 THEN 'val'
       |       ELSE 'test' END AS split
       |FROM documents d LEFT JOIN comp c ON d.doc_id = c.doc_id
       |ORDER BY d.doc_id""".stripMargin
  }

  /** [[closureCte]] for sibling operators composing the closure into
    * larger oracles (CorpusPipeline.trainCorpusSql). */
  private[operators] def closureCteSql(pairsSql: String): String =
    closureCte(pairsSql)

  /** Shared WITH-body (no WITH RECURSIVE keyword): transitive closure of
    * `pairsSql`'s pair set ending in CTE `comp(doc_id, component_id)`. */
  private def closureCte(pairsSql: String): String =
    s"""pairs AS ($pairsSql),
       |edges AS (
       |  SELECT doc_a AS src, doc_b AS dst FROM pairs
       |  UNION
       |  SELECT doc_b AS src, doc_a AS dst FROM pairs
       |),
       |reach(src, dst) AS (
       |  SELECT DISTINCT src, src FROM edges
       |  UNION
       |  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
       |),
       |comp AS (SELECT src AS doc_id, MIN(dst) AS component_id FROM reach GROUP BY src)""".stripMargin

  /** DuckDB oracle: recursive-CTE transitive closure over the same pair
    * set (`pairsSql` must yield doc_a, doc_b), then component = min
    * reachable node. Closure cost is fine at oracle scale; the Spark side
    * exists precisely because closure-by-enumeration is not. */
  def componentsSql(pairsSql: String): String =
    s"""WITH RECURSIVE ${closureCte(pairsSql)}
       |SELECT doc_id, component_id,
       |  COUNT(*) OVER (PARTITION BY component_id) AS component_size
       |FROM comp ORDER BY doc_id""".stripMargin

  /** Oracle for graphs with LARGE components, where [[componentsSql]]'s
    * reachability enumeration explodes (one |V|-node component =
    * |V|^2 reach rows — observed hanging on the 18.6k-node KG): the same
    * min-label iteration the Spark operator runs, unrolled `rounds`
    * times as MATERIALIZED CTEs. Each round every vertex takes the min
    * of its own and its neighbors' labels — |E| join rows per round,
    * |V| rows of state. Converges once `rounds` >= graph diameter
    * (label information flows one hop per round); callers must pick
    * `rounds` with margin for their graph family. */
  def componentsMinLabelSql(pairsSql: String, rounds: Int = 16): String = {
    val stepCtes = (1 to rounds).map { i =>
      val prev = s"l${i - 1}"
      s"""l$i AS MATERIALIZED (
         |  SELECT l.id, MIN(LEAST(l.label, COALESCE(nb.label, l.label))) AS label
         |  FROM $prev l
         |  LEFT JOIN edges e ON e.src = l.id
         |  LEFT JOIN $prev nb ON nb.id = e.dst
         |  GROUP BY l.id
         |)""".stripMargin
    }.mkString(",\n")
    s"""WITH pairs AS MATERIALIZED ($pairsSql),
       |edges AS MATERIALIZED (
       |  SELECT doc_a AS src, doc_b AS dst FROM pairs
       |  UNION
       |  SELECT doc_b AS src, doc_a AS dst FROM pairs
       |),
       |l0 AS MATERIALIZED (SELECT DISTINCT src AS id, src AS label FROM edges),
       |$stepCtes
       |SELECT id AS doc_id, label AS component_id,
       |  COUNT(*) OVER (PARTITION BY label) AS component_size
       |FROM l$rounds ORDER BY doc_id""".stripMargin
  }
}
