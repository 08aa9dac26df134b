package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Graph analytics beyond degree/components: PageRank on the entity
  * interaction graph (Page et al. 1999; the Pregel/GraphX formulation
  * re-expressed as DataFrame joins — no GraphX dependency, the plan IS
  * the message-passing round).
  *
  * Exact replayability: ranks are fixed-point Longs (SCALE = 10^12 mass
  * units). Every per-iteration op — contribution `p div outdeg`, damped
  * update `teleport + (85·Σcontrib) div 100` — is integer division, so
  * DuckDB replays all rounds bit-for-bit (the q_kmeans/q_pca_top
  * pattern; a float PageRank would pin the fold order instead).
  * Σ mass drifts slightly below SCALE from the floors — fine, the
  * ORDER is the contract, and the floors are identical on both engines.
  *
  * Scale posture — the classic distributed PageRank shape:
  *   - edges build once from orders ⋈ lineitem (shuffle on orderkey),
  *     deduplicate, symmetrize, and persist; every node of the
  *     symmetrized graph has outdeg ≥ 1, so there is no dangling-mass
  *     correction term to carry.
  *   - each round is ONE shuffle: contributions map-side (edge ⋈ rank
  *     frame on src — rank frame is node-cardinality, broadcast-class
  *     next to edges), then a map-side-combined sum by dst. Nothing
  *     edge-cardinality persists across rounds.
  *   - the only driver value is the node count (one scalar); ranks stay
  *     distributed. Iteration count bounds total cost at `iters` edge
  *     passes; beyond ~8 rounds add localCheckpoint every 4 (the X12
  *     lineage rule) — at 3 rounds lineage is shallow.
  */
object Graph {

  private val SCALE = 1000000000000L // 10^12 fixed-point mass units

  /** Symmetrized distinct customer↔supplier edges ("c:<id>" / "s:<id>"
    * nodes) from who-bought-from-whom (orders ⋈ lineitem).
    */
  def interactionEdges(s: SparkSession, d: String): DataFrame = {
    val half = Tables.orders(s, d).select("o_orderkey", "o_custkey")
      .join(Tables.lineitem(s, d).select("l_orderkey", "l_suppkey"),
        col("o_orderkey") === col("l_orderkey"))
      .select(concat(lit("c:"), col("o_custkey")).as("src"),
        concat(lit("s:"), col("l_suppkey")).as("dst"))
      .distinct()
    // symmetrize map-side (explode both directions of each distinct edge):
    // a union of two `half` branches would re-run the scan+join+distinct
    // twice — measured in the r8 plan audit before this shape
    half.select(explode(array(
        struct(col("src"), col("dst")),
        struct(col("dst").as("src"), col("src").as("dst")))).as("e"))
      .select(col("e.src"), col("e.dst"))
  }

  /** `iters` damped rounds (d = 0.85) of fixed-point PageRank; returns
    * the top `k` nodes by final mass (ties to the lower node id).
    */
  def pagerank(s: SparkSession, d: String, iters: Int = 3,
               k: Int = 10): DataFrame =
    pagerankOnEdges(interactionEdges(s, d), iters, k)

  /** PageRank over any symmetrized (src, dst) edge frame (every node
    * must have outdeg ≥ 1, which symmetrization guarantees).
    */
  def pagerankOnEdges(edgeFrame: DataFrame, iters: Int,
                      k: Int): DataFrame = {
    import graft.CacheScope.TrackedDataset
    val edges = edgeFrame.persistTracked()
    val deg = edges.groupBy("src").agg(count(lit(1)).as("deg"))
      .select(col("src").as("node"), col("deg")).persistTracked()
    val n = deg.count() // node count — the one driver-side scalar
    val base = SCALE / n
    val teleport = (15L * base) / 100L
    var p = deg.select(col("node"), col("deg"), lit(base).as("p"))
    for (_ <- 1 to iters) {
      val sums = edges
        .join(p.select(col("node").as("src"), expr("p div deg").as("c")), Seq("src"))
        .groupBy(col("dst").as("node"))
        .agg(sum(col("c")).as("s"))
      p = deg.join(sums, Seq("node"), "left")
        .select(col("node"), col("deg"),
          (lit(teleport) + expr("(85 * coalesce(s, 0)) div 100")).as("p"))
    }
    p.select(col("node"), col("p").as("rank_mass"))
      .orderBy(desc("rank_mass"), asc("node")).limit(k)
  }

  /** One DuckDB iteration CTE (replays the Spark round exactly: BIGINT
    * floors throughout; `//` is DuckDB integer division).
    */
  private def iterSql(t: Int): String = {
    val prev = s"p${t - 1}"
    s"""p$t AS (
       | SELECT d.node, d.deg,
       |  (SELECT (15 * (1000000000000 // n)) // 100 FROM nn)
       |   + CAST((85 * COALESCE(s.s, 0)) // 100 AS BIGINT) AS p
       | FROM deg d LEFT JOIN (
       |  SELECT e.dst AS node, sum(p.p // p.deg) AS s
       |  FROM edges e JOIN $prev p ON e.src = p.node GROUP BY 1) s
       | ON d.node = s.node)""".stripMargin
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_pagerank_entity" -> { (s, d) => pagerank(s, d) })

  def oracles: Map[String, String] = Map(
    "q_pagerank_entity" -> {
      val iters = (1 to 3).map(iterSql).mkString(",\n")
      s"""WITH e0 AS (
         | SELECT DISTINCT 'c:' || o_custkey AS src, 's:' || l_suppkey AS dst
         | FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
         |edges AS (
         | SELECT src, dst FROM e0 UNION ALL SELECT dst, src FROM e0),
         |deg AS (SELECT src AS node, count(*) AS deg FROM edges GROUP BY 1),
         |nn AS (SELECT count(*) AS n FROM deg),
         |p0 AS (
         | SELECT node, deg,
         |  (SELECT 1000000000000 // n FROM nn) AS p
         | FROM deg),
         |$iters
         |SELECT node, p AS rank_mass FROM p3
         |ORDER BY rank_mass DESC, node LIMIT 10""".stripMargin
    })
}
