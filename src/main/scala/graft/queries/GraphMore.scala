package graft.queries

import graft.QueryDef
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Round-13 graph-family extension: degree-stratified topology
  * diagnostics over the co-purchase graph [[Graph]] already builds.
  */
object GraphMore {

  /** Rich-club coefficient φ(k) (Zhou & Mondragón 2004): for each
    * degree threshold k, the edge density among the nodes of degree
    * > k — "do the hubs preferentially link to each other?", the
    * summary behind core-periphery claims in co-occurrence and
    * citation graphs (Colizza et al. 2006 add a null-model
    * normalization that needs edge rewiring — out of relational
    * scope, documented here; the raw φ(k) curve is what's gated).
    * Over [[Graph.supportEdges]]'s volume-thresholded co-purchase
    * graph: φ(k) = 2·E_k/(N_k·(N_k−1)), all exact integers, ONE
    * double division per k row.
    *
    * Scale shape: the edge list is aggregated ONCE into a degree
    * histogram and a min-endpoint-degree edge histogram; every φ(k)
    * is then a strict suffix sum over the merged histogram via a
    * single window pass (the k grid IS the distinct degrees, and the
    * edge histogram's min-endpoint values are themselves degrees, so
    * one ORDER BY k DESC frame computes N_k and E_k for every k at
    * once) — degree-grid-sized sort, never edge-sized per k, no
    * non-equi join anywhere. k with hubs but zero hub-hub edges keep
    * their φ = 0 row (the curve's informative collapse point).
    */
  def richClub(s: SparkSession, dir: String): DataFrame = {
    val edges = Graph.supportEdges(s, dir) // symmetric src↔dst
    val deg = edges.groupBy(col("src").as("node"))
      .agg(count(lit(1)).as("deg"))
    val und = edges.filter(col("src") < col("dst"))
    val em = und
      .join(deg.select(col("node").as("src"), col("deg").as("dx")), "src")
      .join(deg.select(col("node").as("dst"), col("deg").as("dy")), "dst")
      .select(least(col("dx"), col("dy")).as("k"))
      .groupBy(col("k")).agg(count(lit(1)).as("ec"))
    val dh = deg.groupBy(col("deg").as("k"))
      .agg(count(lit(1)).as("nc"))
    val hist = dh.select(col("k"), col("nc"), lit(0L).as("ec"))
      .unionByName(em.select(col("k"), lit(0L).as("nc"), col("ec")))
      .groupBy(col("k"))
      .agg(sum(col("nc")).as("nc"), sum(col("ec")).as("ec"))
    // strict suffix: nodes/edges with degree (resp. min endpoint
    // degree) STRICTLY greater than this row's k
    val wSuf = Window.orderBy(col("k").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    hist
      .withColumn("n_nodes", coalesce(sum(col("nc")).over(wSuf), lit(0L)))
      .withColumn("n_edges", coalesce(sum(col("ec")).over(wSuf), lit(0L)))
      .filter(col("n_nodes") > 1)
      .select(col("k"), col("n_nodes"), col("n_edges"),
        round(lit(2.0) * col("n_edges").cast(DoubleType) /
          (col("n_nodes") * (col("n_nodes") - 1)).cast(DoubleType), 6)
          .as("phi"))
      .orderBy(col("k"))
  }

  /** Oracle: the histogram-join formulation (grid × histogram
    * non-equi suffix sums) — deliberately a DIFFERENT derivation
    * than the Spark window pass, so a shared off-by-one in the
    * strict inequality can't cancel out. LEFT JOIN keeps the
    * zero-hub-edge rows the Spark side keeps.
    */
  val richClubOracle: String =
    s"""WITH it AS (SELECT DISTINCT l_orderkey AS o,
       |    CAST(l_partkey AS BIGINT) AS p
       |  FROM lineitem),
       |pr AS (
       |  SELECT a.p AS x, b.p AS y, COUNT(*) AS w
       |  FROM it a JOIN it b ON a.o = b.o AND a.p < b.p
       |  GROUP BY 1, 2
       |  HAVING COUNT(*) >= ${Graph.minSupSql}),
       |sym AS (
       |  SELECT x AS src, y AS dst FROM pr
       |  UNION ALL SELECT y AS src, x AS dst FROM pr),
       |deg AS (SELECT src AS node, COUNT(*) AS deg FROM sym GROUP BY 1),
       |em AS (
       |  SELECT LEAST(dx.deg, dy.deg) AS m, COUNT(*) AS ec
       |  FROM pr JOIN deg dx ON pr.x = dx.node
       |    JOIN deg dy ON pr.y = dy.node
       |  GROUP BY 1),
       |dh AS (SELECT deg, COUNT(*) AS nc FROM deg GROUP BY 1),
       |kg AS (SELECT DISTINCT deg AS k FROM deg),
       |nk AS (SELECT k, CAST(SUM(nc) AS BIGINT) AS n_nodes
       |  FROM kg JOIN dh ON dh.deg > kg.k GROUP BY 1),
       |ek AS (SELECT k, CAST(SUM(ec) AS BIGINT) AS n_edges
       |  FROM kg JOIN em ON em.m > kg.k GROUP BY 1)
       |SELECT nk.k, nk.n_nodes,
       |  COALESCE(ek.n_edges, 0) AS n_edges,
       |  round(2.0 * CAST(COALESCE(ek.n_edges, 0) AS DOUBLE)
       |    / CAST(nk.n_nodes * (nk.n_nodes - 1) AS DOUBLE), 6) AS phi
       |FROM nk LEFT JOIN ek USING (k)
       |WHERE nk.n_nodes > 1
       |ORDER BY nk.k""".stripMargin

  /** Degree-distribution inequality of the co-purchase graph — the
    * one-number "how hub-dominated is this graph" summary that
    * [[richClub]]'s curve refines: the Gini coefficient of the node
    * degree multiset (the graph-topology cousin of `ops_gini`, Gini
    * 1912 via the rank formula G = (2Σᵢi·dᵢ − (n+1)Σd)/(n·Σd) on a
    * deterministic (degree, node) sort), the degree-histogram
    * Shannon entropy H = −Σ(n_k/n)ln(n_k/n), and the max/mean
    * degree. Ranks and both Σ are exact integers (the Gini
    * numerator crosses to double ONCE); entropy terms are
    * per-histogram-row doubles Σ-dec12.
    *
    * Scale shape: one edge aggregate to the node-degree relation,
    * one degree-grid histogram; the rank window sorts the NODE
    * relation (the `ops_gini` shape — a sort of the entity grid,
    * never the edge list).
    */
  def degreeGini(s: SparkSession, dir: String): DataFrame = {
    val d0 = DecimalType(38, 0)
    val d12 = DecimalType(38, 12)
    val deg = Graph.supportEdges(s, dir)
      .groupBy(col("src").as("node")).agg(count(lit(1)).as("deg"))
    val ranked = deg.withColumn("i",
      row_number().over(Window.orderBy(col("deg"), col("node")))
        .cast(LongType))
    val gini = ranked.agg(count(lit(1)).as("n"),
      sum(col("deg").cast(d0)).as("sd"),
      sum((col("i") * col("deg")).cast(d0)).as("sid"),
      max(col("deg")).as("max_degree"))
    val hist = deg.groupBy(col("deg")).agg(count(lit(1)).as("nk"))
    val ent = hist.crossJoin(broadcast(gini.select(col("n").as("nn"))))
      .select((-(col("nk").cast(DoubleType) / col("nn").cast(DoubleType)) *
        log(col("nk").cast(DoubleType) / col("nn").cast(DoubleType)))
        .cast(d12).as("term"))
      .agg(sum(col("term")).cast(DoubleType).as("h"))
    gini.crossJoin(broadcast(ent))
      .filter(col("n") > 1)
      .select(col("n").as("n_nodes"), col("sd").cast(LongType).as("sum_deg"),
        col("max_degree"),
        round(col("sd").cast(DoubleType) / col("n").cast(DoubleType), 6)
          .as("mean_degree"),
        round((lit(2) * col("sid") - (col("n") + 1) * col("sd"))
          .cast(DoubleType) /
          (col("n").cast(d0) * col("sd")).cast(DoubleType), 6)
          .as("gini_degree"),
        round(col("h"), 6).as("degree_entropy"))
  }

  val degreeGiniOracle: String =
    s"""WITH it AS (SELECT DISTINCT l_orderkey AS o,
       |    CAST(l_partkey AS BIGINT) AS p
       |  FROM lineitem),
       |pr AS (
       |  SELECT a.p AS x, b.p AS y, COUNT(*) AS w
       |  FROM it a JOIN it b ON a.o = b.o AND a.p < b.p
       |  GROUP BY 1, 2
       |  HAVING COUNT(*) >= ${Graph.minSupSql}),
       |sym AS (
       |  SELECT x AS src, y AS dst FROM pr
       |  UNION ALL SELECT y AS src, x AS dst FROM pr),
       |deg AS (SELECT src AS node, COUNT(*) AS deg FROM sym GROUP BY 1),
       |ranked AS (
       |  SELECT deg, node,
       |    CAST(row_number() OVER (ORDER BY deg, node) AS BIGINT) AS i
       |  FROM deg),
       |g AS (
       |  SELECT COUNT(*) AS n,
       |    SUM(CAST(deg AS DECIMAL(38,0))) AS sd,
       |    SUM(CAST(i * deg AS DECIMAL(38,0))) AS sid,
       |    CAST(MAX(deg) AS BIGINT) AS max_degree
       |  FROM ranked),
       |hist AS (SELECT deg, COUNT(*) AS nk FROM deg GROUP BY 1),
       |ent AS (
       |  SELECT CAST(SUM(CAST(
       |      -(CAST(nk AS DOUBLE) / CAST(g.n AS DOUBLE))
       |      * ln(CAST(nk AS DOUBLE) / CAST(g.n AS DOUBLE))
       |    AS DECIMAL(38,12))) AS DOUBLE) AS h
       |  FROM hist CROSS JOIN g)
       |SELECT CAST(g.n AS BIGINT) AS n_nodes, CAST(g.sd AS BIGINT) AS sum_deg,
       |  g.max_degree,
       |  round(CAST(g.sd AS DOUBLE) / CAST(g.n AS DOUBLE), 6) AS mean_degree,
       |  round(CAST(2 * g.sid - (g.n + 1) * g.sd AS DOUBLE)
       |    / CAST(g.n * g.sd AS DOUBLE), 6) AS gini_degree,
       |  round(ent.h, 6) AS degree_entropy
       |FROM g CROSS JOIN ent WHERE g.n > 1""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("gr_rich_club", richClub, Some(richClubOracle)),
    QueryDef("gr_degree_gini", degreeGini, Some(degreeGiniOracle)),
  )
}
