package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Round-13 extension tranche C (text side): model-based quality
  * scoring and retrieval-quality evaluation — the two measurement
  * layers a training-data pipeline runs AFTER the constructive
  * operators ([[LlmCuration]]'s filters and mixers, [[Retrieval]]'s
  * BM25/RRF rankers): score every document under a corpus language
  * model, and score every RANKER against labeled relevance. Float
  * policy as everywhere: exact integers through aggregation,
  * per-term doubles written identically in both engines, Σ across
  * rows rides DECIMAL(38,12), round-6 output.
  */
object TextEval {

  private val KnD = 0.75

  /** Per-document perplexity under the corpus Kneser–Ney bigram LM —
    * the CCNet device (Wenzek et al. 2020 §4.3: score every document
    * with a LM, keep the low-perplexity head) that turns
    * `ta_kn_bigram`'s MODEL into a per-document QUALITY SCORE:
    * PP(d) = exp(−(1/T_d)·Σ ln P_KN(w₂|w₁)) over d's T_d bigrams.
    * The LM is the same interpolated Kneser–Ney estimator as
    * `ta_kn_bigram` (rebuilt here unrounded and in full, not
    * top-30 — the two gates stay independent so a change to either
    * cannot silently shift the other); every doc bigram is observed
    * by construction (the LM trains on the same corpus), so the
    * backoff-only branch never fires and the join is inner. Each
    * ln P is one double; the per-document Σ rides DECIMAL(38,12)
    * (bigram order within a doc must not reorder a float sum);
    * single-token documents have no bigram and drop out
    * relationally on both engines.
    *
    * Scale shape: one bigram explode (linear in tokens), the LM
    * relations are vocabulary-sized hash aggregates, the scoring
    * join is keyed on the bigram type, one hash aggregate back to
    * the document grain — no fact-sized shuffle beyond the explode.
    */
  def lmPerplexity(s: SparkSession, dir: String): DataFrame = {
    val d12 = DecimalType(38, 12)
    val t = split(col("text"), " ")
    val len2 = greatest(size(t) - 1, lit(0))
    val bg = Tables.t(s, dir, "documents")
      .select(col("doc_id"), explode(zip_with(
        slice(t, lit(1), len2), slice(t, lit(2), len2),
        (a, b) => struct(a.as("prev"), b.as("w")))).as("bg"))
      .select(col("doc_id"), col("bg.prev").as("prev"), col("bg.w").as("w"))
    val cb = bg.groupBy(col("prev"), col("w")).agg(count(lit(1)).as("cb"))
    val cw1 = bg.groupBy(col("prev")).agg(count(lit(1)).as("c_w1"))
    val n1f = cb.groupBy(col("prev")).agg(count(lit(1)).as("n1_fwd"))
    val n1p = cb.groupBy(col("w")).agg(count(lit(1)).as("n1_prec"))
    val btot = cb.agg(count(lit(1)).as("b_types"))
    val pkn =
      (col("cb").cast(DoubleType) - lit(KnD)) / col("c_w1").cast(DoubleType) +
        lit(KnD) * col("n1_fwd").cast(DoubleType) /
          col("c_w1").cast(DoubleType) *
          (col("n1_prec").cast(DoubleType) / col("b_types").cast(DoubleType))
    val lm = cb.join(cw1, "prev").join(n1f, "prev").join(n1p, "w")
      .crossJoin(broadcast(btot))
      .select(col("prev"), col("w"), pkn.as("p_kn"))
    bg.join(lm, Seq("prev", "w"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        sum(log(col("p_kn")).cast(d12)).cast(DoubleType).as("lnsum"))
      .select(col("doc_id"), col("n_bigrams"),
        round(col("lnsum") / col("n_bigrams").cast(DoubleType), 6)
          .as("avg_lnp"),
        round(exp(-col("lnsum") / col("n_bigrams").cast(DoubleType)), 6)
          .as("perplexity"))
      .orderBy(col("doc_id"))
  }

  val lmPerplexityOracle: String =
    s"""WITH tok AS (SELECT doc_id, string_split(text, ' ') AS t
       |  FROM documents),
       |bg AS (SELECT doc_id, t[i] AS prev, t[i + 1] AS w
       |  FROM (SELECT doc_id, t, unnest(range(1, len(t))) AS i FROM tok)),
       |cb AS (SELECT prev, w, COUNT(*) AS cb FROM bg GROUP BY 1, 2),
       |cw1 AS (SELECT prev, COUNT(*) AS c_w1 FROM bg GROUP BY 1),
       |n1f AS (SELECT prev, COUNT(*) AS n1_fwd FROM cb GROUP BY 1),
       |n1p AS (SELECT w, COUNT(*) AS n1_prec FROM cb GROUP BY 1),
       |btot AS (SELECT COUNT(*) AS b_types FROM cb),
       |lm AS (
       |  SELECT prev, w,
       |    (CAST(cb AS DOUBLE) - $KnD) / CAST(c_w1 AS DOUBLE)
       |      + $KnD * CAST(n1_fwd AS DOUBLE) / CAST(c_w1 AS DOUBLE)
       |        * (CAST(n1_prec AS DOUBLE) / CAST(b_types AS DOUBLE)) AS p_kn
       |  FROM cb JOIN cw1 USING (prev) JOIN n1f USING (prev)
       |    JOIN n1p USING (w) CROSS JOIN btot),
       |sc AS (
       |  SELECT b.doc_id, COUNT(*) AS n_bigrams,
       |    CAST(SUM(CAST(ln(lm.p_kn) AS DECIMAL(38,12))) AS DOUBLE) AS lnsum
       |  FROM bg b JOIN lm USING (prev, w)
       |  GROUP BY 1)
       |SELECT doc_id, n_bigrams,
       |  round(lnsum / CAST(n_bigrams AS DOUBLE), 6) + 0.0 AS avg_lnp,
       |  round(exp(-lnsum / CAST(n_bigrams AS DOUBLE)), 6) AS perplexity
       |FROM sc ORDER BY doc_id""".stripMargin

  /** Ranking-metric evaluation — the IR eval harness (nDCG@10, MRR,
    * Precision@10, AP@20; Järvelin & Kekäläinen 2002 for DCG,
    * ln-discount variant documented below) that every
    * retrieval-backed pipeline needs BESIDE its rankers
    * (`ta_bm25_topk`, `ta_hybrid_rrf`, `sim_ann_recall` covers the
    * ANN side): given a ranking and a relevance label the ranking
    * did NOT see, how good is the ordering? Queries are the 5
    * highest-document-frequency tokens; the system under test ranks
    * documents by raw term frequency (doc_id tiebreak); the labels
    * come from an ORTHOGONAL field — a document is relevant to a
    * token iff its `source` is the token's most-associated source
    * (argmax of the token's within-source rate, source-name
    * tiebreak). DCG uses the natural-log discount rel/ln(r+1) (the
    * "b = e" base choice of Järvelin & Kekäläinen §4 — both engines
    * evaluate ln natively, and base only rescales DCG and IDCG by
    * the same constant, leaving nDCG invariant); the ideal DCG runs
    * over a LITERAL 1..10 position grid capped at the query's true
    * relevant count. Per-position terms are single doubles; every Σ
    * rides DECIMAL(38,12); ranks, counts, and P@10 stay exact
    * integers/rationals until one final division each.
    *
    * Scale shape: one token explode to the (token × doc) tf grid,
    * document-frequency top-5 (TakeOrdered), a source×token grid
    * for the labels, one ≤(5×20)-row retrieved relation — every
    * metric aggregate is constant-bounded after the tf grid.
    */
  def ndcgEval(s: SparkSession, dir: String): DataFrame = {
    val d12 = DecimalType(38, 12)
    val tok = Tables.t(s, dir, "documents")
      .select(col("doc_id"), col("source"),
        explode(split(col("text"), " ")).as("w"))
    val tf = tok.groupBy(col("w"), col("doc_id"), col("source"))
      .agg(count(lit(1)).as("tf"))
    val queries = tf.groupBy(col("w")).agg(count(lit(1)).as("df"))
      .orderBy(col("df").desc, col("w")).limit(5)
    // label: the token's most-associated source by within-source rate
    // ct/st — the rate comparison is exact integer cross-multiplication
    // in spirit (same doubles both engines), tiebreak on source name
    val srcTot = tok.groupBy(col("source")).agg(count(lit(1)).as("st"))
    val target = tok.join(broadcast(queries.select(col("w"))), "w")
      .groupBy(col("w"), col("source")).agg(count(lit(1)).as("ct"))
      .join(srcTot, "source")
      .withColumn("rn", row_number().over(Window.partitionBy(col("w"))
        .orderBy((col("ct").cast(DoubleType) / col("st").cast(DoubleType))
          .desc, col("source"))))
      .filter(col("rn") === 1)
      .select(col("w"), col("source").as("target"))
    val nRel = Tables.t(s, dir, "documents")
      .groupBy(col("source").as("target"))
      .agg(count(lit(1)).as("n_relevant"))
    val retrieved = tf.join(broadcast(queries.select(col("w"), col("df"))), "w")
      .withColumn("rnk", row_number().over(Window.partitionBy(col("w"))
        .orderBy(col("tf").desc, col("doc_id"))))
      .filter(col("rnk") <= 20)
      .join(broadcast(target), "w")
      .join(broadcast(nRel), "target")
      .withColumn("rel",
        when(col("source") === col("target"), 1L).otherwise(0L))
      .withColumn("relcum", sum(col("rel")).over(
        Window.partitionBy(col("w")).orderBy(col("rnk"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val perQuery = retrieved.groupBy(col("w"), col("df"), col("n_relevant"))
      .agg(count(lit(1)).as("n_retrieved"),
        sum(when(col("rnk") <= 10, col("rel")).otherwise(0L)).as("rel10"),
        min(when(col("rel") === 1, col("rnk"))).as("first_rel"),
        sum(when(col("rnk") <= 10 && col("rel") === 1,
          (lit(1.0) / log(col("rnk").cast(DoubleType) + lit(1.0)))
            .cast(d12)).otherwise(lit(0).cast(d12)))
          .cast(DoubleType).as("dcg10"),
        sum(when(col("rel") === 1,
          (col("relcum").cast(DoubleType) / col("rnk").cast(DoubleType))
            .cast(d12)).otherwise(lit(0).cast(d12)))
          .cast(DoubleType).as("apsum"))
    // ideal DCG: positions 1..min(n_relevant, 10) from a literal grid
    val ideal = perQuery.select(col("w"), col("n_relevant"),
        explode(sequence(lit(1), lit(10))).as("pos"))
      .filter(col("pos") <= least(col("n_relevant"), lit(10)))
      .groupBy(col("w"))
      .agg(sum((lit(1.0) / log(col("pos").cast(DoubleType) + lit(1.0)))
        .cast(d12)).cast(DoubleType).as("idcg10"))
    perQuery.join(ideal, "w")
      .filter(col("n_relevant") > 0)
      .select(col("w").as("query"), col("df"), col("n_relevant"),
        col("n_retrieved"),
        round(col("rel10").cast(DoubleType) / lit(10.0), 6).as("p_at_10"),
        round(coalesce(lit(1.0) / col("first_rel").cast(DoubleType),
          lit(0.0)), 6).as("mrr"),
        round(col("dcg10"), 6).as("dcg_10"),
        round(col("idcg10"), 6).as("idcg_10"),
        round(col("dcg10") / col("idcg10"), 6).as("ndcg_10"),
        round(col("apsum") / least(col("n_relevant"), lit(20L))
          .cast(DoubleType), 6).as("ap_20"))
      .orderBy(col("query"))
  }

  val ndcgEvalOracle: String =
    """WITH tok AS (
      |  SELECT doc_id, source, unnest(string_split(text, ' ')) AS w
      |  FROM documents),
      |tf AS (SELECT w, doc_id, source, COUNT(*) AS tf
      |  FROM tok GROUP BY 1, 2, 3),
      |queries AS (
      |  SELECT w, COUNT(*) AS df FROM tf GROUP BY 1
      |  ORDER BY df DESC, w LIMIT 5),
      |src_tot AS (SELECT source, COUNT(*) AS st FROM tok GROUP BY 1),
      |target AS (
      |  SELECT w, source AS target FROM (
      |    SELECT t.w, t.source,
      |      row_number() OVER (PARTITION BY t.w
      |        ORDER BY CAST(ct AS DOUBLE) / CAST(st AS DOUBLE) DESC,
      |          t.source) AS rn
      |    FROM (SELECT tok.w, tok.source, COUNT(*) AS ct
      |      FROM tok JOIN queries USING (w) GROUP BY 1, 2) t
      |    JOIN src_tot USING (source))
      |  WHERE rn = 1),
      |n_rel AS (SELECT source AS target, COUNT(*) AS n_relevant
      |  FROM documents GROUP BY 1),
      |retrieved AS (
      |  SELECT q.w, q.df, nr.n_relevant, r.rnk,
      |    CASE WHEN r.source = tg.target THEN 1 ELSE 0 END AS rel,
      |    SUM(CASE WHEN r.source = tg.target THEN 1 ELSE 0 END)
      |      OVER (PARTITION BY q.w ORDER BY r.rnk
      |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS relcum
      |  FROM (SELECT w, doc_id, source, tf,
      |      row_number() OVER (PARTITION BY w
      |        ORDER BY tf DESC, doc_id) AS rnk
      |    FROM tf) r
      |  JOIN queries q USING (w)
      |  JOIN target tg USING (w)
      |  JOIN n_rel nr USING (target)
      |  WHERE r.rnk <= 20),
      |per_query AS (
      |  SELECT w, df, n_relevant, COUNT(*) AS n_retrieved,
      |    CAST(SUM(CASE WHEN rnk <= 10 THEN rel ELSE 0 END) AS BIGINT)
      |      AS rel10,
      |    MIN(CASE WHEN rel = 1 THEN rnk END) AS first_rel,
      |    CAST(SUM(CASE WHEN rnk <= 10 AND rel = 1
      |      THEN CAST(1.0 / ln(CAST(rnk AS DOUBLE) + 1.0)
      |        AS DECIMAL(38,12))
      |      ELSE CAST(0 AS DECIMAL(38,12)) END) AS DOUBLE) AS dcg10,
      |    CAST(SUM(CASE WHEN rel = 1
      |      THEN CAST(CAST(relcum AS DOUBLE) / CAST(rnk AS DOUBLE)
      |        AS DECIMAL(38,12))
      |      ELSE CAST(0 AS DECIMAL(38,12)) END) AS DOUBLE) AS apsum
      |  FROM retrieved GROUP BY 1, 2, 3),
      |ideal AS (
      |  SELECT p.w,
      |    CAST(SUM(CAST(1.0 / ln(CAST(g.pos AS DOUBLE) + 1.0)
      |      AS DECIMAL(38,12))) AS DOUBLE) AS idcg10
      |  FROM per_query p,
      |    (SELECT unnest(range(1, 11)) AS pos) g
      |  WHERE g.pos <= LEAST(p.n_relevant, 10)
      |  GROUP BY 1)
      |SELECT p.w AS query, p.df, p.n_relevant, p.n_retrieved,
      |  round(CAST(p.rel10 AS DOUBLE) / 10.0, 6) AS p_at_10,
      |  round(COALESCE(1.0 / CAST(p.first_rel AS DOUBLE), 0.0), 6) AS mrr,
      |  round(p.dcg10, 6) AS dcg_10,
      |  round(i.idcg10, 6) AS idcg_10,
      |  round(p.dcg10 / i.idcg10, 6) AS ndcg_10,
      |  round(p.apsum / CAST(LEAST(p.n_relevant, 20) AS DOUBLE), 6)
      |    AS ap_20
      |FROM per_query p JOIN ideal i USING (w)
      |WHERE p.n_relevant > 0
      |ORDER BY query""".stripMargin

  /** Good–Turing smoothing counts (Good 1953; the Gale & Sampson
    * 1995 "simple GT" inputs) over the corpus unigram distribution —
    * the OTHER classical smoothing beside `ta_kn_bigram`'s
    * Kneser–Ney, and the estimator behind "how much probability mass
    * belongs to words we have never seen": the
    * frequency-of-frequencies table N_r, the Turing-adjusted counts
    * r* = (r+1)·N_{r+1}/N_r (an exact integer ratio — ONE double
    * division per row), each class's total smoothed mass, and the
    * unseen mass P₀ = N₁/N. Rows whose successor class N_{r+1} is
    * empty keep a NULL r* on both engines (the point where simple GT
    * switches to the log-linear fit — out of relational scope,
    * documented rather than approximated).
    *
    * Scale shape: one token explode, a vocabulary-sized count
    * aggregate, a frequency-grid-sized (≤ max count) self-join on
    * r+1, a 1-row token-total broadcast.
    */
  def goodTuring(s: SparkSession, dir: String): DataFrame = {
    val counts = Tables.t(s, dir, "documents")
      .select(explode(split(col("text"), " ")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("r"))
    val fof = counts.groupBy(col("r")).agg(count(lit(1)).as("n_r"))
    val tot = counts.agg(sum(col("r")).as("n_tokens"),
      count(lit(1)).as("v_types"))
    val nxt = fof.select((col("r") - 1).as("r"), col("n_r").as("n_r1"))
    fof.join(nxt, Seq("r"), "left")
      .crossJoin(broadcast(tot))
      .select(col("r"), col("n_r"), col("n_r1"), col("n_tokens"),
        col("v_types"),
        round((col("r") + 1).cast(DoubleType) *
          col("n_r1").cast(DoubleType) / col("n_r").cast(DoubleType), 6)
          .as("r_star"),
        round(col("n_r1").cast(DoubleType) * (col("r") + 1).cast(DoubleType) /
          col("n_tokens").cast(DoubleType), 6).as("class_mass"),
        round(when(col("r") === 1,
          col("n_r").cast(DoubleType) / col("n_tokens").cast(DoubleType))
          .otherwise(lit(0.0)), 6).as("p0_if_r1"))
      .orderBy(col("r"))
  }

  val goodTuringOracle: String =
    """WITH counts AS (
      |  SELECT w, COUNT(*) AS r FROM (
      |    SELECT unnest(string_split(text, ' ')) AS w FROM documents)
      |  GROUP BY 1),
      |fof AS (SELECT r, COUNT(*) AS n_r FROM counts GROUP BY 1),
      |tot AS (SELECT CAST(SUM(r) AS BIGINT) AS n_tokens,
      |  COUNT(*) AS v_types FROM counts),
      |nxt AS (SELECT r - 1 AS r, n_r AS n_r1 FROM fof)
      |SELECT f.r, f.n_r, nxt.n_r1, t.n_tokens, t.v_types,
      |  round(CAST(f.r + 1 AS DOUBLE) * CAST(nxt.n_r1 AS DOUBLE)
      |    / CAST(f.n_r AS DOUBLE), 6) AS r_star,
      |  round(CAST(nxt.n_r1 AS DOUBLE) * CAST(f.r + 1 AS DOUBLE)
      |    / CAST(t.n_tokens AS DOUBLE), 6) AS class_mass,
      |  round(CASE WHEN f.r = 1
      |    THEN CAST(f.n_r AS DOUBLE) / CAST(t.n_tokens AS DOUBLE)
      |    ELSE 0.0 END, 6) AS p0_if_r1
      |FROM fof f LEFT JOIN nxt USING (r) CROSS JOIN tot t
      |ORDER BY f.r""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("ta_lm_perplexity", lmPerplexity, Some(lmPerplexityOracle)),
    QueryDef("ta_ndcg_eval", ndcgEval, Some(ndcgEvalOracle)),
    QueryDef("ta_good_turing", goodTuring, Some(goodTuringOracle)),
  )
}
