package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Full-text retrieval over the documents corpus: BM25 — the ranking
  * function every search-backed data pipeline (RAG corpus selection,
  * contamination lookup, quality-by-query probes) reaches for before
  * anything neural. Pure relational formulation: the "inverted index"
  * IS the (term → doc, tf) relation, so at 100 TB the postings build is
  * one explode + hash aggregate and each query's scoring touches only
  * its own postings via the broadcast query join — the corpus is never
  * scanned per query.
  */
object Retrieval {

  private val K1 = 1.2
  private val B = 0.75
  private val TopK = 10
  private val NQueries = 5

  /** BM25 top-k per query term. The query set derives deterministically
    * from the corpus (top-[[NQueries]] document-frequency terms of
    * length ≥ 5, ties by term) so the gate needs no side input; in
    * production the 5-row query relation arrives from the user instead
    * — same plan. Selection compiles to TakeOrderedAndProject (sort +
    * limit), not a global window.
    *
    * Scale shape: postings (tf) and doc lengths are each ONE scan of
    * the corpus; the scored relation is |postings of the 5 query
    * terms| after a broadcast semi-join on term — never corpus-sized;
    * top-k per query is a 5-partition WindowGroupLimit. The two corpus
    * scalars (N, total token count) are parquet-metadata-cheap
    * aggregates, the same bounded-driver-scalar device as tfidf.
    */
  def bm25TopK(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.t(s, dir, "documents")
    val withDl = docs.select(col("doc_id"), split(col("text"), " ").as("toks"))
      .select(col("doc_id"), col("toks"), size(col("toks")).cast("long").as("dl"))
    // bounded driver scalars: corpus size and average doc length
    val Array(nDocs, sumDl) = withDl
      .agg(count(lit(1)), sum(col("dl"))).head().toSeq.toArray
      .map(_.asInstanceOf[Long])
    val avgdl = sumDl.toDouble / nDocs
    val tf = withDl
      .select(col("doc_id"), explode(col("toks")).as("term"))
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val dfRel = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val queries = dfRel.filter(length(col("term")) >= 5)
      .orderBy(col("df").desc, col("term")).limit(NQueries)
    val dl = withDl.select(col("doc_id"), col("dl"))
    val idf = log(
      (lit(nDocs.toDouble) - col("df") + lit(0.5)) / (col("df") + lit(0.5)) + lit(1.0))
    val norm = lit(1.0) - lit(B) + lit(B) * col("dl") / lit(avgdl)
    val score = idf * (col("tf") * lit(K1 + 1.0)) / (col("tf") + lit(K1) * norm)
    val w = Window.partitionBy(col("qterm"))
      .orderBy(round(score, 9).desc, col("doc_id"))
    tf.join(broadcast(queries.withColumnRenamed("term", "qterm")),
        col("term") === col("qterm"))
      .join(dl, "doc_id")
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= TopK)
      .select(col("qterm"), col("rank"), col("doc_id"), round(score, 6).as("bm25"))
      .orderBy(col("qterm"), col("rank"))
  }

  val bm25TopKOracle: String =
    s"""WITH withdl AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
       |tok AS (SELECT doc_id, unnest(toks) AS term FROM withdl),
       |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY 1, 2),
       |dfr AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
       |dl AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl FROM withdl),
       |stats AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n,
       |    CAST(SUM(len(toks)) AS DOUBLE) / COUNT(*) AS avgdl FROM withdl),
       |q AS (SELECT term AS qterm, df FROM dfr WHERE length(term) >= 5
       |  ORDER BY df DESC, term LIMIT $NQueries),
       |scored AS (
       |  SELECT q.qterm, tf.doc_id,
       |    ln((s.n - q.df + 0.5) / (q.df + 0.5) + 1.0)
       |      * (tf.tf * ${K1 + 1.0}) / (tf.tf + $K1 * (1.0 - $B + $B * dl.dl / s.avgdl))
       |      AS score
       |  FROM tf JOIN q ON tf.term = q.qterm
       |  JOIN dl ON tf.doc_id = dl.doc_id CROSS JOIN stats s),
       |ranked AS (SELECT qterm, doc_id, score,
       |    ROW_NUMBER() OVER (PARTITION BY qterm
       |      ORDER BY round(score, 9) DESC, doc_id) AS rank
       |  FROM scored)
       |SELECT qterm, rank, doc_id, round(score, 6) AS bm25
       |FROM ranked WHERE rank <= $TopK ORDER BY qterm, rank""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("ta_bm25_topk", bm25TopK, Some(bm25TopKOracle)),
  )
}
