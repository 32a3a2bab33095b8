package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator registers a [[QueryDef]] in one of the
  * `graft.queries.*` modules; this object only aggregates them. Each def
  * carries its DuckDB oracle SQL (same column names and ORDER BY) unless
  * the semantics are not ANSI-expressible, in which case a ScalaTest spec
  * covers it instead and the driver records a rows-only check.
  */
object SparkEntry {

  def allDefs: Seq[QueryDef] =
    queries_.values.toSeq

  /** Queries with no ANSI-expressible oracle (production-hash sketch
    * twins): excluded from the correctness surface — `queries` must be
    * 100% oracle-backed — but still timed by Bench/ScaleBench and
    * property-pinned by their specs.
    */
  def benchOnlyDefs: Seq[QueryDef] =
    graft.queries.Sketches.benchOnlyDefs ++ graft.queries.StatOps.benchOnlyDefs ++
      graft.queries.EdfOps.benchOnlyDefs

  private lazy val queries_ : Map[String, QueryDef] = {
    val defs =
      graft.queries.Relational.defs ++
        graft.queries.ReferenceOps.defs ++
        graft.queries.GoldenPipeline.defs ++
        graft.queries.AsOfJoin.defs ++
        graft.queries.StreamingGates.defs ++
        graft.queries.LlmText.defs ++
        graft.queries.LlmDedup.defs ++
        graft.queries.LlmVectors.defs ++
        graft.queries.LlmCuration.defs ++
        graft.queries.Sketches.defs ++
        graft.queries.RelationalExt.defs ++
        graft.queries.Subqueries.defs ++
        graft.queries.TrainingPrep.defs ++
        graft.queries.DataOps.defs ++
        graft.queries.TpchMore.defs ++
        graft.queries.TpchFinal.defs ++
        graft.queries.Retrieval.defs ++
        graft.queries.TextScores.defs ++
        graft.queries.Graph.defs ++
        graft.queries.Basket.defs ++
        graft.queries.StatOps.defs ++
        graft.queries.StatMore.defs ++
        graft.queries.GraphMore.defs ++
        graft.queries.StatTests.defs ++
        graft.queries.TextEval.defs ++
        graft.queries.EdfOps.defs ++
        graft.queries.QuantileOps.defs
    // a name collision would silently shrink the correctness gate
    // (toMap keeps the last duplicate) — fail loudly instead; the
    // bench-only names share the namespace (Bench times both sets)
    val allNames = defs.map(_.name) ++ benchOnlyDefs.map(_.name)
    require(allNames.distinct.size == allNames.size,
      s"duplicate query names: ${allNames.diff(allNames.distinct)}")
    require(defs.forall(_.oracle.nonEmpty),
      s"oracle-less defs in the correctness surface: ${defs.filter(_.oracle.isEmpty).map(_.name)}")
    defs.map(d => d.name -> d).toMap
  }

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The full reference view-cascade shape: explode → broadcast left join
    * → collect/flatten/distinct → array filter → boolean flag.
    */
  def entry(spark: SparkSession): DataFrame =
    graft.queries.ReferenceOps.genrePipeline(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    queries_.map { case (k, d) => k -> d.fn }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    queries_.flatMap { case (k, d) => d.oracle.map(k -> _) }

}
