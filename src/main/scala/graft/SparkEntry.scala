package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the operator-coverage surface (one entry per implemented
  * operator from SURVEY.md §2); `oracleSql` carries the DuckDB-equivalent
  * SQL for hash-compare. Queries without an oracle entry get a weaker
  * rows-only check (non-SQL-expressible ops: MinHash/SimHash etc.).
  */
object SparkEntry {

  private val modules: Seq[QueryModule] = Seq(
    _root_.graft.queries.AggQueries,
    _root_.graft.queries.JoinQueries,
    _root_.graft.queries.UpsertQueries,
    _root_.graft.queries.WindowQueries,
    _root_.graft.queries.SetOpQueries,
    _root_.graft.queries.FunctionQueries,
    _root_.graft.queries.OpsQueries,
    _root_.graft.queries.EventQueries,
    _root_.graft.queries.GeoQueries,
    _root_.graft.queries.GraphQueries,
    _root_.graft.queries.ProfileQueries,
    _root_.graft.queries.ParityQueries,
    _root_.graft.queries.TextQueries,
    _root_.graft.queries.BpeQueries,
    _root_.graft.queries.NearDupQueries,
    _root_.graft.queries.RetrievalQueries,
    _root_.graft.queries.SimilarityQueries,
    _root_.graft.queries.StreamQueries,
    _root_.graft.queries.UdfQueries,
    _root_.graft.queries.TypedQueries)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_pricing_summary")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.flatMap(_.queries).toMap

  def oracleSql: Map[String, String] =
    modules.flatMap(_.oracle).toMap
}

/** One per query file under graft.queries. */
trait QueryModule {
  def queries: Map[String, (SparkSession, String) => DataFrame]
  def oracle: Map[String, String]
}
