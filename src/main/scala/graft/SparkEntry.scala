package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory.
  * Every operator family contributes (name → query) plus, where
  * SQL-expressible, a DuckDB oracle over the same tables. */
object SparkEntry {

  val families: Seq[OpFamily] = Seq(
    operators.EventSourcing,
    operators.Windows,
    operators.MetricsOps,
    operators.Relational,
    operators.RangeJoin,
    operators.Behavioral,
    functions.TextAnalysis,
    functions.Dedup,
    functions.SimHash,
    functions.Clusters,
    functions.Pipeline,
    functions.Similarity,
    functions.Multimodal,
    streaming.Streams,
    api.AccountOps,
    api.InventoryOps)

  private lazy val allOps: Seq[Op] = families.flatMap(_.ops)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q5_multijoin")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allOps.map(o => o.name -> o.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    allOps.flatMap(o => o.oracle.map(o.name -> _)).toMap
}
