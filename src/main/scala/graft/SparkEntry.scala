package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Queries are organized into packs (graft.queries.*); each pack entry
  * carries the Spark plan and, where SQL-expressible, a DuckDB oracle.
  */
object SparkEntry {

  /** All registered query packs. Order is irrelevant; names must be unique. */
  def packs: Seq[QueryPack] = Seq(
    RelationalQueries,
    DslQueries,
    TextQueries,
    AssemblyQueries,
  )

  private lazy val all: Map[String, QueryDef] =
    packs.flatMap(_.defs).toMap

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    all("q_join_pipeline").fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map { case (k, d) => k -> d.fn }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    all.collect { case (k, QueryDef(_, Some(sql))) => k -> sql }
}
