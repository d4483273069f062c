package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable operator demo: a Spark plan over the driver testdata plus,
  * where SQL-expressible, an equivalent DuckDB oracle query. Column names in
  * both MUST match (driver sorts columns by name before hashing).
  */
final case class QueryDef(
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
)

trait QueryPack {
  def defs: Map[String, QueryDef]
}
