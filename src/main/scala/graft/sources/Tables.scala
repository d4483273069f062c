package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Readers for the driver-provided parquet star schema and for the
  * reference's TSV.gz dump formats (see FIXTURES.md §3).
  *
  * All readers are plain `spark.read` so Catalyst keeps pushdown/pruning:
  * filters and projections land in the parquet scan (`PushedFilters`,
  * `ReadSchema` in explain output).
  */
object Tables {
  /** Load one of the driver tables (`lineitem`, `orders`, ...). */
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** TSV.gz with explicit schema and `\N` nulls — the format of the
    * reference's principal dumps (indra_db/readonly_dumping/readonly_dumping.py:574-578).
    */
  def tsv(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .option("sep", "\t")
      .option("nullValue", "\\N")
      .option("header", "false")
      .schema(schema)
      .csv(path)

  /** `events.ts` arrives as a nanosecond epoch long (see GraftSession's
    * nanosAsLong flag); normalize to a proper timestamp column once here.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    // integer division: `/` on longs is double division, and epoch-nano
    // values exceed 2^53, so it would round the microsecond off by ±1
    table(spark, dir, "events")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }
}
