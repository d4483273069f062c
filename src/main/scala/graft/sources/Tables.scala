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

  /** Scale-adaptive remedy for unsplittable input (guide §2.5): when the
    * scan yields far fewer partitions than the session's parallelism (a
    * single-row-group parquet file, a lone .gz — every scan stage then
    * runs as ONE task no matter the core count), repartition right after
    * the read so downstream map-heavy work spreads. A no-op whenever the
    * input already splits (any real multi-file dataset), so at scale this
    * never inserts the (there, catastrophic) full-input shuffle. */
  def parallelized(df: DataFrame): DataFrame = {
    val have = df.rdd.getNumPartitions
    val want = df.sparkSession.sparkContext.defaultParallelism
    if (have * 2 < want) {
      // hash-repartition on the leading column (the tables' unique id),
      // not round-robin: a keyless repartition(n) first pays a local sort
      // of its input per map task (sortBeforeRepartition, SPARK-23207),
      // and hashing one column instead of the row keeps column pruning
      // alive through the exchange
      import org.apache.spark.sql.functions.{xxhash64, col}
      df.repartition(want, xxhash64(col(df.columns.head)))
    } else df
  }

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

  /** The reference's read-only-query guard for principal dumps
    * (`_find_disallowed_keywords`, readonly_dumping.py:2130-2176): any
    * whitespace token of the query matching a mutation/DDL keyword,
    * case-insensitive. */
  val disallowedKeywords: Set[String] = Set(
    "alter", "call", "commit", "create", "delete", "drop", "explain",
    "grant", "insert", "lock", "merge", "rename", "revoke", "savepoint",
    "set", "rollback", "transaction", "truncate", "update")

  def findDisallowedKeywords(query: String): Seq[String] =
    query.split("\\s+").map(_.toLowerCase).distinct
      .filter(disallowedKeywords).sorted.toSeq

  /** Generic principal-query -> TSV dump (`principal_query_to_csv`,
    * readonly_dumping.py:2075-2127): run an arbitrary read-only SQL query
    * over the registered tables and write it as headered TSV with `\N`
    * nulls — the same convention [[tsv]] reads back, so dumps round-trip.
    * The keyword blocklist rejects anything that could mutate state before
    * the query ever reaches the engine. Distributed write (one file per
    * partition, like the reference's chunked dumps); `coalesce(1)` at the
    * call site if a single file is required.
    */
  def principalQueryToTsv(
      spark: SparkSession, query: String, outputLocation: String): Unit = {
    val bad = findDisallowedKeywords(query)
    require(bad.isEmpty, s"Query '$query' uses disallowed keywords: $bad")
    spark.sql(query).write
      .option("sep", "\t")
      .option("nullValue", "\\N")
      .option("emptyValue", "")
      .option("header", "true")
      .mode("overwrite")
      .csv(outputLocation)
  }

  /** `events.ts` normalized to one session-zone timestamp type regardless
    * of how the driver generated the parquet: older testdata stores
    * TIMESTAMP(NANOS), which Spark reads as a nanosecond epoch long under
    * GraftSession's nanosAsLong flag; newer testdata stores micros, read
    * as TIMESTAMP_NTZ. Downstream (windows, rollups, oracles) always sees
    * TimestampType in the UTC session, so both generations hash alike.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    normalizeTs(table(spark, dir, "events"))
  }

  /** See [[events]]; exposed for streaming readers of the same table. */
  def normalizeTs(raw: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    raw.schema("ts").dataType match {
      // integer division: `/` on longs is double division, and epoch-nano
      // values exceed 2^53, so it would round the microsecond off by ±1
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      // NTZ -> session-zone instant is identity under the UTC session
      case _: org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts",
          col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => raw
    }
  }
}
